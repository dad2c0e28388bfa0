package graft

import graft.operators._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property-based differential tests (the reference's primary oracle,
 * notebook.ipynb cell 5): on ARBITRARY generated tables the filtered pipeline
 * must produce exactly the brute-force pair set, across thresholds and all
 * three tokenizer families, and the value-deduplicated variant must be
 * output-identical (orientation included) to the record-level pipeline.
 *
 * ScalaCheck generators sampled with fixed seeds (the scalatest<->scalacheck
 * bridge artifact isn't available offline) — deterministic, reproducible runs.
 */
class JaccardPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"generator failed for seed $seed"))

  // Lowercase-only vocabulary: the delimiter tokenizers apply list_distinct
  // BEFORE lowercasing (faithful reference quirk), so case-variant words
  // ("The the") yield duplicate token rows — and under duplicate tokens the
  // prefix-filter bound provably cannot cover brute force (overlap counts
  // token-row PRODUCTS, which exceed the set sizes the filter math assumes).
  // The reference has the same algorithmic limitation; see the dedicated
  // quirk test below. Same-string repeats are safe (set-dedup collapses them).
  private val word = Gen.oneOf(
    "ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen", "ibex", "jay",
    "koi", "lark", "mole-rat", "x")
  private val value = Gen.chooseNum(1, 7)
    .flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
  private val tableGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(5, 28).flatMap { n =>
      Gen.listOfN(n, value).map(_.zipWithIndex.map { case (v, i) => (i + 1L, v) })
    }
  private val thresholds = Seq(0.2, 0.3, 0.5, 0.7, 0.9)
  private val tokenizers: Seq[(String, Tokenizer)] = Seq(
    "ws" -> WhitespaceTokenizer(),
    "q2" -> QGramsTokenizer(2),
    "q3" -> QGramsTokenizer(3),
    "delim" -> DelimiterTokenizer(Set(' ', '-')))

  for (((tokName, tok), i) <- tokenizers.zipWithIndex; t <- thresholds) {
    test(s"property: filtered == brute force ($tokName t=$t)") {
      val df = sample(tableGen, 1000 + i * 10 + (t * 10).toInt).toDF("id", "val")
      val filtered = JaccardJoin.selfJoin(df, "id", "val", tok, t)
      val brute = JaccardJoin.bruteForceSelf(df, "id", "val", tok, t)
      assert(unorderedPairSet(filtered) === unorderedPairSet(brute))
    }
  }

  // duplicate-heavy: draw values from a tiny pool so many records collide and
  // the expansion gate (concat(len,'_',id) string order) is exercised
  private val dupTable: Gen[List[(Long, String)]] =
    Gen.chooseNum(6, 24).flatMap { n =>
      Gen.listOfN(4, value).flatMap { pool =>
        Gen.listOfN(n, Gen.oneOf(pool))
          .map(_.zipWithIndex.map { case (v, i) => (i + 1L, v) })
      }
    }

  for (t <- thresholds; (tokName, tok) <- Seq(tokenizers.head, tokenizers(2))) {
    test(s"property: selfJoinDeduped output-identical to selfJoin ($tokName t=$t)") {
      val df = sample(dupTable, 2000 + (t * 100).toInt).toDF("id", "val")
      assert(pairSet(JaccardJoin.selfJoin(df, "id", "val", tok, t)) ===
        pairSet(JaccardJoin.selfJoinDeduped(df, "id", "val", tok, t)))
    }
  }

  for (t <- Seq(0.3, 0.5, 0.8); seed <- Seq(31L, 47L)) {
    test(s"property: exact-recall R x S == brute force (t=$t seed=$seed)") {
      val ws = WhitespaceTokenizer()
      val l = sample(tableGen, seed).toDF("lid", "lval")
      val r = sample(tableGen, seed + 1).map { case (i, v) => (i + 500L, v) }
        .toDF("rid", "rval")
      val filtered = JaccardJoin.rsJoin(l, "lid", "lval", r, "rid", "rval", ws, t,
        exactRecall = true)
      val brute = JaccardJoin.bruteForceRs(l, "lid", "lval", r, "rid", "rval", ws, t)
      val fPairs = filtered
        .select(filtered.columns.find(_.startsWith("l_")).get,
          filtered.columns.find(_.startsWith("r_")).get)
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
      assert(fPairs === pairSet(brute))
    }
  }

  test("quirk: duplicate tokens break the prefix-filter bound (reference-faithful)") {
    // "The the a b" set-tokenizes (distinct BEFORE lower) to [the, the, a, b]:
    // brute-force overlap with "The the a c" = 2*2 + 1 = 5 >= (4+4)*0.7/1.7,
    // but both docs' rarest-first prefixes at t=0.7 hold only the unique word
    // (b / c), so candidate generation finds no witness — the filtered join
    // MISSES a qualifying pair. This mirrors the reference exactly (its filter
    // math assumes set semantics); with any duplicate-free tokenization the
    // differential properties above guarantee equality.
    val df = Seq(1L -> "b a The the", 2L -> "c a The the").toDF("id", "val")
    val ws = WhitespaceTokenizer()
    assert(pairSet(JaccardJoin.bruteForceSelf(df, "id", "val", ws, 0.7)) ===
      Set((1L, 2L)))
    assert(JaccardJoin.selfJoin(df, "id", "val", ws, 0.7).count() === 0L)
    // the deduped variant reproduces the record-level pipeline bit-for-bit
    assert(JaccardJoin.selfJoinDeduped(df, "id", "val", ws, 0.7).count() === 0L)
  }

  for (t <- Seq(0.5, 0.9)) {
    test(s"property: MinHash+LSH pairs are a verified subset of brute force (t=$t)") {
      val ws = WhitespaceTokenizer()
      val df = sample(tableGen, 4000 + (t * 10).toInt).toDF("id", "val")
      val exact = unorderedPairSet(JaccardJoin.bruteForceSelf(df, "id", "val", ws, t))
      val mh = Dedup.minHashPairs(df, "id", "val", ws, t)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .map { case (a, b) => if (a <= b) (a, b) else (b, a) }.toSet
      assert(mh.subsetOf(exact))
    }
  }
}
