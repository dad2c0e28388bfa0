package graft

import graft.operators._
import scala.util.Random

/** Dedup cascade tests: exact, MinHash+LSH (recall vs exact Jaccard), SimHash. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val ws = WhitespaceTokenizer()

  /** Docs with engineered near-duplicates: base docs + copies with k words swapped. */
  private def corpus(seed: Int, nBase: Int, nDup: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = (0 until 200).map(i => s"w$i")
    val base = (0 until nBase).map { i =>
      i.toLong -> Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")
    }
    val dups = (0 until nDup).map { i =>
      val (srcId, text) = base(rnd.nextInt(nBase))
      val words = text.split(" ")
      words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.size))
      (1000L + i) -> words.distinct.mkString(" ")
    }
    base ++ dups
  }

  test("exact dedup groups identical content and keeps the min key") {
    val df = Seq(1L -> "same text", 2L -> "same text", 3L -> "other").toDF("id", "txt")
    val out = Dedup.exact(df, "id", "txt").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((2L, 1L), (1L, 3L)))
  }

  test("minhash LSH pairs are a subset of exact pairs and recall is high") {
    val df = corpus(5, 40, 20).toDF("id", "txt")
    val exact = unorderedPairSet(JaccardJoin.bruteForceSelf(df, "id", "txt", ws, 0.8))
    val mh = Dedup.minHashPairs(df, "id", "txt", ws, 0.8, bands = 16, rowsPerBand = 8)
    val mhPairs = mh.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => if (a <= b) (a, b) else (b, a) }.toSet
    assert(exact.nonEmpty, "corpus must contain engineered near-dups")
    assert(mhPairs.subsetOf(exact), "verification must kill all false positives")
    assert(mhPairs.size >= (exact.size * 0.9).toInt,
      s"LSH recall too low: ${mhPairs.size}/${exact.size}")
  }

  test("minhash emits each pair exactly once (first-matching-band, both families)") {
    // near-identical copies collide in MOST of the 16 bands, so duplicate
    // emission (what the old `.distinct()` absorbed) would surface here as
    // repeated (lid, rid) rows
    val df = (corpus(11, 20, 40) ++ Seq(2000L -> "w1 w2 w3", 2001L -> "w1 w2 w3"))
      .toDF("id", "txt")
    for (fam <- Seq(Dedup.XxHash64Family, Dedup.Md5Family)) {
      val pairs = Dedup.minHashPairs(df, "id", "txt", ws, 0.8, family = fam)
      val dupes = pairs.groupBy("lid", "rid").count().where($"count" > 1).collect()
      assert(dupes.isEmpty, s"$fam emitted duplicates: ${dupes.take(3).mkString}")
      assert(pairs.count() > 0, s"$fam found no pairs on a dup-heavy corpus")
    }
  }

  test("hashed verification == string verification (pairs AND jaccard values)") {
    // bag tokenizer so duplicate tokens exercise the multiset product count
    // on both paths; candidates = all pairs so the verify gate decides alone
    val wsBag = WhitespaceTokenizer(returnSet = false)
    // dup-run docs chosen to avoid the bag-mode degenerate denominator
    // (product overlap == llen + rlen, e.g. "x x x y" vs "x x y" — a latent
    // edge of the reference's i/(l+r-i) formula, not of the hashed path)
    val docs = (corpus(17, 25, 30) ++ Seq(
      4000L -> "x x y z", 4001L -> "x x y w", 4002L -> "x x y")).toDF("id", "txt")
    val tokens = wsBag.tokenize(docs, "id", "txt")
    val ids = docs.select($"id".as("lid")).crossJoin(docs.select($"id".as("rid")))
      .where($"lid" < $"rid")
    val viaStrings = Dedup.verifyJaccard(ids, tokens, 0.5, hashedVerify = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaHashes = Dedup.verifyJaccard(ids, tokens, 0.5, hashedVerify = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaStrings.nonEmpty)
    assert(viaHashes === viaStrings)
  }

  test("simhash emits each pair exactly once (first-matching-band, both families)") {
    // identical copies have hamming 0 and collide in ALL 4 bands — the
    // worst case for duplicate emission
    val df = (corpus(13, 15, 30) ++ Seq(3000L -> "w1 w2 w3", 3001L -> "w1 w2 w3"))
      .toDF("id", "txt")
    for (fam <- Seq(Dedup.XxHash64Family, Dedup.Md5Family)) {
      val pairs = Dedup.simHashPairs(df, "id", "txt", ws, 3, family = fam)
      val dupes = pairs.groupBy("lid", "rid").count().where($"count" > 1).collect()
      assert(dupes.isEmpty, s"$fam emitted duplicates: ${dupes.take(3).mkString}")
      assert(pairs.where($"lid" === 3000L && $"rid" === 3001L).count() === 1,
        s"$fam must emit the identical pair exactly once")
    }
  }

  test("minhash verification uses the reference threshold operand order") {
    // true J = 27/30 = 0.9 exactly; the reference form computes a bound of
    // 27.000000000000004 and must DROP the pair (consistent with JaccardJoin)
    val common = (1 to 27).map(i => s"c$i")
    val a = (common ++ Seq("a1", "a2")).mkString(" ")        // len 29
    val b = (common ++ Seq("b1")).mkString(" ")              // len 28
    val df = Seq(1L -> a, 2L -> b).toDF("id", "txt")
    val mh = Dedup.minHashPairs(df, "id", "txt", ws, 0.9, bands = 32, rowsPerBand = 2)
    assert(mh.count() === 0L)
    val brute = JaccardJoin.bruteForceSelf(df, "id", "txt", ws, 0.9)
    assert(brute.count() === 0L, "join pipeline drops the same boundary pair")
  }

  test("simhash pairs detect near-identical docs within hamming bound") {
    val df = corpus(9, 30, 15).toDF("id", "txt")
    val out = Dedup.simHashPairs(df, "id", "txt", ws, maxHamming = 3)
    val rows = out.collect()
    assert(rows.forall(_.getInt(2) <= 3))
    // single-word-changed dups of 30-word docs should mostly land within 3 bits
    assert(rows.nonEmpty)
  }

  test("simhash of identical content is identical (hamming 0)") {
    val df = Seq(1L -> "alpha beta gamma", 2L -> "alpha beta gamma").toDF("id", "txt")
    val sigs = Dedup.simHash64(ws.tokenize(df, "id", "txt"))
      .collect().map(_.getLong(1)).toSet
    assert(sigs.size === 1)
  }

  test("minhash verify: multiset fallback matches join-count semantics on case-variant dups") {
    // ws set-mode distincts BEFORE lowercasing, so "The the" emits TWO 'the'
    // rows; the reference's count(*) overlap then counts the 2x2 product.
    // len = 4, overlap = 2*2 + 1 + 1 = 6 -> jaccard = 6/(4+4-6) = 3.0
    val df = Seq(1L -> "The the foo bar", 2L -> "The the foo bar").toDF("id", "txt")
    val rows = Dedup.minHashPairs(df, "id", "txt", ws, 0.9).collect()
    assert(rows.length === 1)
    assert(rows.head.getDouble(2) === 3.0)
  }

  test("minhash verify: multiset overlap can exceed min length (no length prefilter)") {
    // delimiter distinct-before-lowercase: "The THE tHe the" emits FOUR 'the'
    // rows (len 4); against "the" (len 1) the multiset product overlap is
    // 4 >= (4+1)*0.9/1.9 = 2.368, so the reference threshold test KEEPS the
    // pair even though rlen < llen*t. A set-semantics length prefilter must
    // not drop it on the multiset path.
    val df = Seq(1L -> "The THE tHe the", 2L -> "the").toDF("id", "txt")
    val rows = Dedup.minHashPairs(df, "id", "txt", ws, 0.9).collect()
    assert(rows.length === 1)
    assert(rows.head.getDouble(2) === 4.0)
    // consistent with the brute-force join-count semantics on the same data
    assert(JaccardJoin.bruteForceSelf(df, "id", "txt", ws, 0.9).count() === 1L)
  }

  test("ngram near-dup drop ids agree with the q-gram brute-force join") {
    val q5 = QGramsTokenizer(5)
    val df = corpus(11, 25, 12).toDF("id", "txt")
    val expected = unorderedPairSet(JaccardJoin.bruteForceSelf(df, "id", "txt", q5, 0.8))
      .map { case (a, b) => math.max(a, b) }
    val drops = Dedup.nearDuplicateDropIds(df, "id", "txt", q5, 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(drops === expected)
  }

  test("clusterIds: transitive chains collapse to one min-id representative") {
    // components: {1,2,3,7} (chain 1-2, 2-3, 3-7), {10,11}, {20,21} via 21-20
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (10L, 11L), (21L, 20L))
      .toDF("l", "r")
    val out = Dedup.clusterIds(pairs, "l", "r")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    // pairwise greatest-drop would delete 2, 3 AND 7 — clustering keeps the
    // same representative (1) but proves 7 belongs to 1's cluster, not its own
  }

  test("clusterIds: a 2000-node chain converges within the log-round budget") {
    // a pure path graph is the adversarial diameter case: plain min-label
    // propagation needs ~2000 rounds (and would silently hit maxIter with
    // wrong labels); pointer jumping must finish inside the default 50
    val n = 2000
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("l", "r")
    val out = Dedup.clusterIds(pairs, "l", "r").collect()
    assert(out.length === n)
    assert(out.forall(_.getLong(1) == 0L), "every chain node must label to the minimum (0)")
  }

  test("clusterKeepIds: one representative per cluster, unpaired docs all kept") {
    val docs = Seq(1L -> "a", 2L -> "b", 3L -> "c", 7L -> "d", 9L -> "e")
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("l", "r") // chain {1,2,3}; 7, 9 unpaired
    val keep = Dedup.clusterKeepIds(docs, "doc_id", pairs, "l", "r")
      .collect().map(_.getLong(0)).toSet
    assert(keep === Set(1L, 7L, 9L))
    // pairwise greatest-drop on the same pairs would keep {1, 7, 9} too, but
    // on a~b, b~c, c~d style chains it would also drop the representative's
    // whole tail; clustering keeps exactly one per component by construction
  }

  test("cascade: exact stage removes fingerprint dups, near-dup stage drops greatest") {
    val df = Seq(
      1L -> "alpha beta gamma",
      2L -> "Alpha  BETA gamma",   // exact stage dup of 1 (normalized fingerprint)
      3L -> "alpha beta gamma delta x y z q r s", // distinct
      4L -> "unrelated content entirely different words here now ok",
      5L -> "alpha beta gamma").toDF("id", "txt") // another exact dup of 1
    val kept = Dedup.cascadeKeepIds(df, "id", "txt", ws, 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L))
  }

  test("near-duplicate drop ids: greatest of each qualifying pair") {
    val df = Seq(1L -> "a b c d", 2L -> "a b c d", 3L -> "x y z w").toDF("id", "txt")
    val drops = Dedup.nearDuplicateDropIds(df, "id", "txt", ws, 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(drops === Set(2L))
  }

  /** Cross-side exact pairs by brute force: every (corpus, incoming) pair
    * meeting the reference threshold test. */
  private def exactRsPairs(corpus: Seq[(Long, String)], incoming: Seq[(Long, String)],
                           t: Double): Set[(Long, Long)] = {
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).toSet
    (for {
      (lid, ltxt) <- corpus; (rid, rtxt) <- incoming
      l = toks(ltxt); r = toks(rtxt)
      ov = (l intersect r).size
      if ov >= (l.size + r.size) * t / (1 + t)
    } yield (lid, rid)).toSet
  }

  test("minhash R×S pairs: no false positives, high recall, both families agree") {
    // corpus ids 0-39 (base+dups), incoming ids 5000+: half near-dups of
    // corpus docs, half fresh — the daily-ingest shape
    val rnd = new Random(23)
    val corp = corpus(23, 30, 10)
    val vocab = (0 until 200).map(i => s"w$i")
    val incoming = (0 until 12).map { i =>
      if (i % 2 == 0) {
        val (_, text) = corp(rnd.nextInt(corp.size))
        val words = text.split(" ")
        words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.size))
        (5000L + i) -> words.distinct.mkString(" ")
      } else
        (5000L + i) -> Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")
    }
    val exact = exactRsPairs(corp, incoming, 0.8)
    assert(exact.nonEmpty, "incoming must contain engineered corpus near-dups")
    val lDf = corp.toDF("id", "txt"); val rDf = incoming.toDF("id", "txt")
    for (fam <- Seq(Dedup.XxHash64Family, Dedup.Md5Family)) {
      val got = Dedup.minHashPairsRs(lDf, rDf, "id", "txt", ws, 0.8, family = fam)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.subsetOf(exact), s"$fam produced false positives: ${(got -- exact).take(3)}")
      assert(got.size >= (exact.size * 0.9).toInt,
        s"$fam LSH recall too low: ${got.size}/${exact.size}")
    }
  }

  test("minhash R×S emits each pair exactly once (first-matching-band)") {
    // identical cross-side copies collide in ALL bands — worst case for
    // duplicate emission through the banded join
    val lDf = (corpus(29, 15, 20) ++ Seq(900L -> "w1 w2 w3")).toDF("id", "txt")
    val rDf = Seq(7000L -> "w1 w2 w3", 7001L -> "w1 w2 w9").toDF("id", "txt")
    for (fam <- Seq(Dedup.XxHash64Family, Dedup.Md5Family)) {
      val pairs = Dedup.minHashPairsRs(lDf, rDf, "id", "txt", ws, 0.5, family = fam)
      val dupes = pairs.groupBy("lid", "rid").count().where($"count" > 1).collect()
      assert(dupes.isEmpty, s"$fam emitted duplicates: ${dupes.take(3).mkString}")
      assert(pairs.where($"lid" === 900L && $"rid" === 7000L).count() === 1,
        s"$fam must emit the identical cross-side pair exactly once")
    }
  }

  test("indexed R×S pairs == direct R×S pairs (pairs AND jaccard values)") {
    val rnd = new Random(41)
    val corp = corpus(41, 30, 12)
    val vocab = (0 until 200).map(i => s"w$i")
    val incoming = (0 until 10).map { i =>
      if (i % 2 == 0) {
        val (_, text) = corp(rnd.nextInt(corp.size))
        val words = text.split(" ")
        words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.size))
        (6000L + i) -> words.distinct.mkString(" ")
      } else
        (6000L + i) -> Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")
    }
    val lDf = corp.toDF("id", "txt"); val rDf = incoming.toDF("id", "txt")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = asSet(Dedup.minHashPairsRs(lDf, rDf, "id", "txt", ws, 0.8))
    val indexed = asSet(Dedup.minHashPairsRsIndexed(
      Dedup.minHashIndex(lDf, "id", "txt", ws), rDf, "id", "txt", ws, 0.8))
    assert(direct.nonEmpty, "corpus must contain engineered near-dups")
    assert(indexed === direct)
    // md5 family (the oracle-checkable registered twin): the stored 60-bit
    // hash arrays must verify to the same pairs and jaccard values as the
    // direct path's raw-string verification (distinct-token docs: sorted-
    // merge overlap == string product count)
    val directMd5 = asSet(Dedup.minHashPairsRs(lDf, rDf, "id", "txt", ws, 0.8,
      family = Dedup.Md5Family))
    val indexedMd5 = asSet(Dedup.minHashPairsRsIndexed(
      Dedup.minHashIndex(lDf, "id", "txt", ws, family = Dedup.Md5Family),
      rDf, "id", "txt", ws, 0.8, family = Dedup.Md5Family))
    assert(directMd5.nonEmpty)
    assert(indexedMd5 === directMd5)
  }

  test("simhash R×S == brute-force cross hamming (pigeonhole recall, both families)") {
    // hamming <= 3 GUARANTEES a matching band, so the R×S operator must
    // equal the exact cross-side hamming filter — not merely approximate it
    val rnd = new Random(43)
    val corp = corpus(43, 25, 10)
    val vocab = (0 until 200).map(i => s"w$i")
    val incoming = (0 until 12).map { i =>
      if (i % 3 == 0) {
        val (_, text) = corp(rnd.nextInt(corp.size))
        (8000L + i) -> text // identical cross-side copy: hamming 0
      } else if (i % 3 == 1) {
        val (_, text) = corp(rnd.nextInt(corp.size))
        val words = text.split(" ")
        words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.size))
        (8000L + i) -> words.distinct.mkString(" ")
      } else
        (8000L + i) -> Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")
    }
    val lDf = corp.toDF("id", "txt"); val rDf = incoming.toDF("id", "txt")
    for (fam <- Seq(Dedup.XxHash64Family, Dedup.Md5Family)) {
      def sigMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        Dedup.simHash64(ws.tokenize(df, "id", "txt"), fam)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lSigs = sigMap(lDf); val rSigs = sigMap(rDf)
      val exact = (for {
        (lid, ls) <- lSigs; (rid, rs) <- rSigs
        h = java.lang.Long.bitCount(ls ^ rs) if h <= 3
      } yield (lid, rid, h.toLong)).toSet
      assert(exact.nonEmpty, "incoming must contain engineered cross-side near-dups")
      val pairs = Dedup.simHashPairsRs(lDf, rDf, "id", "txt", ws, 3, family = fam)
      val got = pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
      assert(got === exact, s"$fam R×S != exact cross hamming")
      // first-matching-band: exactly-once even for all-band colliders
      val dupes = pairs.groupBy("lid", "rid").count().where($"count" > 1).collect()
      assert(dupes.isEmpty, s"$fam emitted duplicates: ${dupes.take(3).mkString}")
    }
  }

  test("incrementalKeepIds: corpus matches dropped, batch clusters collapsed, fresh kept") {
    val corpusDf = Seq(1L -> "a b c d e f g h").toDF("id", "txt")
    val incoming = Seq(
      10L -> "a b c d e f g h",   // dup of corpus 1 -> dropped
      11L -> "p q r s t u v w",   // dup family {11, 12} -> keep 11
      12L -> "p q r s t u v w",
      13L -> "m n o x y z k j").toDF("id", "txt") // fresh -> kept
    val keep = Dedup.incrementalKeepIds(corpusDf, incoming, "id", "txt", ws, 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(keep === Set(11L, 13L))
  }

  test("simhash indexed R×S == direct R×S (pairs AND hamming, both families)") {
    // same engineered mix as the pigeonhole-recall test: identical copies
    // (hamming 0, collide in ALL bands — the multiplicity worst case),
    // one-word edits, and fresh docs
    val rnd = new Random(47)
    val corp = corpus(47, 25, 10)
    val vocab = (0 until 200).map(i => s"w$i")
    val incoming = (0 until 12).map { i =>
      if (i % 3 == 0) {
        val (_, text) = corp(rnd.nextInt(corp.size))
        (8100L + i) -> text
      } else if (i % 3 == 1) {
        val (_, text) = corp(rnd.nextInt(corp.size))
        val words = text.split(" ")
        words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.size))
        (8100L + i) -> words.distinct.mkString(" ")
      } else
        (8100L + i) -> Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")
    }
    val lDf = corp.toDF("id", "txt"); val rDf = incoming.toDF("id", "txt")
    for (fam <- Seq(Dedup.XxHash64Family, Dedup.Md5Family)) {
      def asRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
      val direct = asRows(Dedup.simHashPairsRs(lDf, rDf, "id", "txt", ws, 3, family = fam))
      val indexed = asRows(Dedup.simHashPairsRsIndexed(
        Dedup.simHashIndex(lDf, "id", "txt", ws, family = fam),
        rDf, "id", "txt", ws, 3, family = fam))
      assert(direct.nonEmpty, s"$fam: corpus must contain engineered near-dups")
      // Seq equality (not Set): the lossless bucket encoding makes indexed
      // == direct INCLUDING emission multiplicity
      assert(indexed === direct, s"$fam indexed != direct")
    }
  }

  test("incrementalKeepIdsIndexed == incrementalKeepIds (both families)") {
    // chains + cross-side dups + fresh docs, large enough that the banded
    // stages do real work
    val corpusDf = corpus(53, 20, 8).toDF("id", "txt")
    val rnd = new Random(53)
    val vocab = (0 until 200).map(i => s"w$i")
    val base = corpus(53, 20, 8)
    val incoming = ((0 until 12).map { i =>
      if (i % 3 == 0) (9000L + i) -> base(rnd.nextInt(base.size))._2 // corpus dup
      else if (i % 3 == 1) {
        val (_, text) = base(rnd.nextInt(base.size))
        val words = text.split(" ")
        words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.size))
        (9000L + i) -> words.distinct.mkString(" ")
      } else (9000L + i) -> Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")
    } ++ Seq( // within-batch dup family -> cluster stage must collapse it
      9100L -> "p q r s t u v w x y",
      9101L -> "p q r s t u v w x y",
      9102L -> "p q r s t u v w x z")).toDF("id", "txt")
    for (fam <- Seq(Dedup.XxHash64Family, Dedup.Md5Family)) {
      val direct = Dedup.incrementalKeepIds(corpusDf, incoming, "id", "txt", ws,
          0.8, bands = 8, rowsPerBand = 4, family = fam)
        .collect().map(_.getLong(0)).toSet
      val indexed = Dedup.incrementalKeepIdsIndexed(
          Dedup.minHashIndex(corpusDf, "id", "txt", ws, bands = 8,
            rowsPerBand = 4, family = fam),
          incoming, "id", "txt", ws, 0.8, bands = 8, rowsPerBand = 4, family = fam)
        .collect().map(_.getLong(0)).toSet
      assert(direct.nonEmpty && direct.size < 15,
        s"$fam: fixture must drop some docs and keep some (kept $direct)")
      assert(indexed === direct, s"$fam indexed keep-set != direct")
    }
  }

  test("simhash keep-set: indexed == direct == naive composition (both families)") {
    val corpusDf = corpus(71, 20, 8).toDF("id", "txt")
    val rnd = new Random(71)
    val vocab = (0 until 200).map(i => s"w$i")
    val base = corpus(71, 20, 8)
    val incoming = ((0 until 12).map { i =>
      if (i % 3 == 0) (9000L + i) -> base(rnd.nextInt(base.size))._2 // corpus dup
      else if (i % 3 == 1) {
        val (_, text) = base(rnd.nextInt(base.size))
        val words = text.split(" ")
        words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.size))
        (9000L + i) -> words.distinct.mkString(" ")
      } else (9000L + i) -> Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).distinct.mkString(" ")
    } ++ Seq( // within-batch hamming-0 family -> cluster stage must collapse it
      9100L -> "p q r s t u v w x y",
      9101L -> "p q r s t u v w x y",
      9102L -> "p q r s t u v w x y")).toDF("id", "txt")
    for (fam <- Seq(Dedup.XxHash64Family, Dedup.Md5Family)) {
      // naive composition of the PUBLIC direct operators — an independent
      // code path from the shared index-frame join the operator uses
      val dropRids = Dedup.simHashPairsRs(corpusDf, incoming, "id", "txt", ws, 3,
        family = fam).select("rid").distinct()
      val survivors = incoming.join(dropRids,
        incoming("id") === dropRids("rid"), "left_anti")
      val selfPairs = Dedup.simHashPairs(survivors, "id", "txt", ws, 3, family = fam)
      val naive = Dedup.clusterKeepIds(survivors, "id", selfPairs, "lid", "rid")
        .collect().map(_.getLong(0)).toSet
      val direct = Dedup.incrementalKeepIdsSimHash(corpusDf, incoming, "id",
          "txt", ws, 3, family = fam)
        .collect().map(_.getLong(0)).toSet
      val indexed = Dedup.incrementalKeepIdsSimHashIndexed(
          Dedup.simHashIndex(corpusDf, "id", "txt", ws, family = fam),
          incoming, "id", "txt", ws, 3, family = fam)
        .collect().map(_.getLong(0)).toSet
      assert(naive.nonEmpty && naive.size < 15,
        s"$fam: fixture must drop some docs and keep some (kept $naive)")
      assert(naive.contains(9100L) && !naive.contains(9101L) && !naive.contains(9102L),
        s"$fam: within-batch hamming-0 family must collapse to min id (kept $naive)")
      assert(direct === naive, s"$fam direct keep-set != naive composition")
      assert(indexed === naive, s"$fam indexed keep-set != naive composition")
    }
  }
}
