package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Golden + property tests for the curation operators. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate: flags exactly the docs sharing an n-gram with the eval set") {
    val train = Seq(
      1L -> "a b c d e f g h",     // contains eval 5-gram "b c d e f"
      2L -> "z y x w v u t s",     // disjoint
      3L -> "q b c d e f q q q"    // same 5-gram, shifted position
    ).toDF("id", "txt")
    val eval = Seq(10L -> "b c d e f").toDF("id", "txt")
    val out = Curation.decontaminate(train, eval, "id", "txt", n = 5, minShared = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 3L -> 1L))
  }

  test("decontaminate: minShared filters low-collision docs; grams are case-insensitive") {
    val train = Seq(
      1L -> "A B C D e f",  // shares grams "a b c" "b c d" "c d e" "d e f"
      2L -> "a b c x y z"   // shares only "a b c"
    ).toDF("id", "txt")
    val eval = Seq(10L -> "a b c d e f").toDF("id", "txt")
    val out = Curation.decontaminate(train, eval, "id", "txt", n = 3, minShared = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 4L))
  }

  test("decontaminate: docs shorter than n produce no grams") {
    val train = Seq(1L -> "a b").toDF("id", "txt")
    val eval = Seq(10L -> "a b").toDF("id", "txt")
    assert(Curation.decontaminate(train, eval, "id", "txt", n = 3).count() === 0)
  }

  test("piiScrub: masks email/phone/ip and counts on the original text") {
    val df = Seq(
      1L -> "mail a.b+c@ex-ample.org now",
      // "+01 …": the "1 555.987.6543" tail is the country-coded match; the
      // leading "+0" is not part of any NANP spelling and survives
      2L -> "call 555-123-4567 or +01 555.987.6543 x",
      3L -> "host 192.168.0.1 clean",
      4L -> "nothing here",
      5L -> "dial (555) 123-4567 or +1-555-987-6543 ok",
      // range-invalid octet and embedded-in-word quads must NOT mask
      6L -> "ver 1.2.3.999 tag v10.20.30.40b ip 255.255.255.255").toDF("id", "txt")
    val out = Curation.piiScrub(df, "id", "txt").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L)._1 === "mail <EMAIL> now" && out(1L)._2 === 1L)
    assert(out(2L)._1 === "call <PHONE> or +0<PHONE> x" && out(2L)._3 === 2L)
    assert(out(3L)._1 === "host <IP> clean" && out(3L)._4 === 1L)
    assert(out(4L) === (("nothing here", 0L, 0L, 0L)))
    assert(out(5L)._1 === "dial <PHONE> or <PHONE> ok" && out(5L)._3 === 2L)
    assert(out(6L)._1 === "ver 1.2.3.999 tag v10.20.30.40b ip <IP>" && out(6L)._4 === 1L)
  }

  test("repetitionStats: hand-computed ratios") {
    val df = Seq(
      1L -> "a a a b",      // 4 tokens, 2 distinct; 2-grams: [a a, a a, a b] top 2/3
      2L -> "x y z",        // no repetition: dup 0, top-2gram 1/2
      3L -> "w").toDF("id", "txt") // too short for 2-grams
    val out = Curation.repetitionStats(df, "id", "txt").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(2) === 1.0 - 2.0 / 4)
    assert(out(1L).getDouble(3) === 2.0 / 3)
    assert(out(2L).getDouble(2) === 0.0)
    assert(out(2L).getDouble(3) === 1.0 / 2)
    assert(out(3L).getDouble(2) === 0.0)
    assert(out(3L).isNullAt(3) && out(3L).isNullAt(4))
  }

  test("mixSources: kept set respects per-source weights and is deterministic") {
    val df = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val weights = Seq("src0" -> 0.0, "src1" -> 1.0, "src2" -> 0.5)
    val out = Curation.mixSources(df, "id", "src", weights, defaultWeight = 0.25)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src0"))                  // weight 0 drops all
    assert(bySrc("src1") === 250L)                   // weight 1 keeps all
    assert(bySrc("src2") > 75L && bySrc("src2") < 175L)   // ~125 of 250
    assert(bySrc("src3") > 25L && bySrc("src3") < 100L)   // default 0.25 → ~62
    // deterministic: the same call returns the identical set
    val again = Curation.mixSources(df, "id", "src", weights, defaultWeight = 0.25)
    assert(out.except(again).count() === 0 && again.except(out).count() === 0)
  }

  test("shuffleOrder: positions are a permutation and match the window-form rank") {
    val df = (0L until 500L).map(i => Tuple1(i)).toDF("id")
    val out = Curation.shuffleOrder(df, "id", seed = "s1")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 500)
    assert(rows.map(_._2).sorted.toSeq === (0L until 500L))
    // sequential oracle: rank by (md5("s1:" || id), id)
    val expected = df
      .withColumn("hk", md5(concat(lit("s1:"), col("id").cast("string"))))
      .orderBy("hk", "id").collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => (id, i.toLong) }.toMap
    assert(rows.toMap === expected)
    // a different seed produces a different permutation
    val other = Curation.shuffleOrder(df, "id", seed = "s2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(other !== rows.toMap)
  }

  test("lineDedup: global first occurrence wins, short lines exempt, hollow docs restored empty") {
    val df = Seq(
      1L -> "boiler plate\nunique one\n.",          // first occurrence of "boiler plate" and "."
      2L -> "unique two\nboiler plate",              // loses its "boiler plate" copy
      3L -> "boiler plate",                          // loses its only long line -> ""
      4L -> ".\n\nunique four",                      // "." and "" short -> exempt everywhere
      5L -> "unique one"                             // dup of doc 1's line elsewhere -> dropped
    ).toDF("id", "txt")
    val out = Curation.lineDedup(df, "id", "txt").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "boiler plate\nunique one\n.",
      2L -> "unique two",
      3L -> "",
      4L -> ".\n\nunique four",
      5L -> ""))
    // within-doc repeats collapse to the first position
    val rep = Curation.lineDedup(Seq(9L -> "dup line\nmid\ndup line").toDF("id", "txt"),
      "id", "txt").collect().map(r => r.getString(1))
    assert(rep.toSeq === Seq("dup line\nmid"))
  }

  test("lineDedup: differential vs sequential first-occurrence reference on random corpora") {
    val rnd = new scala.util.Random(99)
    // short lines ("", ".") mixed in to exercise the exemption path
    val vocab = (0 until 40).map(i => s"line $i content") ++ Seq("", ".")
    for (_ <- 0 until 3) {
      val docs = (0L until 60L).map { id =>
        val n = 1 + rnd.nextInt(5)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString("\n")
      }
      // sequential reference: scan docs in id order, lines in position order —
      // exactly the (id, pos) global-min rule
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.map { case (id, txt) =>
        id -> txt.split("\n", -1).filter { l =>
          if (l.length < 2) true
          else if (seen(l)) false
          else { seen += l; true }
        }.mkString("\n")
      }.toMap
      val out = Curation.lineDedup(docs.toDF("id", "txt"), "id", "txt")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out === expected)
    }
  }

  test("importanceSample: target-style docs upweighted, deterministic, keep rule = hash threshold") {
    // target slice (ids >= 100) and pool style-A docs share a vocabulary;
    // style-B docs use a disjoint one. DSIR semantics: style-A pool docs
    // must carry strictly higher importance than style-B (whose bigrams only
    // ever see the target model's smoothed floor).
    val sentences = Seq(
      "alpha beta gamma delta epsilon zeta alpha beta",
      "beta gamma delta epsilon zeta alpha gamma delta",
      "gamma delta alpha beta epsilon zeta beta gamma")
    val bDocs = (10L until 20L).map(i =>
      i -> s"omega psi chi phi upsilon tau omega psi chi phi")
    val aDocs = (0L until 10L).map(i => i -> sentences((i % 3).toInt))
    val tDocs = (100L until 120L).map(i => i -> sentences((i % 3).toInt))
    val df = (aDocs ++ bDocs ++ tDocs).toDF("id", "txt")
    // scale large enough that min(1, w*scale) = 1 for every doc -> the
    // output IS the full weight table
    val all = Curation.importanceSample(df, "id", "txt", col("id") >= 100L, 1e9)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(all.keySet === (aDocs ++ bDocs ++ tDocs).map(_._1).toSet)
    val wA = aDocs.map(d => all(d._1))
    val wB = bDocs.map(d => all(d._1))
    assert(wA.min > wB.max,
      s"style-A docs must outweigh style-B: minA=${wA.min} maxB=${wB.max}")
    // deterministic across plans/runs
    val again = Curation.importanceSample(df, "id", "txt", col("id") >= 100L, 1e9)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(again === all)
    // the keep rule at a real scale is exactly u(id) < min(1, w*scale) with
    // the md5-uniform (formula pinned here against hashUniform drifting)
    val scale = 1.0
    val u = (id: Long) => {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0d
    }
    val expected = all.collect {
      case (id, w) if u(id) < math.min(1.0, w * scale) => id
    }.toSet
    val kept = Curation.importanceSample(df, "id", "txt", col("id") >= 100L, scale)
      .collect().map(_.getLong(0)).toSet
    assert(kept === expected)
    assert(kept.nonEmpty && kept.size < all.size,
      s"scale=$scale should keep a strict non-empty subset, kept ${kept.size}/${all.size}")
  }

  test("substringDupStats: planted shared span found; self-repetition does not flag") {
    val df = Seq(
      1L -> "alpha beta gamma delta",       // grams: [alpha beta gamma, beta gamma delta]
      2L -> "x alpha beta gamma y",         // shares 'alpha beta gamma' with doc 1
      3L -> "p q r s",                      // unique grams
      4L -> "short",                        // < n tokens -> no grams, absent
      5L -> "a b c a b c a b c"             // repeats its OWN gram only
    ).toDF("id", "txt")
    val out = Curation.substringDupStats(df, "id", "txt", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 5L))
    assert(out(1L) === ((2L, 1L, 0.5d, true)))
    assert(out(2L) === ((3L, 1L, 1d / 3d, true)))
    assert(out(3L) === ((2L, 0L, 0d, false)))
    // doc 5: grams are distinct per doc; corpus df of each is 1 -> not dup
    assert(out(5L)._4 === false && out(5L)._2 === 0L)
  }

  test("keepTopFraction: exact floor(frac·N) cut, (score desc, id) order, ranks dense") {
    // ties straddling the cut are the hard case: four docs share score 0.5
    // and only id order decides which side of the floor(0.6·10)=6 cut each
    // lands on
    val rows = Seq(
      (1L, 0.9), (2L, 0.5), (3L, 0.5), (4L, 0.5), (5L, 0.5),
      (6L, 0.1), (7L, 0.8), (8L, 0.2), (9L, 0.7), (10L, 0.3))
    val out = Curation.keepTopFraction(rows.toDF("id", "q"), "id", "q", 0.6)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val expected = rows.sortBy { case (id, s) => (-s, id) }.take(6)
      .zipWithIndex.map { case ((id, s), i) => (id, s, i.toLong) }.toSet
    assert(out === expected)
    assert(out.map(_._1) === Set(1L, 7L, 9L, 2L, 3L, 4L)) // id 5 loses the tie
    // frac edges: 0 keeps nothing, 1 keeps everything with a full rank range
    assert(Curation.keepTopFraction(rows.toDF("id", "q"), "id", "q", 0.0).count() === 0L)
    val all = Curation.keepTopFraction(rows.toDF("id", "q"), "id", "q", 1.0)
      .collect().map(_.getLong(2)).sorted
    assert(all === (0L until 10L).toArray)
    Api.clearCache()
  }

  test("keepTopFraction: differential vs the window form on a random corpus") {
    val rnd = new scala.util.Random(11)
    // few distinct scores over many rows -> massive tie groups across
    // partition boundaries, the regime where a rank bug would show
    val rows = (0L until 500L).map(i => (i, (rnd.nextInt(5) * 0.25)))
    val df = rows.toDF("id", "q")
    val out = Curation.keepTopFraction(df, "id", "q", 0.37)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val expected = rows.sortBy { case (id, s) => (-s, id) }
      .take(math.floor(0.37 * 500).toInt)
      .zipWithIndex.map { case ((id, _), i) => (id, i.toLong) }.toMap
    assert(out === expected)
    Api.clearCache()
  }

  test("capPerSource: at most cap per source, deterministic hash order, seed redraws") {
    val df = ((0L until 40L).map(i => (i, "web")) ++
      (100L until 103L).map(i => (i, "books"))).toDF("id", "src")
    val out = Curation.capPerSource(df, "id", "src", 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.count(_._2 == "web") === 10)  // capped
    assert(out.count(_._2 == "books") === 3) // under cap: all kept
    // deterministic: the kept web subset is exactly the 10 smallest md5 keys
    val expectedWeb = (0L until 40L)
      .sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(s"cap:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .take(10).toSet
    assert(out.filter(_._2 == "web").map(_._1).toSet === expectedWeb)
    // a different seed redraws the sample
    val redraw = Curation.capPerSource(df, "id", "src", 10, seed = "other")
      .collect().filter(_.getString(1) == "web").map(_.getLong(0)).toSet
    assert(redraw !== expectedWeb)
  }

  test("corpusReport: leaf, per-source, and grand-total levels from one rollup pass") {
    val df = Seq(
      ("web", "en", 100L), ("web", "en", 300L), ("web", "de", 50L),
      ("books", "en", 1000L)).toDF("source", "lang", "n_chars")
    val out = Curation.corpusReport(df, "source", "lang", "n_chars")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out === Map(
      ("web", "en", 0L) -> ((2L, 400L, 200.0)),
      ("web", "de", 0L) -> ((1L, 50L, 50.0)),
      ("books", "en", 0L) -> ((1L, 1000L, 1000.0)),
      ("web", "ALL", 1L) -> ((3L, 450L, 150.0)),
      ("books", "ALL", 1L) -> ((1L, 1000L, 1000.0)),
      ("ALL", "ALL", 3L) -> ((4L, 1450L, 362.5))))
  }

  test("stripHtml: blocks, comments, tags, entity order, unclosed-block degradation") {
    val docs = Seq(
      (1L, "<p  class=\"a\">Hello <b>world</b></p><script type=x>var a\n=1;</script>done"),
      (2L, "<style>p{color:red}</style>A &amp;lt; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"),
      (3L, "<!-- hidden\ntext -->visible"),
      (4L, "<script>never closed so body stays as text"),
      (5L, "")).toDF("id", "text")
    val out = Curation.stripHtml(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "Hello world done")
    // &amp;lt; decodes ONCE: -> &lt; (amp decoded last, no double decode)
    assert(out(2L) === "A &lt; B <tag> \"q\" 's' end")
    assert(out(3L) === "visible")
    assert(out(4L) === "never closed so body stays as text")
    assert(out(5L) === "")
  }

  test("normalizeText: NFC composition, control strip, whitespace collapse") {
    val decomposed = "cafe\u0301" // e + combining acute -> composed e-acute under NFC
    val docs = Seq(
      (1L, decomposed),
      (2L, "a\u0001b\u0007c"), // C0 controls stripped entirely
      (3L, "  x\t\ty \n z  "),
      (4L, "caf\u00e9")).toDF("id", "text") // already composed: unchanged
    val out = Curation.normalizeText(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "caf\u00e9" && out(1L).length === 4)
    assert(out(2L) === "abc")
    assert(out(3L) === "x y z")
    assert(out(4L) === "caf\u00e9")
  }

  test("repetitionStats: adversarial document length capped at the maxChars prefix") {
    val long = ("spam " * 10000).trim // ~50k chars of pure repetition
    val df = Seq((1L, long)).toDF("id", "text")
    // 20-char prefix = "spam spam spam spam " -> 4 tokens, dup ratio 1 - 1/4
    val capped = Curation.repetitionStats(df, "id", "text", maxChars = 20).collect().head
    assert(capped.getLong(1) === 4L)
    assert(capped.getDouble(2) === 0.75)
    // maxChars <= 0 scans the full document
    val full = Curation.repetitionStats(df, "id", "text", maxChars = 0).collect().head
    assert(full.getLong(1) === 10000L)
    // the default cap leaves ordinary documents untouched
    val doc = Seq((1L, "a a b c d a")).toDF("id", "text")
    val d = Curation.repetitionStats(doc, "id", "text").collect().head
    assert(d.getLong(1) === 6L && d.getDouble(2) === 1.0 - 4.0 / 6.0)
  }

  /** Plain-Scala reference of Curation.substringDedup's semantics: rank every
    * gram occurrence by (id, pos); non-first occurrences of any gram with
    * corpus count >= 2 mark their n token positions; rebuild from unmarked. */
  private def refSubstringDedup(docs: Seq[(Long, String)], n: Int): Map[Long, String] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("[\t\n\r ]").filter(_.nonEmpty).toVector }.toMap
    val occ = for {
      (id, tk) <- toks.toSeq
      p <- 0 to tk.length - n
    } yield (tk.slice(p, p + n).map(_.toLowerCase).mkString(" "), id, p)
    val marked = scala.collection.mutable.Set.empty[(Long, Int)]
    occ.groupBy(_._1).valuesIterator.foreach { os =>
      if (os.size >= 2)
        os.sortBy(o => (o._2, o._3)).drop(1)
          .foreach { case (_, id, p) => (0 until n).foreach(k => marked += ((id, p + k))) }
    }
    docs.map { case (id, _) =>
      id -> toks(id).zipWithIndex
        .collect { case (t, i) if !marked((id, i)) => t }.mkString(" ")
    }.toMap
  }

  test("substringDedup: shared span excised from the later doc, first copy kept") {
    val docs = Seq(
      (1L, "alpha beta gamma delta unique one"),
      (2L, "other words alpha beta gamma delta tail"),  // shares the 4-gram span
      (3L, "rep rep rep rep rep"),                      // within-doc repeats
      (4L, "tiny"))                                     // shorter than n
    val out = Curation.substringDedup(docs.toDF("id", "text"), "id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === refSubstringDedup(docs, 4))
    // doc 1 untouched (it holds the global first occurrences)
    assert(out(1L) === "alpha beta gamma delta unique one")
    // doc 2 lost exactly the shared span's tokens
    assert(out(2L) === "other words tail")
    // within-doc: "rep rep rep rep" occurs at pos 0 and 1 -> pos-1 occurrence
    // marks tokens 1..4, keeping only token 0
    assert(out(3L) === "rep")
    assert(out(4L) === "tiny")
  }

  test("substringDedup: differential vs the plain-Scala reference on a random corpus") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "E") // tiny vocab -> heavy overlap
    val docs = (1L to 40L).map { id =>
      id -> (1 to (rnd.nextInt(25))).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val out = Curation.substringDedup(docs.toDF("id", "text"), "id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === refSubstringDedup(docs, 3))
    Api.clearCache()
  }
}
