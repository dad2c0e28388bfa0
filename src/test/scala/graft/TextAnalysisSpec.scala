package graft

import graft.operators._

/** Golden tests for text-analysis operators. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats: counts and ratios on a hand-computed doc") {
    // text: "The cat, the CAT!" -> bag [The, cat,, the, CAT!] (4 tokens)
    val df = Seq(1L -> "The cat, the CAT!").toDF("id", "txt")
    val r = TextAnalysis.stats(df, "id", "txt").head()
    assert(r.getLong(1) === 17L)                   // n_chars
    assert(r.getLong(2) === 4L)                    // n_tokens
    assert(r.getLong(3) === 3L)                    // distinct lowered: the, cat,, cat!
    assert(r.getDouble(4) === (3 + 4 + 3 + 4) / 4.0) // avg_token_len
    assert(r.getDouble(5) === 2.0 / 17)            // punct: ',' '!'
    assert(r.getDouble(6) === 2.0 / 4)             // stopwords: The, the
  }

  test("stats: empty string gives zero counts and NULL ratios") {
    val r = TextAnalysis.stats(Seq(1L -> "").toDF("id", "txt"), "id", "txt").head()
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }

  test("languageId: stopword voting with tie-break order") {
    val df = Seq(
      1L -> "the cat is in the house and it sleeps",
      2L -> "el gato es de la casa y los perros",
      3L -> "xyzzy qwerty asdf",
      4L -> "le chat est les la de").toDF("id", "txt")
    val out = TextAnalysis.languageId(df, "id", "txt")
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
    assert(out(3L) === "und")
    assert(out(4L) === "fr")
  }

  test("languageId tie-break: 'la de en' hits es and fr equally -> es wins") {
    val out = TextAnalysis.languageId(Seq(1L -> "la de").toDF("id", "txt"), "id", "txt").head()
    assert(out.getString(5) === "es")
  }

  test("tokenCounts: ws vs BPE-ish segmentation") {
    val r = TextAnalysis.tokenCounts(
      Seq(1L -> "hello world42 x!y").toDF("id", "txt"), "id", "txt").head()
    assert(r.getLong(1) === 3L)  // ws tokens
    assert(r.getLong(2) === 6L)  // hello | world | 42 | x | ! | y
  }

  test("fingerprint: whitespace/case-insensitive equality") {
    val df = Seq(
      1L -> "Hello   World",
      2L -> "hello world",
      3L -> " hello\tworld ",
      4L -> "hello worlds").toDF("id", "txt")
    val fps = TextAnalysis.fingerprint(df, "id", "txt")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(2L) === fps(3L))
    assert(fps(1L) !== fps(4L))
  }

  test("winnowing: shared long substrings share fingerprints; short/empty texts safe") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      1L -> s"PREFIX ONE $shared SUFFIX ALPHA",
      2L -> s"other beginning $shared different ending",
      3L -> "completely unrelated words with zero overlap at all",
      4L -> "tiny",   // shorter than k -> no fingerprints
      5L -> "").toDF("id", "txt")
    val fps = TextAnalysis.winnowingFingerprints(df, "id", "txt", k = 8, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byId = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // guarantee: shared substring of length >= k+w-1 = 11 -> shared fingerprint
    assert((byId(1L) & byId(2L)).nonEmpty)
    assert((byId(1L) & byId.getOrElse(3L, Set.empty)).isEmpty ||
      (byId(1L) & byId(3L)).size < byId(1L).size / 2)
    assert(!byId.contains(4L) && !byId.contains(5L))
    // deterministic across invocations
    val again = TextAnalysis.winnowingFingerprints(df, "id", "txt", 8, 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(again === fps.toSet)
  }

  test("winnowing overlap pairs: planted shared passage found, boilerplate dropped") {
    val passage = "for while the quick brown fox jumps over the lazy sleeping dog again"
    val boiler = "standard corporate footer text"
    val df = Seq(
      1L -> s"document one begins here $passage and then diverges $boiler",
      2L -> s"a second document $passage with its own unrelated tail $boiler",
      3L -> s"totally disjoint content nothing in common whatsoever $boiler",
      4L -> s"yet another unrelated piece of writing entirely $boiler").toDF("id", "txt")
    val pairs = TextAnalysis.winnowingOverlapPairs(df, "id", "txt",
        k = 8, w = 4, minShared = 3, maxDocFreq = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // the planted ~70-char passage guarantees many shared fingerprints for (1,2)
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 3L)
    // dropping fingerprints present in >2 docs removes the boilerplate-only links
    val strict = TextAnalysis.winnowingOverlapPairs(df, "id", "txt",
        k = 8, w = 4, minShared = 1, maxDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict.contains((1L, 2L)))
    assert(!strict.contains((3L, 4L)), "boilerplate-only pair must be dropped by maxDocFreq")
  }

  test("bm25: rare-term documents outrank common-term documents, k respected") {
    // "common" has df=4 (low idf), "zebra" df=2 (high idf) — the rare-term
    // doc must outrank the common-term doc despite a lower term frequency
    val df = Seq(
      1L -> "zebra zebra zebra words more words here",      // rare term, high tf
      2L -> "zebra appears once in this longer document with many filler words",
      3L -> "common common common common common common",    // common term only
      4L -> "common words without the rare one",
      5L -> "some common filler text here",
      6L -> "another doc with common words inside",
      7L -> "totally unrelated content").toDF("id", "txt")
    val top = TextAnalysis.bm25TopK(df, "id", "txt", "zebra common", k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.length === 3)
    // scores descending
    assert(top.sliding(2).forall { case Array(a, b2) => a._2 >= b2._2; case _ => true })
    // doc 1 (3x rare term, short) must be the top hit
    assert(top.head._1 === 1L)
    // doc 7 (no query terms) never appears
    assert(!top.map(_._1).contains(7L))
    // rational-idf variant preserves the same top document here
    val rational = TextAnalysis.bm25TopK(df, "id", "txt", "zebra common", k = 3, lnIdf = false)
      .collect().map(_.getLong(0))
    assert(rational.head === 1L)
  }

  test("qualityScore: clean prose scores above degenerate text, all scores in (0, 1]") {
    val clean = "the quick brown fox jumps over the lazy dog and it runs far away"
    val short = "hi"
    val noisy = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    val df = Seq(1L -> clean, 2L -> short, 3L -> noisy).toDF("id", "txt")
    val scores = TextAnalysis.qualityScore(df, "id", "txt")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.values.forall(s => s > 0d && s <= 1d))
    assert(scores(1L) > scores(2L))
    assert(scores(1L) > scores(3L))
  }

  test("bigramLmScore: hand-computed add-1 model on a 3-doc corpus") {
    // scored docs: d1 [a b a b], d2 [a b c]; d3 [c] has no bigram -> dropped
    // model (k=1, V=3): c(a,b)=3 c(b,a)=1 c(b,c)=1; ctx a=3 b=2
    //   p(b|a) = (3+1)/(3+3)   p(a|b) = (1+1)/(2+3)   p(c|b) = (1+1)/(2+3)
    val df = Seq(1L -> "a B a b", 2L -> "a b c", 3L -> "c").toDF("id", "txt")
    val out = TextAnalysis.bigramLmScore(df, "id", "txt")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(1L, 2L))
    val pAB = (3d + 1d) / (3d + 1d * 3d)
    val pBA = (1d + 1d) / (2d + 1d * 3d)
    val pBC = (1d + 1d) / (2d + 1d * 3d)
    // document-order sequential folds, exact double equality
    assert(out(1L)._1 === 3L && out(1L)._2 === ((pAB + pBA) + pAB))
    assert(out(2L)._1 === 2L && out(2L)._2 === (pAB + pBC))
    assert(out(1L)._3 ===
      ((math.log(pAB) + math.log(pBA)) + math.log(pAB)) / 3d)
    assert(out(2L)._3 === (math.log(pAB) + math.log(pBC)) / 2d)
  }

  test("bigramLmScore: corpus-typical text outranks shuffled-gibberish text") {
    // 20 near-identical fluent docs train the model; one doc with the same
    // vocabulary in a never-seen order must score lower per bigram
    val fluent = (1L to 20L).map(i => i -> s"the cat sat on the mat $i")
    val gibberish = Seq(99L -> "mat the on cat the sat")
    val df = (fluent ++ gibberish).toDF("id", "txt")
    val ll = TextAnalysis.bigramLmScore(df, "id", "txt")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ll(99L) < ll(1L))
  }
}
