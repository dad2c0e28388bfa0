package graft

import graft.operators.FuzzyJoin

/** Edit-distance self-join: goldens + salt invariance + brute-force parity. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    1L -> "kitten",
    2L -> "sitten",   // dist 1 to kitten
    3L -> "sitting",  // dist 2 to sitten, 3 to kitten
    4L -> "kitten",   // dist 0 to kitten
    5L -> "mittens",  // dist 2 to kitten
    6L -> "zebra"
  ).toDF("id", "name")

  test("golden: maxDist=1 finds substitution and exact pairs only") {
    val out = FuzzyJoin.selfJoin(rows, "id", "name", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 2L, 1L), (1L, 4L, 0L), (2L, 4L, 1L)))
  }

  test("golden: maxDist=2 adds the insertion/deletion band") {
    val out = pairSet(FuzzyJoin.selfJoin(rows, "id", "name", 2).select("lid", "rid"))
    assert(out === Set(1L -> 2L, 1L -> 4L, 2L -> 4L, 2L -> 3L, 1L -> 5L, 4L -> 5L, 2L -> 5L))
  }

  test("hot-band salting is output-invariant") {
    val plain = FuzzyJoin.selfJoin(rows, "id", "name", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // hotBandRows = 0 marks EVERY band hot — forces the salted path
    val salted = FuzzyJoin.selfJoin(rows, "id", "name", 2,
        saltBuckets = 4, hotBandRows = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("parity with unblocked brute force on a random corpus") {
    val rnd = new scala.util.Random(7)
    val words = (0 until 80).map(i =>
      (i.toLong, rnd.alphanumeric.take(3 + rnd.nextInt(4)).mkString))
    val df = words.toDF("id", "name")
    val banded = FuzzyJoin.selfJoin(df, "id", "name", 2, hotBandRows = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: no length band, plain levenshtein over all pairs
    val brute = (for {
      (i, a) <- words; (j, b) <- words if i < j
      d = levenshteinRef(a, b) if d <= 2
    } yield (i, j, d.toLong)).toSet
    assert(banded === brute)
  }

  test("kernel: bounded levenshtein matches textbook DP across random strings and bounds") {
    val rnd = new scala.util.Random(13)
    def randStr(alpha: String, maxLen: Int): String =
      Seq.fill(rnd.nextInt(maxLen + 1))(alpha(rnd.nextInt(alpha.length))).mkString
    val cases = Seq.fill(2000)((randStr("abc", 8), randStr("abc", 8))) ++
      // long shared affixes (the fast path's target shape)
      Seq.fill(500)((s"Customer#0000${randStr("0123456789", 5)}",
                     s"Customer#0000${randStr("0123456789", 5)}")) ++
      Seq(("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
          ("ab", "ba"), ("abcdef", "fedcba"))
    for ((a, b) <- cases; bound <- 0 to 4) {
      val expect = { val d = levenshteinRef(a, b); if (d <= bound) d else -1 }
      val got = graft.expressions.FuzzyKernels.boundedLevenshtein(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b), bound)
      assert(got === expect, s"a=$a b=$b bound=$bound")
    }
  }

  test("kernel: non-ASCII inputs fall back to codepoint-correct distance") {
    import org.apache.spark.unsafe.types.UTF8String.fromString
    val k = graft.expressions.FuzzyKernels
    // é is one codepoint: distance counts chars, not bytes
    assert(k.boundedLevenshtein(fromString("café"), fromString("cafe"), 2) === 1)
    assert(k.boundedLevenshtein(fromString("über"), fromString("uber"), 1) === 1)
    assert(k.boundedLevenshtein(fromString("日本語"), fromString("日本"), 1) === 1)
    assert(k.boundedLevenshtein(fromString("日本語"), fromString("英語"), 1) === -1)
  }

  test("graft_levenshtein registers as a SQL function") {
    graft.Api.registerSqlFunctions(spark)
    rows.createOrReplaceTempView("fuzzy_rows")
    val out = spark.sql(
      """SELECT a.id AS lid, b.id AS rid, graft_levenshtein(a.name, b.name, 1) AS dist
         FROM fuzzy_rows a JOIN fuzzy_rows b ON a.id < b.id
         WHERE graft_levenshtein(a.name, b.name, 1) >= 0""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(out === Set((1L, 2L, 1L), (1L, 4L, 0L), (2L, 4L, 1L)))
  }

  /** Textbook DP Levenshtein, the spec's independent reference. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
