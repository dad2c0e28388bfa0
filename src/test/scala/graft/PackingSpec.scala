package graft

import graft.operators.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("golden: sequential fill, straddlers keep their start offset") {
    val df = Seq((1L, 3L), (2L, 4L), (3L, 5L), (4L, 1L), (5L, 9L))
      .toDF("id", "n")
    val out = Packing.packBins(df, "id", col("n"), 10L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // prefix sums before each doc: 0, 3, 7, 12, 13
    assert(out === Map(
      1L -> (3L, 0L, 0L),
      2L -> (4L, 0L, 3L),
      3L -> (5L, 0L, 7L), // straddles the 10-token boundary: starts in bin 0 at 7
      4L -> (1L, 1L, 2L),
      5L -> (9L, 1L, 3L)))
  }

  test("chunkDocs: window math, coverage, overlap carry, no redundant trailing window") {
    val docs = Seq(
      1L -> "a b c d e f g h i j",      // 10 tokens
      2L -> "x y z",                    // 3 -> single short window
      3L -> "   ",                      // no tokens -> emits nothing
      4L -> "p q r s t u v w").toDF("id", "txt") // exactly 8 -> ONE window, no redundant second
    val out = Packing.chunkDocs(docs, "id", "txt", maxTokens = 8, overlap = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getString(3)))).toMap
    assert(out === Map(
      // stride 6: windows [1..8], [7..10]
      (1L, 0L) -> ((8L, "a b c d e f g h")),
      (1L, 1L) -> ((4L, "g h i j")),     // 2-token overlap carried (g h)
      (2L, 0L) -> ((3L, "x y z")),
      (4L, 0L) -> ((8L, "p q r s t u v w"))))
    // every token of doc 1 is covered, in order, exactly stride apart
    val n14 = Packing.chunkDocs(Seq(9L -> (1 to 15).map(i => s"t$i").mkString(" "))
        .toDF("id", "txt"), "id", "txt", 8, 2)
      .collect().map(r => (r.getLong(1), r.getString(3))).sortBy(_._1)
    assert(n14.map(_._1) === Array(0L, 1L, 2L)) // 1 + ceil(7/6) = 3 windows
    assert(n14.last._2 === "t13 t14 t15")       // last window short, reaches the end
  }

  test("distributed two-pass scan equals the sequential window form") {
    val rnd = new scala.util.Random(29)
    // ids deliberately unordered and sparse; counts include zeros
    val rows = rnd.shuffle((0 until 5000).map(i => (i * 7L + 13, rnd.nextInt(40).toLong)))
    val df = rows.toDF("id", "n").repartition(17)
    val dist = Packing.packBins(df, "id", col("n"), 256L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq = df.withColumn("cum", sum("n").over(w))
      .select(col("id"), col("n"),
        ((col("cum") - col("n")) / 256L).cast("long").as("bin_id"),
        ((col("cum") - col("n")) % 256L).as("bin_offset"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(dist === seq)
  }

  test("packedSequences: bins emit member docs in key order; straddler stays in its start bin") {
    // token counts 3,4,5,2,6 at budget 8: prefix sums 0,3,7,12,14 ->
    // bins 0,0,0,1,1 (doc 3 straddles 8 at offset 7 but STARTS in bin 0)
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i j k l"),
      (4L, "m n"), (5L, "o p q r s t")).toDF("id", "txt")
    val nTok = size(filter(split(col("txt"), "[\t\n\r ]"), x => trim(x) =!= "")).cast("long")
    val out = Packing.packedSequences(docs, "id", "txt", nTok, 8L, sep = "|")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out === Map(
      0L -> ((3L, 12L, "a b c|d e f g|h i j k l")),
      1L -> ((2L, 8L, "m n|o p q r s t"))))
    // coverage invariant: splicing all bins in bin order reproduces the
    // corpus in key order — no doc lost, duplicated, or reordered
    val spliced = out.toSeq.sortBy(_._1).map(_._2._3).mkString("|")
    assert(spliced === "a b c|d e f g|h i j k l|m n|o p q r s t")
  }
}
