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
}
