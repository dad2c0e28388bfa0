package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import scala.util.Random

/** The native codegen'd CosineSim expression must be BIT-IDENTICAL to the
  * interpreted higher-order-function fold it replaces — same IEEE operation
  * sequence, only compiled. */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine == HOF cosine bit-for-bit on random float vectors") {
    val rnd = new Random(42)
    val rows = (0 until 500).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextFloat() * 2f - 1f),
        Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
        Similarity.cosine(col("a"), col("b")).as("native"),
        Similarity.cosineHof(col("a"), col("b")).as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native l2sq == HOF l2sq bit-for-bit on random float vectors") {
    val rnd = new Random(17)
    val rows = (0 until 500).map { i =>
      (i.toLong,
        Array.fill(32)(rnd.nextFloat() * 2f - 1f),
        Array.fill(32)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
        Similarity.l2sq(col("a"), col("b")).as("native"),
        Similarity.l2sqHof(col("a"), col("b")).as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // identical vectors: exactly zero; hand case
    val z = Seq((Array(1.5f, -2f), Array(1.5f, -2f)),
                (Array(1f, 2f), Array(0f, 4f))).toDF("a", "b")
      .select(Similarity.l2sq(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(z(0) === 0.0 && z(1) === 5.0)
  }

  test("native cosine matches a driver-side double computation") {
    val a = Array(0.5f, -1.25f, 3.0f)
    val b = Array(2.0f, 0.25f, -0.5f)
    var dot = 0d; var na = 0d; var nb = 0d
    for (i <- 0 until 3) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    val expected = dot / (math.sqrt(na) * math.sqrt(nb))
    val got = Seq((a, b)).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(got) ===
      java.lang.Double.doubleToLongBits(expected))
  }

  test("native hyperplane signature == HOF lshBucket bit-for-bit") {
    val rnd = new Random(7)
    val rows = (0 until 300).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    val df = rows.toDF("id", "v")
    val out = df.select(
        Similarity.lshBucket(col("v"), 64, 12).as("native"),
        Similarity.lshBucketHof(col("v"), 64, 12).as("hof"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_cosine is callable from SQL after Api.registerSqlFunctions") {
    Api.registerSqlFunctions(spark)
    val rnd = new Random(3)
    Seq((Array.fill(16)(rnd.nextFloat()), Array.fill(16)(rnd.nextFloat())))
      .toDF("a", "b").createOrReplaceTempView("cos_sql_t")
    val viaSql = spark.sql("SELECT graft_cosine(a, b) AS s FROM cos_sql_t").head().getDouble(0)
    val viaCol = spark.table("cos_sql_t")
      .select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(viaSql) ===
      java.lang.Double.doubleToLongBits(viaCol))
  }

  test("null array element nulls the whole result — HOF parity (r10 advice)") {
    // containsNull=true schema; row 0 has a null slot, row 1 is clean
    val df = Seq(
      (Seq(Option(1.0f), None, Option(2.0f)), Seq(Option(1.0f), Option(1.0f), Option(1.0f))),
      (Seq(Option(1.0f), Option(0.5f), Option(2.0f)), Seq(Option(1.0f), Option(1.0f), Option(1.0f))))
      .toDF("a", "b")
    val out = df.select(
      Similarity.cosine(col("a"), col("b")).as("cos_native"),
      Similarity.cosineHof(col("a"), col("b")).as("cos_hof"),
      Similarity.l2sq(col("a"), col("b")).as("l2_native"),
      Similarity.l2sqHof(col("a"), col("b")).as("l2_hof")).collect()
    // null slot: all four forms agree on NULL
    assert((0 until 4).forall(out(0).isNullAt), s"expected all-null row, got ${out(0)}")
    // clean row: native == HOF bit-for-bit, nothing nulled
    assert((0 until 4).forall(i => !out(1).isNullAt(i)))
    assert(java.lang.Double.doubleToLongBits(out(1).getDouble(0)) ===
      java.lang.Double.doubleToLongBits(out(1).getDouble(1)))
    assert(java.lang.Double.doubleToLongBits(out(1).getDouble(2)) ===
      java.lang.Double.doubleToLongBits(out(1).getDouble(3)))
  }

  test("identical vectors have cosine 1.0; orthogonal have 0.0") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f), Array(0f, 1f))).toDF("a", "b")
    val sims = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(sims(1) === 0.0)
  }
}
