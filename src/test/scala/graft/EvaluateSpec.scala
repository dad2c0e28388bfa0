package graft

import graft.operators._

/** Unit tests for the evaluation operator on a hand-built ground truth
  * (reference: py_duckdb/similarity_join/__init__.py:6-62).
  *
  * The reference's `tp` literally counts all confusion-matrix rows with non-null
  * SJ keys — including the fp rows (__init__.py:25-36). The expectations below
  * encode that faithful quirk: tp = matched + fp.
  */
class EvaluateSpec extends SparkSpec {
  import spark.implicits._

  // GT pairs {1-2, 3-4, 5-6}; SJ found {2-1 (flipped), 3-4, 7-8}
  // matched = 2, sj-only = 1, gt-only = 1 -> reference counts tp=3, fp=1, fn=1
  private lazy val gt = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("l_id", "r_id")
  private lazy val sj = Seq((2L, 1L), (3L, 4L), (7L, 8L)).toDF("l_id", "r_id")

  test("counts: symmetric pair equality, orientation-insensitive") {
    val row = Evaluate.counts(gt, sj).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === (3L, 1L, 1L))
  }

  test("countsNormalized matches the nested-loop parity variant") {
    val row = Evaluate.countsNormalized(gt, sj).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === (3L, 1L, 1L))
  }

  test("evaluate: precision/recall/F1 arithmetic over reference counts") {
    val m = Evaluate.evaluate(gt, sj)
    assert(m.tp === 3L && m.fp === 1L && m.fn === 1L)
    assert(m.pr === 3d / 4 && m.rc === 3d / 4)
    assert(math.abs(m.fm - 3d / 4) < 1e-15)
  }

  test("evaluate: empty SJ yields zero tp and zeroed metrics") {
    val empty = Seq.empty[(Long, Long)].toDF("l_id", "r_id")
    val m = Evaluate.evaluate(gt, empty)
    assert(m === EvalMetrics(0L, 0L, 3L, 0d, 0d, 0d))
  }

  test("symmetricDiff is empty iff pair sets agree modulo orientation") {
    assert(Evaluate.symmetricDiff(gt, gt, "l_id", "r_id", "l_id", "r_id").count() === 0L)
    val flipped = gt.select(col("r_id").as("l_id"), col("l_id").as("r_id"))
    assert(Evaluate.symmetricDiff(gt, flipped, "l_id", "r_id", "l_id", "r_id").count() === 0L)
    assert(Evaluate.symmetricDiff(gt, sj, "l_id", "r_id", "l_id", "r_id").count() === 2L)
  }

  test("symmetricDiffNormalized counts the same disagreements as symmetricDiff") {
    val flipped = gt.select(col("r_id").as("l_id"), col("l_id").as("r_id"))
    for ((a, b) <- Seq((gt, gt), (gt, flipped), (gt, sj), (sj, gt))) {
      assert(
        Evaluate.symmetricDiffNormalized(a, b, "l_id", "r_id", "l_id", "r_id").count() ===
        Evaluate.symmetricDiff(a, b, "l_id", "r_id", "l_id", "r_id").count())
    }
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
