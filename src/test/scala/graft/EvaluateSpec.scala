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

  test("thresholdSweep: one row per threshold, reference count semantics, sane metrics") {
    // whitespace GT at 0.5 vs whitespace sweep: at t=0.5 the sweep IS the GT
    // (fp=fn=0, f1=1); stricter thresholds only drop sweep pairs (fp=0),
    // looser only add them (fn=0). NOTE the reference's literal tp counts
    // every confusion-row with a non-null SJ side — fp rows INCLUDED
    // (similarity_join/__init__.py:25-36, replicated by countsNormalized) —
    // so the invariant is |GT| = tp - fp + fn, not tp + fn.
    val words = Vector("ant", "bee", "cat", "dog", "elk", "fox")
    val rnd = new scala.util.Random(11)
    val df = (1L to 40L).map(i =>
      i -> Seq.fill(3 + rnd.nextInt(3))(words(rnd.nextInt(words.size))).mkString(" "))
      .toDF("id", "val")
    val ws = WhitespaceTokenizer()
    val out = Evaluate.thresholdSweep(df, "id", "val", ws, 0.5, ws,
      Seq(0.8, 0.5, 0.3)).collect().map(r =>
        (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(6)))
    assert(out.map(_._1).toSeq === Seq(0.8, 0.5, 0.3))
    val gtSize = out.map { case (_, tp, fp, fn, _) => tp - fp + fn }.distinct
    assert(gtSize.size === 1, s"tp - fp + fn must be |GT| in every row: $out")
    val at05 = out.find(_._1 == 0.5).get
    assert(at05._3 === 0L && at05._4 === 0L && at05._5 === 1.0d)
    val at08 = out.find(_._1 == 0.8).get // stricter: only drops pairs
    assert(at08._3 === 0L && at08._4 > 0L)
    val at03 = out.find(_._1 == 0.3).get // looser: only adds pairs
    assert(at03._4 === 0L && at03._3 > 0L)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
