package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Precision/recall/F-measure of a similarity-join result against a ground-truth
  * pair table (reference: py_duckdb/similarity_join/__init__.py:6-62). */
final case class EvalMetrics(tp: Long, fp: Long, fn: Long, pr: Double, rc: Double, fm: Double)

object Evaluate {

  /**
   * E1 confusion matrix: GT full-outer-join result on *symmetric pair equality* —
   * a pair matches regardless of orientation
   * (reference similarity_join/__init__.py:15-23).
   *
   * ⚠ The OR-of-ANDs condition has no equi conjunct, so Spark plans a broadcast
   * nested-loop join — faithful to the reference and fine for test-sized pair
   * tables. At scale use [[countsNormalized]], which joins on a canonical
   * `(least, greatest)` pair key and hash-partitions.
   */
  def confusionMatrix(
      gt: DataFrame, sj: DataFrame,
      gtLKey: String = "l_id", gtRKey: String = "r_id",
      sjLKey: String = "l_id", sjRKey: String = "r_id"): DataFrame = {
    val g = gt.select(col(gtLKey).as("gtk1"), col(gtRKey).as("gtk2"))
    val s = sj.select(col(sjLKey).as("sjk1"), col(sjRKey).as("sjk2"))
    g.join(s,
      (col("gtk1") === col("sjk1") && col("gtk2") === col("sjk2")) ||
      (col("gtk1") === col("sjk2") && col("gtk2") === col("sjk1")),
      "full_outer")
  }

  /** tp/fp/fn in ONE pass over the confusion matrix (the reference runs three
    * separate count(*) scans, similarity_join/__init__.py:25-42).
    *
    * ⚠ Faithful quirk: the reference's `tp` counts every row whose SJ keys are
    * non-null — which includes the unmatched-SJ (fp) rows, since those also carry
    * non-null SJ keys in the full outer join. Replicated literally. */
  def counts(
      gt: DataFrame, sj: DataFrame,
      gtLKey: String = "l_id", gtRKey: String = "r_id",
      sjLKey: String = "l_id", sjRKey: String = "r_id"): DataFrame =
    confusionMatrix(gt, sj, gtLKey, gtRKey, sjLKey, sjRKey).agg(
      coalesce(sum(when(col("sjk1").isNotNull && col("sjk2").isNotNull, 1L)), lit(0L)).as("tp"),
      coalesce(sum(when(col("gtk1").isNull, 1L)), lit(0L)).as("fp"),
      coalesce(sum(when(col("sjk1").isNull, 1L)), lit(0L)).as("fn"))

  /**
   * Scale path: identical tp/fp/fn via an equi-join on the orientation-normalized
   * pair key `(least(l,r), greatest(l,r))`. Hash-partitionable — at 100 TB this is
   * a plain shuffled join instead of a nested loop. Requires each side to hold
   * distinct unordered pairs (true for the reference's joins, whose outputs carry
   * at most one orientation of a pair).
   *
   * Note: faithfully reproduces the reference's literal counting, where `tp` is
   * the number of confusion-matrix rows whose SJ keys are non-null — which
   * includes the fp rows (similarity_join/__init__.py:25-36).
   */
  def countsNormalized(
      gt: DataFrame, sj: DataFrame,
      gtLKey: String = "l_id", gtRKey: String = "r_id",
      sjLKey: String = "l_id", sjRKey: String = "r_id"): DataFrame = {
    val g = gt.select(
      least(col(gtLKey), col(gtRKey)).as("k1"),
      greatest(col(gtLKey), col(gtRKey)).as("k2"),
      lit(1).as("g"))
    val s = sj.select(
      least(col(sjLKey), col(sjRKey)).as("k1"),
      greatest(col(sjLKey), col(sjRKey)).as("k2"),
      lit(1).as("s"))
    g.join(s, Seq("k1", "k2"), "full_outer").agg(
      coalesce(sum(when(col("s").isNotNull, 1L)), lit(0L)).as("tp"),
      coalesce(sum(when(col("g").isNull, 1L)), lit(0L)).as("fp"),
      coalesce(sum(when(col("s").isNull, 1L)), lit(0L)).as("fn"))
  }

  /** Full metrics dict equivalent (reference similarity_join/__init__.py:46-62). */
  def evaluate(
      gt: DataFrame, sj: DataFrame,
      gtLKey: String = "l_id", gtRKey: String = "r_id",
      sjLKey: String = "l_id", sjRKey: String = "r_id"): EvalMetrics = {
    val row = counts(gt, sj, gtLKey, gtRKey, sjLKey, sjRKey).head()
    val (tp, fp, fn) = (row.getLong(0), row.getLong(1), row.getLong(2))
    if (tp > 0) {
      val pr = tp.toDouble / (tp + fp)
      val rc = tp.toDouble / (tp + fn)
      EvalMetrics(tp, fp, fn, pr, rc, 2 * pr * rc / (pr + rc))
    } else EvalMetrics(tp, fp, fn, 0d, 0d, 0d)
  }

  /**
   * E2 differential oracle: rows of `a` and `b` that do NOT appear in the other
   * side as an unordered pair; empty ⇔ the two joins agree
   * (reference notebook.ipynb cell 5 — the repo's primary correctness check).
   */
  def symmetricDiff(
      a: DataFrame, b: DataFrame,
      aLKey: String, aRKey: String, bLKey: String, bRKey: String): DataFrame =
    confusionMatrix(a, b, aLKey, aRKey, bLKey, bRKey)
      .where(col("gtk1").isNull || col("sjk1").isNull)

  /** [[symmetricDiff]] on the orientation-normalized pair key — identical
    * rows-in-disagreement count for distinct-pair tables, but a hash-
    * partitionable equi-join instead of a nested loop (the scale path, like
    * [[countsNormalized]] vs [[counts]]). */
  def symmetricDiffNormalized(
      a: DataFrame, b: DataFrame,
      aLKey: String, aRKey: String, bLKey: String, bRKey: String): DataFrame = {
    val an = a.select(least(col(aLKey), col(aRKey)).as("k1"),
      greatest(col(aLKey), col(aRKey)).as("k2"), lit(1).as("ina"))
    val bn = b.select(least(col(bLKey), col(bRKey)).as("k1"),
      greatest(col(bLKey), col(bRKey)).as("k2"), lit(1).as("inb"))
    an.join(bn, Seq("k1", "k2"), "full_outer")
      .where(col("ina").isNull || col("inb").isNull)
  }

  /**
   * Threshold sweep as a first-class operator (the reference's quality sweep,
   * test.ipynb cells 41-43/56/63/74): one fixed ground truth (`gtTokenizer` at
   * `gtThreshold`), one filtered self-join per sweep threshold, one row per
   * threshold with confusion counts and precision/recall/F1 under the
   * reference's `tp > 0` guard (similarity_join/__init__.py:46-62).
   *
   * Cost shape: the GT join runs once and is persisted; the sweep side
   * tokenizes/ranks ONCE ([[JaccardJoin.prepareSelfDeduped]] — df and
   * rarest-first position are threshold-free) and every threshold reuses the
   * persisted frames, so an N-point sweep pays one tokenization plus N
   * candidate/verify passes, not N full pipelines. Counts use the
   * normalized-pair equi-join (the scale path), never the nested loop.
   */
  def thresholdSweep(
      table: DataFrame, keyAttr: String, joinAttr: String,
      gtTokenizer: Tokenizer, gtThreshold: Double,
      sweepTokenizer: Tokenizer, thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val lk = "l_" + keyAttr
    val rk = "r_" + keyAttr
    val gt = PersistTracker.persist(
      JaccardJoin.selfJoinDeduped(table, keyAttr, joinAttr, gtTokenizer, gtThreshold))
    val prep = JaccardJoin.prepareSelfDeduped(table, keyAttr, joinAttr, sweepTokenizer)
    thresholds.map { t =>
      val sj = JaccardJoin.selfJoinDedupedPrepared(prep, t)
      countsNormalized(gt, sj, lk, rk, lk, rk)
        .select(lit(t).as("threshold"), col("tp"), col("fp"), col("fn"),
          when(col("tp") > 0, col("tp").cast("double") / (col("tp") + col("fp")))
            .otherwise(lit(0d)).as("pr"),
          when(col("tp") > 0, col("tp").cast("double") / (col("tp") + col("fn")))
            .otherwise(lit(0d)).as("rc"))
        .select(col("threshold"), col("tp"), col("fp"), col("fn"),
          col("pr"), col("rc"),
          when(col("tp") > 0, lit(2) * col("pr") * col("rc") / (col("pr") + col("rc")))
            .otherwise(lit(0d)).as("f1"))
    }.reduce(_ union _)
  }
}
