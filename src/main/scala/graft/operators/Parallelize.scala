package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Scan-parallelism floor for CPU-heavy per-row stages.
 *
 * A per-row stage (gram explosion, regex scrubbing, tokenization) inherits
 * the scan's split count. At cluster scale that is thousands of splits and
 * this helper is a NO-OP; on a small or single-file input (one parquet file
 * = its row-group count, locally often 1-2 splits) the whole stage runs on
 * a couple of cores while the rest idle — measured 17.1 s of a 2-task
 * 13-gram stage on the 8× stress corpus with 30 cores idle.
 *
 * The fix is a repartition GATED on the deficit existing: exactly when the
 * condition triggers, the input is by definition small (few splits), so the
 * shuffle it pays is trivial; when the input is big the condition is false
 * and no full-corpus shuffle is ever introduced. Row content and downstream
 * results are unchanged — only physical parallelism moves.
 */
object Parallelize {

  /** `df` repartitioned up to the session's shuffle-partition count iff its
    * current plan offers fewer partitions (inspecting the plan's RDD costs
    * planning, not a job). */
  def ensureMinParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
