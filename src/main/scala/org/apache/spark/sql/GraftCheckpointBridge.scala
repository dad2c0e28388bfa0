package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Partitioning-PRESERVING local checkpoint (optimization round 15).
 *
 * `Dataset.localCheckpoint` rebuilds the frame as a `LogicalRDD` whose
 * partitioning is extracted from the physical plan — but under AQE the
 * physical plan is an `AdaptiveSparkPlanExec` whose `outputPartitioning` is
 * not final at extraction time, so the leaf comes back `UnknownPartitioning`
 * and every later join/aggregation on the checkpointed frame RE-SHUFFLES it
 * (measured: the [[graft.operators.Dedup.clusterIds]] loop re-exchanged the
 * edge list every round; guide §2.4 — two operations keyed the same way
 * should share one exchange).
 *
 * This bridge checkpoints an explicitly hash-repartitioned, within-partition
 * SORTED copy of the frame and constructs the `LogicalRDD` with the TRUE
 * `HashPartitioning` + `SortOrder` metadata:
 *
 *   - `repartition(n, keys)` plans as `REPARTITION_BY_NUM`, which AQE is
 *     forbidden to coalesce, so the materialized RDD has exactly `n`
 *     partitions laid out by `HashPartitioning(keys, n).partitionIdExpression`
 *     — the claimed partitioning is physically exact, never an assertion;
 *   - `sortWithinPartitions(keys)` makes the claimed ascending `SortOrder`
 *     exact the same way (keys are the caller's join/group keys);
 *   - downstream equi-joins/aggregations on `keys` with the session's shuffle
 *     partition count then plan with NO Exchange and NO Sort on this side.
 *
 * Local-mode only (localCheckpoint) — the reliable-checkpoint strategy keeps
 * the stock path (see [[graft.operators.Checkpoints.cut]]).
 */
object GraftCheckpointBridge {

  def localCheckpointHashPartitioned(df: DataFrame, keys: Seq[String],
                                     numPartitions: Int): DataFrame = {
    require(keys.nonEmpty, "need at least one partitioning key")
    val laid = df
      .repartition(numPartitions, keys.map(df.col): _*)
      .sortWithinPartitions(keys.map(df.col): _*)
      .asInstanceOf[classic.Dataset[Row]]
    val qe = laid.queryExecution
    // same materialization as Dataset.localCheckpoint(eager = true): copy the
    // reused UnsafeRows, mark, then force via count
    val rdd = qe.toRdd.map(_.copy()).localCheckpoint()
    rdd.count(): Unit
    val attrs = qe.analyzed.output
    val keyAttrs = keys.map(k => attrs.find(_.name == k).getOrElse(
      sys.error(s"localCheckpointHashPartitioned: no column '$k' in ${attrs.map(_.name)}")))
    val lr = LogicalRDD(
      attrs, rdd,
      HashPartitioning(keyAttrs, numPartitions),
      keyAttrs.map(a => SortOrder(a, Ascending)),
      isStreaming = false)(laid.sparkSession)
    classic.Dataset.ofRows(laid.sparkSession, lr)
  }
}
