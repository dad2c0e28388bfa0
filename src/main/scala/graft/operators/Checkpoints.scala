package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Lineage-cut strategy for the iterative operators ([[Dedup.clusterIds]]'s
 * pointer-jumping loop, [[Pipeline.curateAndPack]]'s cascade survivors).
 *
 * Local mode (the default): `localCheckpoint(eager)`. Blocks live in executor
 * storage — fastest, zero filesystem traffic, and exactly right for
 * `local[n]`. But the blocks are NOT recoverable: on a real cluster an
 * executor loss mid-loop kills the job, because the truncated lineage has
 * nothing to recompute from.
 *
 * Reliable mode: `checkpoint(eager)` against the SparkContext checkpoint
 * directory (HDFS / object store on a cluster). Each cut pays a write, but
 * the loop survives executor loss — the right trade on a 1000-executor run
 * where *some* executor failing during a 20-round loop is near-certain.
 *
 * Selected per-session via `spark.graft.checkpoint.reliable` (default
 * false). Reliable mode requires `sc.setCheckpointDir(...)`; we fail fast
 * with an actionable message instead of Spark's later opaque
 * `SparkException: Checkpoint directory has not been set`.
 */
private[graft] object Checkpoints {

  /** Session conf key selecting the reliable strategy. */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Cut `df`'s lineage to a leaf using the session-configured strategy. */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      try spark.conf.get(ReliableKey, "false").toBoolean
      catch { case _: IllegalArgumentException => false }
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires spark.sparkContext.setCheckpointDir(...) " +
          "to point at cluster-durable storage")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }
}
