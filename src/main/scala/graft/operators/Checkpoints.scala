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

  /**
   * [[cut]] that PRESERVES an exact hash-partitioning + sort order through
   * the lineage cut (local mode: the
   * [[org.apache.spark.sql.GraftCheckpointBridge]] LogicalRDD path — under
   * AQE a plain localCheckpoint comes back UnknownPartitioning and every
   * later join/agg on the leaf re-shuffles it; guide §2.4). The iterative
   * operators cut their loop state every round, so a lost partitioning is
   * paid once per round — [[graft.operators.Dedup.clusterIds]]'s edge list
   * re-exchanged EVERY round before this. Reliable mode keeps the stock
   * `checkpoint(eager)` on the repartitioned frame: correct, durable, just
   * without the metadata (the loop then re-shuffles as before — availability
   * over speed on a cluster is the existing [[cut]] trade).
   */
  def cutPartitioned(df: DataFrame, keys: Seq[String], numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      try spark.conf.get(ReliableKey, "false").toBoolean
      catch { case _: IllegalArgumentException => false }
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires spark.sparkContext.setCheckpointDir(...) " +
          "to point at cluster-durable storage")
      df.repartition(numPartitions, keys.map(df.col): _*).checkpoint(true)
    } else
      org.apache.spark.sql.GraftCheckpointBridge
        .localCheckpointHashPartitioned(df, keys, numPartitions)
  }

  /**
   * Cut `df`'s lineage to a COMPRESSED PARQUET leaf under the warehouse dir —
   * the bounded-scratch strategy for results that must ACCUMULATE across a
   * multi-pass operator ([[JaccardJoin]]'s `passes` mode). [[cut]]'s
   * localCheckpoint retains each pass's rows as deserialized executor blocks
   * for the life of the union — measured at sf10 t=0.5: ~3.6 GB of rdd
   * blocks PER PASS (the output itself), a monotone floor that ate the
   * scratch the passes knob had just freed. A columnar-compressed file leaf
   * retains the same rows at a fraction of the bytes, off the block manager
   * entirely, and (on a cluster, with the warehouse on durable storage)
   * survives executor loss — the availability gap [[cut]]'s local mode has.
   * The price is one write+read per pass of OUTPUT-sized data — the small
   * end of the pipeline by construction.
   *
   * The directory is tracked ([[PersistTracker.trackScratchDir]]) and
   * DELETED by [[graft.Api.clearCache]]. Note the lifecycle is STRONGER than
   * the persisted frames': an unpersisted cache recomputes on next use, but a
   * deleted parquet leaf cannot — results built on these slices become
   * invalid (FileNotFoundException) after clearCache(), not merely cold.
   * Read-back passes the schema explicitly so an all-empty slice (zero part
   * files) stays a valid empty frame.
   */
  def cutToParquet(df: DataFrame, tag: String): DataFrame = {
    require(tag.matches("[A-Za-z0-9_\\-]+"), s"bad scratch tag '$tag'")
    val spark = df.sparkSession
    val dir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"graft_scratch/$tag")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.write.mode("overwrite").parquet(dir.toString)
    PersistTracker.trackScratchDir(fs, dir)
    spark.read.schema(df.schema).parquet(dir.toString)
  }
}
