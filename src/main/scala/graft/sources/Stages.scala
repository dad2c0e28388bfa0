package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/**
 * Stage materialization / cleanup (S4/S5 in SURVEY.md §2.1).
 *
 * The reference materializes every pipeline stage as a named temp table
 * (`CREATE TABLE <name> AS SELECT …`) and drops predecessors as it goes
 * (reference jaccard_join.py:113-142, clear() at :203-209). Spark's natural
 * equivalents are persist() for reuse and temp views for a name-based surface;
 * this helper packages the pair so pipelines that want the reference's
 * explicit stage lifecycle can have it:
 *
 *   val tkdf = Stages.materialize(spark, "tkdf", buildTkdf(...))
 *   ... use spark.table("tkdf") or the returned handle ...
 *   Stages.drop(spark, "tkdf")
 *
 * At scale, persist(MEMORY_AND_DISK) spills per-executor instead of failing,
 * and dropping eagerly frees block-manager memory between stages — the same
 * reason the reference DROPs aggressively.
 */
object Stages {

  /** S4: materialize a stage under a name — persisted + registered as a temp
    * view; `eager = true` forces computation now (CTAS semantics). */
  def materialize(spark: SparkSession, name: String, df: DataFrame,
                  eager: Boolean = true): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.createOrReplaceTempView(name)
    if (eager) p.count()
    p
  }

  /** S5: drop a named stage — unpersist + deregister (DROP TABLE IF EXISTS). */
  def drop(spark: SparkSession, name: String, blocking: Boolean = false): Unit = {
    if (spark.catalog.tableExists(name)) {
      spark.table(name).unpersist(blocking)
      spark.catalog.dropTempView(name)
    }
    ()
  }

  /** The reference's `finally: clear()` — drop a whole list of stage names
    * (jaccard_join.py:203-209). */
  def clear(spark: SparkSession, names: String*): Unit =
    names.foreach(drop(spark, _))

  /**
   * Durable BUCKETED sink: write `df` as a parquet table hash-partitioned
   * (and sorted) by `bucketCol` into `nBuckets` files per partition. Two
   * tables bucketed the same way join WITHOUT any exchange — each bucket
   * pair is read already co-located, so the repeated joins of a pipeline
   * (tokens ⋈ df, candidates ⋈ arrays, fact ⋈ fact) pay the shuffle once
   * at write time instead of on every query. This is the durable,
   * cross-session counterpart of [[materialize]]'s in-memory stages and the
   * concrete mechanism behind SCALE.md's "bucketed tables on join keys
   * where pipelines repeat" — StagesSpec pins the exchange-free plan.
   */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCol: String, nBuckets: Int): Unit = {
    // Simple unqualified managed-table names ONLY: the orphaned-location
    // cleanup below derives the path as <warehouse>/<table.toLowerCase>,
    // which is wrong for a database-qualified name ('db.tbl') or an
    // external/custom-LOCATION table — a mis-resolved path there could
    // delete an unrelated directory.
    require(table.matches("[A-Za-z0-9_]+"),
      s"writeBucketed requires a simple unqualified table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // A managed-table directory left behind by a PREVIOUS session is not in
    // this session's in-memory catalog, so the DROP above can't see it and
    // saveAsTable refuses the name with LOCATION_ALREADY_EXISTS (observed:
    // two Verify runs in a row, the second inheriting the first's
    // spark-warehouse). Remove the orphaned location explicitly.
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Parquet data files currently in a table's location — the small-file
    * health metric of the append lifecycle (bucketed writes lay files flat in
    * the table directory). The location comes from the CATALOG, not from
    * reconstructing `<warehouse>/<name>` — a warehouse dir changed since
    * table creation or a custom-location table would make the reconstruction
    * probe the wrong (usually absent) directory and silently report 0, so
    * [[appendBucketed]]'s auto-compaction would never fire. 0 when the table
    * is not in the catalog or its location doesn't exist. */
  def dataFileCount(spark: SparkSession, table: String): Long = {
    // getTableMetadata throws for names the persistent catalog doesn't hold
    // (absent tables, temp views shadowing a name) — both mean "no data files"
    val meta = scala.util.Try(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)))
    if (meta.isFailure) return 0L
    val loc = new org.apache.hadoop.fs.Path(meta.get.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(loc)) 0L
    else fs.listStatus(loc).count(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
  }

  /**
   * Append rows to a bucketed table created by [[writeBucketed]] — the
   * MAINTENANCE half of the durable-index lifecycle: a daily ingest joins
   * the batch against the index ([[graft.operators.Dedup.minHashPairsRsIndexed]]),
   * admits the survivors, and appends THEIR index rows
   * (`minHashIndex(admitted)`) so tomorrow's batch sees them — no
   * from-scratch rebuild of the accumulated corpus index, ever. Pass the
   * SAME bucket column/count the table was created with (Spark refuses a
   * mismatched spec). Each append adds AT MOST one file per bucket (the
   * batch is repartitioned onto the bucket key first — see the inline
   * note); the bucket METADATA is unchanged, so joins stay exchange-free
   * on the table.
   *
   * AUTO-COMPACTION: after the append, if the table's average files per
   * bucket exceeds `autoCompactAt` (default the documented ~16 small-file
   * threshold — SCALE.md), [[compactBucketed]] fires in place, so an N-day
   * production admission loop self-maintains instead of relying on a
   * maintenance job it never calls. Rows/keep-sets are unaffected
   * (compaction is a rewrite; the rehearsal spec pins it fires exactly at
   * the promised crossing and changes nothing downstream). Pass
   * `autoCompactAt = 0` to opt out (ingest-latency-critical loops that
   * schedule compaction off-peak instead).
   *
   * StagesSpec pins append-then-join == from-scratch-index-then-join and
   * the ≤ nBuckets files-per-append bound.
   */
  def appendBucketed(df: DataFrame, table: String,
                     bucketCol: String, nBuckets: Int,
                     autoCompactAt: Int = 16): Unit = {
    // When the catalog lacks the table, `append`-saveAsTable would CREATE it
    // — and trip LOCATION_ALREADY_EXISTS on a warehouse directory orphaned
    // by a previous session (the case writeBucketed recovers from). Routing
    // first-write through writeBucketed gets the same cleanup; true appends
    // (table known to this catalog) take the append path unchanged.
    if (!df.sparkSession.catalog.tableExists(table))
      writeBucketed(df, table, bucketCol, nBuckets)
    else {
      // repartition on the bucket column with numPartitions == nBuckets:
      // HashPartitioning and the writer's bucket assignment are the same
      // pmod(murmur3, n), so each task holds exactly one bucket and each
      // append adds exactly ONE file per bucket. Without this the writer
      // emits one file per (task × bucket) — measured in the round-9 ingest
      // rehearsal: ~180 files per appended daily batch at 32 shuffle
      // partitions, reaching 45 files/bucket in two simulated days and
      // dragging the read-back probe join from 1.4 s to 2.2 s. The
      // exchange this costs moves only the DAILY BATCH's index rows —
      // the small side, exactly where an exchange belongs.
      df.repartition(nBuckets, col(bucketCol))
        .write.mode("append").format("parquet")
        .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
        .saveAsTable(table)
      if (autoCompactAt > 0 &&
          dataFileCount(df.sparkSession, table) > autoCompactAt.toLong * nBuckets)
        compactBucketed(df.sparkSession, table, bucketCol, nBuckets)
    }
  }

  /**
   * Compact a bucketed table written by [[writeBucketed]] and grown by
   * [[appendBucketed]]: each append adds a file per bucket, so after
   * many ingest days a bucket is dozens of small files — correctness is
   * unaffected (bucket METADATA never changed, joins stay exchange-free) but
   * scan cost and open-file overhead creep up. Compaction rewrites the
   * table as one file set via TWO bucketed CTAS copies: table →
   * `<table>__compact` (scratch), then scratch → table — each copy reads a
   * different location than it writes, so no step races its own input.
   *
   * Crash recovery: the second copy drops the live table before its rewrite
   * commits, so a crash in that window leaves only the scratch table — the
   * data is intact under `<table>__compact` and recovery is replaying the
   * second copy by hand: `writeBucketed(spark.table(scratch), table, …)`
   * then dropping the scratch. Nothing is lost; the swap is "atomic-ish",
   * not atomic.
   *
   * When to trigger (SCALE.md): file count per bucket > ~16, or average
   * file size < ~1/4 of the parquet row-group target — i.e. roughly every
   * 16 appended batches at daily-ingest cadence.
   *
   * Shape: two bucketed rewrites through a scratch table, NOT an in-place
   * overwrite — `writeBucketed(spark.table(t), t, …)` would delete the files
   * its own (lazy) input scan still needs, and a filesystem rename-swap
   * would have to re-register the files without `saveAsTable`'s bucket-spec
   * metadata, silently forfeiting the exchange-free joins this table exists
   * for. Copying table→scratch→table keeps every step a plain bucketed CTAS
   * whose reads and writes never touch the same location, and the catalog
   * entry that survives carries the full bucket spec (StagesSpec pins the
   * post-compaction plan stays exchange-free and rows are unchanged). The
   * second copy is the price of safety; compaction is an occasional
   * maintenance job, not a per-ingest step.
   *
   * The whole operation is EXCHANGE-FREE: with the auto-bucketed-scan
   * heuristic pinned off, each copy's input scan is the BUCKETED read — one
   * task per bucket, every file of that bucket in that task — so bucketBy's
   * one-file-per-(task, bucket) layout emits exactly ONE file per bucket
   * with no shuffle anywhere. (A `repartition(nBuckets, col)` would NOT do
   * this: the scan already advertises the bucket HashPartitioning, so the
   * planner elides the exchange while the heuristic may still pick a
   * file-split read underneath — tasks then hold mixed buckets and the
   * "compacted" table keeps multiple files per bucket.)
   */
  def compactBucketed(spark: SparkSession, table: String,
                      bucketCol: String, nBuckets: Int): Unit = {
    require(table.matches("[A-Za-z0-9_]+"),
      s"compactBucketed requires a simple unqualified table name, got '$table'")
    val scratch = table + "__compact"
    val autoScanKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAutoScan = spark.conf.get(autoScanKey)
    try {
      spark.conf.set(autoScanKey, "false") // always take the bucketed read
      writeBucketed(spark.table(table), scratch, bucketCol, nBuckets)
      writeBucketed(spark.table(scratch), table, bucketCol, nBuckets)
    } finally spark.conf.set(autoScanKey, prevAutoScan)
    spark.sql(s"DROP TABLE IF EXISTS `$scratch`")
    ()
  }
}
