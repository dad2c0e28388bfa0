package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /**
   * Append rows to a bucketed table created by [[writeBucketed]] — the
   * MAINTENANCE half of the durable-index lifecycle: a daily ingest joins
   * the batch against the index ([[graft.operators.Dedup.minHashPairsRsIndexed]]),
   * admits the survivors, and appends THEIR index rows
   * (`minHashIndex(admitted)`) so tomorrow's batch sees them — no
   * from-scratch rebuild of the accumulated corpus index, ever. Pass the
   * SAME bucket column/count the table was created with (Spark refuses a
   * mismatched spec). Each append adds one file set per bucket; the bucket
   * METADATA is unchanged, so joins stay exchange-free on the table —
   * compact occasionally (re-`writeBucketed` the read-back) when
   * small-file counts grow. StagesSpec pins append-then-join ==
   * from-scratch-index-then-join.
   */
  def appendBucketed(df: DataFrame, table: String,
                     bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("append").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
}
