package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable

/**
 * Registry for every intermediate the graft operators `persist()`.
 *
 * The join/dedup pipelines cache intermediates that are consumed by more than
 * one downstream stage (tkdf, banded signatures, cascade survivors). Because
 * results are returned LAZILY, the operator cannot unpersist before the caller
 * materializes — so in a long-lived session repeated library-style calls would
 * accumulate cached blocks until memory-pressure eviction. Tracking each
 * persist here lets callers release exactly the operator-internal caches via
 * [[unpersistAll]] ([[graft.Api.clearCache]]) without nuking caches the USER
 * created (which a blanket `spark.catalog.clearCache()` would).
 */
private[graft] object PersistTracker {

  private val tracked = mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` at `level` and remember it for [[unpersistAll]].
    *
    * No-op when the plan is already cached (directly, or because the
    * CacheManager matches an identical plan cached earlier — e.g. a bench
    * re-run rebuilding the same query): re-persisting would log
    * "Asked to cache already cached data" and, worse, re-tracking it would
    * let [[unpersistAll]] release a cache some OTHER live consumer still
    * counts on. `storageLevel` does the CacheManager lookup for us. */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      if (df.storageLevel != StorageLevel.NONE) df
      else {
        val p = df.persist(level)
        tracked += p
        p
      }
    }

  /** Operator-internal SCRATCH DIRECTORIES (multi-pass slice spills —
    * [[Checkpoints.cutToParquet]]): like the persisted frames, their results
    * are returned lazily, so the operator cannot delete them itself; tracking
    * lets [[unpersistAll]] reclaim the files with the caches. Stored as
    * (filesystem, path) so deletion needs no live session. */
  private val scratchDirs =
    mutable.ArrayBuffer.empty[(org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path)]

  def trackScratchDir(fs: org.apache.hadoop.fs.FileSystem,
                      path: org.apache.hadoop.fs.Path): Unit = synchronized {
    scratchDirs += ((fs, path))
  }

  /** Unpersist every tracked intermediate and delete every tracked scratch
    * directory; returns how many caches were released. Safe against
    * already-unpersisted / stopped-session entries. */
  def unpersistAll(blocking: Boolean = false): Int = synchronized {
    val n = tracked.size
    tracked.foreach(df => scala.util.Try(df.unpersist(blocking)))
    tracked.clear()
    scratchDirs.foreach { case (fs, p) => scala.util.Try(fs.delete(p, true)) }
    scratchDirs.clear()
    n
  }

  /** `df.persistTracked` — chainable tracked persist. */
  implicit class TrackedPersist(private val df: DataFrame) extends AnyVal {
    def persistTracked: DataFrame = PersistTracker.persist(df)
  }
}
