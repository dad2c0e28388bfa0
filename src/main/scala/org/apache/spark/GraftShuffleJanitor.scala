package org.apache.spark

/**
 * Deterministic shuffle-file reclamation for multi-pass operators
 * ([[graft.operators.JaccardJoin]]'s bounded-footprint `passes` mode).
 *
 * Spark normally deletes a shuffle's files when its ShuffleDependency is
 * garbage-collected (ContextCleaner's weak-reference queue). That contract is
 * correct but NON-DETERMINISTIC: between the passes of a bounded-footprint
 * join, a System.gc() hint may or may not actually surface the dead
 * dependencies before the next pass starts writing — measured at sf10, each
 * pass's ~22 GB candidate shuffle lingered (~5-7 GB retained growth per
 * pass) and the join died on scratch disk that the mode exists to bound.
 *
 * This janitor makes the reclamation explicit: snapshot the registered
 * shuffle ids before a pass, and after the pass's results are materialized
 * to a lineage-cut leaf, remove exactly the shuffles the pass created —
 * blocking, so the disk is free BEFORE the next pass plans. Safety argument
 * is the same as the GC path's: a pass's shuffles have exactly one consumer
 * (the pass's own eager checkpoint), which has completed, and the
 * checkpoint leaf never re-reads them. Re-executions in later passes create
 * FRESH shuffle ids (each action instantiates new exchanges), so removed
 * ids can never be requested again; the one cross-pass reuse — persisted
 * frames — must be materialized BEFORE the first snapshot (the callers do),
 * so their build shuffles are never in a removed set. Even a worst-case
 * cache-evicted recompute that touches a removed shuffle degrades to
 * Spark's standard FetchFailed → parent-stage resubmission, not wrong
 * results.
 *
 * Lives in `org.apache.spark` because MapOutputTrackerMaster and the
 * shuffle-driver components are `private[spark]` — the same adapter
 * technique as [[org.apache.spark.sql.GraftExpressionBridge]].
 */
object GraftShuffleJanitor {

  /** The currently registered shuffle ids (driver side). */
  def shuffleIds(sc: SparkContext): Set[Int] = sc.env.mapOutputTracker match {
    case m: MapOutputTrackerMaster => m.shuffleStatuses.keySet.toSet
    case _ => Set.empty // executor-side tracker: not a driver, nothing to do
  }

  /** Blocking removal of the given shuffles' map outputs and files. */
  def remove(sc: SparkContext, ids: Set[Int]): Unit = {
    val tracker = sc.env.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m
      case _ => return
    }
    ids.foreach { id =>
      // order matters: unregister the map outputs first so no new reads
      // resolve to the files, then drop the files through the block manager
      tracker.unregisterShuffle(id)
      sc.env.shuffleManager.unregisterShuffle(id)
      sc.env.blockManager.master.removeShuffle(id, blocking = true)
    }
  }
}
