package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.PersistTracker.TrackedPersist

/**
 * Fuzzy (edit-distance) self-join: all pairs whose strings are within a
 * Levenshtein distance bound — the entity-resolution complement to the
 * set-overlap joins in [[JaccardJoin]] (typo-class variation: IDs, names,
 * codes, where token sets are identical but characters drift).
 *
 * Scale shape: |len(a) − len(b)| ≤ maxDist is a necessary condition for
 * levenshtein(a, b) ≤ maxDist, so the index side is REPLICATED to its
 * 2·maxDist+1 candidate lengths and the join is an EQUI-join on length —
 * a co-partitioned hash join, never a cartesian. Replication factor is
 * 2·maxDist+1 (3 at maxDist=1), constant in corpus size. Verification uses
 * Spark's thresholded `levenshtein(l, r, maxDist)` (codegen'd, abandons the
 * DP lattice once the bound is exceeded — O(maxDist·len) not O(len²)).
 *
 * Length is a COARSE block, and for fixed-format strings it is no block at
 * all: every customer name has the same length, so one band carries the
 * whole n² and — it being a single join-key value — one task executes it
 * (measured: 230 s at sf0.1 unsalted vs ~7 s salted). The fix is the same
 * df-adaptive salt as the Jaccard candidate join: per-LENGTH counts decide
 * which bands are hot; hot bands hash-split the index side `saltBuckets`
 * ways and replicate the probe side across the buckets, cold bands keep
 * salt 0 on both sides. Each (l, r) pair still meets exactly once (both
 * sides consult the SAME broadcast hotness table, keyed by the band
 * value), so salting is output-invariant — spec-pinned. For corpora where
 * even a split band is too dense, compose with a q-gram prefix block first
 * (JaccardJoin) — the two filters are complementary.
 */
object FuzzyJoin {

  /** Column form of the native bounded-Levenshtein expression. */
  def boundedLev(l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column,
                 bound: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.LevenshteinBounded(
        org.apache.spark.sql.GraftExpressionBridge.expression(l),
        org.apache.spark.sql.GraftExpressionBridge.expression(r), bound))

  /**
   * Pairs (lid, rid, dist) with levenshtein ≤ maxDist and lid < rid.
   *
   * @param df          input relation
   * @param key         unique id column (orders the pair)
   * @param text        string column to compare
   * @param maxDist     inclusive Levenshtein bound (≥ 0)
   * @param saltBuckets split factor for hot length bands; 0 = auto
   *                    (4 × shuffle partitions — oversubscribed so the salt
   *                    keys hash evenly over partitions: with exactly
   *                    nPart salts, balls-into-bins collisions left one task
   *                    with 3× the work, measured maxTask 25.6 s vs 8.5 s
   *                    mean); 1 disables salting
   * @param hotBandRows a length is hot when more than this many rows share it
   */
  def selfJoin(df: DataFrame, key: String, text: String, maxDist: Int,
               saltBuckets: Int = 0, hotBandRows: Long = 4096): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(saltBuckets >= 0, s"saltBuckets must be >= 0, got $saltBuckets")
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val buckets = if (saltBuckets > 0) saltBuckets else 8 * nPart
    val base = df.select(col(key).as("id"), col(text).as("txt"),
      length(col(text)).as("len")).persistTracked
    // tiny (one row per distinct length) — broadcast to both sides so the
    // hot/cold decision is consistent and never itself shuffles
    val hotness = base.groupBy(col("len").as("hlen"))
      .agg((count(lit(1)) > hotBandRows).as("hot"))
    // index side: one row per candidate probe length; hot bands hash-split
    val index = base
      .withColumn("band", explode(sequence(col("len") - maxDist, col("len") + maxDist)))
      .join(broadcast(hotness), col("band") === col("hlen"), "left")
      .withColumn("rsalt", when(coalesce(col("hot"), lit(false)),
        pmod(hash(col("id")), lit(buckets))).otherwise(lit(0)))
      .select(col("id").as("rid"), col("txt").as("rtxt"), col("band"), col("rsalt"))
    // probe side: joins on its own length; replicated only into hot bands
    val probe = base
      .join(broadcast(hotness), col("len") === col("hlen"))
      .withColumn("lsalt", explode(when(col("hot"),
        sequence(lit(0), lit(buckets - 1))).otherwise(array(lit(0)))))
      .select(col("id").as("lid"), col("txt").as("ltxt"), col("len").as("llen"),
        col("lsalt"))
    // Explicit NUMBERED repartition on the join keys: the inputs are tiny in
    // BYTES but huge in join FAN-OUT, and AQE coalesces by input bytes — it
    // folded the salted join back into 1-2 tasks (measured: no speedup).
    // A user-specified numPartitions forbids AQE coalescing, and hash-
    // partitioning on exactly the join keys is reused by the join (no
    // second exchange), so the salt actually lands one bucket per task.
    probe.repartition(nPart, col("llen"), col("lsalt"))
      .join(index.repartition(nPart, col("band"), col("rsalt")),
        col("llen") === col("band") && col("lsalt") === col("rsalt") &&
          col("lid") < col("rid"))
      // graft_levenshtein: exact distance if <= maxDist, -1 past the bound
      // (same contract as the built-in thresholded levenshtein; the native
      // kernel strips shared affixes first — 2.8 µs -> ~0.1 µs per pair on
      // fixed-format names, which dominate hot bands by construction)
      .select(col("lid"), col("rid"),
        boundedLev(col("ltxt"), col("rtxt"), maxDist).cast("long").as("dist"))
      .where(col("dist") >= 0)
  }
}
