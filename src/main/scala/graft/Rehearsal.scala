package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multi-day ingest rehearsal — the MEASUREMENT companion of the StagesSpec
 * lifecycle pin ("multi-day ingest loop"): drives the production daily-ingest
 * loop (`Dedup.incrementalKeepIdsIndexed` with `admitTo` against one durable
 * bucketed index) for N simulated days over disjoint slices of the
 * `documents` table, compacting with `Stages.compactBucketed` after
 * `SPARK_GRAFT_COMPACT_DAY`, and prints a markdown table for BENCH_NOTES:
 * per-day keep-set wall, index rows, parquet files per bucket, and — around
 * the compaction day — the READ-BACK probe-join wall immediately before and
 * after compacting, i.e. the first measured number behind SCALE.md's
 * "compact at >~16 files/bucket" trigger heuristic.
 *
 * Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
 * SPARK_GRAFT_REHEARSAL_DAYS (default 5), SPARK_GRAFT_COMPACT_DAY (default 3;
 * 0 disables), SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE_PARTITIONS.
 */
object Rehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val days = sys.env.get("SPARK_GRAFT_REHEARSAL_DAYS").map(_.toInt).getOrElse(5)
    val compactDay = sys.env.get("SPARK_GRAFT_COMPACT_DAY").map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.codegen.maxFields", 256)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Api.quietBoundedWindowLogs()
    import graft.operators.{Dedup, WhitespaceTokenizer}
    import graft.sources.Stages

    val ws = WhitespaceTokenizer()
    val table = "graft_rehearsal_idx"
    val nBuckets = 8
    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    def tableFiles(): Int = {
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
      Option(loc.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    }
    // the probe join is the read-back workload compaction exists to keep
    // cheap: a FIXED batch joined against the stored index, timed cold
    // (clearCache first) so file-open + scan cost is inside the wall
    def probeJoinSec(probe: DataFrame): Double = {
      Api.clearCache()
      val t0 = System.nanoTime()
      Dedup.minHashPairsRsIndexed(spark.table(table), probe, "doc_id", "text", ws, 0.9)
        .queryExecution.toRdd.foreach(_ => ())
      sec(t0)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").persist()
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    // the 10% incoming stream, split into `days` disjoint daily batches
    def batch(d: Int): DataFrame =
      docs.where(col("doc_id") % 10 === 0 &&
        pmod(floor(col("doc_id") / 10), lit(days)) === (d - 1))
    val probe = batch(1).persist()

    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}__compact")
    val tBuild = System.nanoTime()
    Stages.writeBucketed(
      Dedup.minHashIndex(corpus, "doc_id", "text", ws), table, "bucket", nBuckets)
    println(f"index build + bucketed write: ${sec(tBuild)}%.2f s, " +
      f"${spark.table(table).count()} rows, ${tableFiles()} files")
    println()
    println("| day | batch docs | kept | keep-set wall (s) | index rows | files/bucket | note |")
    println("|---|---|---|---|---|---|---|")
    for (d <- 1 to days) {
      Api.clearCache()
      val b = batch(d).persist()
      val nb = b.count()
      val t0 = System.nanoTime()
      val kept = Dedup.incrementalKeepIdsIndexed(spark.table(table), b,
        "doc_id", "text", ws, 0.9, admitTo = Some(table))
      val nKept = kept.count()
      val wall = sec(t0)
      val rows = spark.table(table).count()
      var note = ""
      if (d == compactDay) {
        val before = probeJoinSec(probe)
        val filesBefore = tableFiles()
        val tc = System.nanoTime()
        Stages.compactBucketed(spark, table, "bucket", nBuckets)
        val cWall = sec(tc)
        val after = probeJoinSec(probe)
        note = f"compacted: $filesBefore->${tableFiles()} files in $cWall%.2f s; " +
          f"probe join $before%.2f s -> $after%.2f s"
      }
      println(f"| $d | $nb | $nKept | $wall%.2f | $rows | ${tableFiles().toDouble / nBuckets}%.1f | $note |")
      b.unpersist()
    }
    val endProbe = probeJoinSec(probe)
    println()
    println(f"final read-back probe join: $endProbe%.2f s over ${spark.table(table).count()} index rows")
    spark.sql(s"DROP TABLE IF EXISTS $table")

    // ---- ANN mirror: the same admission lifecycle on the durable IVF index
    // (Similarity.ingestKeepIdsIndexed + admitTo + compactBucketed), so the
    // embedding side of the production loop gets measured walls too
    import graft.operators.Similarity
    val annTable = "graft_rehearsal_ivf"
    def annFiles(): Int = {
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, annTable)
      Option(loc.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    }
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").persist()
    val annCorpus = embs.where(col("vec_id") % 10 =!= 0)
    def annBatch(d: Int): DataFrame =
      embs.where(col("vec_id") % 10 === 0 &&
        pmod(floor(col("vec_id") / 10), lit(days)) === (d - 1))
    val annProbe = annBatch(1).persist()
    val cents = Similarity.sampleCentroids(annCorpus, "vec_id", "embedding", 16)
      .persist()
    def annProbeJoinSec(): Double = {
      Api.clearCache()
      val t0 = System.nanoTime()
      Similarity.nearMatchesIvfIndexed(spark.table(annTable), cents, annProbe,
          "vec_id", "embedding", 0.4, 4)
        .queryExecution.toRdd.foreach(_ => ())
      sec(t0)
    }
    spark.sql(s"DROP TABLE IF EXISTS $annTable")
    spark.sql(s"DROP TABLE IF EXISTS ${annTable}__compact")
    val tAnnBuild = System.nanoTime()
    Stages.writeBucketed(
      Similarity.ivfIndex(annCorpus, "vec_id", "embedding", cents), annTable, "cid", nBuckets)
    println()
    println(f"ANN: IVF index build + bucketed write: ${sec(tAnnBuild)}%.2f s, " +
      f"${spark.table(annTable).count()} rows, ${annFiles()} files")
    println("| day | batch vecs | kept | keep-set wall (s) | index rows | files/bucket | note |")
    println("|---|---|---|---|---|---|---|")
    for (d <- 1 to days) {
      Api.clearCache()
      val b = annBatch(d).persist()
      val nb = b.count()
      val t0 = System.nanoTime()
      val kept = Similarity.ingestKeepIdsIndexed(spark.table(annTable), cents, b,
        "vec_id", "embedding", 0.4, nProbe = 4, admitTo = Some(annTable),
        admitBuckets = nBuckets)
      val nKept = kept.count()
      val wall = sec(t0)
      var note = ""
      if (d == compactDay) {
        val before = annProbeJoinSec()
        val filesBefore = annFiles()
        val tc = System.nanoTime()
        Stages.compactBucketed(spark, annTable, "cid", nBuckets)
        val cWall = sec(tc)
        val after = annProbeJoinSec()
        note = f"compacted: $filesBefore->${annFiles()} files in $cWall%.2f s; " +
          f"probe join $before%.2f s -> $after%.2f s"
      }
      println(f"| $d | $nb | $nKept | $wall%.2f | ${spark.table(annTable).count()} | ${annFiles().toDouble / nBuckets}%.1f | $note |")
      b.unpersist()
    }
    println(f"ANN final read-back probe join: ${annProbeJoinSec()}%.2f s over ${spark.table(annTable).count()} index rows")
    spark.sql(s"DROP TABLE IF EXISTS $annTable")
    spark.stop()
  }
}
