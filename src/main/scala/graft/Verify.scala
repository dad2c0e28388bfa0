package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // value-side broadcast for the join pipelines (see Bench.scala: AQE
      // converts the verify/expansion SMJs to broadcast when the runtime
      // size allows; 105.8 -> 36.7 s on the stress t=0.9 join)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      // keep the 128-column MinHash aggregate inside whole-stage codegen
      .config("spark.sql.codegen.maxFields", 256)
      // the events table stores TIMESTAMP(NANOS) parquet - read as epoch-nano longs
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      // a single-JVM local run has no real executor liveness to police, and
      // multi-minute host IO stalls (observed: 7-min freeze -> heartbeat
      // timeout killed the context mid-bench) must not abort the run
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Api.quietBoundedWindowLogs()
    new java.io.File(outDir).mkdirs()
    // optional comma-separated filter for fast iteration on one query; the
    // dump lands in the same outDir, so a subsequent check.py --skip-verify
    // compares the fresh dump alongside the prior full run's
    val only = sys.env.get("SPARK_GRAFT_VERIFY_QUERIES").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        Api.clearCache() // don't accumulate graft-persisted intermediates across queries
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
