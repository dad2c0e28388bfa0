package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan-dump harness for the optimization rounds:
 * `runMain graft.PlanDump <outDir> <suffix> [q1,q2,...]`
 *
 * Writes each query's `.explain("formatted")` output to
 * `<outDir>/<query>_<suffix>.txt` (e.g. plans/r15/jac_self_docs_ws_t05_before.txt)
 * WITHOUT executing the query — the optimizer-final (pre-AQE) physical plan,
 * which is what Exchange counts / join strategies / PushedFilters are read
 * from. Session configs mirror graft.Bench exactly so dumped plans are the
 * benched plans. Default query list = every name passed, or the Bench
 * headline set when none given (resolved via SPARK_GRAFT_QUERIES-style CSV).
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error("usage: PlanDump <outDir> <suffix> [q1,q2,...]"))
    val suffix = if (args.length > 1) args(1) else "before"
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("plan-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.sql.adaptive.coalescePartitions.enabled", true)
      .config("spark.sql.adaptive.skewJoin.enabled", true)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.codegen.maxFields", 256)
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Api.quietBoundedWindowLogs()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name - skipping")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            System.err.println(s"[plandump] wrote $name ($suffix)")
          } catch {
            case scala.util.control.NonFatal(t) =>
              System.err.println(s"[plandump] $name failed: $t")
          } finally Api.clearCache()
      }
    }
    spark.stop()
  }
}
