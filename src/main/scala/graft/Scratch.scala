package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.operators.PersistTracker.TrackedPersist

/** Throwaway experiment main (not part of the library surface). */
object Scratch {

  /** The pre-round-15 clusterIds loop, verbatim, for interleaved A/B. */
  def clusterIdsOld(pairs: DataFrame, lCol: String, rCol: String,
                    maxIter: Int = 50): DataFrame = {
    val edges = Checkpoints.cut(pairs
      .select(explode(array(
        struct(col(lCol).cast("long").as("a"), col(rCol).cast("long").as("b")),
        struct(col(rCol).cast("long").as("a"), col(lCol).cast("long").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
      .persistTracked)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var labels = Checkpoints.cut(edges.groupBy("a")
      .agg(least(col("a"), min(col("b"))).as("label"))
      .select(col("a").as("id"), col("label")))
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("b"), col("label").as("nlabel")), "b")
        .groupBy(col("a").as("id")).agg(min("nlabel").as("nmin"))
      val prop = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      val next = Checkpoints.cut(prop.alias("x")
        .join(prop.select(col("id").as("label"), col("label").as("ll")).alias("y"),
          Seq("label"), "left")
        .select(col("id"), least(col("label"), coalesce(col("ll"), col("label"))).as("label")))
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.sql.adaptive.coalescePartitions.enabled", true)
      .config("spark.sql.adaptive.skewJoin.enabled", true)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.codegen.maxFields", 256)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Api.quietBoundedWindowLogs()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val ws = WhitespaceTokenizer()
    // one shared pair frame, persisted + materialized, so both loops time ONLY
    // the CC machinery, not the jaccard join
    val pairs = JaccardJoin.selfJoinDeduped(docs, "doc_id", "text", ws, 0.9)
      .persistTracked
    println("[scratch] pairs = " + pairs.count())
    def time(label: String)(body: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = body.queryExecution.toRdd.count()
      println(f"[scratch] $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm both once, then interleave 3x
    time("old warm")(clusterIdsOld(pairs, "l_doc_id", "r_doc_id"))
    time("new warm")(Dedup.clusterIds(pairs, "l_doc_id", "r_doc_id"))
    for (i <- 1 to 3) {
      time(s"old $i")(clusterIdsOld(pairs, "l_doc_id", "r_doc_id"))
      time(s"new $i")(Dedup.clusterIds(pairs, "l_doc_id", "r_doc_id"))
    }
  }
}
