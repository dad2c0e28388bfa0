package graft

import graft.sources.Stages
import org.apache.spark.sql.functions._

/** Bucketed-sink evidence: two tables bucketed on the join key must join
  * with NO exchange in the physical plan — the write-once shuffle that makes
  * repeated pipeline joins co-located (SCALE.md "bucketed tables on join
  * keys where pipelines repeat"). */
class StagesSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketing join plans without any exchange") {
    val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 1000L).map(i => (i, s"r$i")).toDF("k", "rv")
    Stages.writeBucketed(left, "graft_bkt_l", "k", 8)
    Stages.writeBucketed(right, "graft_bkt_r", "k", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a shuffle-based join strategy so the assertion is about
      // co-location, not about broadcasting away the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_l").join(spark.table("graft_bkt_r"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() === 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
    }
  }
}
