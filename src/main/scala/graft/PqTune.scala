package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.operators.Similarity

/**
 * PQ quality sweep: recall@10 vs exact-L2 for flat PQ and residual IVF-PQ
 * across codebook sizes, on both the driver embeddings (isotropic) and the
 * clustered fixture — the tuning loop behind the registered parameters.
 * `runMain graft.PqTune [sfDir]`.
 */
object PqTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Api.quietBoundedWindowLogs()

    def sweep(label: String, e: org.apache.spark.sql.DataFrame): Unit = {
      val q = e.where(col("vec_id") < 100)
      val exactL2 = Similarity.topKExactL2(e, q, "vec_id", "embedding", 10).persist()
      for (k <- Seq(16, 64, 256)) {
        val cbs = Similarity.pqCodebooks(e, "vec_id", "embedding", 64, 8, k)
        val pq = Recall.topK(exactL2, Similarity.pqTopK(
          Similarity.pqEncode(e, "vec_id", "embedding", cbs, 64, 8),
          cbs, q, "vec_id", "embedding", 10))
        val cents = Similarity.sampleCentroids(e, "vec_id", "embedding", 16)
        val rcbs = Similarity.pqResidualCodebooks(e, "vec_id", "embedding", cents, 64, 8, k)
        val idx = Similarity.pqIvfIndex(e, "vec_id", "embedding", cents, rcbs, 64, 8)
        val ivfpqR = Recall.topK(exactL2, Similarity.pqTopKIvfIndexed(
          idx, cents, rcbs, q, "vec_id", "embedding", 10, 4))
        val ivfpqR8 = Recall.topK(exactL2, Similarity.pqTopKIvfIndexed(
          idx, cents, rcbs, q, "vec_id", "embedding", 10, 8))
        println(f"[pqtune] $label%-10s k=$k%3d  pq@10=$pq%.3f  ivfpq(res,nProbe4)=$ivfpqR%.3f  ivfpq(res,nProbe8)=$ivfpqR8%.3f")
      }
      for (k <- Seq(64, 256)) {
        val cents = Similarity.sampleCentroids(e, "vec_id", "embedding", 16)
        val tcbs = Similarity.pqTrainedCodebooks(e, "vec_id", "embedding", cents, 64, 8, k, 3)
        val tidx = Similarity.pqIvfIndex(e, "vec_id", "embedding", cents, tcbs, 64, 8)
        val ivfpqT4 = Recall.topK(exactL2, Similarity.pqTopKIvfIndexed(
          tidx, cents, tcbs, q, "vec_id", "embedding", 10, 4))
        val ivfpqT8 = Recall.topK(exactL2, Similarity.pqTopKIvfIndexed(
          tidx, cents, tcbs, q, "vec_id", "embedding", 10, 8))
        println(f"[pqtune] $label%-10s TRAINED k=$k%3d  ivfpq(nProbe4)=$ivfpqT4%.3f  ivfpq(nProbe8)=$ivfpqT8%.3f")
        Api.clearCache()
      }
      for ((k, refine) <- Seq((16, 50), (16, 100), (64, 50), (64, 100))) {
        val cents = Similarity.sampleCentroids(e, "vec_id", "embedding", 16)
        val rcbs = Similarity.pqResidualCodebooks(e, "vec_id", "embedding", cents, 64, 8, k)
        val ivf = Similarity.ivfIndex(e, "vec_id", "embedding", cents)
        val idx = Similarity.pqIvfIndex(e, "vec_id", "embedding", cents, rcbs, 64, 8)
        val r4 = Recall.topK(exactL2, Similarity.pqTopKIvfRefined(
          idx, ivf, cents, rcbs, q, "vec_id", "embedding", 10, 4, refine))
        val r8 = Recall.topK(exactL2, Similarity.pqTopKIvfRefined(
          idx, ivf, cents, rcbs, q, "vec_id", "embedding", 10, 8, refine))
        println(f"[pqtune] $label%-10s REFINED k=$k%3d refine=$refine%3d  nProbe4=$r4%.3f  nProbe8=$r8%.3f")
      }
      // IVF pruning ceiling: exact re-rank within the probed lists
      for (nProbe <- Seq(4, 8)) {
        val cents = Similarity.sampleCentroids(e, "vec_id", "embedding", 16)
        val ceil = Recall.topK(exactL2, Similarity.topKIvfIndexed(
          Similarity.ivfIndex(e, "vec_id", "embedding", cents), cents,
          q, "vec_id", "embedding", 10, nProbe))
        println(f"[pqtune] $label%-10s ivf-exact ceiling nProbe=$nProbe: $ceil%.3f (cosine-ranked)")
      }
      exactL2.unpersist()
      ()
    }

    sweep("driver", spark.read.parquet(s"$sfDir/embeddings.parquet"))
    sweep("clustered", Bench.clusteredEmbeddings(spark, 2000, 16, 64))
    spark.stop()
  }
}
