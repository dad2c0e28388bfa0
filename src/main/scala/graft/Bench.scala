package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main. Runs the headline queries on SPARK_GRAFT_SF_DIR and prints
 * ONE JSON line. Per-query time is the best of three runs (the first run
 * pays JIT/codegen warm-up; the reference's notebook timings are likewise
 * warm averages over n runs — BASELINE.md).
 */
object Bench {

  /** Headline set: the workloads with BASELINE.md counterparts plus the
    * scale-path operators. Everything else is correctness-only surface. */
  private val headline = Seq(
    "jac_self_part_ws_t05",     // ≈ profiles 10K/50K whitespace t=0.5 self-join
    "jac_self_part_q3_t05",     // ≈ profiles 10K QGrams t-sweep
    "jac_bf_self_part_ws_t05",  // brute-force ratio (reference wins ~50x at 5K+)
    "jac_rs_cust_supp_q3_t03",  // R×S with widow handling + side choice
    "jac_self_docs_ws_t09",     // near-dup join over documents
    // candidate-explosion regime (BASELINE.md's 45-142 s region at t<=0.4)
    "jac_self_part_ws_t03",
    "jac_self_docs_ws_t05",
    "jac_rs_cust_supp_q3_t02",
    "dedup_minhash_docs",       // MinHash+LSH cascade
    "dedup_minhash_rs_docs",    // incremental: new batch vs corpus, R×S LSH
    "dedup_exact_docs",
    "ann_topk_exact",           // brute-force cosine top-k baseline
    "ann_topk_lsh",             // bucketed scale path
    "ann_topk_ivf",             // inverted-file scale path
    "emb_neardup_lsh",          // bucketed embedding dedup
    "text_stats_docs",
    "winnow_overlap_docs",      // MOSS partial-overlap pairs
    "bm25_topk_docs",           // BM25 keyword retrieval
    "eval_counts_norm_part",    // E1 scale path (equi-join on normalized pair key)
    "dedup_cluster_docs",       // connected components over near-dup pairs
    "fuzzy_cust_names",         // edit-distance join, hot-band salted
    "pipeline_curate_docs",     // the 5-stage curation pipeline end-to-end
    "decontam_docs",            // 13-gram benchmark decontamination
    "shuffle_order_docs",       // deterministic global shuffle (two-pass rank)
  )

  /** Stress profile (SPARK_GRAFT_SF_DIR containing "stress", or
    * SPARK_GRAFT_PROFILE=stress): the 8× uniform-length documents corpus has
    * ONLY the documents table, so the headline narrows to the docs-side
    * scale proofs (SCALE.md "Measured"). Single-run by default — the t=0.9
    * self-join alone is ~100 s class; pair with
    * SPARK_GRAFT_SHUFFLE_PARTITIONS=256 (~128 MB per shuffle partition,
    * zero spill — the A/B in SCALE.md). */
  private val stressHeadline = Seq(
    "jac_self_docs_ws_t09",
    "dedup_minhash_docs",
    "dedup_minhash_rs_docs",
    "dedup_cluster_docs",
    "decontam_docs",
    "shuffle_order_docs",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // default = core count (right for the small-SF bench data); override when
    // benching shuffle-heavy volumes — partitions must track DATA VOLUME
    // (~128 MB each): 32 partitions on the 8x stress corpus meant ~4 GB per
    // aggregation partition and 13.5 GB of spill; 256 erased the spill and
    // cut the join 1.8x (SCALE.md "Measured").
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.sql.adaptive.coalescePartitions.enabled", true)
      .config("spark.sql.adaptive.skewJoin.enabled", true)
      // let AQE broadcast the VALUE-side tables of the join pipelines (the
      // deduped posArrays/vals frames: ~25 MB on the 8× stress corpus, just
      // over the 10 MB default) — without this the verify and expansion
      // joins fall back to SortMergeJoin and drag the 22-125M-row candidate
      // stream through full Exchange+Sort passes. Measured on the stress
      // t=0.9 self-join: 105.8 -> 36.7 s, stage-seconds 173 -> 53, identical
      // output. Safe at any scale: AQE checks RUNTIME sizes, so a value
      // table past the threshold keeps SMJ.
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
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    val stress = sys.env.get("SPARK_GRAFT_PROFILE").contains("stress") ||
      sfDir.contains("stress")
    // dev loop for tuning the approximate paths: skip the timed queries and
    // emit only the recall sidecar
    val recallOnly = sys.env.get("SPARK_GRAFT_RECALL_ONLY").contains("1")
    val queries = if (recallOnly) Seq.empty else if (stress) stressHeadline else headline
    val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt)
      .getOrElse(if (stress) 1 else 3)

    val results = queries.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        System.err.println(s"[bench] running $name")
        // best of 3 (1 on the stress profile): the first run pays persist
        // materialization + codegen; the reference's BASELINE numbers are
        // likewise warm averages over n runs
        val t = try Seq.fill(nRuns)(timeOnce(fn)).min catch { case _: Throwable => -1d }
        Api.clearCache() // drop graft-persisted intermediates between queries
        System.err.println(f"[bench] $name%-26s $t%.3f s")
        name -> t
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val recallJson = recallField(spark, sfDir)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$recallJson${hostField()},"sf":"$sfDir"}""")
    spark.stop()
  }

  @volatile private var probeSink = 0L

  /** Host parallel-efficiency probes, embedded in the JSON line so every
    * bench artifact records the window it ran in. Two workloads, one
    * reference run single-threaded vs one full copy per advertised core
    * (1.0 = perfect scaling):
    *
    *   - `par_eff_cpu` — register-only xor/multiply loop: pure CPU-slot
    *     availability;
    *   - `par_eff_mem` — strided sums over a per-thread 32 MB array:
    *     aggregate memory bandwidth, the resource Spark's token-explosion
    *     and join stages actually contend on.
    *
    * The host has repeatedly degraded mid-round in ways invisible to load
    * average/steal/single-thread checks (BENCH_NOTES rounds 5–6); a 5×
    * bench inflation was observed while the CPU probe still read 0.87, so
    * the MEM number is the one to compare round-over-round before trusting
    * timings. tools/hosthealth.py is the standalone form. */
  private def hostField(): String = {
    val n = Runtime.getRuntime.availableProcessors()
    def eff(work: () => Long): Double = {
      probeSink = work() // JIT warm-up
      val t0 = System.nanoTime(); probeSink = work(); val single = System.nanoTime() - t0
      val threads = (0 until n).map(_ => new Thread(() => { probeSink = work() }))
      val t1 = System.nanoTime()
      threads.foreach(_.start()); threads.foreach(_.join())
      single.toDouble / (System.nanoTime() - t1)
    }
    def cpuWork(): Long = {
      var h = 1469598103934665603L
      var i = 0
      while (i < 200000000) { h = (h ^ i) * 1099511628211L; i += 1 }
      h
    }
    val memBytes = 32 << 20
    def memWork(): Long = {
      val arr = new Array[Long](memBytes / 8) // per-run: thread-local traffic
      var pass = 0
      var h = 0L
      while (pass < 4) {
        var i = 0
        while (i < arr.length) { arr(i) = arr(i) + i; i += 8 } // one line per 64B
        var j = 0
        while (j < arr.length) { h += arr(j); j += 8 }
        pass += 1
      }
      h
    }
    f""","host":{"cores":$n,"par_eff_cpu":${eff(cpuWork _)}%.2f,"par_eff_mem":${eff(memWork _)}%.2f}"""
  }

  /** Approximate-path recall vs the exact twins, emitted as a `"recall"` key
    * INSIDE the single JSON line (a second line would break the driver's
    * parse). Skipped when the profile's tables are missing (stress corpus
    * has no embeddings) or SPARK_GRAFT_RECALL=0; never fails the bench. */
  private def recallField(spark: SparkSession, sfDir: String): String = {
    import graft.operators.{Dedup, JaccardJoin, Similarity, WhitespaceTokenizer}
    import org.apache.spark.sql.functions.col
    if (sys.env.get("SPARK_GRAFT_RECALL").contains("0")) return ""
    if (!new java.io.File(s"$sfDir/embeddings.parquet").exists()) return ""
    try {
      def timed[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        System.err.println(f"[bench] recall/$label%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      val ws = WhitespaceTokenizer()
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      // 100 query points (vs the 5 of the oracle-checked queries) for a
      // stable estimate; same k/planes/centroid params as the registered ops
      val q = e.where(col("vec_id") < 100)
      val exactTopK = Similarity.topKExact(e, q, "vec_id", "embedding", 10)
        .persist()
      val lsh = timed("ann_lsh")(Recall.topK(exactTopK,
        Similarity.topKLsh(e, q, "vec_id", "embedding", 10, 64, planes = 6, tables = 8)))
      val ivf = timed("ann_ivf")(Recall.topK(exactTopK,
        Similarity.topKIvf(e, q, "vec_id", "embedding", 10, 16, 4)))
      val ivfKm = timed("ann_ivf_kmeans")(Recall.topK(exactTopK,
        Similarity.topKIvfKmeans(e, q, "vec_id", "embedding", 10, 16, 4, 3)))
      exactTopK.unpersist()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val exactPairs = timed("exact_pairs")(JaccardJoin
        .selfJoinDeduped(docs, "doc_id", "text", ws, 0.9)
        .select("l_doc_id", "r_doc_id").persist())
      val mh = timed("minhash_pairs")(Recall.pairs(exactPairs, "l_doc_id", "r_doc_id",
        Dedup.minHashPairs(docs, "doc_id", "text", ws, 0.9), "lid", "rid"))
      val sh = timed("simhash_pairs")(Recall.pairs(exactPairs, "l_doc_id", "r_doc_id",
        Dedup.simHashPairs(docs, "doc_id", "text", ws, 3), "lid", "rid"))
      exactPairs.unpersist()
      // incremental path: same 90/10 split as the registered rs queries;
      // the exact baseline is the token-join brute force (no prefix-filter
      // recall edge), cheap at corpus×batch scale
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
      val incoming = docs.where(col("doc_id") % 10 === 0)
      val exactRs = timed("exact_rs_pairs")(JaccardJoin
        .bruteForceRs(corpus, "doc_id", "text", incoming, "doc_id", "text", ws, 0.9)
        .persist())
      val mhRs = timed("minhash_rs_pairs")(Recall.pairs(exactRs, "l_doc_id", "r_doc_id",
        Dedup.minHashPairsRs(corpus, incoming, "doc_id", "text", ws, 0.9), "lid", "rid"))
      exactRs.unpersist()
      Api.clearCache()
      f""","recall":{"ann_lsh_at10":$lsh%.4f,"ann_ivf_at10":$ivf%.4f,"ann_ivf_kmeans_at10":$ivfKm%.4f,"minhash_pairs":$mh%.4f,"simhash_pairs":$sh%.4f,"minhash_rs_pairs":$mhRs%.4f}"""
    } catch {
      case t: Throwable =>
        System.err.println(s"[bench] recall sidecar failed: $t")
        ""
    }
  }
}
