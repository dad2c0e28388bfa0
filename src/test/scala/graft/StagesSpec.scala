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

  test("bucketed minhash index joins the incoming batch with no corpus-side exchange") {
    import graft.operators.{Dedup, WhitespaceTokenizer}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val ws = WhitespaceTokenizer()
    val corpus = (0L until 60L).map(i => (i, s"a b c d w$i x$i y$i")).toDF("id", "txt")
    val incoming = (100L until 110L).map(i => (i, s"a b c d w${i - 100} x${i - 100} y${i - 100}"))
      .toDF("id", "txt")
    Stages.writeBucketed(
      Dedup.minHashIndex(corpus, "id", "txt", ws, bands = 8, rowsPerBand = 4),
      "graft_mh_idx", "bucket", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // static plan + forced shuffle strategy, so the assertion is about the
      // bucketed corpus side's co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val pairs = Dedup.minHashPairsRsIndexed(spark.table("graft_mh_idx"),
        incoming, "id", "txt", ws, 0.8, bands = 8, rowsPerBand = 4)
      val exec = pairs.queryExecution.executedPlan
      val smjSides = exec.collect { case j: SortMergeJoinExec => Seq(j.left, j.right) }.flatten
      val corpusSides = smjSides.filter(_.toString.contains("graft_mh_idx"))
      assert(corpusSides.nonEmpty, s"expected a sort-merge join over the index:\n$exec")
      def shuffles(p: SparkPlan) = p.collect { case e: ShuffleExchangeExec => e }
      assert(corpusSides.forall(s => shuffles(s).isEmpty),
        s"corpus side of the indexed join must not shuffle:\n$exec")
      // and the join is real: the engineered near-dups come back
      assert(pairs.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_mh_idx")
    }
  }

  test("appendBucketed index maintenance: day-2 join == from-scratch index join") {
    import graft.operators.{Dedup, WhitespaceTokenizer}
    val ws = WhitespaceTokenizer()
    // day 0 corpus, day-1 admitted batch, day-2 incoming batch engineered to
    // near-dup docs from BOTH generations of the index
    val corpus = (0L until 40L).map(i => (i, s"a b c d w$i x$i y$i")).toDF("id", "txt")
    val batch1 = (100L until 120L).map(i => (i, s"p q r s w$i x$i y$i")).toDF("id", "txt")
    val batch2 = ((0L until 5L).map(i => (200L + i, s"a b c d w$i x$i z$i")) ++
      (0L until 5L).map(i => (300L + i, s"p q r s w${100 + i} x${100 + i} z$i")))
      .toDF("id", "txt")
    def idx(df: org.apache.spark.sql.DataFrame) =
      Dedup.minHashIndex(df, "id", "txt", ws, bands = 8, rowsPerBand = 4)
    def pairsOf(table: String) =
      Dedup.minHashPairsRsIndexed(spark.table(table), batch2, "id", "txt", ws,
        0.7, bands = 8, rowsPerBand = 4)
        .as[(Long, Long, Double)].collect().toSet
    def accFiles(): Int = {
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
        "graft_idx_acc")
      Option(loc.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    }
    try {
      Stages.writeBucketed(idx(corpus), "graft_idx_acc", "bucket", 8)
      val filesAfterInitial = accFiles()
      Stages.appendBucketed(idx(batch1), "graft_idx_acc", "bucket", 8)
      // file-creep bound: the append repartitions on the bucket column, so
      // one append adds AT MOST one file per bucket (fewer when the batch
      // misses buckets) — without it the writer emits one file per
      // (task × bucket) and a daily ingest reaches dozens of files per
      // bucket within days (measured in the round-9 rehearsal)
      assert(accFiles() - filesAfterInitial <= 8,
        s"one append must add <= nBuckets files, went $filesAfterInitial -> ${accFiles()}")
      Stages.writeBucketed(idx(corpus.unionByName(batch1)), "graft_idx_full", "bucket", 8)
      val viaAppend = pairsOf("graft_idx_acc")
      val viaFull = pairsOf("graft_idx_full")
      assert(viaAppend.nonEmpty, "engineered near-dups must match")
      // matches must span both index generations, or the test proves nothing
      assert(viaAppend.exists(_._1 < 100L) && viaAppend.exists(_._1 >= 100L),
        s"expected matches against day-0 AND day-1 rows: $viaAppend")
      assert(viaAppend === viaFull)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_idx_acc")
      spark.sql("DROP TABLE IF EXISTS graft_idx_full")
    }
  }

  test("bucketed generic-sig (hammingIndex64) join is exchange-free on the corpus side") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    def mix(i: Long): Long = {
      var z = i + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val corpus = (0L until 60L).map(i => (i, mix(i))).toDF("id", "whash")
    val incoming = (100L until 110L).map(i => (i, mix(i - 100L))).toDF("id", "whash")
    Stages.writeBucketed(
      Dedup.hammingIndex64(corpus, "id", "whash"), "graft_h64_idx", "bucket", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val pairs = Dedup.hammingPairsRs64Indexed(spark.table("graft_h64_idx"),
        incoming, "id", "whash", 3)
      val exec = pairs.queryExecution.executedPlan
      val smjSides = exec.collect { case j: SortMergeJoinExec => Seq(j.left, j.right) }.flatten
      val corpusSides = smjSides.filter(_.toString.contains("graft_h64_idx"))
      assert(corpusSides.nonEmpty, s"expected a sort-merge join over the index:\n$exec")
      def shuffles(p: SparkPlan) = p.collect { case e: ShuffleExchangeExec => e }
      assert(corpusSides.forall(s => shuffles(s).isEmpty),
        s"corpus side of the indexed generic-sig join must not shuffle:\n$exec")
      assert(pairs.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_h64_idx")
    }
  }

  test("bucketed simhash index joins the incoming batch with no corpus-side exchange") {
    import graft.operators.{Dedup, WhitespaceTokenizer}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val ws = WhitespaceTokenizer()
    val corpus = (0L until 60L).map(i => (i, s"a b c d w$i x$i y$i")).toDF("id", "txt")
    val incoming = (100L until 110L).map(i => (i, s"a b c d w${i - 100} x${i - 100} y${i - 100}"))
      .toDF("id", "txt")
    Stages.writeBucketed(
      Dedup.simHashIndex(corpus, "id", "txt", ws), "graft_sh_idx", "bucket", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val pairs = Dedup.simHashPairsRsIndexed(spark.table("graft_sh_idx"),
        incoming, "id", "txt", ws, 3)
      val exec = pairs.queryExecution.executedPlan
      val smjSides = exec.collect { case j: SortMergeJoinExec => Seq(j.left, j.right) }.flatten
      val corpusSides = smjSides.filter(_.toString.contains("graft_sh_idx"))
      assert(corpusSides.nonEmpty, s"expected a sort-merge join over the index:\n$exec")
      def shuffles(p: SparkPlan) = p.collect { case e: ShuffleExchangeExec => e }
      assert(corpusSides.forall(s => shuffles(s).isEmpty),
        s"corpus side of the indexed simhash join must not shuffle:\n$exec")
      assert(pairs.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_sh_idx")
    }
  }

  test("incrementalKeepIdsIndexed admission: day-2 on appended index == from-scratch union index") {
    import graft.operators.{Dedup, WhitespaceTokenizer}
    val ws = WhitespaceTokenizer()
    val corpus = (0L until 30L).map(i => (i, s"a b c d w$i x$i y$i")).toDF("id", "txt")
    val batch1 = Seq(
      100L -> "a b c d w1 x1 y1",            // near-dup of corpus doc 1 -> dropped
      101L -> "p q r s t u v w aa bb",       // family {101, 102} -> keep 101
      102L -> "p q r s t u v w aa bb",
      103L -> "m n o j k l z0 z1 z2 z3"      // fresh -> kept (and admitted)
    ).toDF("id", "txt")
    // day-2 docs probe near-dups of the ORIGINAL corpus and of the DAY-1
    // ADMISSIONS — the appended rows must act, or the test proves nothing
    val batch2 = Seq(
      200L -> "a b c d w2 x2 y2",            // vs corpus
      201L -> "p q r s t u v w aa cc",       // vs admitted 101
      202L -> "m n o j k l z0 z1 z2 z9",     // vs admitted 103
      203L -> "f g h i j2 zz1 zz2 zz3"       // fresh
    ).toDF("id", "txt")
    def idx(df: org.apache.spark.sql.DataFrame) =
      Dedup.minHashIndex(df, "id", "txt", ws, bands = 8, rowsPerBand = 4)
    def keepVia(table: String, batch: org.apache.spark.sql.DataFrame,
                admit: Option[String] = None) =
      Dedup.incrementalKeepIdsIndexed(spark.table(table), batch, "id", "txt", ws,
        0.7, bands = 8, rowsPerBand = 4, admitTo = admit)
        .collect().map(_.getLong(0)).toSet
    try {
      Stages.writeBucketed(idx(corpus), "graft_ik_acc", "bucket", 8)
      val kept1 = keepVia("graft_ik_acc", batch1, admit = Some("graft_ik_acc"))
      assert(kept1 === Set(101L, 103L))
      // the append added EXACTLY the kept docs' index rows
      val idsInAcc = spark.table("graft_ik_acc").select("id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(idsInAcc === (0L until 30L).toSet ++ kept1)
      val keptDocs = batch1.where(col("id").isin(kept1.toSeq: _*))
      Stages.writeBucketed(idx(corpus.unionByName(keptDocs)), "graft_ik_full", "bucket", 8)
      val viaAppend = keepVia("graft_ik_acc", batch2)
      val viaFull = keepVia("graft_ik_full", batch2)
      assert(viaAppend === viaFull, "appended index must behave as the from-scratch union")
      assert(viaAppend === Set(203L),
        s"day-2 must drop vs corpus AND vs day-1 admissions, kept $viaAppend")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ik_acc")
      spark.sql("DROP TABLE IF EXISTS graft_ik_full")
    }
  }

  test("multi-day ingest loop: 5 admitTo days + day-3 compaction == direct on the accumulated corpus") {
    // The production lifecycle end-to-end (round-8 verdict gap #4): day 1..5
    // admissions against ONE durable index, compacting after day 3, each
    // day's keep-set checked against the DIRECT (non-indexed) computation
    // over the accumulated corpus. Batches are disjoint and each day probes
    // (a) the original corpus, (b) a PRIOR day's admission, (c) a
    // within-batch dup family, (d) fresh content — so a stale index, a
    // broken append, or a row-corrupting compaction all surface as a
    // keep-set mismatch on some day.
    import graft.operators.{Dedup, WhitespaceTokenizer}
    val ws = WhitespaceTokenizer()
    def tableFiles(table: String): Int = {
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
      Option(loc.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    }
    val corpus0 = (0L until 30L).map(i => (i, s"a b c d w$i x$i y$i")).toDF("id", "txt")
    // every day's tokens are day-suffixed, so cross-day near-dup structure
    // exists ONLY where constructed; the three dup probes are IDENTICAL
    // copies (jaccard 1.0 — every band matches), so expected keep-sets do
    // not depend on LSH recall luck
    def freshDoc(d: Int) = s"fresh$d f$d g$d h$d i$d j$d k$d l$d m$d n$d"
    def dayBatch(d: Int): org.apache.spark.sql.DataFrame = Seq(
      (1000L * d + 0) -> s"a b c d w$d x$d y$d",  // identical to corpus doc d
      (1000L * d + 1) -> freshDoc(d - 1),          // identical to day d-1 admission (fresh on day 1)
      (1000L * d + 2) -> s"batchdup$d n$d o$d p$d q$d r$d s$d t$d u$d", // family {2,3} -> keep 2
      (1000L * d + 3) -> s"batchdup$d n$d o$d p$d q$d r$d s$d t$d u$d",
      (1000L * d + 4) -> freshDoc(d)               // fresh -> admitted
    ).toDF("id", "txt")
    try {
      Stages.writeBucketed(
        Dedup.minHashIndex(corpus0, "id", "txt", ws, bands = 8, rowsPerBand = 4),
        "graft_md_acc", "bucket", 8)
      var accumulated = corpus0
      for (d <- 1 to 5) {
        val batch = dayBatch(d)
        val kept = Dedup.incrementalKeepIdsIndexed(spark.table("graft_md_acc"),
            batch, "id", "txt", ws, 0.7, bands = 8, rowsPerBand = 4,
            admitTo = Some("graft_md_acc"))
          .collect().map(_.getLong(0)).toSet
        val direct = Dedup.incrementalKeepIds(accumulated, batch, "id", "txt",
            ws, 0.7, bands = 8, rowsPerBand = 4)
          .collect().map(_.getLong(0)).toSet
        assert(kept === direct, s"day $d: indexed keep-set != direct on accumulated corpus")
        val expectFresh = Set(1000L * d + 2, 1000L * d + 4) ++
          (if (d == 1) Set(1000L + 1) else Set.empty) // day 1 has no prior admission to match
        assert(kept === expectFresh, s"day $d kept $kept, expected $expectFresh")
        accumulated = accumulated
          .unionByName(batch.where(col("id").isin(kept.toSeq: _*)))
          .localCheckpoint(true) // keep the direct-side lineage flat across days
        if (d == 3) {
          val filesBefore = tableFiles("graft_md_acc")
          assert(filesBefore > 8, s"3 appends into 8 buckets must leave >8 files, got $filesBefore")
          Stages.compactBucketed(spark, "graft_md_acc", "bucket", 8)
          assert(tableFiles("graft_md_acc") === 8,
            "day-3 compaction must leave one file per bucket")
        }
      }
      // after 5 days the index holds exactly original corpus + all admissions
      val idsInAcc = spark.table("graft_md_acc").select("id").distinct()
        .collect().map(_.getLong(0)).toSet
      val expected = (0L until 30L).toSet ++
        (1 to 5).flatMap(d => Set(1000L * d + 2, 1000L * d + 4)) + 1001L
      assert(idsInAcc === expected, "index contents after day 5 must be corpus + admissions")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_md_acc")
      spark.sql("DROP TABLE IF EXISTS graft_md_acc__compact")
    }
  }

  test("auto-compaction: 18-day admission loop self-compacts at the threshold, keep-sets unchanged") {
    // appendBucketed(autoCompactAt) fires compactBucketed when average
    // files/bucket crosses the threshold — the admission loop maintains
    // itself instead of relying on a job it never calls. Drive 18 simulated
    // days through the REAL MinHash admission operator with a low threshold
    // (autoCompactAt = 3, admitBuckets = 2) so the crossing happens several
    // times inside the loop, and assert (a) the on-disk file count matches a
    // step-by-step simulation of the promised trigger rule on every day —
    // compaction fires exactly when promised, never early, never late — and
    // (b) every day's keep-set is the constructed expectation (compaction
    // changes no admission decision).
    import graft.operators.{Dedup, WhitespaceTokenizer}
    val ws = WhitespaceTokenizer()
    def tableFiles(table: String): Long = Stages.dataFileCount(spark, table)
    val corpus0 = (0L until 12L).map(i => (i, s"a b c d w$i x$i y$i"))
      .toDF("id", "txt").coalesce(1)
    def dayBatch(d: Int): org.apache.spark.sql.DataFrame = Seq(
      (1000L * d + 0) -> s"a b c d w${d % 12} x${d % 12} y${d % 12}", // dups corpus doc
      (1000L * d + 4) -> s"fresh$d f$d g$d h$d i$d j$d k$d l$d m$d n$d" // admitted
    ).toDF("id", "txt").coalesce(1)
    try {
      Stages.writeBucketed(
        Dedup.minHashIndex(corpus0, "id", "txt", ws, bands = 8, rowsPerBand = 4),
        "graft_ac_idx", "bucket", 2)
      var expectedFiles = tableFiles("graft_ac_idx")
      var compactions = 0
      for (d <- 1 to 18) {
        val kept = Dedup.incrementalKeepIdsIndexed(spark.table("graft_ac_idx"),
            dayBatch(d), "id", "txt", ws, 0.7, bands = 8, rowsPerBand = 4,
            admitTo = Some("graft_ac_idx"), admitBuckets = 2, autoCompactAt = 3)
          .collect().map(_.getLong(0)).toSet
        assert(kept === Set(1000L * d + 4), s"day $d keep-set")
        // simulate the promised rule: append adds one file per bucket; if
        // the total then exceeds threshold × buckets, compaction rewrites
        // to one file per bucket
        expectedFiles += 2
        if (expectedFiles > 3L * 2) { expectedFiles = 2; compactions += 1 }
        assert(tableFiles("graft_ac_idx") === expectedFiles,
          s"day $d files: compaction must fire exactly at the promised crossing")
      }
      assert(compactions >= 3, s"18 days at threshold 3 must compact repeatedly, got $compactions")
      // the index still holds exactly corpus + all 18 admissions
      val ids = spark.table("graft_ac_idx").select("id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(ids === (0L until 12L).toSet ++ (1 to 18).map(d => 1000L * d + 4).toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ac_idx")
      spark.sql("DROP TABLE IF EXISTS graft_ac_idx__compact")
      Api.clearCache()
    }
  }

  test("compactBucketed: fewer files, identical rows, join still exchange-free") {
    val rows = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    def tableFiles(table: String): Int = {
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
      Option(loc.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    }
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Stages.writeBucketed(rows.where(col("k") < 400), "graft_cpt", "k", 4)
      Stages.appendBucketed(rows.where(col("k") >= 400 && col("k") < 700), "graft_cpt", "k", 4)
      Stages.appendBucketed(rows.where(col("k") >= 700), "graft_cpt", "k", 4)
      val before = spark.table("graft_cpt").collect().map(_.getLong(0)).toSet
      val filesBefore = tableFiles("graft_cpt")
      assert(filesBefore > 4, s"three writes into 4 buckets must leave >4 files, got $filesBefore")
      Stages.compactBucketed(spark, "graft_cpt", "k", 4)
      assert(tableFiles("graft_cpt") === 4, "compaction must leave one file per bucket")
      assert(spark.table("graft_cpt").collect().map(_.getLong(0)).toSet === before)
      assert(!spark.catalog.tableExists("graft_cpt__compact"), "scratch table must be dropped")
      // the property compaction exists to preserve: a same-bucketing join
      // still plans with no exchange on either side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Stages.writeBucketed(rows, "graft_cpt_probe", "k", 4)
      val joined = spark.table("graft_cpt").join(spark.table("graft_cpt_probe"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"post-compaction bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_cpt")
      spark.sql("DROP TABLE IF EXISTS graft_cpt__compact")
      spark.sql("DROP TABLE IF EXISTS graft_cpt_probe")
    }
  }

  test("appendBucketed with no catalog entry routes through writeBucketed's cleanup") {
    // simulate the orphaned-location case: a warehouse directory exists but
    // the (in-memory) catalog has no entry — the documented two-sessions-in-
    // a-row failure appendBucketed previously hit with LOCATION_ALREADY_EXISTS
    val rows = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, "graft_orphan")
    try {
      assert(!spark.catalog.tableExists("graft_orphan"))
      loc.mkdirs()
      val junk = new java.io.File(loc, "stale-file")
      java.nio.file.Files.write(junk.toPath, "stale".getBytes)
      Stages.appendBucketed(rows, "graft_orphan", "k", 4)
      assert(spark.table("graft_orphan").count() === 100L)
      assert(!junk.exists(), "the stale pre-existing file must have been cleaned up")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_orphan")
    }
  }
}
