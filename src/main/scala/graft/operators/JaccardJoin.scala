package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PersistTracker.TrackedPersist

/**
 * Set-similarity join under a Jaccard threshold, prefix-filtering family
 * (length filter + prefix filter + positional filter + exact verification).
 *
 * Semantics mirror the reference pipeline
 * (reference: py_duckdb/similarity_join/join/jaccard_join.py:9-469) re-expressed as
 * lazy Spark DataFrame stages so Catalyst plans the physical join/agg strategy:
 *
 *   tokenize -> document frequency -> rarest-first position -> prefix selection
 *            -> candidate generation (equi-join on token + theta filters)
 *            -> verification (suffix overlap count + exact threshold test)
 *
 * Where the reference materializes every stage as a DuckDB temp table, we keep the
 * plan declarative and only `persist()` the one intermediate every variant reads
 * multiple times (`tkdf`, read by both candidate generation and verification —
 * reference jaccard_join.py:154,176). Everything else pipelines inside whole-stage
 * codegen.
 *
 * Scale notes (target: 1000-executor cluster, ~100 TB):
 *   - The candidate join is an equi-join on `token` with theta post-filters; Catalyst
 *     picks shuffled-hash/sort-merge on the equi key and evaluates the length/prefix/
 *     positional conditions as join residuals — no custom strategy needed.
 *   - Token skew (very frequent tokens) is the known hot spot; the rarest-first
 *     prefix ordering already removes the most frequent tokens from indexing
 *     prefixes, and AQE skew-join splitting handles the residue. Enable
 *     `spark.sql.adaptive.skewJoin.enabled` (on by default in Spark 4).
 *   - Document-frequency tables are `groupBy(token).count()` — map-side partial
 *     aggregation keeps the shuffle proportional to distinct tokens, not token rows.
 *   - The two driver-side `count()` actions in the R×S variant (widow placeholder and
 *     index-side choice) are the reference's manual adaptive planning
 *     (jaccard_join.py:238-245,341-353); they run over persisted token tables so the
 *     data is scanned once.
 *
 * Float semantics: all threshold comparisons keep the reference's exact operand
 * order, e.g. `count(*) + pfxOverlap - 1 >= ((L.len + R.len) * t / (1+t))`
 * (reference jaccard_join.py:183 and the float-sensitivity note in test.ipynb
 * cell 23), so results hash-match a DuckDB oracle computing in DOUBLE.
 */
object JaccardJoin {

  /** J1: entry-point dispatch — self-join iff `right` is empty or the same table
    * (reference jaccard_join.py:9-33). */
  def join(
      left: DataFrame, lKey: String, lJoin: String,
      right: Option[DataFrame], rKey: String, rJoin: String,
      tokenizer: Tokenizer, threshold: Double,
      lOutPrefix: String = "l_", rOutPrefix: String = "r_"): DataFrame =
    right match {
      case None => selfJoin(left, lKey, lJoin, tokenizer, threshold, lOutPrefix, rOutPrefix)
      case Some(r) => rsJoin(left, lKey, lJoin, r, rKey, rJoin, tokenizer, threshold, lOutPrefix, rOutPrefix)
    }

  /**
   * Per-record token arrays in rarest-first position order: `arr[pos-1]` is
   * the token ranked at `pos` (positions are the window's consecutive
   * `row_number`, so `collect_list(struct(pos, token))` sorted by pos
   * reconstructs the exact ranked sequence), plus the record's token count.
   */
  private def posArrays(tkdf: DataFrame): DataFrame =
    tkdf.groupBy("id").agg(
      transform(sort_array(collect_list(struct(col("pos"), col("token")))),
        x => x.getField("token")).as("arr"),
      first(col("len")).as("len"))

  /**
   * Suffix verification over position arrays — semantically identical to the
   * reference's 3-way join + GROUP BY + HAVING (jaccard_join.py:168-188) but
   * O(|suffix|) per candidate with no row explosion (the relational form
   * streamed 162M joined rows for the sf0.1 documents self-join; this runs the
   * same verification in a few seconds):
   *
   *   - `cnt` = number of (L-row, R-row) token matches with `L.pos >= LmaxPos
   *     AND R.pos >= RmaxPos` = matches between the two position slices; for
   *     duplicate-free slices that is `array_intersect`, and slices holding
   *     duplicate tokens (the delimiter tokenizer's distinct-before-lowercase
   *     quirk) take the exact multiset product fold instead;
   *   - a pair only survives when `cnt >= 1` — in the reference the GROUP only
   *     exists if the verification join matched at least one row (LmaxPos and
   *     RmaxPos can come from different prefix tokens, so zero suffix matches
   *     is possible and must DROP the pair even when `pfxOverlap - 1` alone
   *     would clear the bound — reachable for t < sqrt(2)-1);
   *   - the HAVING bound keeps the reference's exact operand order.
   *
   * `cand` must carry (<lv>, <rv>, <lMax>, <rMax>, pfxOverlap); returns one
   * row per surviving pair with the original `lv`/`rv` columns.
   */
  private def verifySuffix(
      cand: DataFrame, lArrs: DataFrame, rArrs: DataFrame,
      lv: String, rv: String, lMax: String, rMax: String,
      threshold: Double, assumeDupFree: Boolean = false): DataFrame = {
    val t = lit(threshold)
    val onePlusT = lit(1d + threshold)
    val joined = cand
      .join(lArrs.select(col("id").as(lv), col("arr").as("larr"), col("len").as("llen")), lv)
      .join(rArrs.select(col("id").as(rv), col("arr").as("rarr"), col("len").as("rlen")), rv)
    // graft_suffix_overlap: one fused native kernel per candidate — multiset
    // overlap of the two suffixes directly from the arrays + start positions.
    // Replaces two `slice` copies + `array_intersect` (set path) and the
    // per-pair dup probes + INTERPRETED higher-order fold (bag path); for
    // duplicate-free suffixes multiset == set count, so one kernel serves
    // both tokenizer classes with the reference's join-count semantics.
    // (`assumeDupFree` is retained for call-site documentation; the kernel
    // no longer needs the distinction.)
    val cnt = org.apache.spark.sql.GraftExpressionBridge.column(
      graft.expressions.SuffixOverlapCount(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("larr")),
        org.apache.spark.sql.GraftExpressionBridge.expression(col("rarr")),
        org.apache.spark.sql.GraftExpressionBridge.expression(col(lMax).cast("int")),
        org.apache.spark.sql.GraftExpressionBridge.expression(col(rMax).cast("int"))))
    joined
      .withColumn("cnt", cnt)
      .where(col("cnt") >= 1 &&
        col("cnt") + col("pfxOverlap") - lit(1) >=
          ((col("llen") + col("rlen")) * t / onePlusT))
      .select(col(lv), col(rv))
  }

  /** J2: brute-force dispatch (reference jaccard_join.py:36-60). */
  def bruteForce(
      left: DataFrame, lKey: String, lJoin: String,
      right: Option[DataFrame], rKey: String, rJoin: String,
      tokenizer: Tokenizer, threshold: Double,
      lOutPrefix: String = "l_", rOutPrefix: String = "r_"): DataFrame =
    right match {
      case None => bruteForceSelf(left, lKey, lJoin, tokenizer, threshold, lOutPrefix, rOutPrefix)
      case Some(r) => bruteForceRs(left, lKey, lJoin, r, rKey, rJoin, tokenizer, threshold, lOutPrefix, rOutPrefix)
    }

  // ---------------------------------------------------------------------------
  // Self-join (reference jaccard_join.py:111-209)
  // ---------------------------------------------------------------------------

  /**
   * Filtered self-join. Output: `(<lOutPrefix><keyAttr>, <rOutPrefix><keyAttr>)`,
   * pair orientation given by the canonical composite key `concat(len,'_',id)`
   * compared as a STRING (reference jaccard_join.py:135,155 — deliberately
   * lexicographic, replicated exactly so oracle output orientation matches).
   */
  def selfJoin(
      table: DataFrame, keyAttr: String, joinAttr: String,
      tokenizer: Tokenizer, threshold: Double,
      lOutPrefix: String = "l_", rOutPrefix: String = "r_"): DataFrame = {
    val t = lit(threshold)
    val onePlusT = lit(1d + threshold)

    val tokens = tokenizer.tokenize(table, keyAttr, joinAttr)

    // J4: document frequency (jaccard_join.py:126-130)
    val dfreq = tokens.groupBy("token").agg(count(lit(1)).as("df"))

    // J5-J7: rarest-first position + composite canonical key (jaccard_join.py:131-137)
    val w = Window.partitionBy("id").orderBy("df", "token")
    val tkdf = tokens.join(dfreq, "token")
      .select(
        col("id"), col("len"), col("token"),
        row_number().over(w).cast("long").as("pos"),
        concat(col("len").cast("string"), lit("_"), col("id").cast("string")).as("l_id"))
      .persistTracked

    val L = tkdf.alias("L")
    val R = tkdf.alias("R")

    // J10/J11/J13: candidate generation with inlined prefix selections
    // (jaccard_join.py:147-166)
    val candCond =
      col("L.l_id") < col("R.l_id") &&
      col("L.token") === col("R.token") &&
      // length filter (one-sided, as the reference)
      col("L.len") >= col("R.len") * t &&
      // indexing prefix on L
      (col("L.len") - col("L.pos") + lit(1)) >= (col("L.len") * lit(2) * t / onePlusT) &&
      // probing prefix on R
      (col("R.len") - col("R.pos") + lit(1)) >= (col("R.len") * t) &&
      // positional filter
      least(col("L.len") - col("L.pos") + lit(1), col("R.len") - col("R.pos") + lit(1)) >=
        ((col("L.len") + col("R.len")) * t / onePlusT)

    val cand = L.join(R, candCond)
      .groupBy(col("L.id").as("Lid"), col("R.id").as("Rid"))
      .agg(
        max(col("L.pos")).as("LmaxPos"),
        max(col("R.pos")).as("RmaxPos"),
        count(lit(1)).as("pfxOverlap"))

    // J14: verification — count suffix overlap from the last prefix match onward
    // (inclusive, hence the `- 1`; reference jaccard_join.py:168-188)
    val c = cand.alias("c")
    L.join(c, col("c.Lid") === col("L.id") && col("L.pos") >= col("c.LmaxPos"))
      .join(R,
        col("c.Rid") === col("R.id") &&
        col("L.token") === col("R.token") &&
        col("R.pos") >= col("c.RmaxPos"))
      .select(
        col("L.id").as("lid"), col("R.id").as("rid"),
        col("L.len").as("llen"), col("R.len").as("rlen"),
        col("c.pfxOverlap").as("pfxOverlap"))
      .groupBy("lid", "rid", "llen", "rlen", "pfxOverlap")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") + col("pfxOverlap") - lit(1) >=
        ((col("llen") + col("rlen")) * t / onePlusT))
      .select(
        col("lid").as(lOutPrefix + keyAttr),
        col("rid").as(rOutPrefix + keyAttr))
  }

  /** J15: brute-force self-join oracle (reference jaccard_join.py:190-201). */
  def bruteForceSelf(
      table: DataFrame, keyAttr: String, joinAttr: String,
      tokenizer: Tokenizer, threshold: Double,
      lOutPrefix: String = "l_", rOutPrefix: String = "r_"): DataFrame = {
    val t = lit(threshold)
    val onePlusT = lit(1d + threshold)
    val tokens = tokenizer.tokenize(table, keyAttr, joinAttr)
      .persistTracked
    val L = tokens.alias("L")
    val R = tokens.alias("R")
    L.join(R, col("L.token") === col("R.token") && col("L.id") < col("R.id"))
      .select(col("L.id").as("lid"), col("L.len").as("llen"),
        col("R.id").as("rid"), col("R.len").as("rlen"))
      .groupBy("lid", "llen", "rid", "rlen")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= ((col("llen") + col("rlen")) * t / onePlusT))
      .select(
        col("lid").as(lOutPrefix + keyAttr),
        col("rid").as(rOutPrefix + keyAttr))
  }

  // ---------------------------------------------------------------------------
  // Value-deduplicated variants — identical output, built for duplicated keys
  // ---------------------------------------------------------------------------

  /**
   * Self-join with VALUE DEDUPLICATION: runs the whole pipeline over the
   * DISTINCT join-attribute values, then expands value-level matches back to
   * record pairs. Output is IDENTICAL to [[selfJoin]]:
   *
   *   - document frequency is weighted by value multiplicity (`sum(w)`), so df
   *     and therefore per-record token order `(df, token)` match the
   *     record-level pipeline exactly;
   *   - every filter (length/prefix/positional) and the verification bound
   *     depend only on value-level quantities (len, pos, token), so a record
   *     pair qualifies iff its ORIENTED value pair qualifies;
   *   - the reference's canonical gate `L.l_id < R.l_id` (string compare of
   *     `concat(len,'_',id)`, jaccard_join.py:155) picks the orientation per
   *     RECORD pair, so value-level candidates/matches are computed in BOTH
   *     orientations (the one-sided prefix filters are asymmetric!) and the
   *     gate is applied at expansion time.
   *
   * Cost collapses from O(Σ_token df_rec²) to O(Σ_token df_val²): corpora with
   * heavy value duplication (the common case at 100 TB — urls, names, titles)
   * see orders-of-magnitude smaller candidate joins; the expansion is two
   * cheap value-equi joins.
   */
  def selfJoinDeduped(
      table: DataFrame, keyAttr: String, joinAttr: String,
      tokenizer: Tokenizer, threshold: Double,
      lOutPrefix: String = "l_", rOutPrefix: String = "r_",
      saltBuckets: Int = 8, hotTokenDf: Int = 10000,
      maxSaltBuckets: Int = 64, passes: Int = 1): DataFrame =
    selfJoinDedupedPrepared(prepareSelfDeduped(table, keyAttr, joinAttr, tokenizer),
      threshold, lOutPrefix, rOutPrefix, saltBuckets, hotTokenDf, maxSaltBuckets,
      passes)

  /**
   * The threshold-INDEPENDENT state of [[selfJoinDeduped]]'s pipeline:
   * distinct values + multiplicities, the ranked value-level token table, and
   * the per-value position arrays. Document frequency and rarest-first
   * position depend only on (table, joinAttr, tokenizer) — never on the
   * threshold — so a threshold sweep (the reference's precision/recall sweep,
   * test.ipynb cells 41-74) can tokenize ONCE and run every threshold against
   * the same persisted frames via [[selfJoinDedupedPrepared]]. All three
   * frames are persist-tracked; `Api.clearCache()` releases them.
   */
  final case class SelfJoinPrep private[operators] (
      table: DataFrame, keyAttr: String, joinAttr: String,
      emitsDistinctTokens: Boolean,
      vals: DataFrame, vtkdf: DataFrame, varr: DataFrame)

  /** Build [[SelfJoinPrep]] — the tokenize/df/rank stages shared by every
    * threshold. See [[selfJoinDeduped]] for the stage semantics. */
  def prepareSelfDeduped(
      table: DataFrame, keyAttr: String, joinAttr: String,
      tokenizer: Tokenizer): SelfJoinPrep = {
    // Compact 128-bit BINARY surrogate per distinct value: every downstream
    // shuffle row (tokens, prefixes, candidates, verification) keys on the
    // 16-byte digest instead of the raw value — on long-text corpora
    // (documents) the raw-value key made each token row carry the whole
    // document and a single sf0.1 run shuffled >40 GB to disk.
    val vals = table.select(col(joinAttr).as("value"))
      .groupBy("value").agg(count(lit(1)).as("w"))
      .withColumn("vid", unhex(md5(col("value"))))
      .persistTracked

    // value-level tokens keyed by the surrogate
    val vtokens = tokenizer.tokenize(vals.select(col("vid"), col("value")), "vid", "value")

    // multiplicity-weighted document frequency == record-level df (drives the
    // reference's rarest-first ordering); vdf = VALUE-level df, whose square
    // bounds the token's candidate fan-out — the hot-token salting signal
    // (weighted df would overstate fan-out by the duplication factor²)
    val dfreq = vtokens
      .join(vals.select(col("vid").as("id"), col("w")), "id")
      .groupBy("token").agg(sum("w").as("df"), count(lit(1)).as("vdf"))

    val w = Window.partitionBy("id").orderBy("df", "token")
    val vtkdf = vtokens.join(dfreq, "token")
      .select(col("id"), col("len"), col("token"), col("df"), col("vdf"),
        row_number().over(w).cast("long").as("pos"))
      .persistTracked

    // position arrays persist too: verification scans this frame TWICE per
    // action (L and R side of the verify join) and it is the frame AQE
    // broadcasts — rebuilding the aggregation + broadcast from scratch every
    // action was the measured ~1.5-2.3 s warm floor on the sub-second
    // part/ws/t=0.3 flagship (BENCH_NOTES round 6)
    SelfJoinPrep(table, keyAttr, joinAttr, tokenizer.emitsDistinctTokens,
      vals, vtkdf, posArrays(vtkdf).persistTracked)
  }

  /** Threshold-dependent tail of [[selfJoinDeduped]] over a shared
    * [[SelfJoinPrep]]: prefix selection, banded/salted candidate generation,
    * verification, record expansion. Output is identical to
    * [[selfJoinDeduped]] at the same threshold.
    *
    * `passes = P > 1` is the BOUNDED-FOOTPRINT mode for the low-threshold
    * candidate-explosion regime (t ≤ 0.5), where the candidate join's
    * shuffle can exceed a node's scratch disk (measured: sf10 t=0.5 needs
    * ~76 GB shuffle vs 79 GB scratch — a resource wall, not a plan defect):
    * the PROBING prefix stream partitions by `pmod(xxhash64(id), P)` and the
    * candidate+verify pipeline runs once per slice, each pass's verified
    * value pairs materialized to a lineage-cut leaf before the next starts —
    * so peak in-flight shuffle is ~1/P of the single-pass join, traded for
    * P re-reads of the (persisted) indexed side. Output is INVARIANT in P:
    * every candidate pair's probing value lands in exactly one slice, the
    * per-pair prefix stats aggregate within that slice alone, and
    * verification is per-pair — spec-pinned (JaccardJoinSpec). */
  /** Pass-slice materialization for the bounded-footprint mode, selected by
    * `spark.graft.passes.spill`:
    *   - `parquet` (default): [[Checkpoints.cutToParquet]] — slices
    *     accumulate as compressed columnar files, not executor blocks.
    *     Measured at sf10 t=0.5, localCheckpoint retained ~3.6 GB of rdd
    *     blocks per pass (the output itself — a monotone floor that consumed
    *     the scratch the passes knob freed); the parquet leaf holds the same
    *     rows in ~1/4 the bytes and, on a durable warehouse, survives
    *     executor loss.
    *   - `local`: [[Checkpoints.cut]] — no filesystem traffic; right when
    *     slices are small or the warehouse is slow.
    * The nanoTime suffix keeps repeated invocations in one session from
    * overwriting a predecessor's still-referenced slice files. */
  private def cutSlice(df: DataFrame, tag: String): DataFrame = {
    val mode =
      try df.sparkSession.conf.get("spark.graft.passes.spill", "parquet")
      catch { case scala.util.control.NonFatal(_) => "parquet" }
    mode match {
      case "parquet" =>
        Checkpoints.cutToParquet(df, s"${tag}_${java.lang.Long.toHexString(System.nanoTime())}")
      case "local" => Checkpoints.cut(df)
      case other => sys.error(
        s"spark.graft.passes.spill must be 'parquet' or 'local', got '$other'")
    }
  }

  def selfJoinDedupedPrepared(
      prep: SelfJoinPrep, threshold: Double,
      lOutPrefix: String = "l_", rOutPrefix: String = "r_",
      saltBuckets: Int = 8, hotTokenDf: Int = 10000,
      maxSaltBuckets: Int = 64, passes: Int = 1): DataFrame = {
    require(passes >= 1, "passes must be >= 1 (1 = single-pass)")
    // hotTokenDf is a VALUE-level df calibration point: a token at vdf =
    // hotTokenDf (fan-out hotTokenDf² = 1e8 at the defaults) is split
    // saltBuckets ways, and every token's salt width scales with its own
    // fan-out from there — ceil(saltBuckets·(vdf/hotTokenDf)²), capped at
    // maxSaltBuckets — bounding per-bucket candidate work at
    // hotTokenDf²/saltBuckets rows (1.25e7 ≈ seconds of join work at the
    // defaults) no matter how degenerate the token. Tune hotTokenDf DOWN on
    // large clusters where per-core fan-out budgets are smaller.
    require(saltBuckets >= 1, "saltBuckets must be >= 1 (1 disables salting)")
    require(maxSaltBuckets >= saltBuckets, "maxSaltBuckets must be >= saltBuckets")
    val t = lit(threshold)
    val onePlusT = lit(1d + threshold)
    val vals = prep.vals
    val vtkdf = prep.vtkdf

    def idxPfx(d: DataFrame) =
      d.where(col("len") - col("pos") + lit(1) >= (col("len") * lit(2) * t / onePlusT))
    def prbPfx(d: DataFrame) =
      d.where(col("len") - col("pos") + lit(1) >= (col("len") * t))

    // Ordered value pairs, BOTH orientations, self pairs included — the record
    // gate below decides which orientation applies to each record pair.
    //
    // Two output-preserving partitioning tricks on the candidate equi key:
    //
    //   1. LENGTH-BAND equi key: with lengths confined to a factor-(1/t) window,
    //      band(len) = floor(ln(len)/ln(1/t)) lets the join hash on
    //      (token, band) instead of token alone. The probing side explodes to
    //      every band its admissible partner lengths [floor(len*t), ceil(len/t)]
    //      can occupy (floor/ceil make the FP boundaries conservative; the
    //      exact filters above stay as residuals). The indexing side has ONE
    //      band, so no pair is emitted twice. On skewed corpora (tiny shared
    //      vocabularies — the documents table) this splits each hot token's
    //      n_idx x n_prb blowup across length bands: measured 31M -> 17M joined
    //      rows at sf0.1 t=0.9.
    //   2. ID-HASH SALT: banding degenerates on uniform-length corpora (every
    //      record in one band — SCALE.md "Measured"), leaving one partition to
    //      compute a hot key's whole n_idx x n_prb product. Salting the
    //      indexing side by hash(id) % S and replicating the probing side to
    //      all S salts splits every hot bucket S ways. Each (L,R) pair meets
    //      in EXACTLY one partition (the one with L's salt), so candidates and
    //      per-pair prefix stats are unchanged; the cost is S x the probing
    //      prefix's shuffle rows — the small side of the fan-out by
    //      construction. S is PER-TOKEN and fan-out-proportional: a fixed
    //      8-way split leaves a vdf=4·hotTokenDf token with 2·hotTokenDf²
    //      rows in ONE bucket (measured as a 42 s straggler task on the 8×
    //      stress corpus), so each token gets
    //      S = ceil(saltBuckets · (vdf/hotTokenDf)²) buckets, capped at
    //      maxSaltBuckets — per-bucket work is bounded by
    //      hotTokenDf²·saltBuckets⁻¹ no matter how hot the token, and the
    //      probe-replication cost stays proportional to the work it splits.
    //      Both sides derive S from the SAME vdf column, so the widths agree
    //      per token and the exactly-once-per-pair invariant is untouched.
    val lnInvT = math.log(1d / threshold)
    def bandOf(len: Column): Column =
      if (threshold >= 1d) len else floor(log(len.cast("double")) / lit(lnInvT)).cast("long")
    // `lenkey` is the len part of the reference's canonical record key
    // `concat(len,'_',id)` compared as a STRING: when two values' lenkeys
    // differ, the first differing character sits inside the len digits or at
    // the '_' separator, so EVERY record pair's orientation is already decided
    // — generating the (L,R) orientation with lenkey(L) > lenkey(R) is pure
    // waste (its expansion gate can never pass). Equal lenkeys (same len) keep
    // both orientations: record ids decide there.
    val lenkey = concat(col("len").cast("string"), lit("_"))
    // df-ADAPTIVE salting: the width formula itself decides when to split —
    // ceil(saltBuckets·(vdf/hotTokenDf)²) is ≥ 2 exactly when the token's
    // fan-out vdf² crosses the per-bucket budget hotTokenDf²/saltBuckets
    // (1.25e7 rows at the defaults), and 1 (= unsalted, salt 0 both sides)
    // below it, so mild corpora see near-zero probe replication while every
    // over-budget token splits — there is deliberately NO separate
    // activation threshold: gating at vdf ≥ hotTokenDf left vdf≈6-9k tokens
    // unsalted with 4-8e7-row buckets, reproducing the 42 s straggler the
    // salt exists to kill (measured, 8× stress corpus). Both sides derive
    // the width from the SAME vdf column through identical deterministic
    // double math, so the widths agree per token. saltBuckets == 1 keeps
    // its documented meaning: salting off.
    val nsalt =
      if (saltBuckets == 1) lit(1L)
      else least(lit(maxSaltBuckets.toLong),
        ceil(lit(saltBuckets.toDouble)
          * pow(col("vdf").cast("double") / lit(hotTokenDf.toDouble), 2d)))
    val L0 = idxPfx(vtkdf).withColumn("band", bandOf(col("len")))
      .withColumn("lenkey", lenkey)
      .withColumn("salt", pmod(xxhash64(col("id")), nsalt))
    // one candidate+verify slice: `probeSlice` restricts the PROBING side to
    // a pass's share of the value ids (None = everything, the single-pass
    // plan unchanged). A value pair's R id decides its slice, so slices
    // partition the pair space exactly.
    //
    // Multi-pass slices pin the candidate join's parallelism with an
    // explicit NUMBERED repartition on the join's equi keys (the FuzzyJoin
    // rule): the sliced probe prefix is small in BYTES but huge in join
    // FAN-OUT, and AQE coalesces by input bytes — measured at sf10 it folded
    // each pass's join+partial-agg onto 34 tasks with a 36 GB sort spill PER
    // PASS, which is exactly the scratch the mode exists to avoid. A
    // user-numbered repartition forbids the coalesce, and hashing on exactly
    // the join keys is reused by the join (no second exchange).
    val nPart = prep.table.sparkSession.sessionState.conf.numShufflePartitions
    def pinned(d: DataFrame): DataFrame =
      if (passes == 1) d
      else d.repartition(nPart, col("token"), col("band"), col("salt"))
    val L = pinned(L0).alias("L")
    def vmOfSlice(probeSlice: Option[Column]): DataFrame = {
      val prb0 = prbPfx(vtkdf)
      val R = pinned(probeSlice.fold(prb0)(prb0.where)
        .withColumn("band",
          if (threshold >= 1d) col("len")
          else explode(sequence(
            bandOf(greatest(floor(col("len") * t), lit(1d))),
            bandOf(ceil(col("len") / t)))))
        .withColumn("lenkey", lenkey)
        .withColumn("salt", explode(sequence(lit(0L), nsalt - lit(1L)))))
        .alias("R")
      // The length filter is one-sided, exactly as the reference
      // (`L.len >= R.len * t`, jaccard_join.py:158). No mirror condition: a pair
      // with R.len < L.len*t is already rejected by the positional filter —
      // R.len - R.pos + 1 <= R.len < (L.len+R.len)*t/(1+t) exactly in that
      // region — and any hand-written mirror would be a DIFFERENT float
      // expression that could diverge from the record-level pipeline and the
      // DuckDB oracle at representational boundaries.
      val candCond =
        col("L.token") === col("R.token") &&
        col("L.band") === col("R.band") &&
        col("L.salt") === col("R.salt") &&
        col("L.lenkey") <= col("R.lenkey") &&
        col("L.len") >= col("R.len") * t &&
        least(col("L.len") - col("L.pos") + lit(1), col("R.len") - col("R.pos") + lit(1)) >=
          ((col("L.len") + col("R.len")) * t / onePlusT)
      val cand = L.join(R, candCond)
        .groupBy(col("L.id").as("Lv"), col("R.id").as("Rv"))
        .agg(max(col("L.pos")).as("LmaxPos"), max(col("R.pos")).as("RmaxPos"),
          count(lit(1)).as("pfxOverlap"))
        .alias("c")
      val varr = prep.varr
      verifySuffix(cand.toDF(), varr, varr,
          "Lv", "Rv", "LmaxPos", "RmaxPos", threshold, prep.emitsDistinctTokens)
        .select(col("Lv").as("lval"), col("Rv").as("rval"))
    }
    val vm =
      if (passes == 1) vmOfSlice(None)
      else {
        // materialize the shared persisted frames BEFORE the first shuffle
        // snapshot, so their build shuffles are never in a pass's removal
        // set (the janitor's cross-pass-reuse precondition)
        val sc = prep.table.sparkSession.sparkContext
        // per-invocation unique job-group tags: two concurrent multi-pass
        // joins on one session must never attribute each other's stages
        // (a constant per-pass tag would merge their listener sets)
        val runTag = java.lang.Long.toHexString(System.nanoTime())
        val (_, prepShuffles) =
          org.apache.spark.GraftShuffleJanitor.runScoped(sc, s"graft-jac-self-$runTag-prep") {
            vals.count(); vtkdf.count(); prep.varr.count()
          }
        val slices = (0 until passes).map { p =>
          // eager lineage cut, then DETERMINISTIC reclamation of exactly the
          // shuffles this pass's own stages wrote (GraftShuffleJanitor
          // job-group scoping — a concurrent job's shuffles are untouchable
          // by construction): the pass's only consumer — its own checkpoint —
          // has completed, so the ~22 GB/pass candidate shuffle frees BEFORE
          // the next pass writes. GC-hint cleanup was measured too lazy at
          // sf10 (5-7 GB retained per pass → scratch death the mode exists
          // to prevent).
          val (slice, passShuffles) =
            org.apache.spark.GraftShuffleJanitor.runScoped(sc, s"graft-jac-self-$runTag-pass-$p") {
              cutSlice(vmOfSlice(Some(
                pmod(xxhash64(col("id")), lit(passes.toLong)) === lit(p.toLong))),
                s"jacself_p$p")
            }
          // subtract the prep shuffles: a prep map stage RESUBMITTED during
          // this pass (FetchFailed after executor loss) runs under the
          // pass's job group and would otherwise land in the removal set —
          // fully unregistering a shuffle the persisted frames still recompute
          // through (releaseFiles below keeps those registered by design)
          org.apache.spark.GraftShuffleJanitor.remove(sc, passShuffles -- prepShuffles)
          slice
        }.reduce(_ union _)
        // every consumer from here on reads the PERSISTED frames, not their
        // build shuffles (~25 GB retained for the whole run at sf10) —
        // release the files, keeping the registrations so a cache-evicted
        // recompute resubmits the parent stages instead of crashing
        org.apache.spark.GraftShuffleJanitor.releaseFiles(sc, prepShuffles)
        slices
      }

    expandSelf(prep.table, prep.keyAttr, prep.joinAttr, vals, vtkdf, vm,
      lOutPrefix, rOutPrefix)
  }

  /** Brute-force self-join over deduplicated values; identical output to
    * [[bruteForceSelf]] (the brute conditions factor through values entirely). */
  def bruteForceSelfDeduped(
      table: DataFrame, keyAttr: String, joinAttr: String,
      tokenizer: Tokenizer, threshold: Double,
      lOutPrefix: String = "l_", rOutPrefix: String = "r_"): DataFrame = {
    val t = lit(threshold)
    val onePlusT = lit(1d + threshold)
    val vals = table.select(col(joinAttr).as("value")).distinct()
      .withColumn("vid", unhex(md5(col("value"))))
    val vtokens = tokenizer.tokenize(vals.select(col("vid"), col("value")), "vid", "value")
      .persistTracked
    val L = vtokens.alias("L")
    val R = vtokens.alias("R")
    // unordered value pairs incl. self pairs (record gate dedupes/orients below)
    val vm = L.join(R, col("L.token") === col("R.token") && col("L.id") <= col("R.id"))
      .select(col("L.id").as("lval"), col("L.len").as("llen"),
        col("R.id").as("rval"), col("R.len").as("rlen"))
      .groupBy("lval", "llen", "rval", "rlen")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= ((col("llen") + col("rlen")) * t / onePlusT))
      .select(col("lval"), col("rval"))
    // brute force orients by raw id: emit both value orientations, gate id<id
    val vmBoth = vm.union(
      vm.where(col("lval") =!= col("rval"))
        .select(col("rval").as("lval"), col("lval").as("rval")))
    val recs = table.select(col(keyAttr).as("rid"), col(joinAttr).as("value"))
      .join(vals, "value")
    vmBoth.join(recs.select(col("vid").as("lval"), col("rid").as("lid")), "lval")
      .join(recs.select(col("vid").as("rval"), col("rid").as("rid2")), "rval")
      .where(col("lid") < col("rid2"))
      .select(col("lid").as(lOutPrefix + keyAttr), col("rid2").as(rOutPrefix + keyAttr))
  }

  /** Expand oriented value-level matches (keyed by surrogate `vid`) to record
    * pairs under the reference's `l_id` string gate. */
  private def expandSelf(
      table: DataFrame, keyAttr: String, joinAttr: String,
      vals: DataFrame, vtkdf: DataFrame, vm: DataFrame,
      lOutPrefix: String, rOutPrefix: String): DataFrame = {
    val vlens = vtkdf.select(col("id").as("vid"), col("len")).distinct()
    val recs = table.select(col(keyAttr).as("rid"), col(joinAttr).as("value"))
      .join(vals.select(col("value"), col("vid")), "value")
      .join(vlens, "vid")
      .select(col("rid"), col("vid"),
        concat(col("len").cast("string"), lit("_"), col("rid").cast("string")).as("lid_str"))
    vm.join(recs.select(col("vid").as("lval"), col("rid").as("lid"),
        col("lid_str").as("l_lid")), "lval")
      .join(recs.select(col("vid").as("rval"), col("rid").as("rid2"),
        col("lid_str").as("r_lid")), "rval")
      .where(col("l_lid") < col("r_lid"))
      .select(col("lid").as(lOutPrefix + keyAttr), col("rid2").as(rOutPrefix + keyAttr))
  }

  // ---------------------------------------------------------------------------
  // R×S (two-table) join (reference jaccard_join.py:235-433)
  // ---------------------------------------------------------------------------

  /**
   * Filtered R×S join. Mirrors the reference's two driver-side adaptive decisions:
   *
   *   1. widow placeholder = |L| * |R| + 1 — the max possible df product + 1, so
   *      tokens appearing on only one side sort last and never become prefix
   *      witnesses (jaccard_join.py:266-268,292-294);
   *   2. index-side selection — the side with MORE widow prefix rows becomes the
   *      indexing side R with the tighter 2t/(1+t) prefix (jaccard_join.py:341-353).
   *
   * Output columns follow the reference exactly: `<R.outPrefix><lKeyAttr>,
   * <S.outPrefix><rKeyAttr>` (jaccard_join.py:391) — i.e. the *prefixes* swap with
   * the R/S choice while the key-attr names stay in l,r order.
   *
   * ⚠ Known recall edge in the reference algorithm (replicated by default for
   * oracle parity): the indexing side R uses the `2t/(1+t)` prefix
   * (jaccard_join.py:331,338) even when the indexed record is LONGER than its
   * partner. For |R| > |S| the required overlap `(|R|+|S|)·t/(1+t)` is smaller
   * than `2t/(1+t)·|R|`, so a qualifying pair's only witness tokens can sit
   * beyond R's indexing prefix and the pair is silently dropped (e.g. lens 6 vs 4
   * at t=0.4, common tokens ranked last). `exactRecall = true` widens the
   * indexing prefix to the always-safe probing bound `len·t` — with the two-sided
   * length filter, required overlap ≥ t·|R|, so a `len - ceil(t·len) + 1` prefix
   * always contains a witness and filtered == brute force.
   */
  def rsJoin(
      lTable: DataFrame, lKey: String, lJoin: String,
      rTable: DataFrame, rKey: String, rJoin: String,
      tokenizer: Tokenizer, threshold: Double,
      lOutPrefix: String = "l_", rOutPrefix: String = "r_",
      exactRecall: Boolean = false,
      saltBuckets: Int = 8, hotTokenDf: Long = 100000000L,
      maxSaltBuckets: Int = 64, passes: Int = 1): DataFrame = {
    // hotTokenDf compares against df = l_df * r_df, which IS the token's
    // candidate fan-out: the 1e8 default matches selfJoinDeduped's bound.
    // passes = P > 1 is the bounded-footprint mode (see
    // selfJoinDedupedPrepared): the probing side partitions by
    // pmod(xxhash64(id), P), candidate+verify runs per slice with an eager
    // lineage cut between passes — ~1/P peak shuffle, P re-reads of the
    // persisted indexing prefix, output invariant in P (spec-pinned).
    require(saltBuckets >= 1, "saltBuckets must be >= 1 (1 disables salting)")
    require(maxSaltBuckets >= saltBuckets, "maxSaltBuckets must be >= saltBuckets")
    require(passes >= 1, "passes must be >= 1 (1 = single-pass)")
    val t = lit(threshold)
    val onePlusT = lit(1d + threshold)

    // Driver-side counts sizing the widow placeholder (jaccard_join.py:238-245)
    val lCount = lTable.count()
    val rCount = rTable.count()
    val widowPlaceholder = lCount * rCount + 1

    val lTokens = tokenizer.tokenize(lTable, lKey, lJoin).persistTracked
    val rTokens = tokenizer.tokenize(rTable, rKey, rJoin).persistTracked

    // J8/J9: full-outer df merge with widow placeholder (jaccard_join.py:270-295)
    val lDf = lTokens.groupBy("token").agg(count(lit(1)).as("l_df"))
    val rDf = rTokens.groupBy("token").agg(count(lit(1)).as("r_df"))
    // persisted: consumed by BOTH sides' tkdf builds (would otherwise recompute
    // the two groupBys + full-outer merge twice)
    val dfreq = lDf.join(rDf, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("l_df") * col("r_df"), lit(widowPlaceholder)).as("df"))
      .persistTracked

    def tkdfOf(tokens: DataFrame): DataFrame = {
      val w = Window.partitionBy("id").orderBy("df", "token")
      tokens.join(dfreq, "token")
        .select(col("id"), col("len"), col("token"), col("df"),
          row_number().over(w).cast("long").as("pos"))
        .persistTracked
    }
    val lTkdf = tkdfOf(lTokens)
    val rTkdf = tkdfOf(rTokens)

    // J10: indexing prefixes on both sides, then J12: widow-count side choice
    def indexingPrefix(tkdf: DataFrame): DataFrame =
      tkdf.where(col("len") - col("pos") + lit(1) >= (col("len") * lit(2) * t / onePlusT))
    def probingPrefix(tkdf: DataFrame): DataFrame =
      tkdf.where(col("len") - col("pos") + lit(1) >= (col("len") * t))

    // one Spark job for both widow counts (the reference issues two scalar queries,
    // jaccard_join.py:341-353; fusing them halves the driver round-trips and lets
    // the two persisted tkdf scans run concurrently)
    val widowRows = indexingPrefix(lTkdf).where(col("df") === widowPlaceholder)
      .select(lit("l").as("side"))
      .union(indexingPrefix(rTkdf).where(col("df") === widowPlaceholder)
        .select(lit("r").as("side")))
      .groupBy("side").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val lWidows = widowRows.getOrElse("l", 0L)
    val rWidows = widowRows.getOrElse("r", 0L)

    // R = indexing side (more widows), S = probing side (jaccard_join.py:353)
    val lIsIndexing = lWidows > rWidows
    val (idxTkdf, idxPrefixName) = if (lIsIndexing) (lTkdf, lOutPrefix) else (rTkdf, rOutPrefix)
    val (prbTkdf, prbPrefixName) = if (lIsIndexing) (rTkdf, rOutPrefix) else (lTkdf, lOutPrefix)

    // df-adaptive id-hash salt (see selfJoinDeduped's candidate-key
    // commentary): here df = l_df * r_df is EXACTLY the token's candidate
    // fan-out before filters, so `hot` is a direct row-count bound and the
    // fan-out-proportional width is df/hotTokenDf directly (no square); widow
    // tokens (df = placeholder) match nothing and are never replicated.
    // no separate activation threshold (see selfJoinDeduped): the width is
    // ≥ 2 exactly when df crosses the per-bucket budget hotTokenDf/saltBuckets
    val nsalt =
      if (saltBuckets == 1) lit(1L)
      else when(col("df") < lit(widowPlaceholder),
        least(lit(maxSaltBuckets.toLong),
          ceil(lit(saltBuckets.toDouble)
            * col("df").cast("double") / lit(hotTokenDf.toDouble))))
        .otherwise(lit(1L))
    // multi-pass slices pin join parallelism on the equi keys — the AQE
    // explode-blind-coalesce defeat, see selfJoinDedupedPrepared
    val nPart = lTable.sparkSession.sessionState.conf.numShufflePartitions
    def pinned(d: DataFrame): DataFrame =
      if (passes == 1) d else d.repartition(nPart, col("token"), col("salt"))
    val rPfx = pinned(
        (if (exactRecall) probingPrefix(idxTkdf) else indexingPrefix(idxTkdf))
          .withColumn("salt", pmod(xxhash64(col("id")), nsalt)))
      .alias("Rpfx")
    val idxArr = posArrays(idxTkdf)
    val prbArr = posArrays(prbTkdf)
    // one candidate+verify slice over a probing-side share (None = all)
    def vmOfSlice(probeSlice: Option[Column]): DataFrame = {
      val prb0 = probingPrefix(prbTkdf)
      val sPfx = pinned(probeSlice.fold(prb0)(prb0.where)
          .withColumn("salt", explode(sequence(lit(0L), nsalt - lit(1L)))))
        .alias("Spfx")

      // J13: candidates, two-sided length filter (jaccard_join.py:364-384)
      val candCond =
        col("Rpfx.token") === col("Spfx.token") &&
        col("Rpfx.salt") === col("Spfx.salt") &&
        col("Rpfx.len") >= col("Spfx.len") * t &&
        col("Spfx.len") >= col("Rpfx.len") * t &&
        least(col("Rpfx.len") - col("Rpfx.pos") + lit(1), col("Spfx.len") - col("Spfx.pos") + lit(1)) >=
          ((col("Rpfx.len") + col("Spfx.len")) * t / onePlusT)

      val cand = rPfx.join(sPfx, candCond)
        .groupBy(col("Rpfx.id").as("Rid"), col("Spfx.id").as("Sid"))
        .agg(
          max(col("Rpfx.pos")).as("RmaxPos"),
          max(col("Spfx.pos")).as("SmaxPos"),
          count(lit(1)).as("pfxOverlap"))
        .alias("c")

      // J14: verification (jaccard_join.py:386-405), array form — see verifySuffix
      verifySuffix(cand.toDF(), idxArr, prbArr,
        "Rid", "Sid", "RmaxPos", "SmaxPos", threshold, tokenizer.emitsDistinctTokens)
    }
    val vm =
      if (passes == 1) vmOfSlice(None)
      else {
        // see selfJoinDedupedPrepared: materialize shared persisted frames
        // before the first snapshot, then reclaim each pass's shuffles
        // deterministically once its checkpoint lands
        val sc = lTable.sparkSession.sparkContext
        // see selfJoinDedupedPrepared: unique tags per invocation, and prep
        // shuffles subtracted from every pass's removal set
        val runTag = java.lang.Long.toHexString(System.nanoTime())
        val (_, prepShuffles) =
          org.apache.spark.GraftShuffleJanitor.runScoped(sc, s"graft-jac-rs-$runTag-prep") {
            dfreq.count(); lTkdf.count(); rTkdf.count()
          }
        val slices = (0 until passes).map { p =>
          val (slice, passShuffles) =
            org.apache.spark.GraftShuffleJanitor.runScoped(sc, s"graft-jac-rs-$runTag-pass-$p") {
              cutSlice(vmOfSlice(Some(
                pmod(xxhash64(col("id")), lit(passes.toLong)) === lit(p.toLong))),
                s"jacrs_p$p")
            }
          org.apache.spark.GraftShuffleJanitor.remove(sc, passShuffles -- prepShuffles)
          slice
        }.reduce(_ union _)
        // see selfJoinDedupedPrepared: the prep frames' build shuffles are
        // consumed — release their files, keep the registrations
        org.apache.spark.GraftShuffleJanitor.releaseFiles(sc, prepShuffles)
        slices
      }
    vm.select(
      col("Rid").as(idxPrefixName + lKey),
      col("Sid").as(prbPrefixName + rKey))
  }

  /** J15 (R×S): brute-force oracle (reference jaccard_join.py:407-420). */
  def bruteForceRs(
      lTable: DataFrame, lKey: String, lJoin: String,
      rTable: DataFrame, rKey: String, rJoin: String,
      tokenizer: Tokenizer, threshold: Double,
      lOutPrefix: String = "l_", rOutPrefix: String = "r_"): DataFrame = {
    val t = lit(threshold)
    val onePlusT = lit(1d + threshold)
    val L = tokenizer.tokenize(lTable, lKey, lJoin).alias("L")
    val R = tokenizer.tokenize(rTable, rKey, rJoin).alias("R")
    L.join(R, col("L.token") === col("R.token"))
      .select(col("L.id").as("lid"), col("L.len").as("llen"),
        col("R.id").as("rid"), col("R.len").as("rlen"))
      .groupBy("lid", "llen", "rid", "rlen")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= ((col("llen") + col("rlen")) * t / onePlusT))
      .select(
        col("lid").as(lOutPrefix + lKey),
        col("rid").as(rOutPrefix + rKey))
  }
}
