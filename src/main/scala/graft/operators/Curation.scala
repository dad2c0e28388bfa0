package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import graft.operators.PersistTracker.TrackedPersist

/**
 * Corpus-curation operators a large-scale training-data pipeline runs between
 * dedup and sequence packing: benchmark decontamination, PII scrubbing,
 * repetition-based quality signals, per-source mixture sampling, and the
 * deterministic global shuffle that fixes training order.
 *
 * These extend the reference's capability surface (the reference stops at
 * similarity joins + evaluation — py_duckdb/similarity_join/__init__.py);
 * everything here is deterministic and SQL-expressible, so each operator is
 * hash-verified against the DuckDB oracle like the core pipeline
 * (see [[graft.DuckSql]] counterparts).
 */
/** A normalized/cleaned document row (top-level so the Dataset encoder
  * stays in generated code). */
final case class CleanDoc(id: Long, text: String)

object Curation {

  /** Lowercased whitespace bag tokens, order preserved (blank tokens dropped) —
    * the same char class the join pipeline's WhitespaceTokenizer uses. */
  private def wsBagLower(c: Column): Column =
    filter(split(lower(c), "[\t\n\r ]"), x => trim(x) =!= "")

  /** Distinct md5-prefix hashes of a text column's word n-grams, as one array
    * per row — the decontamination gram key (shared with the streaming
    * variant so stream and batch agree exactly). */
  private[graft] def gramHashArray(text: Column, n: Int): Column =
    array_distinct(transform(wordGrams(wsBagLower(text), n),
      g => substring(md5(g), 1, 16)))

  /** Word n-grams of a token array: windows of `n` joined by one space.
    * Empty when the document has fewer than `n` tokens. */
  private def wordGrams(tks: Column, n: Int): Column = {
    val nGrams = size(tks) - lit(n - 1)
    val idx = when(nGrams >= 1, sequence(lit(1), nGrams))
      .otherwise(array().cast("array<int>"))
    transform(idx, i => array_join(slice(tks, i, lit(n)), " "))
  }

  /**
   * HTML stripping — the FIRST pass of a web-crawl curation pipeline:
   * remove `<script>`/`<style>` blocks (content and all), comments, and
   * tags (each replaced by a space so block boundaries keep words apart),
   * decode the common entities (`&lt; &gt; &quot; &#39; &nbsp;` first,
   * `&amp;` LAST so `&amp;lt;` decodes once, to `&lt;`), collapse
   * whitespace runs, trim. Pure column expressions — zero shuffles, runs
   * inside the scan stage; the regexes stay in the RE2 ∩ Java subset (no
   * backreferences — script and style are separate passes), so the operator
   * is DuckDB-oracle-checked. An UNCLOSED script/style block keeps its body
   * as text (only the opening tag strips) — malformed markup degrades to
   * extra text, never to lost rows.
   *
   * Output: (id, text).
   */
  def stripHtml(df: DataFrame, key: String, text: String): DataFrame = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(col(text), "(?is)<script\\b[^>]*>.*?</script>", " "),
        "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    df.select(col(key).as("id"),
      trim(regexp_replace(decoded, "[\t\n\r ]+", " ")).as("text"))
  }

  /**
   * Unicode text normalization — the fix-encoding pass every multilingual
   * corpus needs before hashing/dedup (the same logical text in NFC vs NFD
   * hashes differently and silently defeats exact dedup): NFC composition
   * (`java.text.Normalizer`; DuckDB's `nfc_normalize` implements the same
   * Unicode standard, so outputs hash-match), C0/DEL control-character
   * strip (tab/newline/CR survive as whitespace), whitespace-run collapse,
   * trim. NFC has no Column form, so this is a zero-shuffle mapPartitions
   * pass with patterns compiled once per partition.
   *
   * Output: (id, text).
   */
  def normalizeText(df: DataFrame, key: String, text: String): DataFrame = {
    df.select(col(key).cast("long"), col(text)).mapPartitions { it =>
      val controls = java.util.regex.Pattern.compile("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")
      val ws = java.util.regex.Pattern.compile("[\t\n\r ]+")
      it.map { r =>
        val s = r.getString(1)
        val out =
          if (s == null) ""
          else {
            val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
            ws.matcher(controls.matcher(nfc).replaceAll(""))
              .replaceAll(" ").trim
          }
        CleanDoc(r.getLong(0), out)
      }
    }(org.apache.spark.sql.Encoders.product[CleanDoc]).toDF()
  }

  /**
   * Benchmark decontamination: flag training documents sharing at least
   * `minShared` distinct word `n`-grams with any evaluation-set document —
   * the published 13-gram-collision rule for removing test-set leakage from
   * a training corpus (GPT-3 appendix C shape).
   *
   * Grams are md5-prefix hashed before the join, so shuffle keys are 16-byte
   * strings rather than n-word texts (the small-keys rule from SCALE.md —
   * at 100 TB the gram join would otherwise move the corpus several times
   * over). The eval side of the join is tiny by construction (benchmarks are
   * thousands of documents, not billions) and broadcasts.
   *
   * Output: (id, n_shared_grams) for contaminated training documents only.
   */
  def decontaminate(train: DataFrame, evalSet: DataFrame, key: String,
                    text: String, n: Int = 13, minShared: Int = 1): DataFrame = {
    def gramHashes(df: DataFrame): DataFrame =
      df.select(col(key).as("id"), explode(gramHashArray(col(text), n)).as("gh"))
    val evalGrams = gramHashes(Parallelize.ensureMinParallelism(evalSet))
      .select(col("gh")).distinct()
    // gram generation is the CPU of this operator (~28 13-word joins + md5
    // per doc) and runs inside the scan stage — floor its parallelism for
    // small-split inputs (no-op at scale; see Parallelize)
    gramHashes(Parallelize.ensureMinParallelism(train))
      .join(broadcast(evalGrams), "gh")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shared_grams"))
      .where(col("n_shared_grams") >= minShared)
  }

  // Patterns are DEMONSTRATIVE policy shapes, not a scrubbing guarantee:
  // they cover the common NANP phone spellings (555-123-4567, 555.123.4567,
  // (555) 123-4567, +1-555-123-4567) and range-valid dotted-quad IPv4s with
  // word boundaries, but a dotted version string like "1.2.3.4" is textually
  // an IP and still masks. Kept to the regex subset RE2 (DuckDB) and Java
  // (Spark codegen) compile identically — mirrored in DuckSql.piiScrub.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe =
    "(?:\\+?1[-. ])?(?:\\([0-9]{3}\\) ?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}"
  private val octetRe = "(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
  private val ipRe = s"\\b$octetRe\\.$octetRe\\.$octetRe\\.$octetRe\\b"

  /**
   * PII scrubbing: mask emails, phone numbers, and IPv4 literals with typed
   * placeholders and report per-document match counts (the counts drive
   * drop-if-too-dense policies downstream). Pure column expressions — zero
   * shuffles, runs inside the scan stage at any scale. Patterns are kept to
   * the regex subset RE2 and Java compile identically, so the operator is
   * DuckDB-oracle-checked.
   *
   * Output: (id, clean_text, n_emails, n_phones, n_ips). Counts are measured
   * on the ORIGINAL text; masking applies email → phone → IP.
   */
  def piiScrub(df: DataFrame, key: String, text: String): DataFrame = {
    def cnt(re: String): Column =
      size(regexp_extract_all(col(text), lit(re), lit(0))).cast("long")
    val masked = regexp_replace(
      regexp_replace(
        regexp_replace(col(text), emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipRe, "<IP>")
    df.select(col(key).as("id"), masked.as("clean_text"),
      cnt(emailRe).as("n_emails"), cnt(phoneRe).as("n_phones"), cnt(ipRe).as("n_ips"))
  }

  /**
   * Repetition-based quality signals (the Gopher repetition rules' shape):
   * duplicate-token fraction plus the fraction of all 2-grams / 3-grams
   * occupied by the single most frequent one — boilerplate and degenerate
   * generations light these up while clean prose stays low. All array-fold
   * column expressions over the per-row token list: zero shuffles. Ratios are
   * NULL when the document is too short to form the gram.
   *
   * Per-row cost bound: the top-gram count probes `filter(grams, ...)` once
   * per DISTINCT gram — O(distinct × total) per document, quadratic on a
   * pathologically long degenerate document (exactly what this filter
   * targets). The signal is measured on the first `maxChars` characters
   * (default 20 000 — repetition is a density signal, so a prefix reads it
   * fine), which caps the per-row cost at ~(maxChars/5)²/… regardless of
   * adversarial document length; the truncation may split the boundary
   * word, costing at most one token of signal. Pass `maxChars <= 0` to
   * scan full documents.
   *
   * Output: (id, n_tokens, dup_token_ratio, top_2gram_ratio, top_3gram_ratio).
   */
  def repetitionStats(df: DataFrame, key: String, text: String,
                      maxChars: Int = 20000): DataFrame = {
    val capped = if (maxChars > 0) substring(col(text), 1, maxChars) else col(text)
    val tks = wsBagLower(capped)
    val n = size(tks).cast("long")
    def topGramRatio(g: Int): Column = {
      val grams = wordGrams(tks, g)
      val counts = transform(array_distinct(grams),
        d => size(filter(grams, x => x === d)))
      when(size(grams) >= 1,
        array_max(counts).cast("double") / size(grams))
    }
    df.select(
      col(key).as("id"),
      n.as("n_tokens"),
      when(n =!= 0,
        lit(1.0d) - size(array_distinct(tks)).cast("double") / n).as("dup_token_ratio"),
      topGramRatio(2).as("top_2gram_ratio"),
      topGramRatio(3).as("top_3gram_ratio"))
  }

  /** Deterministic per-record uniform in [0, 1): the top 60 bits of
    * md5("<seed>:<id>") over 2^60 — reproducible on any engine, unlike RNG
    * sampling (cf. the n3b hash-sample query). */
  private def hashUniform(id: Column, seed: String): Column =
    conv(substring(md5(concat(lit(s"$seed:"), id.cast("string"))), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0d) // 2^60

  /**
   * Source-mixture sampling: keep each document with its source's target
   * probability — how a pipeline reweights web/books/code/reference shares
   * before packing. The keep decision is a deterministic per-id hash
   * threshold, so the sample is reproducible, stable under reruns and
   * cluster layout, and exact-verifiable (vs `TABLESAMPLE`'s engine RNG).
   * Pure column expressions; the filter pushes to the scan.
   *
   * @param weights (source value → keep probability); sources not listed
   *                keep `defaultWeight`
   */
  def mixSources(df: DataFrame, key: String, source: String,
                 weights: Seq[(String, Double)], defaultWeight: Double = 1.0,
                 seed: String = "mix"): DataFrame = {
    val w = weights.foldRight(lit(defaultWeight): Column) { case ((s, p), acc) =>
      when(col(source) === s, lit(p)).otherwise(acc)
    }
    df.where(hashUniform(col(key), seed) < w)
      .select(col(key).as("id"), col(source).as("source"))
  }

  /**
   * Per-source document cap — the Gopher/Dolma-style "at most `cap`
   * documents per domain" rule that stops crawl-heavy sources from swamping
   * the mixture where proportional [[mixSources]] sampling isn't enough
   * (a 10× over-crawled domain keeps 10× the docs at any keep probability;
   * a cap is absolute). Selection within a source is ordered by
   * md5("<seed>:<id>") then id — the deterministic-uniform key, so the kept
   * subset is a reproducible unbiased sample rather than "first crawled
   * wins", and changing the seed redraws it.
   *
   * Scale shape: ONE shuffle (the window's hashpartitioning on `source`) —
   * the window is PARTITIONED, every source ranks independently in its own
   * tasks. A skew-heavy source (the exact thing this operator exists for)
   * concentrates its rows in one partition; row_number is a streaming
   * window (no buffering beyond the frame row), so the cost is that
   * source's row count, not memory. Output: (id, source).
   */
  def capPerSource(df: DataFrame, key: String, source: String, cap: Int,
                   seed: String = "cap"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("hk"), col("id"))
    df.select(col(key).as("id"), col(source).as("source"),
        md5(concat(lit(s"$seed:"), col(key).cast("string"))).as("hk"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= cap)
      .select(col("id"), col("source"))
  }

  /**
   * Corpus-composition report — the mixture-monitoring query a curation team
   * runs before and after every [[mixSources]] re-weighting: document counts
   * and size mass at every (source × lang) combination PLUS the per-source
   * and whole-corpus super-aggregates, in ONE pass via ROLLUP. `gid` is the
   * grouping bit-vector (0 = leaf, 1 = lang rolled up, 3 = grand total) so
   * consumers never confuse a real 'ALL' value with a rolled-up level.
   *
   * Scale shape: ROLLUP plans as Expand (×3 rows) feeding one
   * hash-aggregate — the expansion happens MAP-SIDE and partial aggregation
   * collapses it before the single exchange, so shuffle traffic is
   * ∝ distinct(source × lang) × levels, not corpus rows. `avg_chars` is one
   * bigint-sum division — IEEE-exact on any engine (the bm25 rational rule),
   * so the report is oracle-hash-checkable including the doubles.
   *
   * Output: (source, lang, gid, n_docs, total_chars, avg_chars).
   */
  def corpusReport(df: DataFrame, source: String, lang: String,
                   sizeCol: String): DataFrame =
    df.rollup(col(source).as("source"), col(lang).as("lang"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).cast("long").as("total_chars"),
        (sum(col(sizeCol)).cast("double") / count(lit(1))).as("avg_chars"))
      .select(coalesce(col("source"), lit("ALL")).as("source"),
        coalesce(col("lang"), lit("ALL")).as("lang"),
        col("gid"), col("n_docs"), col("total_chars"), col("avg_chars"))

  /**
   * Deterministic global shuffle: the training-order permutation as an
   * explicit rank — `shuffle_pos` = position of the document when the corpus
   * is ordered by `md5("<seed>:<id>")` (ties broken by id). Changing the seed
   * reshuffles; the same seed always reproduces the same order, which is what
   * a training run needs for resumability.
   *
   * Scale shape: the textbook `row_number() OVER (ORDER BY hash)` moves every
   * row to ONE task. This is the distributed two-pass rank instead (same
   * machinery as [[Packing.packBins]]): range-repartition by the hash key,
   * count per partition, exclusive-scan the counts on the driver (one number
   * per PARTITION, not per row), then emit per-partition running positions.
   * The DuckDB oracle runs the window form; hash-equality proves the
   * distributed rank reproduces it exactly.
   *
   * Output: (id, shuffle_pos), 0-based, a permutation of the input keys.
   */
  /** Per-partition row counts → exclusive prefix starts: the driver sees ONE
    * Long per PARTITION, never per row — the two-pass-rank machinery shared
    * by [[shuffleOrder]] and [[keepTopFraction]]. Explicit Long accumulator:
    * Iterator.size returns Int and would silently wrap past ~2.1B rows in
    * one partition, corrupting every downstream position. Returns
    * (starts, total). */
  private def partitionStarts(df: DataFrame): (Array[Long], Long) = {
    val counts = df.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var c = 0L
        while (it.hasNext) { it.next(); c += 1L }
        Iterator((pid, c))
      }
      .collect().sortBy(_._1).map(_._2)
    (counts.scanLeft(0L)(_ + _).init, counts.sum)
  }

  def shuffleOrder(df: DataFrame, key: String, seed: String = "shuffle"): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val base = df.select(col(key).cast("long").as("id"))
      .withColumn("hk", md5(concat(lit(s"$seed:"), col("id").cast("string"))))
      .repartitionByRange(nPart, col("hk"), col("id"))
      .sortWithinPartitions("hk", "id")
      .persistTracked
    val (starts, _) = partitionStarts(base)
    val out = base.rdd.mapPartitionsWithIndex { (pid, it) =>
      var pos = starts(pid)
      it.map { r =>
        if (r.isNullAt(0))
          // a null here means the key column had nulls or failed the long
          // cast — getLong would silently read 0 and emit duplicate ids
          throw new IllegalArgumentException(
            s"shuffleOrder: key column '$key' has a null/uncastable id")
        val p = pos
        pos += 1L
        Row(r.getLong(0), p)
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("shuffle_pos", LongType, nullable = false))))
  }

  /**
   * Exact global quality-threshold selection — "keep the best `frac` of the
   * corpus by `score`", the CCNet-style percentile gate applied after any
   * scoring pass ([[TextAnalysis.qualityScore]], the bigram-LM signal, DSIR
   * weights): keeps exactly floor(frac·N) rows, the top of the total order
   * (score desc, id), each with its exact global rank. EXACT selection, not
   * `approx_percentile`: a sketch moves the cut by ±ε·N documents silently
   * and unreproducibly, which poisons dedup-style set comparisons downstream
   * — this kept-set is deterministic, resumable, and oracle-hash-checkable.
   *
   * Scale shape: the same distributed two-pass rank as [[shuffleOrder]] —
   * range-repartition on the sort key, one count per PARTITION to the
   * driver, per-partition running positions — so there is no global window
   * and no single-task sort; partitions entirely past the cut emit nothing.
   * Range boundaries only distribute rows, never reorder them, so the rank
   * is exact whatever boundaries the sampler picks.
   *
   * Output: (id, score, rank), rank 0-based dense in [0, floor(frac·N)).
   */
  def keepTopFraction(df: DataFrame, key: String, score: String,
                      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val base = df.select(col(key).cast("long").as("id"),
        col(score).cast("double").as("s"))
      .repartitionByRange(nPart, col("s").desc, col("id"))
      .sortWithinPartitions(col("s").desc, col("id"))
      .persistTracked
    val (starts, total) = partitionStarts(base)
    val target = math.floor(frac * total).toLong
    val out = base.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (starts(pid) >= target) Iterator.empty
      else {
        var pos = starts(pid)
        it.takeWhile(_ => pos < target).map { r =>
          if (r.isNullAt(0) || r.isNullAt(1))
            // getLong/getDouble on a null silently reads 0 — a null id would
            // emit duplicates, a null score would rank as 0.0 mid-corpus
            throw new IllegalArgumentException(
              s"keepTopFraction: null/uncastable '$key' or '$score'")
          val p = pos
          pos += 1L
          Row(r.getLong(0), r.getDouble(1), p)
        }
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("rank", LongType, nullable = false))))
  }

  /**
   * Cross-document exact LINE deduplication — the C4/RefinedWeb-style pass
   * that strips boilerplate repeated across pages (nav bars, cookie banners,
   * license headers): every distinct line keeps its GLOBAL first occurrence
   * (ordered by (key, line position)) and loses every other copy; documents
   * are reassembled in original line order, possibly down to the empty
   * string (kept, so the caller can count/filter the hollowed-out docs).
   * Lines shorter than `minLineLen` characters are exempt and pass through
   * everywhere — dedup'ing "" or "." would shred unrelated documents.
   *
   * Scale shape: first-occurrence selection is a groupBy on the line VALUE
   * with a `min(struct(key, pos))` aggregate, so partial aggregation
   * collapses hot boilerplate map-side — a line occurring 10^9 times ships
   * one row per input partition into the shuffle, not 10^9 rows (the
   * textbook `row_number() OVER (PARTITION BY line)` ships every copy into
   * one hot partition and cannot partial-aggregate; that form is the DuckDB
   * oracle, and hash-equality proves this one reproduces it). The join back
   * is equi on the line and lands on the aggregate's own partitioning; the
   * rebuild is one groupBy on the doc key with a sort_array over (pos, line)
   * structs — per-doc data, no window, no skew beyond document size itself.
   *
   * Output: (id, text), one row per input row.
   */
  def lineDedup(df: DataFrame, key: String, text: String,
                minLineLen: Int = 2): DataFrame = {
    val lines = df.select(col(key).as("id"),
      posexplode(split(col(text), "\n", -1)).as(Seq("pos", "line")))
    val firsts = lines.where(length(col("line")) >= minLineLen)
      .groupBy("line")
      .agg(min(struct(col("id"), col("pos"))).as("first"))
    val kept = lines.join(firsts, Seq("line"), "left")
      .where(col("first").isNull ||
        (col("id") === col("first.id") && col("pos") === col("first.pos")))
    val rebuilt = kept.groupBy("id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("text"))
    // a doc whose every line was dropped has no kept rows — restore it empty
    df.select(col(key).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"))
  }

  /**
   * Exact-substring duplicate detection — the span-level signal from
   * "Deduplicating Training Data Makes Language Models Better" (Lee et al.,
   * ACL 2022): a document is substring-contaminated when any of its word
   * `n`-gram spans occurs VERBATIM in another document, even though the
   * documents as wholes are unique (press-release reuse, templated pages,
   * quoted passages — exactly what whole-document and near-dup hashing miss
   * at high thresholds, and finer-grained than line dedup because a span may
   * cross line breaks). This flavor scores and flags; it composes with
   * [[lineDedup]]-style rewriting or document dropping downstream.
   *
   * The published implementation builds a corpus-wide suffix array — a
   * global sort unavailable mid-pipeline; the distributed equivalent here is
   * the gram-df shape: distinct n-gram keys per document, one groupBy for
   * corpus document-frequency, join back. A gram occurring in one document
   * only ships ONE row into the shuffle after partial aggregation, so
   * boilerplate spans (the hot keys) collapse map-side.
   *
   * Grams are md5-prefix 16-byte keys (SCALE.md small-keys rule — shuffle
   * traffic is bounded by gram COUNT, not span text). Output per document
   * with >= 1 gram: (id, n_grams, n_dup_grams, dup_ratio, is_dup), where
   * n_dup_grams counts the document's distinct spans shared with at least
   * one other document (corpus gram-df >= 2).
   */
  def substringDupStats(df: DataFrame, key: String, text: String,
                        n: Int = 13): DataFrame = {
    // the gram stream feeds BOTH the df aggregate and the join-back probe;
    // persist it so the ~n-token window join + md5 per doc runs once, not
    // twice (released via Api.clearCache like every operator intermediate)
    val grams = (Parallelize.ensureMinParallelism(df)
      .select(col(key).as("id"), explode(gramHashArray(col(text), n)).as("gh")))
      .persistTracked
    // gramHashArray is per-doc DISTINCT, so count(*) here is document
    // frequency, not occurrence frequency
    val gdf = grams.groupBy("gh").agg(count(lit(1)).as("gdf"))
    grams.join(gdf, "gh")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") >= 2, lit(1L)).otherwise(lit(0L))).as("n_dup_grams"))
      .select(col("id"), col("n_grams"), col("n_dup_grams"),
        (col("n_dup_grams").cast("double") / col("n_grams").cast("double"))
          .as("dup_ratio"),
        (col("n_dup_grams") > 0).as("is_dup"))
  }

  /**
   * Exact-substring REMOVAL — the rewrite half of Lee et al.'s deduplication
   * (the paper's ExactSubstr operator: when a span occurs verbatim more than
   * once in the corpus, keep ONE global copy and excise every other
   * occurrence). [[substringDupStats]] flags; this rewrites. Semantics, all
   * deterministic and oracle-expressible:
   *
   *   - spans are word `n`-grams (whitespace tokens, case-insensitive match,
   *     original-case rebuild), every OCCURRENCE (not per-doc distinct);
   *   - a gram value occurring ≥ 2 times corpus-wide keeps its global first
   *     occurrence — min (id, pos) — and every other occurrence marks its
   *     `n` token positions for removal (within-doc repeats cut too);
   *   - overlapping marked spans merge by position-set union (the min-span
   *     merge falls out of marking positions, not intervals);
   *   - documents rebuild from the surviving tokens in order, single-space
   *     joined, possibly to the empty string (kept, like [[lineDedup]]).
   *
   * Scale shape: the same gram-df machinery as [[substringDupStats]] — one
   * groupBy on 16-byte md5-prefix gram keys whose `min(struct(id, pos))` +
   * count partial-aggregate map-side (hot boilerplate spans ship one row per
   * input partition, not per occurrence; the textbook `row_number() OVER
   * (PARTITION BY gram)` form is the DuckDB oracle and cannot
   * partial-aggregate), a join back on the gram key, one position explode
   * bounded by n × duplicate occurrences, an anti-join on (id, token pos),
   * and the per-doc sort_array rebuild. No global window anywhere. A 16-byte
   * prefix collision would merge two gram groups (vanishingly rare; the
   * oracle hashes identically, so verification is unaffected).
   *
   * Output: (id, text), one row per input row.
   */
  def substringDedup(df: DataFrame, key: String, text: String,
                     n: Int = 13): DataFrame = {
    val tksCol = filter(split(col(text), "[\t\n\r ]"), x => trim(x) =!= "")
    val base = Parallelize.ensureMinParallelism(
        df.select(col(key).as("id"), tksCol.as("tks")))
      .persistTracked
    val m = n - 1
    val nG = size(col("tks")) - m
    val ghs = when(nG >= 1, transform(sequence(lit(1), nG), i =>
        substring(md5(array_join(
          transform(slice(col("tks"), i, lit(n)), t => lower(t)), " ")), 1, 16)))
      .otherwise(array().cast("array<string>"))
    // every gram OCCURRENCE with its 0-based start position
    val grams = base.select(col("id"), posexplode(ghs).as(Seq("gpos", "gh")))
      .persistTracked
    val firsts = grams.groupBy("gh")
      .agg(count(lit(1)).as("cnt"), min(struct(col("id"), col("gpos"))).as("first"))
    val marked = grams.join(firsts, "gh")
      .where(col("cnt") >= 2 &&
        !(col("id") === col("first.id") && col("gpos") === col("first.gpos")))
      .select(col("id"), explode(sequence(col("gpos"), col("gpos") + m)).as("tpos"))
      .distinct()
    val toks = base.select(col("id"), posexplode(col("tks")).as(Seq("tpos", "tok")))
    val rebuilt = toks.join(marked, Seq("id", "tpos"), "left_anti")
      .groupBy("id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("tpos"), col("tok")))),
          s => s.getField("tok")), " ").as("text"))
    base.select(col("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"))
  }

  /**
   * DSIR-shape importance resampling (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling" — the n-gram-feature variant):
   * keep documents from a general pool in proportion to how much more likely
   * a TARGET-domain language model finds them than the pool's own model.
   * Both models are the corpus-trained add-k bigram LM of
   * [[TextAnalysis.bigramLmScore]] — no external artifact: the target model
   * trains on the pool subset matching `targetPred` (e.g. the high-quality
   * or in-domain slice), the proxy model on the whole pool.
   *
   * Per document the importance statistic is the RATIONAL form
   *
   *   w = sum_p_target / sum_p_proxy
   *
   * — document-order folds of the smoothed bigram probabilities under each
   * model (the bm25/bigram-LM rule: `ln` drifts ~1 ulp across engines, so
   * the hashed oracle projection keeps +, *, / only; the conventional
   * log-ratio variant is a spec-level twin of the same joins). A bigram or
   * context absent from the target model contributes its smoothed floor
   * (c=0), which is why the target-model joins are LEFT joins where the
   * proxy's are inner (every pool bigram is in the pool model by
   * construction).
   *
   * The keep decision is the deterministic [[hashUniform]] threshold used by
   * [[mixSources]]: keep iff u(id) < min(1, w·scale) — reproducible across
   * engines, reruns and cluster layout, so the sample itself (not just the
   * weights) is oracle-hash-verified.
   *
   * Output (kept documents only): (id, n_bigrams, sum_p_target, sum_p_proxy, w).
   *
   * Scale shape: two model trainings = two groupBys on bigram VALUES
   * (partial aggregation collapses hot bigrams map-side; model tables scale
   * with vocabulary, Zipf-bounded, not corpus size), one scoring pass joining
   * the pool's bigram stream to both models on natural keys, vocab sizes as
   * one-row broadcasts. The target stream is a filtered re-read of the pool
   * scan, not a second corpus shuffle.
   */
  def importanceSample(df: DataFrame, key: String, text: String,
                       targetPred: Column, scale: Double, k: Double = 1.0,
                       seed: String = "dsir"): DataFrame = {
    val docs = TextAnalysis.wsDocsLower(df, key, text)
    val bg = TextAnalysis.bigramStream(docs).persistTracked
    val tdocs = TextAnalysis.wsDocsLower(df.where(targetPred), key, text)
    // persisted like `bg`: the target stream feeds both target-model
    // aggregations, which otherwise each re-tokenize the target slice
    val bgT = TextAnalysis.bigramStream(tdocs).persistTracked
    val bgcP = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12p"))
    val ctxP = bgcP.groupBy("w1").agg(sum(col("c12p")).as("c1p"))
    val vP = broadcast(docs.select(explode(col("tks")).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("vp")))
    val bgcT = bgT.groupBy("w1", "w2").agg(count(lit(1)).as("c12t"))
    val ctxT = bgcT.groupBy("w1").agg(sum(col("c12t")).as("c1t"))
    // an empty target slice would make vt = 0 → pt = k/0 = +Inf → w = +Inf →
    // keep-threshold 1 silently keeps the WHOLE pool (and the oracle, built
    // the same way, would agree — the hash check can't catch it). Fail fast
    // in-plan instead: raise_error costs no extra driver action.
    val vT = broadcast(tdocs.select(explode(col("tks")).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("vt"))
      .select(when(col("vt") > 0, col("vt"))
        .otherwise(raise_error(lit(
          "importanceSample: targetPred matches no documents with >= 2 tokens " +
          "(empty target vocabulary)"))).as("vt")))
    val pP = (col("c12p").cast("double") + lit(k)) /
      (col("c1p").cast("double") + lit(k) * col("vp"))
    val pT = (coalesce(col("c12t"), lit(0L)).cast("double") + lit(k)) /
      (coalesce(col("c1t"), lit(0L)).cast("double") + lit(k) * col("vt"))
    bg.join(bgcP, Seq("w1", "w2"))
      .join(ctxP, Seq("w1"))
      .join(bgcT, Seq("w1", "w2"), "left")
      .join(ctxT, Seq("w1"), "left")
      .crossJoin(vP).crossJoin(vT)
      .select(col("id"), col("pos"), pT.as("pt"), pP.as("pp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        array_sort(collect_list(struct(col("pos"), col("pt"), col("pp")))).as("ps"))
      .select(col("id"), col("n_bigrams"),
        aggregate(transform(col("ps"), x => x.getField("pt")),
          lit(0.0d), (acc, x) => acc + x).as("sum_p_target"),
        aggregate(transform(col("ps"), x => x.getField("pp")),
          lit(0.0d), (acc, x) => acc + x).as("sum_p_proxy"))
      .withColumn("w", col("sum_p_target") / col("sum_p_proxy"))
      .where(hashUniform(col("id"), seed) < least(lit(1.0d), col("w") * lit(scale)))
  }
}
