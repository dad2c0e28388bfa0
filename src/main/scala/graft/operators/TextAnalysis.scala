package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: per-document
 * statistics, quality signals, language identification, token counting and
 * content fingerprinting. All pure Column expressions (codegen-friendly, no
 * UDFs) — at 100 TB these run embarrassingly parallel inside the parquet scan
 * stage with zero shuffles.
 *
 * These extend the reference's capability surface (its tokenizers stop at
 * (id, len, token) emission — py_duckdb/similarity_join/tokenizers/__init__.py);
 * the building blocks reuse the same whitespace-split semantics so document
 * stats agree with what the join pipeline sees.
 */
object TextAnalysis {

  /** Whitespace bag tokens of a string column (blank tokens dropped, case kept).
    * Same char class as WhitespaceTokenizer. */
  private def wsBag(c: Column): Column =
    filter(split(c, "[\t\n\r ]"), x => trim(x) =!= "")

  private val stopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  private val stopwordsEs = Seq("el", "la", "de", "y", "en", "es", "los", "que", "un", "por")
  private val stopwordsFr = Seq("le", "la", "de", "et", "en", "est", "les", "que", "un", "pour")
  private val stopwordsDe = Seq("der", "die", "das", "und", "in", "ist", "von", "den", "mit", "zu")

  private def litArray(xs: Seq[String]): Column = array(xs.map(lit): _*)

  /**
   * Per-document statistics and quality signals:
   * (id, n_chars, n_tokens, n_distinct_tokens, avg_token_len, punct_ratio,
   * stopword_ratio). Ratios are NULL when the denominator is zero.
   */
  def stats(df: DataFrame, key: String, text: String): DataFrame = {
    val bag = wsBag(col(text))
    val nTokens = size(bag).cast("long")
    val sumLen = aggregate(bag, lit(0L), (acc, x) => acc + length(x))
    val punct = length(regexp_replace(col(text), "[a-zA-Z0-9\\s]", ""))
    val stops = size(filter(bag, x => array_contains(litArray(stopwordsEn), lower(x)))).cast("long")
    df.select(
      col(key).as("id"),
      length(col(text)).cast("long").as("n_chars"),
      nTokens.as("n_tokens"),
      size(array_distinct(transform(bag, lower(_)))).cast("long").as("n_distinct_tokens"),
      when(nTokens =!= 0, sumLen / nTokens).as("avg_token_len"),
      when(length(col(text)) =!= 0, punct.cast("long") / length(col(text)).cast("long")).as("punct_ratio"),
      when(nTokens =!= 0, stops / nTokens).as("stopword_ratio"))
  }

  /**
   * Language identification by stopword voting: count distinct tokens hitting
   * each language's stopword list; highest count wins with a fixed tie-break
   * order (en, es, fr, de); no hits → 'und'. A deliberately deterministic
   * n-gram-free heuristic, exactly replicable in the SQL oracle.
   */
  def languageId(df: DataFrame, key: String, text: String): DataFrame = {
    val tks = array_distinct(transform(wsBag(col(text)), lower(_)))
    def score(sw: Seq[String]): Column = size(array_intersect(tks, litArray(sw)))
    val (en, es, fr, de) = (score(stopwordsEn), score(stopwordsEs), score(stopwordsFr), score(stopwordsDe))
    val mx = greatest(en, es, fr, de)
    df.select(
      col(key).as("id"),
      en.cast("long").as("s_en"), es.cast("long").as("s_es"),
      fr.cast("long").as("s_fr"), de.cast("long").as("s_de"),
      when(mx === 0, "und")
        .when(en === mx, "en")
        .when(es === mx, "es")
        .when(fr === mx, "fr")
        .otherwise("de").as("lang_pred"))
  }

  /**
   * Token counting: whitespace tokens plus a BPE-ish segmentation count
   * (letter runs, digit runs, single punctuation marks — the usual pre-tokenizer
   * regex shape).
   */
  def tokenCounts(df: DataFrame, key: String, text: String): DataFrame =
    df.select(
      col(key).as("id"),
      size(wsBag(col(text))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(lower(col(text)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("n_bpeish_tokens"))

  /**
   * Composite quality score in (0, 1]: length-window gate x punctuation
   * cleanliness x stopword-profile plausibility — a deterministic heuristic
   * assembled from the [[stats]] signals (mirrored exactly in the SQL oracle).
   * Same double arithmetic order on both sides, so scores hash-match.
   */
  def qualityScore(df: DataFrame, key: String, text: String): DataFrame = {
    val s = stats(df, key, text)
    val lenGate = when(col("n_tokens") >= 5 && col("n_tokens") <= 2000, lit(1.0d))
      .otherwise(lit(0.5d))
    val punctFactor = coalesce(lit(1.0d) - col("punct_ratio"), lit(1.0d))
    val stopFactor = when(col("stopword_ratio").isNotNull &&
        col("stopword_ratio") > lit(0.05d) && col("stopword_ratio") < lit(0.6d), lit(1.0d))
      .otherwise(lit(0.8d))
    s.select(col("id"), (lenGate * punctFactor * stopFactor).as("quality_score"))
  }

  /**
   * Winnowing fingerprints (the MOSS scheme): hash every k-gram of the
   * lowercased text, slide a window of `w` consecutive gram hashes, keep each
   * window's minimum — any shared substring of length >= k + w - 1 between two
   * documents guarantees a shared fingerprint, so matching fingerprints find
   * PARTIAL overlap (plagiarism/quotation), which whole-document hashing
   * cannot. Gram hashes are md5-prefix STRINGS (identical bytes in any
   * engine), so the operator is deterministic and SQL-oracle-checked. Output:
   * one row per distinct (id, fingerprint).
   *
   * Scale: pure per-row column expressions into a distinct — shuffle traffic
   * is the fingerprint set (~|text|/w per doc), and an inverted
   * fingerprint->docs index is one groupBy away.
   */
  def winnowingFingerprints(df: DataFrame, key: String, text: String,
                            k: Int = 8, w: Int = 4): DataFrame = {
    // materialization barriers: explode(array(x)) emits one row carrying the
    // EVALUATED value. Without them CollapseProject inlines the expressions
    // into the downstream lambdas and every window re-hashes every gram (and
    // every gram re-lowercases the whole text) — O(|text|^2) interpreted
    // evaluation per document (measured: minutes for 5000 300-char docs; with
    // the barriers, seconds).
    val lowOnce = df.select(col(key).as("id"),
      explode(array(lower(col(text)))).as("lowtxt"))
    val low = col("lowtxt")
    val nGrams = length(low) - lit(k - 1)
    // guards: Spark sequence(1, n) counts DOWN for n < 1
    val gramIdx = when(nGrams >= 1, sequence(lit(1), nGrams))
      .otherwise(array().cast("array<int>"))
    val ghashes = transform(gramIdx, i => substring(md5(low.substr(i, lit(k))), 1, 16))
    val once = lowOnce.select(col("id"), explode(array(ghashes)).as("gh"))
    val winIdx = when(size(col("gh")) >= 1,
        sequence(lit(1), greatest(size(col("gh")) - lit(w - 1), lit(1))))
      .otherwise(array().cast("array<int>"))
    val fps = array_distinct(transform(winIdx, j => array_min(slice(col("gh"), j, lit(w)))))
    once.select(col("id"), explode(fps).as("fingerprint")).distinct()
  }

  /**
   * Partial-overlap pairs via shared winnowing fingerprints (the MOSS match
   * step): documents sharing >= `minShared` fingerprints — i.e. containing
   * common substrings of length >= k + w - 1 — are reported with their shared
   * count. This finds QUOTATION/plagiarism/boilerplate overlap that neither
   * whole-document hashing nor token-set Jaccard can (a long verbatim passage
   * inside otherwise-different documents).
   *
   * `maxDocFreq` drops fingerprints appearing in more than that many
   * documents before pairing — MOSS's own over-common-fingerprint rule
   * (boilerplate headers match everything and mean nothing). It is ALSO the
   * scale guard: the equi-join fan-out per fingerprint is bounded by
   * maxDocFreq², so the join never degenerates on corpus-wide boilerplate.
   *
   * Output: (lid, rid, n_shared) with lid < rid.
   */
  def winnowingOverlapPairs(df: DataFrame, key: String, text: String,
                            k: Int = 8, w: Int = 4, minShared: Int = 3,
                            maxDocFreq: Int = 100): DataFrame = {
    import graft.operators.PersistTracker.TrackedPersist
    val fps = winnowingFingerprints(df, key, text, k, w).persistTracked
    val keep = fps.groupBy("fingerprint").agg(count(lit(1)).as("ndocs"))
      .where(col("ndocs") <= maxDocFreq)
      .select(col("fingerprint"))
    val kept = fps.join(keep, "fingerprint")
    kept.alias("a").join(kept.alias("b"),
        col("a.fingerprint") === col("b.fingerprint") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("lid"), col("b.id").as("rid"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /**
   * Content fingerprint: md5 over the whitespace-normalized lowercased text.
   * Identical fingerprints ⇒ near-identical content modulo spacing/case — the
   * cheap first pass before MinHash in a dedup cascade.
   */
  def fingerprint(df: DataFrame, key: String, text: String): DataFrame =
    df.select(
      col(key).as("id"),
      md5(trim(regexp_replace(lower(col(text)), "\\s+", " "))).as("fingerprint"))

  /**
   * BM25 keyword retrieval: top-k documents for a query string.
   *
   *   score(d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
   *
   * Whitespace-bag term frequencies (same char class the join pipeline uses),
   * lowercased matching; N and avgdl are computed over documents with at
   * least one token. `lnIdf = true` (default) uses the canonical
   * `ln((N − df + 0.5)/(df + 0.5) + 1)`; `lnIdf = false` uses the rational
   * ln-argument itself as idf — rank-equivalent for single-term queries and
   * the form used by the DuckDB-verified gate query, because `ln` is not
   * bit-identical across engines (measured: a few 1-ulp differences per 6000
   * inputs) while +,-,*,/ are IEEE-exact everywhere.
   *
   * Deterministic scoring: per-document contributions are folded in TOKEN
   * ORDER (sorted collect_list → sequential fold), not via an unordered SUM —
   * double addition is non-associative, and an unordered aggregate would make
   * ranks run-dependent at ties.
   *
   * Scale: term filter prunes the token stream at the scan; df/stats are
   * broadcast; the only shuffle is the tf groupBy on (id, token); top-k plans
   * as TakeOrderedAndProject (per-partition heap + driver merge of k rows).
   */
  def bm25TopK(df: DataFrame, key: String, text: String, query: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
               lnIdf: Boolean = true): DataFrame = {
    val qterms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(qterms.nonEmpty, "query must contain at least one term")
    val toks = WhitespaceTokenizer(returnSet = false)
      .tokenize(df, key, text)
      .select(col("id"), col("len"), lower(col("token")).as("token"))
    // one broadcast row: corpus size + average doc length (exact integer sum,
    // one division — engine-identical, unlike avg()'s internal accumulation)
    val stats = broadcast(toks.select(col("id"), col("len")).distinct()
      .agg(count(lit(1)).as("n"),
        (sum(col("len")).cast("double") / count(lit(1))).as("avgdl")))
    val tf = toks.where(col("token").isin(qterms: _*))
      .groupBy("id", "token")
      .agg(count(lit(1)).as("tf"), min(col("len")).as("len"))
    val dfreq = broadcast(tf.groupBy("token").agg(count(lit(1)).as("df")))
    val idfArg = ((col("n") - col("df")) + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)
    val idf = if (lnIdf) log(idfArg) else idfArg
    val contrib = idf *
      ((col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + (lit(b) * col("len")) / col("avgdl"))))
    tf.join(dfreq, "token").crossJoin(stats)
      .select(col("id"), col("token"), contrib.as("c"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("token"), col("c")))).as("cs"))
      .select(col("id"),
        aggregate(transform(col("cs"), x => x.getField("c")), lit(0.0d), (acc, x) => acc + x)
          .as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /**
   * Corpus-trained bigram language-model quality score — the CCNet/KenLM
   * perplexity-filter shape, self-trained on the corpus itself so it needs no
   * external model artifact: estimate add-k-smoothed bigram conditionals
   *
   *   p(w2 | w1) = (c(w1,w2) + k) / (ctx(w1) + k·V)
   *
   * over the whole corpus (ctx(w1) = occurrences of w1 as a left context,
   * V = corpus vocabulary size), then score every document against the model.
   * Fluent, corpus-typical text scores high; gibberish, boilerplate-shredded
   * and wrong-language text scores low — the standard LM-based quality gate,
   * here fully distributed (counts are aggregates, scoring is two equi-joins).
   *
   * Output per document with >= 1 bigram (shorter docs have no defined score):
   *   (id, n_bigrams, sum_p, ll_per_bigram)
   * - `sum_p` is the DOCUMENT-ORDER sequential fold of the smoothed
   *   probabilities: integer→double casts, +, *, / only — IEEE-exact in any
   *   engine — so it is oracle-hash-checkable exactly (the bm25 rational-form
   *   rule; `ln` differs by ~1 ulp across engines and is kept OUT of it).
   * - `ll_per_bigram` is mean ln p — the conventional log-likelihood signal;
   *   spec-checked, excluded from the hashed oracle projection.
   *
   * Scale shape: model "training" is one groupBy on the bigram value (partial
   * aggregation collapses hot bigrams map-side) plus a re-aggregate of that
   * result for contexts — no second pass over the corpus; V is a one-row
   * broadcast. Scoring joins the exploded bigram stream to the model on its
   * natural keys and folds per document. Nothing touches the driver; the
   * model tables scale with VOCABULARY (Zipf-bounded), not corpus size.
   */
  /** Lowercased whitespace-token docs with >= 2 tokens — the shared
    * tokenization of [[bigramLmScore]] and
    * [[Curation.importanceSample]]: `(id, tks)`. */
  private[graft] def wsDocsLower(df: DataFrame, key: String, text: String): DataFrame =
    df.select(col(key).as("id"), wsBag(lower(col(text))).as("tks"))
      .where(size(col("tks")) >= 2)

  /** Document-order bigram stream over [[wsDocsLower]] rows:
    * `(id, pos, w1, w2)`, pos 0-based. */
  private[graft] def bigramStream(docs: DataFrame): DataFrame =
    docs.select(col("id"),
        posexplode(transform(sequence(lit(0), size(col("tks")) - 2),
          i => struct(element_at(col("tks"), i + 1).as("w1"),
                      element_at(col("tks"), i + 2).as("w2")))).as(Seq("pos", "b")))
      .select(col("id"), col("pos"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  def bigramLmScore(df: DataFrame, key: String, text: String,
                    k: Double = 1.0): DataFrame = {
    import graft.operators.PersistTracker.TrackedPersist
    val docs = wsDocsLower(df, key, text)
    // persisted: the bigram stream feeds the scoring join AND both model
    // aggregations — unpersisted, the optimizer re-derived it from the
    // parquet scan three times, re-paying the tokenize + posexplode that IS
    // this operator's CPU (plan audit, optimization r15; released via
    // Api.clearCache like every operator intermediate)
    val bg = bigramStream(docs).persistTracked
    val bgCounts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctxCounts = bgCounts.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = broadcast(docs.select(explode(col("tks")).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("V")))
    val p = (col("c12").cast("double") + lit(k)) /
      (col("c1").cast("double") + lit(k) * col("V"))
    bg.join(bgCounts, Seq("w1", "w2"))
      .join(ctxCounts, Seq("w1"))
      .crossJoin(vocab)
      .select(col("id"), col("pos"), p.as("p"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        array_sort(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .select(col("id"), col("n_bigrams"),
        aggregate(transform(col("ps"), x => x.getField("p")),
          lit(0.0d), (acc, x) => acc + x).as("sum_p"),
        (aggregate(transform(col("ps"), x => log(x.getField("p"))),
          lit(0.0d), (acc, x) => acc + x) / col("n_bigrams")).as("ll_per_bigram"))
  }
}
