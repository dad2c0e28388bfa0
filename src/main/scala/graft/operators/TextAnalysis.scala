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
   * Content fingerprint: md5 over the whitespace-normalized lowercased text.
   * Identical fingerprints ⇒ near-identical content modulo spacing/case — the
   * cheap first pass before MinHash in a dedup cascade.
   */
  def fingerprint(df: DataFrame, key: String, text: String): DataFrame =
    df.select(
      col(key).as("id"),
      md5(trim(regexp_replace(lower(col(text)), "\\s+", " "))).as("fingerprint"))
}
