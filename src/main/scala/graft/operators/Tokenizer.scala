package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Tokenizers: `DataFrame(key, value, …)` → `DataFrame(id, len, token)`.
 *
 * Semantics mirror the reference's SQL-template tokenizers
 * (reference: py_duckdb/similarity_join/tokenizers/__init__.py:1-49) re-expressed as
 * declarative Spark column expressions, so Catalyst can fuse them into whole-stage
 * codegen with the downstream join pipeline — no UDFs.
 *
 * Contract (matches the reference exactly):
 *   - `id`    = the key attribute, unchanged.
 *   - `len`   = number of tokens of the record (set or bag cardinality, per `returnSet`).
 *   - `token` = one output row per token; rows with NULL/empty token arrays disappear
 *               (DuckDB `unnest` ≡ Spark `explode`).
 *
 * Set vs bag: `returnSet = false` skips the distinct step
 * (reference: tokenizers/__init__.py:3-5 strips `list_distinct`).
 */
sealed trait Tokenizer extends Serializable {
  def returnSet: Boolean

  /** True when a record can NEVER emit two identical token rows — lets the
    * verification layers skip per-pair duplicate checks and use plain set
    * intersection. Q-grams lowercase INSIDE the window expression, so their
    * set mode is duplicate-free; delimiter tokenizers distinct BEFORE
    * lowercasing (faithful reference quirk), so case variants can collide
    * after emission; every bag mode can duplicate. */
  def emitsDistinctTokens: Boolean = false

  /** The token array for one value, BEFORE the optional distinct step. */
  protected def tokenArray(value: Column): Column

  /** Per-token transform applied at emission, after explode. */
  protected def emit(token: Column): Column

  /** Append `(len, token)` built from `valueCol`, keeping `keyCol` as `id`. */
  def tokenize(df: DataFrame, key: String, value: String): DataFrame = {
    val arr0 = tokenArray(col(value))
    val arr  = if (returnSet) array_distinct(arr0) else arr0
    df.select(col(key).as("id"), arr.as("tks"))
      .select(col("id"), size(col("tks")).cast("long").as("len"), explode(col("tks")).as("tk"))
      .select(col("id"), col("len"), emit(col("tk")).as("token"))
  }
}

/**
 * Q-gram tokenizer: pads the lowercased value with `q-1` '#' on both sides and emits
 * all `len(value) + q - 1` sliding windows of width q
 * (reference: tokenizers/__init__.py:11-26).
 *
 * Note the reference lowercases INSIDE the window expression, so in set mode the
 * distinct runs over already-lowercased grams. The trailing `lower(unnest(tks))` is a
 * no-op for q-grams; we keep it for uniformity.
 */
final case class QGramsTokenizer(q: Int, returnSet: Boolean = true) extends Tokenizer {
  require(q >= 1, s"q must be >= 1, got $q")

  override def emitsDistinctTokens: Boolean = returnSet

  override protected def tokenArray(value: Column): Column = {
    val pad    = lit("#" * (q - 1))
    val padded = concat(pad, lower(value), pad)
    val stop   = length(value) + lit(q - 1)
    // DuckDB generate_series(1, n) is empty when n < 1; Spark sequence would count DOWN.
    val idx = when(stop >= 1, sequence(lit(1), stop)).otherwise(array().cast("array<int>"))
    transform(idx, x => padded.substr(x, lit(q)))
  }

  override protected def emit(token: Column): Column = lower(token)
}

/**
 * Delimiter tokenizer: regex-split on a character class, drop blank tokens, distinct,
 * lowercase at emission (reference: tokenizers/__init__.py:29-43).
 *
 * ⚠ Faithful quirk: the reference applies `list_distinct` BEFORE lowercasing (lowering
 * happens at `lower(unnest(tks))`), so "Whisk whisk" yields len=2 and TWO identical
 * 'whisk' token rows. Replicated exactly — document frequencies depend on it.
 *
 * ⚠ Deliberate deviation: separators that are regex-class metacharacters (']', '-',
 * '\', '^', '&') are ESCAPED here, whereas the reference interpolates them raw into
 * `str_split_regex('[<seps>]')` and produces a broken or differently-interpreted
 * character class. Splitting on the literal separator characters is the intended
 * behavior; outputs diverge from the reference only for such separators.
 */
final case class DelimiterTokenizer(separators: Set[Char], returnSet: Boolean = true)
    extends Tokenizer {
  require(separators.nonEmpty, "need at least one separator")

  private val charClass: String = {
    // escape regex-class metacharacters
    val escaped = separators.toSeq.sorted.map {
      case c @ ('\\' | ']' | '[' | '^' | '-' | '&') => "\\" + c
      case '\t' => "\\t"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c    => c.toString
    }
    s"[${escaped.mkString}]"
  }

  override protected def tokenArray(value: Column): Column =
    filter(split(value, charClass), x => trim(x) =!= "")

  override protected def emit(token: Column): Column = lower(token)
}

/** Whitespace tokenizer = delimiter on { ' ', \t, \r, \n } (reference: tokenizers/__init__.py:46-49). */
object WhitespaceTokenizer {
  def apply(returnSet: Boolean = true): DelimiterTokenizer =
    DelimiterTokenizer(Set(' ', '\t', '\r', '\n'), returnSet)
}
