package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.PersistTracker.TrackedPersist

/**
 * Sequence packing: assign documents, taken in ascending key order, to
 * fixed token-budget bins — the curation step before training-sequence
 * construction (each bin becomes one packed context window; a doc whose
 * tokens straddle a boundary starts in `bin_id` at `bin_offset` and the
 * downstream writer splits or pads it).
 *
 * `bin_id = tokens_before / budget`, `bin_offset = tokens_before % budget`,
 * where tokens_before is the exclusive prefix sum of token counts in key
 * order — i.e. the textbook `sum(n) OVER (ORDER BY id) - n`.
 *
 * Scale shape: that textbook window is UN-PARTITIONED — Spark executes it
 * by moving every row to a single task, the one plan shape that can never
 * scale. This implementation is the classic distributed two-pass prefix
 * sum instead:
 *
 *   1. range-repartition by key and sort within partitions (ranges are
 *      ascending, so partition p holds keys strictly below partition p+1);
 *   2. pass 1 computes ONE partial sum per partition (nPart numbers to the
 *      driver — partition COUNT, not row count, so fine at any scale);
 *   3. an exclusive scan over those partials gives each partition its
 *      starting offset;
 *   4. pass 2 rescans each partition sequentially, emitting running
 *      offsets. The input is cached between passes so both see identical
 *      range bounds.
 *
 * The DuckDB oracle runs the sequential window form; hash-equality proves
 * the distributed scan reproduces it exactly. This is one of the few graft
 * operators on RDD `mapPartitions` — a per-partition SEQUENTIAL scan is
 * the semantics, so per-partition imperative code is the honest shape.
 */
object Packing {

  /**
   * Context-window chunking — split each document into fixed-size token
   * windows with `overlap` tokens of left context carried between
   * consecutive windows: the standard pre-training document-splitting step
   * for docs longer than the model context (the complement of [[packBins]],
   * which handles docs SHORTER than the context). Window starts advance by
   * `stride = maxTokens - overlap`; the last window may be shorter; a doc
   * with no tokens emits nothing. Whitespace bag tokenization, case kept
   * (the [[TextAnalysis]] wsBag char class), windows re-joined with a
   * single space.
   *
   * Window count = 1 + ceil((n - maxTokens) / stride) for n > maxTokens —
   * exactly enough that every token is covered and no start is emitted
   * past coverage (a naive `sequence(1, n, stride)` emits a redundant
   * trailing window whenever the previous one already reached the end).
   *
   * Output: (id, chunk_idx, n_tokens, chunk_text), chunk_idx 0-based.
   *
   * Scale shape: pure per-row column expressions — split, one arithmetic
   * window count, transform+slice over the token array, explode. ZERO
   * shuffles; output rows ∝ total tokens / stride. Deterministic, so the
   * oracle hash-checks the chunk text itself.
   */
  def chunkDocs(df: DataFrame, key: String, text: String,
                maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val tks = filter(split(col(text), "[\t\n\r ]"), x => trim(x) =!= "")
    val n = size(col("tks")).cast("long")
    // exact for n < 2^52: double division then ceil on integer-valued args
    val nWin = when(n <= maxTokens, lit(1L))
      .otherwise(lit(1L) + ceil((n - lit(maxTokens)).cast("double") / stride).cast("long"))
    df.select(col(key).as("id"), tks.as("tks"))
      .where(size(col("tks")) >= 1)
      .select(col("id"), posexplode(transform(sequence(lit(0L), nWin - 1), i =>
        slice(col("tks"), (i * stride + 1).cast("int"), lit(maxTokens))))
        .as(Seq("chunk_idx", "ctks")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("ctks")).cast("long").as("n_tokens"),
        array_join(col("ctks"), " ").as("chunk_text"))
  }

  /**
   * Packed-SEQUENCE emitter — the step after [[packBins]] that materializes
   * what a trainer actually loads: one row per bin with the member documents'
   * text concatenated in key order behind a document separator (the
   * `<|endoftext|>`-style boundary marker). A document belongs to the bin
   * where it STARTS (its [[packBins]] `bin_id`); a straddling document keeps
   * its full text here and the trainer-side loader splits or pads at the
   * budget — the same contract packBins documents. `n_tokens` is the bin's
   * member-token sum, so a straddler's bin can exceed the budget by up to
   * one document.
   *
   * Output: (bin_id, n_docs, n_tokens, seq_text).
   *
   * Scale shape: the two-pass prefix sum of [[packBins]] plus one equi-join
   * back to the text and one groupBy on bin_id. Per-bin payload is bounded
   * by the token budget (plus one straddler), so the collect_list aggregate
   * is budget-sized regardless of corpus size — no skew beyond the budget
   * itself. Deterministic, so the oracle hash-checks the sequence text.
   */
  def packedSequences(df: DataFrame, key: String, text: String,
                      nTokens: Column, budget: Long,
                      sep: String = "<|doc|>"): DataFrame = {
    val bins = packBins(df, key, nTokens, budget)
    val docs = df.select(col(key).cast("long").as("id"), col(text).as("txt"))
    bins.join(docs, "id")
      .groupBy(col("bin_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("id"), col("txt")))),
            s => s.getField("txt")), sep).as("seq_text"))
  }

  /**
   * @param df      input with a unique orderable key and a token count
   * @param key     unique id column (long-castable; defines packing order)
   * @param nTokens token-count column expression (long-castable)
   * @param budget  bin capacity in tokens (≥ 1)
   * @return (id, n_tokens, bin_id, bin_offset), one row per input row
   */
  def packBins(df: DataFrame, key: String, nTokens: Column, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val base = df.select(col(key).cast("long").as("id"), nTokens.cast("long").as("n"))
      .repartitionByRange(nPart, col("id"))
      .sortWithinPartitions("id")
      .persistTracked
    // pass 1: one partial sum per partition
    val partials = base.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        while (it.hasNext) s += it.next().getLong(1)
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    // exclusive scan: partition p starts at the sum of all earlier partitions
    val starts = partials.scanLeft(0L)(_ + _).init
    // pass 2: sequential scan per partition from its start offset
    val out = base.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = starts(pid)
      it.map { r =>
        val before = cum
        cum += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), before / budget, before % budget)
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("bin_id", LongType, nullable = false),
      StructField("bin_offset", LongType, nullable = false))))
  }
}
