package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval — reciprocal-rank fusion (RRF, Cormack/Clarke/Buettcher
 * SIGIR'09) of a lexical BM25 ranking and a dense exact-cosine ranking over
 * the SAME corpus: the standard two-tower retrieval shape of a training-data
 * pipeline (mining paired/contrastive examples, dedup-aware retrieval eval,
 * RAG candidate generation). Each retriever contributes
 * `1 / (kRrf + rank)` for documents inside its own top-`poolSize` pool and
 * nothing outside it; the fused top-k orders by the summed score.
 *
 * RRF is rank-only — the two retrievers' raw scores are never mixed, which
 * is exactly why it needs no score normalization and why it is
 * oracle-hash-checkable: integer ranks feed a fixed two-term rational
 * expression (+, / on doubles — IEEE-exact on any engine), and both
 * constituent rankings (BM25 rational-idf fold, sequential-fold cosine) are
 * individually hash-proven against DuckDB already.
 *
 * Conventions, mirrored exactly in the oracle SQL:
 * - the ANN side excludes the query vector itself ([[Similarity.topKExact]]
 *   semantics); the BM25 pool drops `queryVecId` too (re-ranked after the
 *   drop), so "the query document" can never retrieve itself through the
 *   lexical tower alone — the pool may then hold poolSize-1 docs, immaterial
 *   at poolSize >> k;
 * - a doc absent from one pool gets that tower's term = 0 and rank sentinel
 *   -1 (a NULL rank would hash as NaN through the parquet/pandas compare).
 *
 * Scale shape: the BM25 plan is the audited [[TextAnalysis.bm25TopK]]
 * (term-pruned scan, broadcast df/stats, one tf shuffle,
 * TakeOrderedAndProject); the dense side broadcasts the single query vector
 * over a corpus scan into the same TakeOrdered pattern. Everything after the
 * two pools — the full-outer fuse, the single-partition rank windows, the
 * final top-k — touches at most 2·poolSize rows BY CONSTRUCTION, so the
 * unpartitioned windows are bounded, not a scale hazard. At 100 TB the cost
 * is two corpus scans (each pruned to its own columns); the fusion is free.
 */
object Retrieval {

  /**
   * RRF-fused top-k over a BM25 text query and an exact-cosine query vector.
   *
   * @param docs        corpus with (`docKey`, `textCol`)
   * @param embeddings  same corpus's vectors as (`embKey`, `vecCol`), keyed
   *                    compatibly with `docKey`
   * @param queryText   whitespace-separated BM25 terms
   * @param queryVecId  key of the query embedding row (the dense query)
   * Output: (id, rrf_score, bm25_rank, ann_rank), top `k` by score desc with
   * id tie-break; absent-pool ranks are -1.
   */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame,
                 docKey: String, textCol: String,
                 embKey: String, vecCol: String,
                 queryText: String, queryVecId: Long,
                 k: Int = 10, poolSize: Int = 50, kRrf: Int = 60,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(poolSize >= k, s"poolSize $poolSize must cover k $k")
    // lexical pool: rational-idf BM25 (the hash-exact form), query doc
    // dropped, re-ranked — the window is over <= poolSize rows
    val bm = TextAnalysis.bm25TopK(docs, docKey, textCol, queryText,
        poolSize, k1, b, lnIdf = false)
      .where(col("id") =!= queryVecId)
      .select(col("id"), row_number()
        .over(Window.orderBy(col("score").desc, col("id")))
        .cast("long").as("bm25_rank"))
    // dense pool: broadcast single-query exact top-k (self-excluding)
    val ann = Similarity.topKExact(embeddings,
        embeddings.where(col(embKey) === queryVecId), embKey, vecCol, poolSize)
      .select(col("neighbor_id").as("id"), col("rank").as("ann_rank"))
    val bmTerm = coalesce(lit(1.0d) / (lit(kRrf) + col("bm25_rank")), lit(0.0d))
    val annTerm = coalesce(lit(1.0d) / (lit(kRrf) + col("ann_rank")), lit(0.0d))
    bm.join(ann, Seq("id"), "full_outer")
      .select(col("id"), (bmTerm + annTerm).as("rrf_score"),
        coalesce(col("bm25_rank"), lit(-1L)).as("bm25_rank"),
        coalesce(col("ann_rank"), lit(-1L)).as("ann_rank"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(k)
  }
}
