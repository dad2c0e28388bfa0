package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.PersistTracker.TrackedPersist

/**
 * End-to-end training-data curation: the individual operators composed the
 * way a production pipeline runs them, as ONE lazy plan —
 *
 *   1. quality gate   — [[TextAnalysis.qualityScore]] ≥ `minQuality`;
 *   2. language gate  — [[TextAnalysis.languageId]] prediction ≠ 'und'
 *      (both gates are pure column expressions: no shuffle, and Catalyst
 *      collapses them into the same scan);
 *   3. exact dedup    — keep the MIN key per content hash
 *      ([[Dedup.exact]]; one shuffle);
 *   4. near-dup clustering keep — transitive clusters over the filtered
 *      survivors' Jaccard pair graph, one representative per cluster
 *      ([[Dedup.clusterKeepIds]] over [[JaccardJoin.selfJoinDeduped]]);
 *   5. sequence packing — survivors into fixed token-budget bins
 *      ([[Packing.packBins]] over [[TextAnalysis.tokenCounts]]).
 *
 * Ordering is the cheap-stage-first cascade: the column-expression gates
 * shrink the corpus before anything shuffles, exact dedup shrinks it again
 * before the (most expensive) similarity join, and packing runs last on
 * the smallest frame. Every stage keeps its standalone operator's exact
 * semantics — the whole composition is DuckDB-oracle-verified end-to-end.
 *
 * Output: (id, n_tokens, bin_id, bin_offset) for every surviving document.
 */
object Pipeline {

  def curateAndPack(docs: DataFrame, key: String, text: String,
                    minQuality: Double, tokenizer: Tokenizer,
                    nearDupThreshold: Double, binBudget: Long): DataFrame = {
    val passQ = TextAnalysis.qualityScore(docs, key, text)
      .where(col("quality_score") >= minQuality)
      .select(col("id").as("q_id"))
    val passL = TextAnalysis.languageId(docs, key, text)
      .where(col("lang_pred") =!= "und")
      .select(col("id").as("l_id"))
    // each stage's frame feeds 2+ downstream subtrees — cache the narrow
    // survivors, not the raw corpus (PersistTracker releases them on
    // Api.clearCache)
    val gated = docs
      .join(passQ, col(key) === col("q_id"), "left_semi")
      .join(passL, col(key) === col("l_id"), "left_semi")
      .persistTracked
    val keepExact = Dedup.exact(gated, key, text).select(col("keep_id"))
    // persist caches the rows (reused across re-constructions of the same
    // plan); localCheckpoint cuts the lineage so the similarity join, the
    // cluster loop, and the packing passes downstream all carry an RDD leaf
    // instead of re-printing the gate/dedup subtree in every action's plan
    // string (see clusterIds' edges note — same driver-side cost)
    val deduped = Checkpoints.cut(
      gated.join(keepExact, col(key) === col("keep_id"), "left_semi")
        .persistTracked)
    val clusterKeep = Dedup.clusterKeepIds(deduped, key,
        JaccardJoin.selfJoinDeduped(deduped, key, text, tokenizer, nearDupThreshold),
        s"l_$key", s"r_$key")
      .select(col(key).as("ck_id"))
    val survivors = deduped.join(clusterKeep, col(key) === col("ck_id"), "left_semi")
    Packing.packBins(TextAnalysis.tokenCounts(survivors, key, text),
      "id", col("n_ws_tokens"), binBudget)
  }
}
