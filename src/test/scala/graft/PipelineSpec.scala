package graft

import graft.operators.{Pipeline, WhitespaceTokenizer}
import org.apache.spark.sql.functions._

/** End-to-end curation invariants on an engineered corpus. The exact
  * stage-by-stage parity is proven by the DuckDB oracle (pipeline_curate_docs);
  * this spec pins the semantic shape: which docs survive and how they pack. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("gates, dedup stages, and packing compose as the standalone operators") {
    val good = "the quick brown fox jumps over the lazy dog and that is it for now"
    val docs = Seq(
      1L -> good,                          // survives
      2L -> good,                          // exact dup of 1 -> dropped (min id kept)
      3L -> (good + " indeed"),            // near-dup of 1 at ws t=0.9 -> clustered, dropped
      4L -> "tok",                         // fails the length gate (quality 0.5*... < 0.5)
      5L -> ("zzz qqq xxx vvv kkk www " +
             "mmm nnn ppp rrr sss ttt"),   // no stopwords, no lang signal -> 'und', dropped
      6L -> ("a completely different document with plenty of the usual english " +
             "stopword signal that it should keep for sure in the end")
    ).toDF("doc_id", "text")
    val out = Pipeline.curateAndPack(docs, "doc_id", "text",
        minQuality = 0.5, WhitespaceTokenizer(), nearDupThreshold = 0.9, binBudget = 16L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(1L, 6L))
    // packing order is by id: doc 1 (15 ws tokens) fills bin 0 first
    assert(out(1L)._2 === 0L && out(1L)._3 === 0L)
    // doc 6 starts at offset 15 of bin 0 (15 + 21 straddles the 16 boundary)
    assert(out(6L)._2 === 0L && out(6L)._3 === 15L)
  }
}
