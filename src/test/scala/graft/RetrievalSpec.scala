package graft

import graft.operators._

/** RRF hybrid-retrieval tests: fused ranking against a plain-Scala reference
  * on a corpus whose two tower rankings are known by construction. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // Docs engineered so the BM25 ranking for query "alpha" is pure tf order:
  // one query term (uniform df contribution), every doc exactly 6 tokens
  // (uniform length normalization). tf: doc0=4 > doc1=3 > doc2=2 > doc3=1;
  // docs 4/5 score zero (outside the lexical pool entirely).
  private val docs = Seq(
    0L -> "alpha alpha alpha alpha pad pad",
    1L -> "alpha alpha alpha pad pad pad",
    2L -> "alpha alpha pad pad pad pad",
    3L -> "alpha pad pad pad pad pad",
    4L -> "beta beta beta beta beta beta",
    5L -> "gamma gamma gamma gamma gamma gamma")

  // 2-d vectors with query vec 5 at angle 0; cosine to it strictly decreases
  // with index distance from 5's direction: ann ranking (self excluded) is
  // 4 > 3 > 2 > 1 > 0 by construction.
  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }
  private val embs = Seq(
    0L -> vec(80), 1L -> vec(60), 2L -> vec(40), 3L -> vec(20),
    4L -> vec(10), 5L -> vec(0))

  test("hybridTopK == plain-Scala RRF of the two known rankings") {
    // query doc 5 is dropped from the BM25 pool by convention (here it was
    // never in it — "gamma" doesn't match) and self-excluded from ANN.
    val bmRank = Map(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L)
    val annRank = Map(4L -> 1L, 3L -> 2L, 2L -> 3L, 1L -> 4L, 0L -> 5L)
    val kRrf = 60
    val expected = (0L to 4L).map { id =>
      val s = bmRank.get(id).map(r => 1.0 / (kRrf + r)).getOrElse(0.0) +
        annRank.get(id).map(r => 1.0 / (kRrf + r)).getOrElse(0.0)
      (id, s, bmRank.getOrElse(id, -1L), annRank.getOrElse(id, -1L))
    }.sortBy { case (id, s, _, _) => (-s, id) }.take(5)

    val out = Retrieval.hybridTopK(docs.toDF("doc_id", "text"),
        embs.toDF("vec_id", "embedding"), "doc_id", "text",
        "vec_id", "embedding", "alpha", queryVecId = 5L, k = 5,
        poolSize = 10, kRrf = kRrf)
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(out === expected)
    // every dual-pool doc outranks the single-pool doc 4: its lone ann
    // rank 1 (1/61) loses even to doc 3's 1/64 + 1/62
    assert(out.head._1 === 0L) // 1/61 + 1/65, the best combined sum
    assert(out.map(_._1).indexOf(3L) < out.map(_._1).indexOf(4L))
    // docs 1 and 3 sum the SAME two terms (1/62 + 1/64) — id tie-break
    assert(out.map(_._1).indexOf(1L) < out.map(_._1).indexOf(3L))
  }

  test("hybridTopK drops the query doc from the lexical pool and re-ranks") {
    // make the query doc itself the strongest lexical match: it must not
    // appear in the output, and the survivors' bm25 ranks close the gap
    val docs2 = (6L -> "alpha alpha alpha alpha alpha pad") +: docs
    val out = Retrieval.hybridTopK(docs2.toDF("doc_id", "text"),
        (embs :+ (6L -> vec(0))).toDF("vec_id", "embedding"), "doc_id", "text",
        "vec_id", "embedding", "alpha", queryVecId = 6L, k = 6,
        poolSize = 10, kRrf = 60)
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(!out.exists(_._1 == 6L))
    // doc 0 (tf 4) is re-ranked to bm25_rank 1 after the query doc drops out
    assert(out.find(_._1 == 0L).get._3 === 1L)
    // sentinel ranks: doc 4 never matches "alpha" -> bm25_rank -1
    assert(out.find(_._1 == 4L).get._3 === -1L)
  }
}
