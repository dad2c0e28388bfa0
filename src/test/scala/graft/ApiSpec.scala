package graft

import graft.operators._

/** The reference-shaped, name-based API: tables in the catalog, results as
  * temp views, connection-in/connection-out (reference jaccard_join.py:9-33,
  * exam.ipynb cells 11-12 golden outputs). */
class ApiSpec extends SparkSpec {

  private val ws = WhitespaceTokenizer()

  private def loadPurchases(): Unit =
    spark.read.option("header", true).option("inferSchema", true)
      .csv("data/fixtures/purchases.csv")
      .createOrReplaceTempView("purchases")

  test("jaccardJoin: name in, temp view out, reference golden orientation") {
    loadPurchases()
    val s = Api.jaccardJoin(spark, "purchases", "", "id", "id",
      "purchases", "purchases", ws, 0.5, outTable = "matches_api")
    assert(s eq spark)
    assert(pairSet(spark.table("matches_api")) === Set((3L, 5L), (6L, 2L)))
    Api.clear(spark, "matches_api")
    assert(!spark.catalog.tableExists("matches_api"))
  }

  test("jaccardJoinBruteForce golden + evaluate over views") {
    loadPurchases()
    Api.jaccardJoinBruteForce(spark, "purchases", "purchases", "id", "id",
      "purchases", "purchases", ws, 0.5, outTable = "bf_api")
    assert(pairSet(spark.table("bf_api")) === Set((2L, 6L), (3L, 5L)))
    Api.jaccardJoin(spark, "purchases", "", "id", "id",
      "purchases", "purchases", ws, 0.5, outTable = "sj_api")
    val m = Api.evaluate(spark, "bf_api", "sj_api", "l_id", "r_id", "l_id", "r_id")
    // same unordered pairs: tp = |sj|, no false positives/negatives
    assert(m === EvalMetrics(2, 0, 0, 1.0, 1.0, 1.0))
    Api.clear(spark, "bf_api", "sj_api", "purchases")
  }

  test("jaccardJoin dispatches to R x S when tables differ") {
    loadPurchases()
    spark.table("purchases").selectExpr("id + 100 AS rid", "purchases AS rtext")
      .createOrReplaceTempView("purchases_r")
    Api.jaccardJoin(spark, "purchases", "purchases_r", "id", "rid",
      "purchases", "rtext", ws, 0.9, outTable = "rs_api")
    val out = spark.table("rs_api")
    // every row pairs with its own shifted copy (J = 1.0)
    val cols = out.columns.toSet
    assert(cols.exists(_.endsWith("id")) && cols.exists(_.endsWith("rid")))
    assert(out.count() === 6L)
    Api.clear(spark, "rs_api", "purchases_r", "purchases")
  }
}
