package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Thin source readers (S1/S2 in SURVEY.md §2.1). The reference reads CSV with
 * auto schema (`FROM 'data/x.csv'`, notebook.ipynb cell 9) and JSON-lines via
 * pandas replacement scan (cells 30/33); both map to spark.read.
 *
 * At scale: prefer parquet for anything hot; CSV/JSON scans are
 * schema-inferred here for parity with the reference's auto-detection, but
 * production pipelines should pass an explicit schema to skip the inference
 * pass over the data.
 */
object Sources {

  /** S1: CSV with header + schema inference. */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).option("inferSchema", true).csv(path)

  /** S2: JSON-lines. */
  def jsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
