package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per `sbt test` run). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  /** Result rows as a set of (l, r) Long pairs — order-insensitive compare. */
  def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (toLong(r, 0), toLong(r, 1))).toSet

  /** Unordered pair set: orientation-insensitive compare. */
  def unorderedPairSet(df: DataFrame): Set[(Long, Long)] =
    pairSet(df).map { case (a, b) => if (a <= b) (a, b) else (b, a) }

  private def toLong(r: Row, i: Int): Long = r.get(i) match {
    case l: Long => l
    case i2: Int => i2.toLong
    case s: String => s.toLong
    case other => sys.error(s"unexpected key type: $other")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // keep the 128-column MinHash aggregate inside whole-stage codegen
      .config("spark.sql.codegen.maxFields", 256)
      // the events table stores TIMESTAMP(NANOS) parquet - read as epoch-nano longs
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.Api.quietBoundedWindowLogs()
    s
  }
}
