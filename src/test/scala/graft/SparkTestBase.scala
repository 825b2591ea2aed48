package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM, reused across suites). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Tiny single-series fixture: (ts-string, value-or-null) rows for
    * series key "s". Timestamps are "yyyy-MM-dd HH:mm:ss" UTC.
    */
  def series(rows: (String, Option[Double])*): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    rows.toSeq.toDF("ts_s", "value")
      .withColumn("series", lit("s"))
      .withColumn("ts", to_timestamp($"ts_s"))
      .select("series", "ts", "value")
  }

  def v(x: Double): Option[Double] = Some(x)
  val na: Option[Double] = None
}
