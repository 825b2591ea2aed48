package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{SeriesSpec, TimeIndex}

/** Readers for the driver testdata plus the canonical long-form series
  * adapter. All scans are plain parquet relations so Catalyst pushes
  * filters/projections into the scan.
  */
object Tables {

  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which the
    * Spark vectorized reader rejects; with
    * spark.sql.legacy.parquet.nanosAsLong=true it reads as Long ns.
    * Canonicalize to a µs TimestampType via integer division — this is
    * the same truncation DuckDB applies when it loads ns parquet into
    * its µs TIMESTAMP, so both engines agree bit-for-bit.
    */
  def events(spark: SparkSession, dir: String,
      sliceUs: Option[(Long, Long)] = None): DataFrame = {
    // The flag must be set at SparkSession construction (Bench/Verify/
    // EntrySmoke/tests all do) — setting it here would mutate reader
    // behavior session-wide as a hidden side effect of building a query.
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true when building the SparkSession")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // Time-slices must hit the RAW ns column so Catalyst pushes them
    // into the scan (row-group pruning at scale); a filter on the
    // derived µs timestamp cannot push through the conversion. For
    // positive epochs, ts_us >= lo ⟺ ts_ns >= lo·1000 exactly.
    val sliced = sliceUs match {
      case Some((lo, hi)) => raw.filter(col("ts") >= lo * 1000 && col("ts") < hi * 1000)
      case None => raw
    }
    sliced.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** The events stream as a canonical long-form series table:
    * `user_id` is the series key, `value` the measurement; duplicate
    * timestamps are dropped keep-first by event_id (the deterministic
    * stand-in for the reference's file-order keep-first,
    * ufz_water_qc_pipeline.py:74).
    */
  val eventsSpec: SeriesSpec = SeriesSpec(keys = Seq("user_id"))

  def eventsSeries(spark: SparkSession, dir: String,
      sliceUs: Option[(Long, Long)] = None): DataFrame =
    TimeIndex.dedupKeepFirst(
      events(spark, dir, sliceUs).select("user_id", "ts", "value", "event_id"),
      eventsSpec, col("event_id"))
      .drop("event_id")
}
