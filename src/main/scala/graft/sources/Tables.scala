package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.core.{SeriesSpec, TimeIndex}

/** Readers for the driver testdata plus the canonical long-form series
  * adapter. All scans are plain parquet relations so Catalyst pushes
  * filters/projections into the scan.
  */
object Tables {

  /** events.parquet: the canonical reader is schema-adaptive because the
    * driver has shipped `ts` under three parquet physical contracts over
    * time — TIMESTAMP(NANOS) (reads as Long ns under
    * spark.sql.legacy.parquet.nanosAsLong=true), TIMESTAMP(MICROS,
    * adjusted=false) (reads as TimestampNTZ), and TIMESTAMP(MICROS,
    * adjusted=true) (reads as Timestamp). All three canonicalize to a µs
    * TimestampType under the UTC session timezone, matching DuckDB's µs
    * TIMESTAMP bit-for-bit.
    *
    * Time-slices are expressed against the RAW column type so Catalyst
    * pushes them into the scan (row-group/page pruning at scale); a
    * filter on a derived/cast column cannot push through the conversion.
    */
  def events(spark: SparkSession, dir: String,
      sliceUs: Option[(Long, Long)] = None): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")

    def sliced(loLit: Long => Column): DataFrame = sliceUs match {
      case Some((lo, hi)) =>
        raw.filter(col("ts") >= loLit(lo) && col("ts") < loLit(hi))
      case None => raw
    }

    raw.schema("ts").dataType match {
      case LongType =>
        // Legacy ns-as-Long path. For positive epochs,
        // ts_us >= lo ⟺ ts_ns >= lo·1000 exactly; `div` truncation
        // matches DuckDB's ns→µs load truncation.
        sliced(us => lit(us * 1000))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // µs naive timestamps: compare against an NTZ literal (pushes to
        // the scan), then reinterpret as UTC-instant TimestampType —
        // micros-exact ONLY under a UTC session timezone (the cast reads
        // the naive wall-clock in the session zone), so guard loudly
        // instead of silently shifting every instant.
        require(
          spark.conf.get("spark.sql.session.timeZone", "") == "UTC",
          "events reader: timestamp[us] NTZ parquet requires " +
            "spark.sql.session.timeZone=UTC (Sessions.local sets it)")
        sliced { us =>
          lit(java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC))
        }.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        // timestamp_micros(lit) constant-folds, so the predicate still
        // reaches the scan as a pushed filter.
        sliced(us => timestamp_micros(lit(us)))
      case other =>
        sys.error(s"events.parquet: unsupported ts type $other")
    }
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
