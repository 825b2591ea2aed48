package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{SeriesSpec, TimeIndex}
import graft.operators.{Gaps, Runs, Sentinels}
import graft.sources.Ingest

object DebugGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spec = SeriesSpec(Seq("series"))
    val v = "SurfaceWaterConcentration_O2_mg_L-1"
    val wide = spark.read.parquet("/root/reference/scripts/water_qc_output/processed/Erkenruh_Einruhr/Erkenruh_Einruhr__qc_timeseries.parquet")
    val raw = Ingest.nanToNull(wide.select(lit(v).as("series"),
      timestamp_micros(expr("timestamp div 1000")).as("ts"),
      col(s"${v}__raw").as("value")), Seq("value"))
    println(s"rows=${raw.count()} nonnull=${raw.filter(col("value").isNotNull).count()}")
    val d0 = Sentinels.mask(raw, spec)
    val d1 = TimeIndex.withDeltaUs(d0, spec)
    val clean = Gaps(d1, spec, gapHours = 2.0)
    println(s"gapmasked=${clean.filter(col("is_gap")).count()}")
    val flats = Runs.flatValues(clean, spec, minHours = 2.0)
    println(s"flats=${flats.count()}")
    flats.orderBy("start")
      .select(unix_micros(col("start")).as("start_us"), unix_micros(col("end")).as("end_us"), round(col("hours"), 6).as("hours"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv("/tmp/ourflats")
    spark.stop()
  }
}
