package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.core.{SeriesSpec, TimeIndex}

/** Ingestion (reference `read_data`/`ensure_time_index`,
  * scripts/ufz_water_qc_pipeline.py:68-75, :150-155): CSV scan with
  * explicit schema, timestamp parse, optional tz localization,
  * optional station filter (pushed into the scan by Catalyst), NaN →
  * NULL normalization, keep-first dedup, and the wide↔long reshape
  * that turns the reference's per-variable loop into our partition
  * axis.
  */
object Ingest {

  /** CSV → DataFrame with a parsed `ts` column. `schema` None infers
    * (convenience flag only — explicit schemas at scale).
    */
  def readCsvTimeSeries(spark: SparkSession, path: String,
      schema: Option[StructType] = None, tsCol: String = "timestamp",
      tz: Option[String] = None, stationField: Option[String] = None,
      stationValue: Option[String] = None): DataFrame = {
    val rd = spark.read.option("header", "true")
    val base = schema.map(rd.schema).getOrElse(rd.option("inferSchema", "true"))
      .csv(path)
    val withTs = tz match {
      case Some(z) => base.withColumn("ts", to_utc_timestamp(col(tsCol), z))
      case None => base.withColumn("ts", to_timestamp(col(tsCol)))
    }
    (stationField, stationValue) match {
      case (Some(f), Some(v)) => withTs.filter(col(f) === v)
      case _ => withTs
    }
  }

  /** NaN → NULL for the given double columns (the reference's NaN IS
    * its NULL — SURVEY §1.2; Spark distinguishes them, we normalize at
    * the boundary).
    */
  def nanToNull(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, when(isnan(col(c)), lit(null)).otherwise(col(c))))

  /** Wide → long unpivot: one row per (idCols, variable, value).
    * The scalable layout — each (station, variable) series becomes one
    * window partition.
    */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      varName: String = "variable", valName: String = "value"): DataFrame = {
    val kvs = valueCols.map(c =>
      s"'${c.replace("'", "\\'")}', CAST(`$c` AS DOUBLE)").mkString(", ")
    df.selectExpr(
      (idCols :+ s"stack(${valueCols.size}, $kvs) as ($varName, $valName)"): _*)
  }

  /** Full `ensure_time_index` equivalent: parse → NaN-normalize →
    * keep-first dedup by tiebreaker. Sorted-by-time is implicit in
    * every downstream window.
    */
  def ensureTimeIndex(df: DataFrame, spec: SeriesSpec, tiebreak: Column): DataFrame =
    TimeIndex.dedupKeepFirst(nanToNull(df, Seq(spec.value)), spec, tiebreak)
}
