package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.SeriesSpec

/** Tumbling-window resampling (reference optional
  * `data.resample(freq).median()` before the QC suite,
  * scripts/ufz_water_qc_pipeline.py:462-463). Buckets are epoch-
  * aligned like pandas' default origin; the bucket key is plain
  * integer arithmetic so it shuffles/prunes like any grouping column.
  */
object Resample {

  /** Per-(series, bucket) exact median + finite count.
    * Output: keys*, bucket_us, med, n.
    */
  def medianBy(df: DataFrame, spec: SeriesSpec, freqUs: Long): DataFrame = {
    val bucket = (unix_micros(spec.tsCol) -
      pmod(unix_micros(spec.tsCol), lit(freqUs))).as("bucket_us")
    df.groupBy((spec.keyCols :+ bucket): _*)
      .agg(median(spec.valueCol).as("med"), count(spec.valueCol).as("n"))
  }
}
