package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-length grouping — the reference's `rle_bool`
  * (scripts/ufz_water_qc_pipeline.py:94-103) as sessionization:
  * a run boundary is any row whose flag differs (null-safely) from its
  * predecessor; the running count of boundaries is the run id. Pure
  * window built-ins; one pass over the already-sorted series
  * partition.
  */
object Rle {

  /** Adds `runCol`: consecutive rows with equal `flag` share an id;
    * ids are dense and increasing within each series (first run = 1).
    */
  def withRunId(df: DataFrame, spec: SeriesSpec, flag: Column,
      runCol: String = "run_id"): DataFrame = {
    val w = SeriesWindows.ordered(spec)
    val changed = !(flag <=> lag(flag, 1).over(w))
    df.withColumn(runCol,
      sum(when(changed, 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
