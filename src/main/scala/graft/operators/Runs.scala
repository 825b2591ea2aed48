package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Rle, SeriesSpec, SeriesWindows}

/** Run-based event detectors (reference `detect_flat_runs`
  * scripts/ufz_water_qc_pipeline.py:208-221, `detect_binary_switches`
  * :192-205, tables :642-654).
  *
  * Shared shape: flag rows, RLE-group them, then read each run's
  * boundary attributes with first/last_value over the run window —
  * the run's first row already carries its own lag-attributes, so one
  * row_number()==1 filter yields the event row. first/last_value with
  * default null handling behaves identically in Spark and DuckDB,
  * unlike max_by/arg_max whose null semantics differ.
  */
object Runs {

  private def runWindowFull(spec: SeriesSpec) =
    Window.partitionBy((spec.keyCols :+ col("run_id")): _*).orderBy(spec.tsCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

  private def runWindowOrdered(spec: SeriesSpec) =
    Window.partitionBy((spec.keyCols :+ col("run_id")): _*).orderBy(spec.tsCol)

  /** Flat-value runs: eq[i] = |v[i] − v[i−1]| ≤ absTol (NULLs → not
    * equal; a series' first row is never equal — the reference's
    * eq[0]=False). Event start = SECOND sample of the constant stretch
    * (SURVEY §4.2 trap 7); end = the sample after the eq-run (last
    * sample when the run reaches the series end — reference
    * `v.index[b] if b<len(v) else v.index[-1]`). Keep runs with
    * (end−start) ≥ minHours. `value` = value at the start row.
    *
    * Output: keys*, start, end, hours, value (one row per event).
    */
  /** Generic flag-run extractor: consecutive flag-true rows form a
    * run; the emitted event starts at the run's FIRST row, ends at the
    * one-past-run sample (clamped to the run's last row at series
    * end), and must span ≥ minHours. The surviving row is the run's
    * first row, so all of its original columns pass through.
    * Output: input columns + start, end, hours.
    */
  def flagRuns(df: DataFrame, spec: SeriesSpec, flag: Column,
      minHours: Double): DataFrame = {
    val w = SeriesWindows.ordered(spec)
    val d = df.withColumn("__flag", flag)
      .withColumn("__next_ts", lead(spec.tsCol, 1).over(w))
    val r = Rle.withRunId(d, spec, col("__flag")).filter(col("__flag"))
    val wf = runWindowFull(spec)
    val hours =
      (unix_micros(col("end")) - unix_micros(col("start"))) / lit(3600000000.0)
    r.withColumn("__rn", row_number().over(runWindowOrdered(spec)))
      .withColumn("__last_ts", last(spec.tsCol).over(wf))
      .withColumn("__after_ts", last(col("__next_ts")).over(wf))
      .filter(col("__rn") === 1)
      .withColumn("start", spec.tsCol)
      .withColumn("end", coalesce(col("__after_ts"), col("__last_ts")))
      .filter(hours >= minHours)
      .withColumn("hours", hours)
      .drop("__flag", "__next_ts", "__rn", "__last_ts", "__after_ts", "run_id")
  }

  def flatValues(df: DataFrame, spec: SeriesSpec, minHours: Double = 2.0,
      absTol: Double = 0.0): DataFrame = {
    val w = SeriesWindows.ordered(spec)
    val eq =
      coalesce(abs(spec.valueCol - lag(spec.valueCol, 1).over(w)) <= absTol, lit(false))
    flagRuns(df, spec, eq, minHours)
      .select((spec.keyCols :+ col("start") :+ col("end") :+ col("hours")
        :+ spec.valueCol.as("value")): _*)
  }

  /** Binary-switch events: runs of |v| ≤ zeroTol (finite), with finite
    * neighbors on both (index-clamped) sides that are not both zero.
    * pre/post are the samples adjacent to the run, clamped to the
    * series bounds (a run at the series edge uses its own edge sample,
    * matching the reference's max(0,a-1)/min(n-1,b+1)).
    *
    * Output: keys*, start, end, pre, post, pre_val, post_val.
    */
  def binarySwitches(df: DataFrame, spec: SeriesSpec, zeroTol: Double = 1e-12,
      minDur: Int = 1): DataFrame = {
    val w = SeriesWindows.ordered(spec)
    val d = df
      .withColumn("__z", coalesce(abs(spec.valueCol) <= zeroTol, lit(false)))
      .withColumn("__prev_ts", lag(spec.tsCol, 1).over(w))
      .withColumn("__prev_val", lag(spec.valueCol, 1).over(w))
      .withColumn("__next_ts", lead(spec.tsCol, 1).over(w))
      .withColumn("__next_val", lead(spec.valueCol, 1).over(w))
    val r = Rle.withRunId(d, spec, col("__z")).filter(col("__z"))
    val wf = runWindowFull(spec)
    r.withColumn("__rn", row_number().over(runWindowOrdered(spec)))
      .withColumn("__len", count(lit(1)).over(wf))
      .withColumn("__last_ts", last(spec.tsCol).over(wf))
      .withColumn("__last_val", last(spec.valueCol).over(wf))
      .withColumn("__ln_ts", last(col("__next_ts")).over(wf))
      .withColumn("__ln_val", last(col("__next_val")).over(wf))
      .filter(col("__rn") === 1)
      .withColumn("start", spec.tsCol)
      .withColumn("end", col("__last_ts"))
      .withColumn("pre", coalesce(col("__prev_ts"), spec.tsCol))
      .withColumn("pre_val",
        when(col("__prev_ts").isNotNull, col("__prev_val")).otherwise(spec.valueCol))
      .withColumn("post", coalesce(col("__ln_ts"), col("__last_ts")))
      .withColumn("post_val",
        when(col("__ln_ts").isNotNull, col("__ln_val")).otherwise(col("__last_val")))
      .filter(col("__len") >= minDur &&
        col("pre_val").isNotNull && col("post_val").isNotNull &&
        (col("pre_val") =!= 0.0 || col("post_val") =!= 0.0))
      .select((spec.keyCols :+ col("start") :+ col("end") :+ col("pre")
        :+ col("post") :+ col("pre_val") :+ col("post_val")): _*)
  }

  /** Plateau/constants point mask (reference `_fallback_flag_plateau`
    * / `_fallback_flag_constants` + `_mask_from_runs`,
    * ufz_water_qc_pipeline.py:392-407): mark every sample inside the
    * [start, end] interval of a qualifying flat run. Because end is
    * the one-past-run sample, the interval covers the eq-run rows plus
    * exactly the next row — marked with a lag() instead of a range
    * join (the stretch's FIRST sample, at start−1, is NOT covered:
    * interval is [ts[a], ts[a+l]]). Adds boolean `out`.
    */
  def flatMask(df: DataFrame, spec: SeriesSpec, minHours: Double = 2.0,
      absTol: Double = 0.0, out: String = "flag_plateau"): DataFrame = {
    val w = SeriesWindows.ordered(spec)
    val d = df
      .withColumn("__eq",
        coalesce(abs(spec.valueCol - lag(spec.valueCol, 1).over(w)) <= absTol, lit(false)))
      .withColumn("__next_ts", lead(spec.tsCol, 1).over(w))
    val r = Rle.withRunId(d, spec, col("__eq"))
    val wf = runWindowFull(spec)
    val qual = r.filter(col("__eq"))
      .withColumn("__rn", row_number().over(runWindowOrdered(spec)))
      .withColumn("__last_ts", last(spec.tsCol).over(wf))
      .withColumn("__after_ts", last(col("__next_ts")).over(wf))
      .filter(col("__rn") === 1)
      .filter((unix_micros(coalesce(col("__after_ts"), col("__last_ts"))) -
        unix_micros(spec.tsCol)) / lit(3600000000.0) >= minHours)
      .select((spec.keyCols :+ col("run_id") :+ lit(true).as("__qual")): _*)
    r.join(qual, spec.keys :+ "run_id", "left")
      .withColumn("__in_run", col("__eq") && coalesce(col("__qual"), lit(false)))
      .withColumn(out,
        col("__in_run") || coalesce(lag(col("__in_run"), 1).over(w), lit(false)))
      .drop("__eq", "__next_ts", "__qual", "__in_run", "run_id")
  }

  /** Isolated-group mask (reference `_fallback_flag_isolated`,
    * ufz_water_qc_pipeline.py:430-453): finite runs of length ≤
    * toPoints(groupWindow, step) whose first row's delta and the delta
    * just after the run both exceed gapHours. Requires `delta_us`;
    * `stepDf` is (keys*, step_us). Adds boolean `isolated` to every
    * row.
    */
  def isolatedMask(df: DataFrame, spec: SeriesSpec, stepDf: DataFrame,
      gapHours: Double = 3.0, groupWindowUs: Double = 30 * 60 * 1e6): DataFrame = {
    val gapUs = (gapHours * 3600 * 1e6).toLong
    val w = SeriesWindows.ordered(spec)
    val d = df
      .withColumn("__next_delta", lead(col("delta_us"), 1).over(w))
      .withColumn("__z", spec.valueCol.isNotNull)
    val r = Rle.withRunId(d, spec, col("__z"))
    val wf = runWindowFull(spec)
    val qual = r.filter(col("__z"))
      .withColumn("__rn", row_number().over(runWindowOrdered(spec)))
      .withColumn("__len", count(lit(1)).over(wf))
      .withColumn("__right_d", last(col("__next_delta")).over(wf))
      .filter(col("__rn") === 1)
      .join(stepDf, spec.keys)
      .withColumn("__grp_pts",
        greatest(lit(1L), floor(lit(groupWindowUs) / col("step_us") + 0.5).cast("long")))
      .filter(col("__len") <= col("__grp_pts") &&
        col("delta_us") > gapUs && col("__right_d") > gapUs)
      .select((spec.keyCols :+ col("run_id") :+ lit(true).as("__isolated_run")): _*)
    r.join(qual, spec.keys :+ "run_id", "left")
      .withColumn("isolated", col("__z") && coalesce(col("__isolated_run"), lit(false)))
      .drop("__z", "__next_delta", "__isolated_run", "run_id")
  }
}
