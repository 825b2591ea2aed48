package graft.sentem

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{SeriesSpec, SeriesWindows}

/** Per-run band parameters (reference SENTEMQC_CONFIG,
  * scripts/sentemqc.py:75: wN/sfN/cN/taN/bsN).
  */
final case class RunParams(w: Int, sf: Double, center: Boolean,
    ta: Double, bs: Double)

/** One sensor's 5-run configuration. Exactly one of uncertaintyPct /
  * uncertaintyCon is set for the shipped sensors; neither means plain
  * band-violation flagging (sentemqc.py:95-102).
  */
final case class SentemConfig(runs: Seq[RunParams],
    uncertaintyPct: Option[Double] = None,
    uncertaintyCon: Option[Double] = None,
    tri5: Boolean = true) {
  require(runs.size == 5, "SentemQC is a 5-run engine")
}

object SentemConfig {
  val MinFrac = 0.3 // sentemqc.py:18

  /** The five shipped sensor configs (sentemqc.py:75). */
  val byCode: Map[Int, SentemConfig] = Map(
    157787 -> SentemConfig(Seq( // turbidity
      RunParams(960, 3.5, true, 10.0, 1.5), RunParams(960, 3.5, true, 10.0, 1.5),
      RunParams(48, 1.7, true, 2.5, 2.5), RunParams(5, 1.3, true, 0.5, 0.3),
      RunParams(5, 1.3, true, 0.5, 0.3)), uncertaintyPct = Some(0.05)),
    2477034 -> SentemConfig(Seq( // NO3 Trios
      RunParams(960, 3.0, true, 1.5, 0.05), RunParams(960, 2.6, true, 1.2, 0.05),
      RunParams(48, 2.5, true, 0.35, 0.2), RunParams(5, 0.3, true, 0.05, 0.025),
      RunParams(5, 0.9, true, 0.05, 0.025)), uncertaintyPct = Some(0.03)),
    2477787 -> SentemConfig(Seq( // NO3 YSI
      RunParams(960, 2.5, true, 0.4, 0.05), RunParams(960, 1.5, true, 0.3, 0.05),
      RunParams(48, 1.0, true, 0.35, 0.01), RunParams(5, 0.2, true, 0.03, 0.01),
      RunParams(5, 0.9, true, 0.05, 0.025)), uncertaintyPct = Some(0.03)),
    400 -> SentemConfig(Seq( // dissolved oxygen
      RunParams(960, 2.5, true, 0.4, 0.2), RunParams(960, 2.5, true, 0.4, 0.2),
      RunParams(48, 1.7, true, 0.35, 0.35), RunParams(5, 1.3, true, 0.05, 0.05),
      RunParams(5, 1.3, true, 0.05, 0.05)), uncertaintyPct = Some(0.02)),
    410 -> SentemConfig(Seq( // pH
      RunParams(960, 2.0, true, 0.3, 0.2), RunParams(960, 2.0, true, 0.3, 0.2),
      RunParams(12, 1.6, true, 0.05, 0.05), RunParams(5, 1.3, true, 0.05, 0.05),
      RunParams(5, 1.3, true, 0.05, 0.05)), uncertaintyCon = Some(0.1))
  )

  def minPeriods(w: Int): Int = math.max(3, math.ceil(w * MinFrac).toInt)
}

/** The SentemQC per-sensor 5-pass rolling QC-band engine
  * (`apply_sentemqc_to_series`, scripts/sentemqc.py:80-114).
  */
object SentemQc {

  /** Sensor-error rules (`apply_sensor_error_flags`, sentemqc.py:40-50)
    * applied to the unit-converted OBS series. 100 ok / 200 flagged.
    */
  def sensorErrorFlag(code: Int, v: Column): Column = code match {
    case 157787 => when(v < 0, 200).otherwise(100)
    case 2477034 | 2477787 => when(v < 0, 200).otherwise(100)
    case 400 | 400100011 =>
      when(v === 30 || v === 25 || v === 0 || v >= 40, 200)
        .when(v.isNull, 200).otherwise(100)
    case 410 =>
      when(v === 0 || v >= 13 || v < 0, 200)
        .when(v.isNull, 200).otherwise(100)
    case _ => lit(100)
  }

  /** Basic rolling mean/median + population std with min_periods
    * max(3, ceil(0.3·w)) (`rolling_mean_std_basic`, sentemqc.py:25-30).
    */
  private def basicStats(df: DataFrame, spec: SeriesSpec, w: Int,
      median: Boolean, maOut: String, sdOut: String): DataFrame = {
    val frame = SeriesWindows.centered(spec, w)
    val minp = SentemConfig.minPeriods(w)
    val ma =
      if (median) SeriesWindows.rollingMedian(col("obs"), frame, minp)
      else SeriesWindows.rollingMean(col("obs"), frame, minp)
    df.withColumn(maOut, ma)
      .withColumn(sdOut, SeriesWindows.rollingStdPop(col("obs"), frame, minp))
  }

  /** Triangular-weighted 5-point mean/std over finite neighbors, ≥3
    * finite required (`rolling_mean_std_tri5`, sentemqc.py:31-39).
    * Closed 5-term form over lag/lead — weights renormalize over the
    * present (in-bounds AND finite) neighbors exactly like the
    * reference's boundary/mask slicing.
    */
  private def tri5Stats(df: DataFrame, spec: SeriesSpec,
      maOut: String, sdOut: String): DataFrame = {
    val w = SeriesWindows.ordered(spec)
    val d = df
      .withColumn("__xm2", lag(col("obs"), 2).over(w))
      .withColumn("__xm1", lag(col("obs"), 1).over(w))
      .withColumn("__xp1", lead(col("obs"), 1).over(w))
      .withColumn("__xp2", lead(col("obs"), 2).over(w))
    val cols = Seq("__xm2", "__xm1", "obs", "__xp1", "__xp2")
    val wts = Seq(1.0, 2.0, 3.0, 2.0, 1.0)
    val wsum = cols.zip(wts).map { case (c, wt) =>
      when(col(c).isNotNull, lit(wt)).otherwise(lit(0.0))
    }.reduce(_ + _)
    val nfin = cols.map(c =>
      when(col(c).isNotNull, 1).otherwise(0)).reduce(_ + _)
    val wx = cols.zip(wts).map { case (c, wt) =>
      coalesce(col(c), lit(0.0)) * lit(wt)
    }.reduce(_ + _)
    val d2 = d.withColumn("__wsum", wsum).withColumn("__nfin", nfin)
      .withColumn(maOut, when(col("__nfin") >= 3, wx / col("__wsum")))
    val sdev = sqrt(cols.zip(wts).map { case (c, wt) =>
      coalesce(pow(col(c) - col(maOut), 2) * lit(wt), lit(0.0))
    }.reduce(_ + _) / col("__wsum"))
    d2.withColumn(sdOut, when(col("__nfin") >= 3, sdev))
      .drop("__xm2", "__xm1", "__xp1", "__xp2", "__wsum", "__nfin")
  }

  /** Full 5-run engine. Adds: obs_in, obs_raw (≤0/non-finite
    * pre-masked), obs (unit-converted), mask_pre, flag_sensor,
    * flag_run1..5, qcband_top/bottom (support-gated run-5 band, back
    * in original units for nitrate), flag_global (100/200),
    * is_flagged, flag_reason, value_masked.
    */
  def apply(df: DataFrame, spec: SeriesSpec, code: Int,
      cfg: SentemConfig, isNitrate: Boolean): DataFrame = {
    var d = df
      .withColumn("obs_in", spec.valueCol)
      .withColumn("mask_pre", spec.valueCol.isNull || spec.valueCol <= 0)
      .withColumn("obs_raw", when(col("mask_pre"), lit(null)).otherwise(spec.valueCol))
      .withColumn("obs",
        if (isNitrate) col("obs_raw") * (lit(14.0) / lit(62.0)) else col("obs_raw"))
      .withColumn("flag_sensor", sensorErrorFlag(code, col("obs")))
    val flagCols = Seq("flag_sensor") ++ (1 to 5).map(r => s"flag_run$r")
    for (r <- 1 to 5) {
      val p = cfg.runs(r - 1)
      d =
        if (r == 5 && cfg.tri5) tri5Stats(d, spec, s"__ma$r", s"__sd$r")
        else basicStats(d, spec, p.w, median = (r == 3), s"__ma$r", s"__sd$r")
      val top = col(s"__ma$r") + lit(p.ta) + lit(p.sf) * col(s"__sd$r")
      val bot = col(s"__ma$r") - lit(p.bs) - lit(p.sf) * col(s"__sd$r")
      val fu = (cfg.uncertaintyPct, cfg.uncertaintyCon) match {
        case (Some(u), _) =>
          val tu = lit(1.0 + u) * col("obs")
          val bu = lit(1.0 - u) * col("obs")
          when((tu > top && bu > top) || (bu < bot && tu < bot), 200).otherwise(100)
        case (None, Some(c)) =>
          val tu = col("obs") + lit(c)
          val bu = col("obs") - lit(c)
          when((tu > top && bu > top) || (bu < bot && tu < bot), 200).otherwise(100)
        case _ =>
          when(col("obs") > top || col("obs") < bot, 200).otherwise(100)
      }
      d = d.withColumn(s"flag_run$r", fu)
      if (r == 5) {
        val frame5 = SeriesWindows.centered(spec, p.w)
        val minp5 = SentemConfig.minPeriods(p.w)
        d = d
          .withColumn("__support",
            sum(when(col("obs").isNotNull, 1).otherwise(0)).over(frame5))
          .withColumn("qcband_top", when(col("__support") >= minp5, top))
          .withColumn("qcband_bottom", when(col("__support") >= minp5, bot))
          .drop("__support")
      }
    }
    val anyFlag = flagCols.map(c => col(c) === 200).reduce(_ || _)
    d = d.withColumn("flag_global", when(anyFlag, 200).otherwise(100))
      .withColumn("is_flagged", col("flag_global") === 200)
      .withColumn("flag_reason",
        concat_ws(" ", flagCols.map(c => when(col(c) === 200, lit(c))): _*))
    if (isNitrate) d = d
      .withColumn("qcband_top", col("qcband_top") * (lit(62.0) / lit(14.0)))
      .withColumn("qcband_bottom", col("qcband_bottom") * (lit(62.0) / lit(14.0)))
    d.withColumn("value_masked",
      when(col("is_flagged"), lit(null)).otherwise(col("obs_raw")))
      .drop((1 to 5).flatMap(r => Seq(s"__ma$r", s"__sd$r")): _*)
  }
}
