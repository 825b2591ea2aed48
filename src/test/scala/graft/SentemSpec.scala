package graft

import org.apache.spark.sql.functions._
import graft.core.SeriesSpec
import graft.sentem.{RunParams, SentemConfig, SentemQc}

/** Fixtures: uncertainty_band, nitrate_roundtrip, tri5_weights
  * (FIXTURES.md §C).
  */
class SentemSpec extends SparkTestBase {

  private val spec = SeriesSpec(Seq("series"))

  /** Tiny config: all five runs use a 5-pt plain-mean band so the
    * numbers are hand-checkable.
    */
  private def tinyCfg(uPct: Option[Double] = None, uCon: Option[Double] = None,
      tri5: Boolean = false) = SentemConfig(
    Seq.fill(5)(RunParams(5, 1.0, true, 1.0, 1.0)),
    uncertaintyPct = uPct, uncertaintyCon = uCon, tri5 = tri5)

  private def flatSeries(n: Int, v0: Double, outlierAt: Int = -1,
      outlier: Double = 0.0) = series((0 until n).map { i =>
    (java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(15L * i)
      .toString.replace('T', ' '),
      Some(if (i == outlierAt) outlier else v0))
  }: _*)

  test("uncertainty band: flag only when the whole interval is outside") {
    // constant 10s; outlier 11.9: band = 10 +- (1 + 1*~0.8-ish)... use
    // uncertainty 5%: interval [11.305, 12.495] — band top around 11.8
    // -> borderline case exercised both ways with two outlier sizes.
    val cfg = tinyCfg(uPct = Some(0.05))
    // mild outlier: interval straddles the band -> NOT flagged
    val mild = SentemQc(flatSeries(9, 10.0, outlierAt = 4, outlier = 11.9),
      spec, 0, cfg, isNitrate = false)
      .filter(col("obs_in") === 11.9).select("is_flagged").head().getBoolean(0)
    // wild outlier: whole interval above every run's band -> flagged
    val wild = SentemQc(flatSeries(9, 10.0, outlierAt = 4, outlier = 100.0),
      spec, 0, cfg, isNitrate = false)
      .filter(col("obs_in") === 100.0).select("is_flagged").head().getBoolean(0)
    assert(!mild && wild)
  }

  test("constant-uncertainty variant flags when x +- c clears the band") {
    val cfg = tinyCfg(uCon = Some(0.1))
    val out = SentemQc(flatSeries(9, 10.0, outlierAt = 4, outlier = 50.0),
      spec, 0, cfg, isNitrate = false)
    assert(out.filter(col("obs_in") === 50.0).select("is_flagged").head().getBoolean(0))
    assert(!out.filter(col("obs_in") === 10.0 && col("is_flagged")).limit(1).collect().nonEmpty)
  }

  test("nitrate roundtrip: QC in N units, bands exported back, masked in raw units") {
    val df = flatSeries(9, 6.2) // 6.2 mg/L NO3 -> 1.4 as N
    val out = SentemQc(df, spec, 2477034,
      tinyCfg(uPct = Some(0.03)), isNitrate = true)
      .select("obs", "qcband_top", "value_masked").collect()
    assert(out.forall(r => math.abs(r.getDouble(0) - 1.4) < 1e-12)) // converted
    // band built around 1.4 in N units: top = 1.4 + 1 + 1*0 = 2.4 -> x 62/14
    assert(out.exists(r => !r.isNullAt(1) &&
      math.abs(r.getDouble(1) - 2.4 * 62.0 / 14.0) < 1e-9))
    assert(out.forall(r => r.getDouble(2) == 6.2)) // raw units, unflagged
  }

  test("tri5 weights renormalize over finite neighbors and need >=3") {
    val cfg = tinyCfg(tri5 = true)
    // series 1,2,3,4,5: at i=2 full frame -> ma = (1*1+2*2+3*3+2*4+1*5)/9 = 3
    val df = series((0 until 5).map { i =>
      (java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(15L * i)
        .toString.replace('T', ' '), Some(i + 1.0))
    }: _*)
    val bands = SentemQc(df, spec, 0, cfg, isNitrate = false)
      .orderBy("ts").select("qcband_top").collect()
    // run5 ma at center = 3.0, sd = sqrt((4*1+2*1+... )/9):
    // devs: (1-3)^2*1=4, (2-3)^2*2=2, 0, (4-3)^2*2=2, (5-3)^2*1=4 -> 12/9
    val expectTop = 3.0 + 1.0 + 1.0 * math.sqrt(12.0 / 9.0)
    assert(math.abs(bands(2).getDouble(0) - expectTop) < 1e-12)
    // boundary row i=0: neighbors {x0..x2} weights {3,2,1} ->
    // ma = (3*1+2*2+1*3)/6 = 10/6
    val expectMa0 = 10.0 / 6.0
    val devs0 = (math.pow(1 - expectMa0, 2) * 3 + math.pow(2 - expectMa0, 2) * 2 +
      math.pow(3 - expectMa0, 2) * 1) / 6
    assert(math.abs(bands(0).getDouble(0) - (expectMa0 + 1.0 + math.sqrt(devs0))) < 1e-12)
  }

  test("sensor rules: O2 exact-code and pH range flags, null flagged") {
    val df = series(
      ("2024-01-01 00:00:00", v(30.0)), // code 400: ==30 flagged
      ("2024-01-01 00:15:00", v(39.9)),
      ("2024-01-01 00:30:00", v(41.0)), // >=40 flagged
      ("2024-01-01 00:45:00", na))      // pre-masked -> null -> flagged
    val out = SentemQc(df, spec, 400, SentemConfig.byCode(400), isNitrate = false)
      .orderBy("ts").select("flag_sensor").collect().map(_.getInt(0))
    assert(out.toSeq == Seq(200, 100, 200, 200))
  }
}
