package graft

import org.apache.spark.sql.functions._
import graft.core.SeriesSpec
import graft.wrtds.Wrtds

/** Exercise the WRTDS discharge-kernel path (wrtds_proxy with a q
  * column, ufz_water_qc_pipeline.py:599, :610-611): with y a function
  * of discharge plus season, the q-kernel regression recovers the
  * signal.
  */
class WrtdsQSpec extends SparkTestBase {

  test("wrtds with discharge kernel fits y = f(q, season)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      val q = 10.0 + 5.0 * math.sin(2 * math.Pi * i / 50.0) + rng.nextDouble()
      val doySignal = 8 * math.sin(2 * math.Pi * i / 365.25)
      ("s", java.time.LocalDateTime.of(2022, 1, 1, 12, 0, 0).plusDays(i.toLong)
        .toString.replace('T', ' '), 3.0 * q + doySignal + 40.0, q)
    }
    val df = rows.toDF("series", "ts_s", "value", "discharge")
      .withColumn("ts", to_timestamp($"ts_s"))
      .select("series", "ts", "value", "discharge")
    val spec = SeriesSpec(Seq("series"))
    val fit = Wrtds.proxy(df, spec, qCol = Some("discharge"))
    val stats = fit.agg(
      count(col("wrtds_resid")).as("n"),
      median(abs(col("wrtds_resid"))).as("medAbs")).head()
    assert(stats.getAs[Long]("n") > 300) // fitted for most points
    assert(stats.getAs[Double]("medAbs") < 2.0) // signal recovered
  }

  test("local2 bounded-kernel regression recovers a linear trend") {
    import spark.implicits._
    val rows = (0 until 120).map { i =>
      ("s", java.time.LocalDateTime.of(2022, 1, 1, 12, 0, 0).plusDays(i.toLong)
        .toString.replace('T', ' '), 5.0 + 0.25 * i)
    }
    val df = rows.toDF("series", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s"))
      .select("series", "ts", "value")
    val spec = SeriesSpec(Seq("series"))
    val fit = Wrtds.local2(df, spec, htDays = 20.0, supportDays = 60.0, minp = 5)
    // a weighted linear fit of exactly-linear data is the line itself
    // (up to the 1e-6 term quantization), at every point
    val worst = fit.agg(max(abs(col("l2_resid")))).head().getDouble(0)
    assert(fit.count() == 120)
    assert(worst < 1e-3, s"worst |resid| = $worst")
  }

  test("local2 multi-key series do not bleed into each other") {
    import spark.implicits._
    // two series with identical timestamps but different levels: if the
    // self-join key handling collapsed them, fits would be pulled to
    // the midpoint and residuals would blow up
    val rows = (0 until 60).flatMap { i =>
      val t = java.time.LocalDateTime.of(2022, 1, 1, 12, 0, 0)
        .plusDays(i.toLong).toString.replace('T', ' ')
      Seq(("a", t, 10.0), ("b", t, 1000.0))
    }
    val df = rows.toDF("series", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s"))
      .select("series", "ts", "value")
    val spec = SeriesSpec(Seq("series"))
    val fit = Wrtds.local2(df, spec, htDays = 20.0, supportDays = 60.0, minp = 5)
    val worst = fit.agg(max(abs(col("l2_resid")))).head().getDouble(0)
    assert(worst < 1e-3, s"worst |resid| = $worst")
  }

  test("local2 raises on |value| past the exact-long micro-sum bound") {
    import spark.implicits._
    // |value| ~ 1e14: micro-unit terms overflow a long — the contract
    // is a LOUD error (Spark 4 ANSI raises on the cast / the sum),
    // never a silently wrapped fit (cross-engine divergence: DuckDB
    // would sum the same terms in HUGEINT and return numbers)
    val rows = (0 until 40).map { i =>
      ("s", java.time.LocalDateTime.of(2022, 1, 1, 12, 0, 0).plusDays(i.toLong)
        .toString.replace('T', ' '), 1.0e14 + 1.0e7 * i)
    }
    val df = rows.toDF("series", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s"))
      .select("series", "ts", "value")
    val spec = SeriesSpec(Seq("series"))
    val fit = Wrtds.local2(df, spec, htDays = 20.0, supportDays = 60.0, minp = 5)
    val ex = intercept[Exception] { fit.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(m =>
        m.contains("CAST_OVERFLOW") || m.contains("ARITHMETIC_OVERFLOW") ||
          m.contains("overflow"))),
      s"expected a loud ANSI overflow, got: $ex")
    // and magnitudes comfortably inside the bound still fit cleanly
    // (the 1e-6 term grid is absolute, so residual noise scales with
    // |y| — keep the in-bound fixture at O(100))
    val ok = df.withColumn("value", col("value") / 1e12)
    val worst = Wrtds.local2(ok, spec, htDays = 20.0, supportDays = 60.0,
      minp = 5).agg(max(abs(col("l2_resid")))).head().getDouble(0)
    assert(worst < 1e-3, s"worst |resid| = $worst")
  }
}
