package graft

import org.apache.spark.sql.functions._
import graft.core.SeriesSpec
import graft.functions.SpecialMath
import graft.operators.{Diagnostics, Slope}

class DiagnosticsSpec extends SparkTestBase {

  private val spec = SeriesSpec(Seq("series"))

  test("rolling slope recovers a linear trend exactly") {
    // y = 2x + 1 with x in hours -> slope 2/3600 per second
    val rows = (0 until 30).map { i =>
      (java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusHours(i.toLong)
        .toString.replace('T', ' '), Some(2.0 * i + 1))
    }
    val out = Slope.rollingLinSlope(series(rows: _*), spec, win = 25, minp = 5)
      .orderBy("ts").select("slope").collect()
    assert(out.forall(r => math.abs(r.getDouble(0) - 2.0 / 3600) < 1e-12))
  }

  test("slope is null below min_periods of finite values") {
    val rows = (0 until 6).map { i =>
      (java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusHours(i.toLong)
        .toString.replace('T', ' '), if (i < 3) Some(1.0 * i) else None)
    }
    val out = Slope.rollingLinSlope(series(rows: _*), spec, win = 25, minp = 5)
      .select("slope").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("chi2 survival function matches known quantiles") {
    // chi2(df=9): sf(16.919) ~ 0.050; sf(21.666) ~ 0.010
    assert(math.abs(SpecialMath.chi2Sf(16.919, 9) - 0.05) < 5e-4)
    assert(math.abs(SpecialMath.chi2Sf(21.666, 9) - 0.01) < 2e-4)
    assert(SpecialMath.chi2Sf(0.0, 9) == 1.0)
  }

  test("decimal uniformity: perfectly uniform fractions give chisq 0") {
    val rows = (0 until 100).map { i =>
      (java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(15L * i)
        .toString.replace('T', ' '), Some(10.0 + (i % 10) / 10.0 + 0.05))
    }
    val out = Diagnostics.decimalUniformity(series(rows: _*), spec).head()
    assert(out.getAs[Long]("n_finite") == 100L)
    assert(out.getAs[Double]("chisq") == 0.0)
    assert(math.abs(out.getAs[Double]("p") - 1.0) < 1e-9)
  }

  test("dominant decimal mode ties break to the smallest code") {
    val rows = Seq(10.25, 20.25, 30.75, 40.75, 5.5).zipWithIndex.map { case (x, i) =>
      (java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(15L * i)
        .toString.replace('T', ' '), Some(x))
    }
    val out = Diagnostics.dominantDecimal(series(rows: _*), spec).head()
    assert(out.getAs[Int]("dom") == 25) // 25 and 75 both count 2 -> smallest
    assert(out.getAs[Double]("dom_frac") == 0.4)
  }

  test("quant step detected on a quantized signal, absent on continuous") {
    val rng = new scala.util.Random(7)
    // random walk with increments in +-{5,10,15}: |d| is a small
    // multiple of the 5-unit base step, so q50/i lands on it
    var level = 500.0
    val quantized = (0 until 300).map { i =>
      level += 5.0 * (rng.nextInt(3) + 1) * (if (rng.nextBoolean()) 1 else -1)
      (java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(15L * i)
        .toString.replace('T', ' '), Some(level))
    }
    val r1 = Diagnostics.quantStep(series(quantized: _*), spec).head()
    assert(r1.getAs[Boolean]("is_quantized"))
    val continuous = (0 until 300).map { i =>
      (java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(15L * i)
        .toString.replace('T', ' '), Some(rng.nextDouble() * 100))
    }
    val r2 = Diagnostics.quantStep(series(continuous: _*), spec).head()
    assert(!r2.getAs[Boolean]("is_quantized"))
    assert(r2.isNullAt(r2.fieldIndex("quant_step")))
  }

  test("valueHistogram: bin edges, outlier clamping, null skip, counts sum") {
    import spark.implicits._
    val d = Seq(
      ("a", Some(-5.0)),  // below lo -> bin 0
      ("a", Some(0.0)),   // bin 0
      ("a", Some(9.999)), // bin 0 (right-open edge)
      ("a", Some(10.0)),  // bin 1
      ("a", Some(99.9)),  // bin 9
      ("a", Some(100.0)), // at hi -> clamps into bin 9
      ("a", Some(250.0)), // above hi -> bin 9
      ("a", None),        // skipped
      ("b", Some(55.0)))  // bin 5
      .toDF("g", "v")
    val out = Diagnostics.valueHistogram(d, "g", "v", lo = 0.0, hi = 100.0,
        nBins = 10)
      .orderBy("g", "bin").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("bin"),
        r.getAs[Double]("bin_lo"), r.getAs[Long]("n")))
    assert(out.toSeq == Seq(
      ("a", 0L, 0.0, 3L), ("a", 1L, 10.0, 1L), ("a", 9L, 90.0, 3L),
      ("b", 5L, 50.0, 1L)))
    // counts sum to the non-null row count
    assert(out.filter(_._1 == "a").map(_._4).sum == 7L)
  }
}
