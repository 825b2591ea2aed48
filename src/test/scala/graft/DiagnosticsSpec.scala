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

  test("groupedLinearFit: known line, noise-free r2, constant-x null, null skip") {
    import spark.implicits._
    // group a: exact line y = 2.5x + 1 -> slope 2.5, intercept 1, r2 1
    // group b: constant x -> NULL fit; group c has a null pair to skip
    val df = Seq(
      ("a", Some(1.0), Some(3.5)), ("a", Some(2.0), Some(6.0)),
      ("a", Some(3.0), Some(8.5)), ("a", Some(4.0), Some(11.0)),
      ("b", Some(2.0), Some(1.0)), ("b", Some(2.0), Some(9.0)),
      ("c", Some(1.0), Some(1.0)), ("c", Some(3.0), Some(2.0)),
      ("c", None, Some(5.0)), ("c", Some(4.0), None)
    ).toDF("g", "x", "y")
    val out = Diagnostics.groupedLinearFit(df, Seq("g"), "x", "y")
      .orderBy("g").collect()
    val a = out(0)
    assert(a.getLong(1) == 4L)
    assert(a.getDouble(2) == 2.5 && a.getDouble(3) == 1.0 && a.getDouble(4) == 1.0)
    val b = out(1)
    assert(b.getLong(1) == 2L && b.isNullAt(2) && b.isNullAt(3) && b.isNullAt(4))
    val c = out(2)
    assert(c.getLong(1) == 2L) // null pairs dropped
    assert(c.getDouble(2) == 0.5) // (2-1)/(3-1)
  }

  test("groupedLinearFit matches an unquantized double reference within 1e-9") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      val x = rng.nextInt(5000) / 100.0
      // y kept to exactly 2 decimals so scale-100 quantization is
      // lossless and the plain-double reference is comparable
      val y = math.round((3.25 * x - 7.5 + rng.nextInt(1000) / 100.0) * 100) / 100.0
      ("g", x, y)
    }
    val df = rows.toDF("g", "x", "y")
    val r = Diagnostics.groupedLinearFit(df, Seq("g"), "x", "y").head()
    // reference on the SAME quantized values (scale 100 keeps these
    // two-decimal inputs exact, so plain double OLS agrees)
    val n = rows.size.toDouble
    val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    val sxy = rows.map(r => r._2 * r._3).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = sy / n - slope * (sx / n)
    assert(math.abs(r.getDouble(2) - slope) < 1e-6)
    assert(math.abs(r.getDouble(3) - icept) < 1e-6)
    assert(r.getDouble(4) > 0.8 && r.getDouble(4) <= 1.0)
  }
}
