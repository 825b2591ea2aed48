package graft

import graft.operators.Diagnostics

/** Exact-assert fixtures for the one-step Huber robust fit: on clean
  * data it agrees with OLS; with a gross outlier it recovers the
  * underlying line that OLS is dragged off; degenerate groups stay
  * NULL.
  */
class RobustFitSpec extends SparkTestBase {
  import spark.implicits._

  private def fit(rows: (String, Double, Double)*) =
    Diagnostics.groupedRobustFit(
      rows.toSeq.toDF("g", "x", "y"), Seq("g"), "x", "y", scale = 100L)
      .collect().map(r => r.getAs[String]("g") -> r).toMap

  test("clean linear data: robust fit equals the OLS fit exactly") {
    // y = 2x + 1, exact on the 0.01 grid → zero residuals, all weights 1
    val out = fit((1 to 10).map(i => ("a", i.toDouble, 2.0 * i + 1.0)): _*)
    val r = out("a")
    assert(r.getAs[Double]("slope_ols") === 2.0)
    assert(r.getAs[Double]("slope_robust") === 2.0)
    assert(r.getAs[Double]("intercept_robust") === 1.0)
    assert(r.getAs[Long]("n_downweighted") === 0L)
  }

  test("a gross outlier is downweighted and the slope recovers") {
    // 20 points on y = x, one wild outlier at (21, 1000)
    val pts = (1 to 20).map(i => ("b", i.toDouble, i.toDouble)) :+
      (("b", 21.0, 1000.0))
    val out = fit(pts: _*)
    val r = out("b")
    val ols = r.getAs[Double]("slope_ols")
    val rob = r.getAs[Double]("slope_robust")
    assert(math.abs(ols - 1.0) > 5.0, s"outlier should wreck OLS: $ols")
    assert(math.abs(rob - 1.0) < 0.5, s"robust slope should recover: $rob")
    assert(r.getAs[Long]("n_downweighted") >= 1L)
  }

  test("2 vs 3 IRLS rounds: registry-data coefficient drift in-band") {
    // the q_robust_fit registry runs iters=2 (its VALUES are exact by
    // the DuckDB oracle replaying the same 2 rounds) — this pins the
    // CONVERGENCE evidence that justified dropping the third full
    // scale+moment pass, on the REGISTRY'S OWN data shape (lineitem
    // quantity→price per flag/status group: huge n, mild residual
    // tails — IRLS is deep in its fixed point by round 2; a synthetic
    // two-gross-outliers-in-42-points fixture drifts 1000x more and
    // says nothing about this query)
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    def coefs(iters: Int) =
      Diagnostics.groupedRobustFit(li,
        Seq("l_returnflag", "l_linestatus"), "l_quantity",
        "l_extendedprice", iters = iters)
        .collect()
        .map(r => (r.getAs[String]("l_returnflag"),
          r.getAs[String]("l_linestatus")) ->
          (r.getAs[Double]("slope_robust"),
            r.getAs[Double]("intercept_robust"))).toMap
    val c2 = coefs(2)
    val c3 = coefs(3)
    assert(c2.keySet == c3.keySet && c2.nonEmpty)
    for ((k, (s2, b2)) <- c2; (s3, b3) = c3(k)) {
      // relative drift: intercepts are O(1e4) on this data
      assert(math.abs(s2 - s3) <= 1e-4 * math.max(1.0, math.abs(s3)),
        s"$k slope drift: $s2 vs $s3")
      assert(math.abs(b2 - b3) <= 1e-4 * math.max(1.0, math.abs(b3)),
        s"$k intercept drift: $b2 vs $b3")
    }
  }

  test("magnitudes past the long-product bound raise, not wrap") {
    // |y|·scale ~ 1e12 with |x|·scale ~ 1e5 → w·xq·yq worst case
    // 1e6·1e5·1e12 = 1e23 ≫ 2^63: the contract is a LOUD ANSI
    // overflow error, never silently wrapped moment sums
    val rows = (1 to 30).map(i => ("e", i * 10.0, 1.0e10 * i))
    val df = rows.toDF("g", "x", "y")
    val ex = intercept[Exception] {
      Diagnostics.groupedRobustFit(df, Seq("g"), "x", "y",
        scale = 100L).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(m =>
        m.contains("CAST_OVERFLOW") || m.contains("ARITHMETIC_OVERFLOW") ||
          m.contains("overflow"))),
      s"expected a loud ANSI overflow, got: $ex")
  }

  test("constant-x groups emit NULL coefficients") {
    val out = fit(("c", 5.0, 1.0), ("c", 5.0, 2.0), ("c", 5.0, 3.0))
    val r = out("c")
    assert(r.isNullAt(r.fieldIndex("slope_ols")))
    assert(r.isNullAt(r.fieldIndex("slope_robust")))
    assert(r.isNullAt(r.fieldIndex("intercept_robust")))
  }
}
