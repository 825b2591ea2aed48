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

  test("constant-x groups emit NULL coefficients") {
    val out = fit(("c", 5.0, 1.0), ("c", 5.0, 2.0), ("c", 5.0, 3.0))
    val r = out("c")
    assert(r.isNullAt(r.fieldIndex("slope_ols")))
    assert(r.isNullAt(r.fieldIndex("slope_robust")))
    assert(r.isNullAt(r.fieldIndex("intercept_robust")))
  }
}
