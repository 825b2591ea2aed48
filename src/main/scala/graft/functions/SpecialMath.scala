package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Special-function support: regularized upper incomplete gamma
  * Q(a, x), giving the χ² survival function the reference obtains from
  * scipy.stats.chisquare (scripts/ufz_water_qc_pipeline.py:243-244).
  * Standard series/continued-fraction evaluation (Numerical Recipes
  * style, public-domain algorithm). Driver-side scalar math; the one
  * scalar UDF in the engine (not on any hot path).
  */
object SpecialMath {

  private val Eps = 3e-12
  private val MaxIter = 500

  private def gammaln(x: Double): Double = {
    // Lanczos approximation, g=5, n=6
    val cof = Array(76.18009172947146, -86.50532032941677, 24.01409824083091,
      -1.231739572450155, 0.1208650973866179e-2, -0.5395239384953e-5)
    val xx = x
    var y = x
    val tmp0 = xx + 5.5
    val tmp = tmp0 - (xx + 0.5) * math.log(tmp0)
    var ser = 1.000000000190015
    var j = 0
    while (j < 6) { y += 1.0; ser += cof(j) / y; j += 1 }
    -tmp + math.log(2.5066282746310005 * ser / xx)
  }

  /** Lower regularized gamma P(a, x) by series expansion (x < a+1). */
  private def gser(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var n = 0
    while (n < MaxIter && math.abs(del) >= math.abs(sum) * Eps) {
      ap += 1.0; del *= x / ap; sum += del; n += 1
    }
    sum * math.exp(-x + a * math.log(x) - gammaln(a))
  }

  /** Upper regularized gamma Q(a, x) by continued fraction (x ≥ a+1). */
  private def gcf(a: Double, x: Double): Double = {
    val fpmin = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / fpmin
    var d = 1.0 / b
    var h = d
    var i = 1
    var del = 0.0
    do {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < fpmin) d = fpmin
      c = b + an / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      del = d * c
      h *= del
      i += 1
    } while (i <= MaxIter && math.abs(del - 1.0) >= Eps)
    math.exp(-x + a * math.log(x) - gammaln(a)) * h
  }

  /** Q(a, x) = 1 − P(a, x), regularized upper incomplete gamma. */
  def regularizedGammaQ(a: Double, x: Double): Double = {
    if (x < 0.0 || a <= 0.0) Double.NaN
    else if (x == 0.0) 1.0
    else if (x < a + 1.0) 1.0 - gser(a, x)
    else gcf(a, x)
  }

  /** χ² survival function: P(X ≥ chisq) with `dfree` degrees of freedom. */
  def chi2Sf(chisq: Double, dfree: Double): Double =
    regularizedGammaQ(dfree / 2.0, chisq / 2.0)

  private val chi2SfUdf = udf((cs: java.lang.Double, k: java.lang.Double) =>
    if (cs == null || k == null) null
    else java.lang.Double.valueOf(chi2Sf(cs.doubleValue(), k.doubleValue())))

  /** Column form, NULL-propagating. */
  def chi2_sf(chisq: Column, dfree: Column): Column = chi2SfUdf(chisq, dfree)
}
