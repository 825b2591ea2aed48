package graft.wrtds

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.core.{SeriesSpec, SeriesWindows}

/** WRTDS-proxy weighted local regression + residual spike buster
  * (reference `wrtds_proxy` scripts/ufz_water_qc_pipeline.py:592-622,
  * `wrtds_buster` :624-639).
  *
  * The one operator that is not a tidy built-in composition: per point
  * i a Gaussian time-kernel weighted least squares on
  * [1, t, sin(2π·doy/365.25), cos(2π·doy/365.25) (, q)] over ALL other
  * points of the series — O(n²) per series, contained inside
  * `flatMapGroups` so each series runs as one task on its executor
  * (the reference runs the same loop single-threaded; our parallel
  * axis is many series). Weights below 1e-3 of the max are dropped
  * like the reference (:615-616).
  */
object Wrtds {

  /** Adds `wrtds_yhat` and `wrtds_resid` (NULL where the reference
    * yields NaN). Optional discharge column enables the q-kernel.
    */
  def proxy(df: DataFrame, spec: SeriesSpec, qCol: Option[String] = None,
      htDays: Double = 90.0, minp: Int = 30): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Unambiguous composite key: \u0001 separator + NULL sentinel so
    // multi-key specs cannot collide ("ab","c" vs "a","bc") and NULL
    // key parts are not silently skipped by concat_ws (which would
    // merge distinct series and cross-match rows in the join-back).
    val skey = concat_ws("\u0001",
      spec.keyCols.map(c => coalesce(c.cast("string"), lit("\u0002NULL"))): _*)
    val hasQ = qCol.isDefined
    val prepared = df.select(
      skey.as("__skey"),
      unix_micros(spec.tsCol).as("__us"),
      dayofyear(spec.tsCol).cast("double").as("__doy"),
      spec.valueCol.cast("double").as("__y"),
      (qCol.map(col(_).cast("double")).getOrElse(lit(null).cast("double"))).as("__q"))
      .as[(String, Long, Double, java.lang.Double, java.lang.Double)]
    val fitted = prepared.groupByKey(_._1).flatMapGroups { (key, it) =>
      val rows = it.toArray.sortBy(_._2)
      val n = rows.length
      val us = rows.map(_._2)
      val minUs = us.min
      val tnum = us.map(u => (u - minUs) / 86400e6) // days
      val sv = rows.map(r => math.sin(2 * math.Pi * r._3 / 365.25))
      val cv = rows.map(r => math.cos(2 * math.Pi * r._3 / 365.25))
      val y = rows.map(r => if (r._4 == null) Double.NaN else r._4.doubleValue())
      val q = rows.map(r => if (r._5 == null) Double.NaN else r._5.doubleValue())
      val dim = if (hasQ) 4 else 3
      def xrow(i: Int): Array[Double] =
        if (hasQ) Array(tnum(i), sv(i), cv(i), q(i)) else Array(tnum(i), sv(i), cv(i))
      val finite = (0 until n).map(i =>
        !y(i).isNaN && xrow(i).forall(v => !v.isNaN && !v.isInfinite)).toArray
      val idxs = (0 until n).filter(finite).toArray
      val out = Array.fill[(Double, Double)](n)((Double.NaN, Double.NaN))
      if (idxs.length >= math.max(minp, 10)) {
        // q-kernel bandwidth: 3 * MAD of the finite discharge values
        val qMad = if (hasQ) {
          val qv = idxs.map(q)
          val med = medianOf(qv)
          math.max(1e-9, medianOf(qv.map(v => math.abs(v - med))) * 3)
        } else 0.0
        var i = 0
        while (i < n) {
          if (finite(i)) {
            val wAll = idxs.map { j =>
              val dt = math.abs(tnum(j) - tnum(i))
              val wt = math.exp(-math.pow(dt / htDays, 2))
              if (hasQ) wt * math.exp(-math.pow(math.abs(q(j) - q(i)) / qMad, 2))
              else wt
            }
            val wMax = wAll.max
            val ws = if (wMax > 0) wAll.map(_ / wMax) else wAll
            val keep = ws.zipWithIndex.filter(_._1 > 1e-3)
            if (keep.length >= minp) {
              // solve (A'W²A) beta = A'W²y with A = [1 | X]
              val p = dim + 1
              val ata = Array.ofDim[Double](p, p)
              val aty = Array.ofDim[Double](p)
              keep.foreach { case (w, kj) =>
                val j = idxs(kj)
                val a = Array(1.0) ++ xrow(j)
                val w2 = w * w
                var r = 0
                while (r < p) {
                  aty(r) += w2 * a(r) * y(j)
                  var c = 0
                  while (c < p) { ata(r)(c) += w2 * a(r) * a(c); c += 1 }
                  r += 1
                }
              }
              solveInPlace(ata, aty).foreach { beta =>
                val ai = Array(1.0) ++ xrow(i)
                val yhat = ai.zip(beta).map { case (a, b) => a * b }.sum
                out(i) = (yhat, y(i) - yhat)
              }
            }
          }
          i += 1
        }
      }
      (0 until n).iterator.map { i =>
        val (yh, res) = out(i)
        (key, us(i),
          if (yh.isNaN) null else java.lang.Double.valueOf(yh),
          if (res.isNaN) null else java.lang.Double.valueOf(res))
      }
    }.toDF("__skey", "__us", "wrtds_yhat", "wrtds_resid")
    df.withColumn("__skey", skey)
      .withColumn("__us", unix_micros(spec.tsCol))
      .join(fitted, Seq("__skey", "__us"), "left")
      .drop("__skey", "__us")
  }

  /** Bounded-support 2-term kernel local regression — the
    * SQL-expressible member of the WRTDS family (the full proxy's
    * O(n²) 4-feature WLS has no tidy relational form; this variant
    * exists so the kernel-regression semantics are oracle-checkable).
    *
    * Per point i: neighbors j of the same series with finite y and
    * |t_j − t_i| ≤ supportDays (the reference itself drops weights
    * below 1e-3 of max — ufz_water_qc_pipeline.py:615-616 — so a hard
    * time cutoff is the same idea made join-friendly: a bounded range
    * self-join, bucketable by time at cluster scale). Gaussian weights
    * w = exp(−((Δt)/htDays)²); fit y ≈ b0 + b1·t by weighted least
    * squares via the closed 2×2 normal equations.
    *
    * Cross-engine determinism: every kernel sum term is quantized with
    * round(term, 6) and summed as DECIMAL(38,6) — exact and order-free
    * — so Spark and DuckDB aggregate bit-identical values regardless
    * of row order; the 2×2 solve then runs in double on identical
    * inputs. Output: keys*, ts, value, l2_yhat, l2_resid (NULL when
    * fewer than minp in-support neighbors or a degenerate design).
    *
    * PRECONDITION: one row per (keys, ts). Duplicate timestamps within
    * a series would collapse to a single output row whose value is an
    * arbitrary duplicate's (`first(__yi)`) while the kernel sums count
    * each neighbor once per surviving group — nondeterministic output.
    * Deduplicate upstream first (e.g. TimeIndex.resolveDuplicatesMedian,
    * which the shipped pipeline flow always runs before this).
    */
  def local2(df: DataFrame, spec: SeriesSpec, htDays: Double = 30.0,
      supportDays: Double = 90.0, minp: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val wAll = Window.partitionBy(spec.keyCols: _*)
    val base = df
      .withColumn("__us", unix_micros(spec.tsCol))
      .withColumn("__t",
        (col("__us") - min(col("__us")).over(wAll)) / lit(86400e6))
    val iSide = base.select((spec.keyCols :+ col("__us").as("__ius") :+
      col("__t").as("__ti") :+ spec.valueCol.as("__yi")): _*)
    val jSide = base.filter(spec.valueCol.isNotNull)
      .select((spec.keyCols :+ col("__t").as("__tj") :+
        spec.valueCol.as("__yj")): _*)
    val dt = (col("__tj") - col("__ti")) / htDays
    val wgt = exp(-(dt * dt))
    def dec(c: org.apache.spark.sql.Column) =
      round(c, 6).cast(DecimalType(38, 6))
    // LEFT join: a point with zero in-support finite neighbors must
    // still appear in the output (with NULL fit), not vanish — the
    // documented contract, and what composing with the full proxy
    // expects. Both sides carry explicit aliases: key columns on the
    // two sides share expression IDs (common `base` lineage), and an
    // unaliased iSide(k) === jSide(k) builds a trivially-true
    // predicate that only Dataset-id self-join disambiguation rescues
    // — fragile across Spark versions, and it logs a WARN per plan.
    val joined = iSide.as("i").join(jSide.as("j"),
      spec.keys.map(k => col(s"i.$k") === col(s"j.$k")).reduce(_ && _) &&
        abs(col("__tj") - col("__ti")) <= supportDays, "left")
      .select((spec.keys.map(k => col(s"i.$k").as(k)) ++ Seq(col("__ius"),
        col("__ti"), col("__yi"), col("__tj"), col("__yj"))): _*)
    val agg = joined
      .groupBy((spec.keyCols :+ col("__ius")): _*)
      .agg(first(col("__ti")).as("__ti"), first(col("__yi")).as("__yi"),
        count(col("__yj")).as("__n"),
        sum(dec(wgt)).cast("double").as("s0"),
        sum(dec(wgt * col("__tj"))).cast("double").as("s1"),
        sum(dec(wgt * col("__tj") * col("__tj"))).cast("double").as("s2"),
        sum(dec(wgt * col("__yj"))).cast("double").as("sy"),
        sum(dec(wgt * col("__tj") * col("__yj"))).cast("double").as("sty"))
    val denom = col("s0") * col("s2") - col("s1") * col("s1")
    val b1 = (col("s0") * col("sty") - col("s1") * col("sy")) / denom
    val b0 = (col("sy") - b1 * col("s1")) / col("s0")
    val yhat = when(col("__n") >= minp && abs(denom) > 1e-9,
      b0 + b1 * col("__ti"))
    agg.select((spec.keyCols :+ timestamp_micros(col("__ius")).as("ts") :+
      col("__yi").as("value") :+
      round(yhat, 6).as("l2_yhat") :+
      round(col("__yi") - yhat, 6).as("l2_resid")): _*)
  }

  private def medianOf(xs: Array[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) Double.NaN
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Gaussian elimination with partial pivoting; None if singular. */
  private def solveInPlace(a: Array[Array[Double]], b: Array[Double])
      : Option[Array[Double]] = {
    val n = b.length
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (math.abs(a(piv)(col)) < 1e-300) return None
      if (piv != col) {
        val tmp = a(piv); a(piv) = a(col); a(col) = tmp
        val tb = b(piv); b(piv) = b(col); b(col) = tb
      }
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / a(col)(col)
        var c = col
        while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    Some(x)
  }

  /** Global robust-z spike detection on residuals (`wrtds_buster`):
    * z = (r − median(r)) / (1.4826·median(|r − median(r)|) + 1e−9);
    * spike = |z| ≥ zThresh. Two-pass exact medians per series.
    */
  def buster(df: DataFrame, spec: SeriesSpec, residCol: String = "wrtds_resid",
      zThresh: Double = 4.0): DataFrame = {
    val med = df.groupBy(spec.keyCols: _*)
      .agg(median(col(residCol)).as("__rmed"))
    val withMed = df.join(med, spec.keys)
    val mad = withMed.groupBy(spec.keyCols: _*)
      .agg(median(abs(col(residCol) - col("__rmed"))).as("__rmad"))
    val z = (col(residCol) - col("__rmed")) /
      (lit(1.4826) * col("__rmad") + lit(1e-9))
    withMed.join(mad, spec.keys)
      .withColumn("wrtds_spike", coalesce(abs(z) >= zThresh, lit(false)))
      .drop("__rmed", "__rmad")
  }
}
