package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{SeriesSpec, SeriesWindows}
import graft.functions.SpecialMath

/** Value-distribution diagnostics (reference `decimal_uniformity`
  * scripts/ufz_water_qc_pipeline.py:239-248,
  * `find_long_unique_double_decimals` :250-258,
  * `quant_step_estimate` :129-142 / `infer_quantization` :260-262).
  */
object Diagnostics {

  /** 10-bin histogram of fractional parts + χ² uniformity statistic
    * against the uniform expectation e = n/nbins. Empty bins
    * contribute (0−e)²/e = e, accounted without densifying the
    * histogram. Output: keys*, n_finite, chisq (+ p, the χ² survival
    * with df = nbins−1, where the reference uses scipy).
    */
  def decimalUniformity(df: DataFrame, spec: SeriesSpec,
      nbins: Int = 10, withP: Boolean = true): DataFrame = {
    val bin = floor(pmod(spec.valueCol, lit(1.0)) * nbins).cast("int")
    val finite = df.filter(spec.valueCol.isNotNull)
    val perBin = finite.withColumn("__bin", bin)
      .groupBy((spec.keyCols :+ col("__bin")): _*)
      .agg(count(lit(1)).as("__h"))
    val totals = perBin.groupBy(spec.keyCols: _*)
      .agg(sum("__h").as("n_finite"), count(lit(1)).as("__present"))
      .withColumn("__e", col("n_finite").cast("double") / nbins)
    val chisq = perBin.join(totals, spec.keys)
      .groupBy(spec.keyCols: _*)
      .agg(first(col("n_finite")).as("n_finite"),
        (sum(pow(col("__h") - col("__e"), 2) / col("__e")) +
          (lit(nbins) - first(col("__present"))) * first(col("__e"))).as("chisq"))
      .withColumn("chisq", round(col("chisq"), 6))
    if (withP)
      chisq.withColumn("p",
        round(SpecialMath.chi2_sf(col("chisq"), lit((nbins - 1).toDouble)), 6))
    else chisq
  }

  /** Mode of round(frac·100): most frequent two-digit decimal pattern
    * and its share; numpy argmax tie-breaks to the smallest code.
    * Output: keys*, dom, dom_frac.
    */
  def dominantDecimal(df: DataFrame, spec: SeriesSpec): DataFrame = {
    // Spark round = HALF_UP; the reference's np.round is half-even, so
    // frac·100 landing exactly on .5 (e.g. 12.5 → ref 12, ours 13)
    // diverges — deliberate, matches the DuckDB oracle's round();
    // documented centrally at TimeIndex.toPoints.
    val code = round(pmod(spec.valueCol, lit(1.0)) * 100).cast("int")
    val finite = df.filter(spec.valueCol.isNotNull).withColumn("__code", code)
    val counts = finite.groupBy((spec.keyCols :+ col("__code")): _*)
      .agg(count(lit(1)).as("__c"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(spec.keyCols: _*)
      .orderBy(col("__c").desc, col("__code").asc)
    counts
      .withColumn("__total", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(spec.keyCols: _*)))
      .withColumn("__rk", row_number().over(wRank))
      .filter(col("__rk") === 1)
      .select((spec.keyCols :+ col("__code").as("dom")
        :+ (col("__c").cast("double") / col("__total")).as("dom_frac")): _*)
  }

  /** Quantization-step estimate: candidate steps from the quantile
    * ladder of positive |Δ| ({q10, q25, q50, q50/2 … q50/9}); pick the
    * first candidate (list order) maximizing the fraction of deltas
    * within 1e−3 of an integer multiple; require > 0.7.
    * Output: keys*, quant_step (NULL if not quantized), is_quantized.
    */
  def quantStep(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val w = SeriesWindows.ordered(spec)
    val deltas = df
      .withColumn("__d", abs(spec.valueCol - lag(spec.valueCol, 1).over(w)))
      .filter(col("__d") > 0 && col("__d").isNotNull)
      .select((spec.keyCols :+ col("__d")): _*)
    val qs = deltas.groupBy(spec.keyCols: _*)
      .agg(percentile(col("__d"), lit(0.1)).as("q10"),
        percentile(col("__d"), lit(0.25)).as("q25"),
        percentile(col("__d"), lit(0.5)).as("q50"))
    // The 11-candidate ladder is evaluated as ONE pass of conditional
    // aggregates over the deltas (the per-series quantile row is a tiny
    // broadcast join), not a posexplode that would shuffle 11x the
    // delta rows. avg of exact 0.0/1.0 terms is order-free, so this is
    // bit-identical to the per-candidate grouping it replaces.
    def candExprs: Seq[org.apache.spark.sql.Column] = Seq(col("q10"), col("q25"), col("q50")) ++
      (2 to 9).map(i => col("q50") / i)
    val hitAggs = candExprs.zipWithIndex.map { case (c, i) =>
      avg(when(abs(col("__d") / c - round(col("__d") / c)) <= 1e-3, 1.0)
        .otherwise(0.0)).as(s"__hit_$i")
    }
    val keepQs = Seq(first(col("q10")).as("q10"), first(col("q25")).as("q25"),
      first(col("q50")).as("q50"))
    val agg = deltas.join(qs, spec.keys)
      .groupBy(spec.keyCols: _*)
      .agg(hitAggs.head, (hitAggs.tail ++ keepQs): _*)
    val hitCols = candExprs.indices.map(i => col(s"__hit_$i"))
    val best = greatest(hitCols: _*)
    // first-max tie-break = candidate ladder order (numpy argmax)
    val bestCand = coalesce(candExprs.zipWithIndex.map { case (c, i) =>
      when(col(s"__hit_$i") === best, c)
    }: _*)
    agg.select((spec.keyCols :+
      when(best > 0.7, round(bestCand, 6)).as("quant_step") :+
      (best > 0.7).as("is_quantized")): _*)
  }

  /** Fixed-bin value histogram per group: bin i covers
    * [lo + i·w, lo + (i+1)·w) with w = (hi−lo)/nBins; values outside
    * [lo, hi) clamp into the first/last bin (so counts always sum to
    * the group's row count — the distribution-monitoring contract,
    * where a stray outlier must not vanish). NULL values are skipped.
    * The bin index is pure arithmetic (floor of a single IEEE
    * division) — deterministic across engines. Empty bins are not
    * densified: one map-side-combining aggregate, output rows ≤
    * groups × nBins regardless of input size.
    * Output: group, bin, bin_lo, n.
    */
  def valueHistogram(df: DataFrame, group: String, value: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"bad histogram spec [$lo,$hi)/$nBins")
    val w = (hi - lo) / nBins
    val raw = floor((col(value) - lit(lo)) / lit(w)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(nBins - 1L))
    df.filter(col(value).isNotNull)
      .groupBy(col(group), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", round(lit(lo) + col("bin") * lit(w), 6))
      .select(col(group), col("bin"), col("bin_lo"), col("n"))
  }

  /** Per-group closed-form OLS fit (y = slope·x + intercept, plus r²)
    * with ORDER-FREE exact aggregation — the trend/drift monitor shape
    * (one map-side-combined pass, output one row per group).
    *
    * Cross-engine determinism: doubles are quantized to scaled longs
    * (round(v·scale)) and every moment (Σx, Σy, Σx², Σxy, Σy²) is an
    * exact integer sum in DECIMAL(38,0) — no float sum-order
    * sensitivity anywhere. The closed-form combination
    * (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) happens once per group on those
    * exact integers, with ONE double division at the very end; the
    * quantization scale cancels in the slope, and the intercept
    * rescales by 1/scale. Rows with a NULL x or y are excluded (the
    * pairwise-complete contract). Constant-x groups → NULL fit.
    * Output: group*, n, slope, intercept, r2 (rounded 6).
    */
  def groupedLinearFit(df: DataFrame, groupCols: Seq[String],
      x: String, y: String, scale: Long = 100L): DataFrame = {
    val dec = "decimal(38,0)"
    val xq = graft.core.FastRound.halfAwayLong(col(x) * scale)
    val yq = graft.core.FastRound.halfAwayLong(col(y) * scale)
    val m = df.filter(col(x).isNotNull && col(y).isNotNull)
      .select(groupCols.map(col) :+ xq.as("__x") :+ yq.as("__y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast(dec).as("__n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        // cast the FACTORS, not the product: long·long overflows
        // silently for quantized magnitudes past 2^31.5, decimal
        // multiply stays exact to 1e38
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val den = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val deny = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    val slope = num / den
    val nd = col("__n").cast("double")
    m.select(groupCols.map(col) ++ Seq(
      col("__n").cast("long").as("n"),
      when(den =!= 0.0, round(slope, 6)).as("slope"),
      when(den =!= 0.0,
        round(col("__sy").cast("double") / (nd * scale) -
          slope * (col("__sx").cast("double") / (nd * scale)), 6))
        .as("intercept"),
      when(den =!= 0.0 && deny =!= 0.0,
        round(num * num / (den * deny), 6)).as("r2")): _*)
  }

  /** Per-group ROBUST linear fit — Huber IRLS on the
    * [[groupedLinearFit]] moment machinery: a pilot OLS fit, then
    * `iters` reweighting rounds, each computing per-row residuals
    * against the previous fit, a robust scale s = median|r| per
    * group, Huber weights w = 1 for |r| ≤ c·s else c·s/|r| quantized
    * to a 1e-6 grid, and a weighted least-squares refit via exact
    * DECIMAL(38,0) integer moments (weights and values both on fixed
    * grids, so every sum is order-free and engine-portable; each
    * round's coefficients are rounded to 6 dp before feeding the next
    * round — the same determinism contract as the OLS fit, so DuckDB
    * replays the identical iteration trajectory). Multiple rounds
    * matter: one step cannot neutralize a high-leverage outlier,
    * because the tilted pilot inflates every residual.
    *
    * Scale shape: 1 + 2·iters linear passes over the data (pilot
    * moments, then a residual-scale aggregate and a weighted-moment
    * aggregate per round), each map-side-combined; the per-group
    * fit/scale tables are broadcast back, so nothing ever shuffles on
    * the data axis. The residual-scale pass buffers each group's
    * residuals for the exact median — swap in approx_percentile at
    * the 100 TB tier the same way q_percentiles ↔
    * q_approx_percentiles trade.
    *
    * Groups whose pilot fit is degenerate (constant x) emit NULL
    * robust coefficients. Output: group*, slope_ols, intercept_ols,
    * slope_robust, intercept_robust, n, n_downweighted (counters from
    * the final round; coefficients rounded 6).
    *
    * PRECONDITION: quantized magnitudes must keep every weighted
    * moment product inside a long — 1e6·max((|x|·scale)²,
    * |x|·scale·|y|·scale) < 2^63, i.e. |x|·scale ≲ 3e6 and
    * |x·y|·scale² ≲ 9e12. Violations cannot corrupt results
    * silently: under the engine's default ANSI mode the quantization
    * cast and the long products RAISE on overflow (pinned in
    * RobustFitSpec); rescale inputs or shrink `scale` to fit.
    */
  def groupedRobustFit(df: DataFrame, groupCols: Seq[String],
      x: String, y: String, scale: Long = 100L,
      c: Double = 3.0, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be positive: $iters")
    val dec = "decimal(38,0)"
    val g = groupCols.map(col)
    // each IRLS round reads the base twice (residual-scale pass +
    // weighted-moment pass) — cache the filtered projection so the
    // 1+2·iters passes pay the scan/filter once (Caches-registered:
    // bench unpersists between queries)
    val base = graft.core.Caches.cached(
      df.filter(col(x).isNotNull && col(y).isNotNull)
        .select(g :+ col(x).as("__xr") :+ col(y).as("__yr"): _*))
    // pilot over the SAME cached base (one parquet scan total), and
    // itself cached: it is consumed by round 1's residuals AND the
    // final output join. Every per-round fit/stats table below is
    // cached the same way — these are O(groups)-row tables, but an
    // UNcached fit's lineage re-executes the whole previous round's
    // scale+moment passes once PER CONSUMER (round k's scale pass,
    // round k's moment pass, and the final join each re-ran rounds
    // 1..k-1 — the multiplicative re-execution that made iters=3
    // cost 12.5 s at sf0.1 where 1+2·iters linear passes cost ~4 s).
    val pilot = graft.core.Caches.cached(
      groupedLinearFit(base, groupCols, "__xr", "__yr", scale)
        .select(g :+ col("slope").as("__b1") :+
          col("intercept").as("__b0"): _*))
    var fit = pilot
    var stats: DataFrame = null
    var lastB1: org.apache.spark.sql.Column = null
    var lastB0: org.apache.spark.sql.Column = null
    for (_ <- 1 to iters) {
      val rows = base.join(broadcast(fit), groupCols)
        .withColumn("__r",
          col("__yr") - (col("__b1") * col("__xr") + col("__b0")))
      val scaleTab = rows.groupBy(g: _*)
        .agg(expr("percentile(abs(__r), 0.5)").as("__s"))
      val wq = when(col("__b1").isNull, lit(null))
        .when(col("__s") === 0.0 || abs(col("__r")) <= lit(c) * col("__s"),
          lit(1000000L))
        .otherwise(graft.core.FastRound.halfAwayLong(
          lit(c) * col("__s") / abs(col("__r")) * 1000000L))
      // moment terms as exact LONG products (the local2 micro-unit
      // discipline, commit 9c3b9ae): w ≤ 1e6 and the quantized
      // xq/yq are integers, so w·xq, w·yq, w·xq², w·xq·yq are exact
      // codegen'd long multiplies — converted to decimal ONCE for
      // the order-free 38-digit sum instead of 2-3 BigDecimal
      // multiplies per row per term. The values are identical to the
      // old all-decimal idiom (and to the oracle's HUGEINT products)
      // whenever no long product wraps — the documented PRECONDITION,
      // which cannot fail silently: under the engine's default ANSI
      // mode both the quantization cast and the products raise on
      // overflow (RobustFitSpec pins this) instead of wrapping.
      val weighted = graft.core.Caches.cached(
        rows.join(broadcast(scaleTab), groupCols)
        .withColumn("__w", wq)
        .withColumn("__xq", graft.core.FastRound.halfAwayLong(col("__xr") * scale))
        .withColumn("__yq", graft.core.FastRound.halfAwayLong(col("__yr") * scale))
        .groupBy(g: _*)
        .agg(
          count(lit(1)).as("n"),
          sum(col("__w").cast(dec)).as("__sw"),
          sum((col("__w") * col("__xq")).cast(dec)).as("__swx"),
          sum((col("__w") * col("__yq")).cast(dec)).as("__swy"),
          sum((col("__w") * col("__xq") * col("__xq")).cast(dec))
            .as("__swxx"),
          sum((col("__w") * col("__xq") * col("__yq")).cast(dec))
            .as("__swxy"),
          sum(when(col("__w") < 1000000L, 1L).otherwise(0L))
            .as("n_downweighted")))
      val num = (col("__sw") * col("__swxy") - col("__swx") * col("__swy"))
        .cast("double")
      val den = (col("__sw") * col("__swxx") - col("__swx") * col("__swx"))
        .cast("double")
      val slopeR = num / den
      val swd = col("__sw").cast("double")
      stats = weighted
      lastB1 = when(den =!= 0.0, round(slopeR, 6))
      lastB0 = when(den =!= 0.0,
        round(col("__swy").cast("double") / (swd * scale) -
          slopeR * (col("__swx").cast("double") / (swd * scale)), 6))
      fit = weighted.select(g ++ Seq(
        lastB1.as("__b1"), lastB0.as("__b0")): _*)
    }
    // ONE broadcast join of the two tiny per-group tables: the final
    // robust coefficients and counters are a single select off the
    // CACHED final-round aggregate (a separate fit-table join +
    // stats-table join doubled the broadcast/stage count of a query
    // whose cost is stage overhead, not data)
    pilot.select(g :+ col("__b1").as("slope_ols") :+
        col("__b0").as("intercept_ols"): _*)
      .join(broadcast(stats.select(g ++ Seq(
        lastB1.as("slope_robust"), lastB0.as("intercept_robust"),
        col("n"), col("n_downweighted")): _*)), groupCols)
  }

  /** Population-stability-index drift between consecutive time
    * windows — the standard "did this feed's distribution shift?"
    * monitor a production pipeline runs per sensor/event-type:
    * PSI(cur ‖ prev) = Σ_bins (p_b − q_b)·ln(p_b/q_b) over a FIXED
    * value binning (fixed-width bins over [lo, hi), out-of-range
    * values clamped to the edge bins — fixed bins keep the operator
    * one map-side-combined aggregate; quantile bins would need the
    * [[graft.ext.Sampling.quantileBuckets]] boundary pass first).
    * Empty bins are Laplace-smoothed ((c + 0.5)/(N + 0.5·nBins), the
    * standard half-count prior), so PSI is always finite. Rule of
    * thumb: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 drifted.
    *
    * One (group, window, bin) count aggregate reduces the stream to
    * O(groups·windows·nBins) rows; the prev-window comparison is an
    * equi-join on (group, window−1) over that tiny table — no
    * window-function sort, no corpus re-scan. FP determinism: counts
    * stay BIGINT; each bin term mirrors identically-shaped double
    * expressions, rounds to 9 dp and sums as DECIMAL(38,9)
    * (order-free); the reported statistic re-rounds the exact sum to
    * 6 dp IN DECIMAL SPACE (both engines round decimals
    * half-away-from-zero exactly) before the single cast to double,
    * so neither a 1-ulp libm difference in a single ln term nor a
    * 6-dp midpoint sitting exactly on the 9-dp grid can flip the
    * emitted value.
    * Output: group*, window_id, n_prev, n_cur, psi (double).
    */
  def psiDrift(df: DataFrame, groupCols: Seq[String], tsUs: String,
      value: String, windowUs: Long, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo, s"bad binning: [$lo,$hi) x $nBins")
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    val g = groupCols.map(col)
    val width = (hi - lo) / nBins
    val bin = least(greatest(
      floor((col(value) - lit(lo)) / lit(width)), lit(0.0)),
      lit(nBins - 1.0)).cast("int")
    val counts = df.filter(col(value).isNotNull)
      .select(g :+ floor(col(tsUs) / lit(windowUs)).cast("long")
        .as("window_id") :+ bin.as("bin"): _*)
      .groupBy((groupCols :+ "window_id" :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("c"))
    // densify: every (group, window) carries all nBins bins so empty
    // bins enter the smoothed sum on both sides of the join
    val wins = counts.groupBy((groupCols :+ "window_id").map(col): _*)
      .agg(sum("c").as("n"))
    val full = wins
      .withColumn("bin", explode(sequence(lit(0), lit(nBins - 1))))
      .join(counts, groupCols :+ "window_id" :+ "bin", "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val cur = full.select(g :+ col("window_id") :+ col("bin") :+
      col("c").as("c_cur") :+ col("n").as("n_cur"): _*)
    val prev = full.select(g :+ (col("window_id") + 1).as("window_id") :+
      col("bin") :+ col("c").as("c_prev") :+ col("n").as("n_prev"): _*)
    val p = (col("c_cur") + lit(0.5)) /
      (col("n_cur") + lit(0.5) * nBins)
    val q = (col("c_prev") + lit(0.5)) /
      (col("n_prev") + lit(0.5) * nBins)
    cur.join(prev, groupCols :+ "window_id" :+ "bin")
      .select(g :+ col("window_id") :+ col("n_prev") :+ col("n_cur") :+
        round((p - q) * log(p / q), 9).cast("decimal(38,9)").as("t"): _*)
      .groupBy((groupCols :+ "window_id").map(col): _*)
      .agg(first(col("n_prev")).as("n_prev"),
        first(col("n_cur")).as("n_cur"),
        round(sum(col("t")), 6).cast("double").as("psi"))
  }
}
