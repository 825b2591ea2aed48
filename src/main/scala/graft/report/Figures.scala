package graft.report

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.SeriesSpec
import graft.operators.RollingStats
import graft.pipeline.Pipeline

/** The engine's PNG figure sink — the per-variable report figures the
  * reference emits from `process_variable`
  * (scripts/ufz_water_qc_pipeline.py:706-714: raw-vs-clean, flags,
  * flat events, decimal histogram, |Δ| diffs, seasonal coverage
  * heatmap, gaussian compare; plus the SentemQC band plot,
  * scripts/sentemqc.py:117-142).
  *
  * Scale discipline: everything that TOUCHES the full series (diffs,
  * histogram bins, smoothing, flag projection) is computed IN SPARK;
  * only a stride-downsampled tail (≤ maxPoints rows) or a tiny
  * aggregate is collected to the driver for rasterization — a figure
  * cannot use more points than it has pixels, so the collect is
  * bounded regardless of input size.
  */
object Figures {

  /** Deterministic stride downsample to ≤ cap rows per series (keeps
    * every k-th sample in time order — the figure-resolution variant
    * of the series, not a statistical sample).
    */
  def downsample(df: DataFrame, spec: SeriesSpec, cap: Int): DataFrame = {
    val w = Window.partitionBy(spec.keyCols: _*).orderBy(spec.tsCol)
    val wAll = Window.partitionBy(spec.keyCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      // ceiling division: a floor stride keeps ceil(n/floor(n/cap))
      // rows — up to ~2·cap−1 (n=199, cap=100 keeps all 199) — which
      // breaks the documented ≤ cap driver-collect bound
      .withColumn("__stride", greatest(lit(1), ceil(col("__n") / cap).cast("int")))
      .filter((col("__rn") - 1) % col("__stride") === 0)
      .drop("__rn", "__n", "__stride")
  }

  /** Decimal-histogram bar data (plot_decimal_hist binning): first
    * fractional digit of the non-null values of `valueCol`, 10 bins.
    * Public so figure CONTENT is assertable against golden-derived
    * values (FiguresSpec/GoldenSpec pin bar heights, not pixels).
    */
  def decimalHist(series: DataFrame, valueCol: String)
      : (Array[Double], Array[Double]) = {
    val hist = series.filter(col(valueCol).isNotNull)
      .groupBy(floor(pmod(col(valueCol), lit(1.0)) * 10).cast("int").as("bin"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val centers = (0 until 10).map(b => b / 10.0 + 0.05).toArray
    val heights = (0 until 10).map(b => hist.getOrElse(b, 0L).toDouble).toArray
    (centers, heights)
  }

  private def tsUs(rows: Array[Row], i: Int): Array[Double] =
    rows.map(r => r.getTimestamp(i).getTime * 1000.0)

  private def dbl(rows: Array[Row], i: Int): Array[Double] =
    rows.map(r => if (r.isNullAt(i)) Double.NaN else r.getDouble(i))

  /** |Δ| successive differences of `clean` per series — the y-series
    * of the quant_diffs figure (`plot_quant_diffs`,
    * ufz_water_qc_pipeline.py:333-343: `s.diff().abs()` — NULL
    * propagates through the lag like pandas NaN).
    */
  def withAbsDiff(series: DataFrame, spec: SeriesSpec): DataFrame = {
    val w = Window.partitionBy(spec.keyCols: _*).orderBy(spec.tsCol)
    series.withColumn("absdiff",
      abs(col("clean") - lag(col("clean"), 1).over(w)))
  }

  /** The season→coverage matrix the coverage heatmap plots: fixed
    * DJF/MAM/JJA/SON order, absent or NULL seasons drawn as 0 (the
    * reference heatmap's fillna(0), `plot_heatmap_coverage`,
    * ufz_water_qc_pipeline.py:359-371).
    */
  def coverageMatrix(seasonal: DataFrame): Seq[(String, Double)] = {
    val cov = seasonal.select(col("season"), col("coverage_pct")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) 0.0 else r.getDouble(1))).toMap
    Seq("DJF", "MAM", "JJA", "SON").map(s => s -> cov.getOrElse(s, 0.0))
  }

  /** Spark-side equivalent of [[bandLine]], applied at FULL resolution
    * before any downsampling: NULLs `qcband_top`/`qcband_bottom` where
    * the value is non-positive (log-scale filter) or where the time
    * delta to the previous point exceeds 10× the series' inferred base
    * step (`TimeIndex.inferStep` — np.median of positive deltas, the
    * same statistic sentemqc.py:61-72 uses). Distributed and
    * shuffle-shared with the figure layer's existing series window —
    * the 100 TB-safe place to do this; FiguresSpec pins it equal to
    * the driver-side [[bandLine]] on the golden corpus.
    */
  def maskBandLines(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val w = Window.partitionBy(spec.keyCols: _*).orderBy(spec.tsCol)
    val delta = unix_micros(spec.tsCol) -
      unix_micros(lag(spec.tsCol, 1).over(w))
    val gap = coalesce(delta > col("step_us") * 10, lit(false))
    df.join(graft.core.TimeIndex.inferStep(df, spec), spec.keys)
      .withColumn("qcband_top",
        when(!gap && col("qcband_top") > 0, col("qcband_top")))
      .withColumn("qcband_bottom",
        when(!gap && col("qcband_bottom") > 0, col("qcband_bottom")))
      .drop("step_us")
  }

  /** QC-band line data exactly as the reference's band plot draws it
    * (`plot_combined_log_gap`, sentemqc.py:118-127): non-positive band
    * values become NaN (the log-scale filter), then any point whose
    * time delta to the previous point exceeds 10× the base step
    * (median positive delta; 15 min fallback — sentemqc.py:61-72) is
    * NaN'd so the line breaks across gaps. `xsUs` must be time-sorted.
    *
    * Pass `stepUs` measured on the FULL-RESOLUTION series (e.g. via
    * `TimeIndex.inferStep`) when `xsUs` is downsampled: inferring from
    * strided xs would inflate the break threshold by the stride, so
    * outages the reference breaks on would draw connected. When
    * `stepUs` is NaN the step is inferred from `xsUs` itself
    * (np.median semantics — even-count deltas average the middle two).
    */
  def bandLine(xsUs: Array[Double], v: Array[Double],
      stepUs: Double = Double.NaN): Array[Double] = {
    val pos = v.map(x => if (x > 0) x else Double.NaN)
    if (xsUs.length <= 1) return pos
    val deltas = xsUs.sliding(2).map(p => p(1) - p(0)).filter(_ > 0).toArray
    val step =
      if (!stepUs.isNaN) stepUs
      else if (xsUs.length < 3 || deltas.isEmpty) 15 * 60 * 1e6
      else {
        java.util.Arrays.sort(deltas)
        val m = deltas.length
        if (m % 2 == 1) deltas(m / 2)
        else (deltas(m / 2 - 1) + deltas(m / 2)) / 2.0
      }
    val gapUs = 10 * step
    val out = pos.clone()
    var i = 1
    while (i < out.length) {
      if (xsUs(i) - xsUs(i - 1) > gapUs) out(i) = Double.NaN
      i += 1
    }
    out
  }

  /** All figures for one variable of a pipeline Result. Returns the
    * written paths. `timeseries` must already be filtered to one
    * (station, variable) series — same contract as the reference's
    * per-variable plot calls.
    */
  def forVariable(series: DataFrame, events: DataFrame, seasonal: DataFrame,
      spec: SeriesSpec, outDir: String, name: String,
      maxPoints: Int = 3000): Seq[String] = {
    val dir = s"$outDir/figures/${graft.sources.Ingest.sanitizeName(name)}"
    val written = scala.collection.mutable.ArrayBuffer[String]()
    def emit(fname: String, img: java.awt.image.BufferedImage): Unit = {
      val p = s"$dir/$fname"
      Plot.savePng(img, p)
      written += p
    }

    // one bounded collect of the downsampled series feeds 4 figures
    val withDiff = withAbsDiff(series, spec)
    // band columns are plot-only (the reference never persists them);
    // draw them when the caller's series carries them. The reference's
    // band-line transform (positive filter + gap break at 10× the base
    // step, sentemqc.py:118-127) is applied IN SPARK at full
    // resolution before downsampling — inferring the step from the
    // downsampled points would inflate the break threshold by the
    // stride, hiding multi-hour outages the reference breaks on.
    val hasBand = series.columns.contains("qcband_top") &&
      series.columns.contains("qcband_bottom")
    val withBand = if (hasBand) maskBandLines(withDiff, spec) else withDiff
    val baseCols = Seq(spec.tsCol, col("raw"), col("clean"), col("accepted"),
      col("saqc_flag"), col("sm_masked"), col("sm_flagged"), col("absdiff"))
    val selCols = if (hasBand)
      baseCols ++ Seq(col("qcband_top"), col("qcband_bottom")) else baseCols
    val ds = downsample(withBand, spec, maxPoints)
      .select(selCols: _*)
      .orderBy(spec.tsCol)
      .collect()
    if (ds.isEmpty) return written.toSeq
    val xs = tsUs(ds, 0)
    val raw = dbl(ds, 1); val clean = dbl(ds, 2); val accepted = dbl(ds, 3)
    val flagged = ds.map(r => !r.isNullAt(4) && r.getBoolean(4))
    val absdiff = dbl(ds, 7)

    // 1. raw vs clean (plot_series_basic composition, :706)
    emit("series_raw_clean.png", Plot.render(Seq(Plot.Panel(
      s"$name — raw vs clean", "Time", name,
      series = Seq(Plot.Series("Raw", Plot.Raw, xs, raw, 0.7f),
        Plot.Series("Clean", Plot.Blue, xs, clean, 0.8f)),
      xIsTimeUs = true))))

    // 2. accepted + flag markers (:708 flags overlay)
    val fx = xs.zip(raw).zip(flagged).collect { case ((x, y), true) => (x, y) }
    emit("flags.png", Plot.render(Seq(Plot.Panel(
      s"$name — QC flags", "Time", name,
      series = Seq(Plot.Series("Accepted", Plot.Blue, xs, accepted, 0.8f)),
      markers = Seq(Plot.Markers("Flagged", Plot.Orange,
        fx.map(_._1), fx.map(_._2))),
      xIsTimeUs = true))))

    // 3. flat events spans (plot_flat_events, :345-357)
    val evRows = events
      .filter(col("type").isin("flat_values", "flat_slopes"))
      .select(col("type"), col("start"), col("end"))
      .collect()
    val spans = evRows.toSeq.map { r =>
      val c = if (r.getString(0) == "flat_values") Plot.Orange else Plot.Blue
      val a = if (r.getString(0) == "flat_values") 0.2f else 0.18f
      Plot.Span(r.getTimestamp(1).getTime * 1000.0,
        r.getTimestamp(2).getTime * 1000.0, c, a)
    }
    emit("flat_events.png", Plot.render(Seq(Plot.Panel(
      s"$name — flat values (orange) and flat slopes (blue)", "Time", name,
      series = Seq(Plot.Series("Raw", Plot.Raw, xs, raw, 0.7f)),
      spans = spans, xIsTimeUs = true))))

    // 4. |Δ| successive differences (plot_quant_diffs, :333-343)
    emit("quant_diffs.png", Plot.render(Seq(Plot.Panel(
      s"$name — absolute successive differences", "Time", "|Δ|",
      series = Seq(Plot.Series("", Plot.Blue, xs, absdiff, 0.6f)),
      xIsTimeUs = true)), width = 700, heightPerPanel = 260))

    // 5. decimal histogram (plot_decimal_hist, :320-331) — binned in
    // Spark, 10 numbers cross the driver boundary
    val (centers, heights) = decimalHist(series, "clean")
    emit("decimal_hist.png", Plot.render(Seq(Plot.Panel(
      "Decimal distribution", "Fractional part [0..1)", "Count",
      bars = Some((centers, heights)))), width = 700, heightPerPanel = 260))

    // 6. seasonal coverage heatmap (plot_heatmap_coverage, :359-371)
    emit("coverage.png", Plot.heatmap(
      coverageMatrix(seasonal), "Coverage per season [%]"))

    // 7. gaussian compare, 2 panels (plot_gaussian_compare, :373-389):
    // smooth + residual computed IN SPARK (RollingStats.gaussianSmooth
    // over the ffill/bfill-filled clean series), downsampled for pixels
    val filled = graft.core.TimeIndex.bfill(
      graft.core.TimeIndex.ffill(series, spec, "clean", "__f"), spec, "__f", "__fb")
    val smoothed = RollingStats.gaussianSmooth(filled, spec, "__fb",
      sigmaPts = 4.0, radius = 12, out = "__smooth")
      .withColumn("__resid", col("clean") - col("__smooth"))
    val gs = downsample(smoothed, spec, maxPoints)
      .select(spec.tsCol, col("clean"), col("__smooth"), col("__resid"))
      .orderBy(spec.tsCol).collect()
    val gx = tsUs(gs, 0)
    emit("gaussian_compare.png", Plot.render(Seq(
      Plot.Panel(s"$name — gaussian filter", "Time", name,
        series = Seq(Plot.Series("Raw", Plot.Raw, gx, dbl(gs, 1), 0.6f),
          Plot.Series("Gaussian", Plot.Blue, gx, dbl(gs, 2), 0.9f)),
        xIsTimeUs = true),
      Plot.Panel("Residual", "Time", "resid",
        series = Seq(Plot.Series("Residual", Plot.Orange, gx, dbl(gs, 3), 0.7f)),
        xIsTimeUs = true))))

    // 8. SentemQC masked plot (sentemqc.py:117-142) when the side-band
    // carries any data for this variable
    val smFlagged = ds.map(r => !r.isNullAt(6) && r.getBoolean(6))
    if (ds.exists(r => !r.isNullAt(5)) || smFlagged.exists(identity)) {
      val sm = dbl(ds, 5)
      val sfx = xs.zip(raw).zip(smFlagged).collect { case ((x, y), true) => (x, y) }
      // QC band top/bottom in grey when the series carries the band
      // columns (plot_combined_log_gap, sentemqc.py:125-127: the
      // positive filter + gap break were applied in Spark above at
      // full resolution; NULL → NaN here breaks the plotted line;
      // drawn only if any point is left on both lines)
      val bandSeries =
        if (!hasBand) Seq.empty
        else {
          val top = dbl(ds, 8)
          val bot = dbl(ds, 9)
          if (top.exists(d => !d.isNaN) && bot.exists(d => !d.isNaN))
            Seq(Plot.Series("QC band top", Plot.BandGrey, xs, top, 0.8f),
              Plot.Series("QC band bottom", Plot.BandGrey, xs, bot, 0.8f))
          else Seq.empty
        }
      emit("sentem.png", Plot.render(Seq(Plot.Panel(
        s"$name — SentemQC", "Time", name,
        series = Seq(Plot.Series("Raw", Plot.Raw, xs, raw, 0.6f)) ++
          bandSeries ++
          Seq(Plot.Series("Masked", Plot.Green, xs, sm, 0.8f)),
        markers = Seq(Plot.Markers("Flagged", Plot.Orange,
          sfx.map(_._1), sfx.map(_._2))),
        xIsTimeUs = true))))
    }
    written.toSeq
  }

  /** Figures for every variable of a pipeline Result (the reference's
    * per-variable plot loop). `variableCol` names the variable key
    * column inside the result's series keys.
    */
  def writeAll(r: Pipeline.Result, spec: SeriesSpec, variableCol: String,
      outDir: String, maxPoints: Int = 3000): Seq[String] = {
    val variables = r.timeseries.select(variableCol).distinct()
      .collect().map(_.get(0).toString).sorted
    variables.flatMap { v =>
      forVariable(
        r.timeseries.filter(col(variableCol) === v),
        r.events.filter(col(variableCol) === v),
        r.seasonal.filter(col(variableCol) === v),
        spec, outDir, v, maxPoints)
    }.toSeq
  }
}
