package graft

import org.apache.spark.sql.functions._
import graft.core.SeriesSpec
import graft.pipeline.{Pipeline, PipelineConfig}
import graft.report.{Figures, Plot}

/** PNG figure sink: the report layer renders real PNGs headlessly and
  * the downsampler bounds what crosses the driver boundary.
  */
class FiguresSpec extends SparkTestBase {

  private val spec = SeriesSpec(Seq("station", "variable"))

  private def mkSeries(n: Int, f: Int => Option[Double]) = {
    import spark.implicits._
    (0 until n).map { i =>
      ("st1", "v1",
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusMinutes(15L * i)
          .toString.replace('T', ' '), f(i))
    }.toDF("station", "variable", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  test("downsample keeps <= cap points per series in time order") {
    val df = mkSeries(1000, i => Some(i.toDouble))
    val out = Figures.downsample(df, spec, cap = 100)
      .orderBy("ts").select("value").collect().map(_.getDouble(0))
    assert(out.length <= 100 && out.length >= 50) // ceil stride: hard <= cap
    assert(out.toSeq == out.sorted.toSeq) // order preserved
    assert(out.head == 0.0) // first sample kept
    // adversarial n just under 2*cap: floor stride would keep ALL 199
    val tight = Figures.downsample(mkSeries(199, i => Some(i.toDouble)), spec,
      cap = 100).count()
    assert(tight <= 100 && tight >= 50, s"cap bound violated: $tight")
  }

  test("decimal-hist figure data matches golden-derived bar heights") {
    // Figure CONTENT parity, not pixels: the decimal-histogram bar
    // heights computed by the figure layer over the golden corpus's
    // committed O2 raw series must equal the histogram derived
    // independently (plain Scala over the collected values, same
    // first-fractional-digit binning as plot_decimal_hist).
    val gold = spark.read.parquet("/root/reference/scripts/water_qc_output/" +
      "processed/Erkenruh_Einruhr/Erkenruh_Einruhr__qc_timeseries.parquet")
      .select(col("SurfaceWaterConcentration_O2_mg_L-1__raw").as("clean"))
      .filter(!isnan(col("clean")))
    val (centers, heights) = Figures.decimalHist(gold, "clean")
    assert(centers.toSeq == (0 until 10).map(b => b / 10.0 + 0.05))
    val vals = gold.collect().map(_.getDouble(0))
    val expected = new Array[Double](10)
    vals.foreach { v =>
      val frac = ((v % 1.0) + 1.0) % 1.0 // pmod semantics
      expected(math.min(9, (frac * 10).toInt)) += 1
    }
    assert(vals.length > 90000, s"golden O2 series unexpectedly small: ${vals.length}")
    assert(heights.toSeq == expected.toSeq,
      s"bar heights ${heights.toSeq} != golden-derived ${expected.toSeq}")
  }

  test("pipeline figures render decodable PNGs with plotted content") {
    // a series with flags, flat runs and gaps so every figure has data
    val df = mkSeries(600, i =>
      if (i % 97 == 0) None
      else if (i > 200 && i < 230) Some(42.0)            // flat run
      else Some(20.0 + 10 * math.sin(i / 20.0) + (if (i == 300) 500.0 else 0.0)))
    val cfg = PipelineConfig(kVariance = 6, kZscore = 8, applySentem = false)
    val r = Pipeline.run(df, spec, cfg, variableCol = Some("variable"))
    val outDir = java.nio.file.Files.createTempDirectory("figs").toString
    val written = Figures.writeAll(r, spec, "variable", outDir, maxPoints = 500)
    graft.core.Caches.unpersistAll()
    val names = written.map(_.split('/').last).toSet
    assert(Set("series_raw_clean.png", "flags.png", "flat_events.png",
      "quant_diffs.png", "decimal_hist.png", "coverage.png",
      "gaussian_compare.png").subsetOf(names), s"missing figures: $names")
    written.foreach { p =>
      val img = javax.imageio.ImageIO.read(new java.io.File(p))
      assert(img != null, s"$p does not decode")
      assert(img.getWidth >= 300 && img.getHeight >= 200)
      // plotted content: some pixels are neither white nor black frame
      var colored = 0
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y) & 0xffffff
        if (rgb != 0xffffff && rgb != 0x000000) colored += 1
      }
      assert(colored > 100, s"$p looks empty ($colored colored pixels)")
    }
    // the raw/clean figure carries both series colors
    val rc = javax.imageio.ImageIO.read(
      new java.io.File(written.find(_.endsWith("series_raw_clean.png")).get))
    def hasColor(c: java.awt.Color): Boolean = {
      for (y <- 0 until rc.getHeight; x <- 0 until rc.getWidth)
        if ((rc.getRGB(x, y) & 0xffffff) == (c.getRGB & 0xffffff)) return true
      false
    }
    assert(hasColor(Plot.Raw) && hasColor(Plot.Blue))
  }
}
