package graft.report

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage

/** Minimal headless 2D plot renderer (JDK `Graphics2D` + `ImageIO`,
  * zero dependencies) backing the engine's PNG figure sink — the
  * report layer the reference implements with matplotlib
  * (scripts/ufz_water_qc_pipeline.py:293-389, scripts/sentemqc.py:117-142).
  * Faithful to the reference's figure CONTENT (series lines, marker
  * overlays, event spans, histogram bars, band fills, season heatmap
  * cells, titles/labels/legend), not to matplotlib's pixel output.
  *
  * All drawing happens driver-side on ALREADY-AGGREGATED or
  * downsampled data (a figure has ~10³ useful points; callers
  * stride-downsample before collecting — Figures.downsample) — the
  * same shape as the reference, whose matplotlib also renders from
  * the driver process.
  */
object Plot {

  // the reference's palette (COLOR_RAW grey, blue, orange)
  val Raw = new Color(0x88, 0x88, 0x88)
  val Blue = new Color(0x1f, 0x77, 0xb4)
  val Orange = new Color(0xff, 0x7f, 0x0e)
  val Green = new Color(0x2c, 0xa0, 0x2c)
  val BandGrey = new Color(0x77, 0x77, 0x77) // COLOR_QCBAND_GREY, sentemqc.py:17

  final case class Series(label: String, color: Color, xs: Array[Double],
      ys: Array[Double], lw: Float = 1.0f)
  final case class Markers(label: String, color: Color, xs: Array[Double],
      ys: Array[Double], size: Int = 3)
  /** Vertical [x0, x1] span with a translucent fill. */
  final case class Span(x0: Double, x1: Double, color: Color, alpha: Float)
  /** Filled band between two y-series over shared xs. */
  final case class Band(label: String, color: Color, alpha: Float,
      xs: Array[Double], yLo: Array[Double], yHi: Array[Double])

  final case class Panel(title: String, xLabel: String, yLabel: String,
      series: Seq[Series] = Nil, markers: Seq[Markers] = Nil,
      spans: Seq[Span] = Nil, bands: Seq[Band] = Nil,
      bars: Option[(Array[Double], Array[Double])] = None, // (centers, heights)
      xIsTimeUs: Boolean = false, annot: Option[String] = None)

  private val axisFont = new Font(Font.SANS_SERIF, Font.PLAIN, 10)
  private val titleFont = new Font(Font.SANS_SERIF, Font.BOLD, 12)
  private val ml = 56; private val mr = 14; private val mt = 26; private val mb = 40

  /** Render stacked panels into one image (the reference's
    * plt.subplot(n,1,i) layout).
    */
  def render(panels: Seq[Panel], width: Int = 960,
      heightPerPanel: Int = 320): BufferedImage = {
    val h = heightPerPanel * panels.size
    val img = new BufferedImage(width, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_ON)
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, width, h)
    panels.zipWithIndex.foreach { case (p, i) =>
      drawPanel(g, p, 0, i * heightPerPanel, width, heightPerPanel)
    }
    g.dispose()
    img
  }

  private def finite(a: Array[Double]): Array[Double] = a.filter(v => !v.isNaN)

  private def drawPanel(g: Graphics2D, p: Panel, x0: Int, y0: Int,
      w: Int, h: Int): Unit = {
    val plotX = x0 + ml; val plotY = y0 + mt
    val plotW = w - ml - mr; val plotH = h - mt - mb

    val allX = (p.series.flatMap(s => finite(s.xs)) ++
      p.markers.flatMap(m => finite(m.xs)) ++
      p.bands.flatMap(b => finite(b.xs)) ++
      p.spans.flatMap(s => Seq(s.x0, s.x1)) ++
      p.bars.map(_._1.toSeq).getOrElse(Nil)).filterNot(_.isNaN)
    val allY = (p.series.flatMap(s => finite(s.ys)) ++
      p.markers.flatMap(m => finite(m.ys)) ++
      p.bands.flatMap(b => finite(b.yLo) ++ finite(b.yHi)) ++
      p.bars.map(_._2.toSeq).getOrElse(Nil) ++
      p.bars.map(_ => Seq(0.0)).getOrElse(Nil)).filterNot(_.isNaN)
    if (allX.isEmpty || allY.isEmpty) { drawFrame(g, p, plotX, plotY, plotW, plotH); return }
    var (xMin, xMax) = (allX.min, allX.max)
    var (yMin, yMax) = (allY.min, allY.max)
    if (xMax == xMin) { xMax = xMin + 1 }
    if (yMax == yMin) { yMax = yMin + 1 }
    val yPad = (yMax - yMin) * 0.05
    yMin -= yPad; yMax += yPad
    def sx(v: Double): Int = plotX + ((v - xMin) / (xMax - xMin) * plotW).round.toInt
    def sy(v: Double): Int = plotY + plotH - ((v - yMin) / (yMax - yMin) * plotH).round.toInt

    // spans under everything
    p.spans.foreach { s =>
      g.setColor(new Color(s.color.getRed, s.color.getGreen, s.color.getBlue,
        (s.alpha * 255).toInt))
      val a = sx(s.x0); val b = math.max(sx(s.x1), a + 1)
      g.fillRect(a, plotY, b - a, plotH)
    }
    p.bands.foreach { b =>
      g.setColor(new Color(b.color.getRed, b.color.getGreen, b.color.getBlue,
        (b.alpha * 255).toInt))
      var i = 0
      while (i < b.xs.length - 1) {
        if (!b.yLo(i).isNaN && !b.yHi(i).isNaN && !b.yLo(i + 1).isNaN && !b.yHi(i + 1).isNaN) {
          val poly = new java.awt.Polygon()
          poly.addPoint(sx(b.xs(i)), sy(b.yLo(i)))
          poly.addPoint(sx(b.xs(i + 1)), sy(b.yLo(i + 1)))
          poly.addPoint(sx(b.xs(i + 1)), sy(b.yHi(i + 1)))
          poly.addPoint(sx(b.xs(i)), sy(b.yHi(i)))
          g.fillPolygon(poly)
        }
        i += 1
      }
    }
    p.bars.foreach { case (centers, heights) =>
      g.setColor(Blue)
      val bw = math.max(2, (plotW / math.max(centers.length, 1) * 0.85).toInt)
      centers.indices.foreach { i =>
        val cx = sx(centers(i)); val top = sy(heights(i)); val base = sy(0.0)
        g.fillRect(cx - bw / 2, math.min(top, base), bw, math.abs(base - top))
      }
    }
    p.series.foreach { s =>
      g.setColor(s.color)
      g.setStroke(new BasicStroke(s.lw))
      var i = 0
      while (i < s.xs.length - 1) {
        // NaN breaks the line — the reference's gap-break convention
        if (!s.ys(i).isNaN && !s.ys(i + 1).isNaN)
          g.drawLine(sx(s.xs(i)), sy(s.ys(i)), sx(s.xs(i + 1)), sy(s.ys(i + 1)))
        i += 1
      }
    }
    p.markers.foreach { m =>
      g.setColor(m.color)
      m.xs.indices.foreach { i =>
        if (!m.ys(i).isNaN)
          g.fillOval(sx(m.xs(i)) - m.size / 2, sy(m.ys(i)) - m.size / 2, m.size, m.size)
      }
    }
    drawFrame(g, p, plotX, plotY, plotW, plotH)
    drawTicks(g, p, plotX, plotY, plotW, plotH, xMin, xMax, yMin, yMax)
    drawLegend(g, p, plotX, plotY)
    p.annot.foreach { a =>
      g.setColor(Color.DARK_GRAY); g.setFont(axisFont)
      g.drawString(a, plotX + 4, plotY + plotH - 4)
    }
  }

  private def drawFrame(g: Graphics2D, p: Panel, plotX: Int, plotY: Int,
      plotW: Int, plotH: Int): Unit = {
    g.setStroke(new BasicStroke(1f))
    g.setColor(Color.BLACK)
    g.drawRect(plotX, plotY, plotW, plotH)
    g.setFont(titleFont)
    g.drawString(p.title, plotX, plotY - 8)
    g.setFont(axisFont)
    g.drawString(p.xLabel, plotX + plotW / 2 - 12, plotY + plotH + 30)
    val old = g.getTransform
    g.rotate(-math.Pi / 2, plotX - 42, plotY + plotH / 2)
    g.drawString(p.yLabel, plotX - 42, plotY + plotH / 2)
    g.setTransform(old)
  }

  private def drawTicks(g: Graphics2D, p: Panel, plotX: Int, plotY: Int,
      plotW: Int, plotH: Int, xMin: Double, xMax: Double, yMin: Double,
      yMax: Double): Unit = {
    g.setFont(axisFont)
    g.setColor(Color.BLACK)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    (0 to 4).foreach { i =>
      val fx = xMin + (xMax - xMin) * i / 4.0
      val px = plotX + plotW * i / 4
      g.drawLine(px, plotY + plotH, px, plotY + plotH + 4)
      val label =
        if (p.xIsTimeUs) fmt.format(java.time.Instant.ofEpochSecond((fx / 1e6).toLong))
        else f"$fx%.3g"
      g.drawString(label, px - 24, plotY + plotH + 16)
      val fy = yMin + (yMax - yMin) * i / 4.0
      val py = plotY + plotH - plotH * i / 4
      g.drawLine(plotX - 4, py, plotX, py)
      g.drawString(f"$fy%.3g", plotX - 50, py + 4)
    }
  }

  private def drawLegend(g: Graphics2D, p: Panel, plotX: Int, plotY: Int): Unit = {
    val entries = p.series.map(s => (s.label, s.color)) ++
      p.markers.map(m => (m.label, m.color)) ++ p.bands.map(b => (b.label, b.color))
    var x = plotX + 6
    g.setFont(axisFont)
    entries.filter(_._1.nonEmpty).foreach { case (label, c) =>
      g.setColor(c); g.fillRect(x, plotY + 5, 10, 10)
      g.setColor(Color.BLACK); g.drawString(label, x + 13, plotY + 14)
      x += 13 + 7 * label.length + 14
    }
  }

  /** Single-column season heatmap (the reference's
    * plot_heatmap_coverage): one cell per season, 0–100 colormapped.
    */
  def heatmap(values: Seq[(String, Double)], title: String,
      width: Int = 320, height: Int = 240): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(Color.WHITE); g.fillRect(0, 0, width, height)
    g.setFont(titleFont); g.setColor(Color.BLACK)
    g.drawString(title, 10, 18)
    val cellH = (height - 40) / math.max(values.size, 1)
    values.zipWithIndex.foreach { case ((season, pct), i) =>
      val t = math.max(0.0, math.min(1.0, pct / 100.0))
      // white → blue ramp
      g.setColor(new Color((255 - t * 200).toInt, (255 - t * 140).toInt, 255))
      g.fillRect(70, 28 + i * cellH, width - 130, cellH - 4)
      g.setColor(Color.BLACK)
      g.setFont(axisFont)
      g.drawString(season, 14, 28 + i * cellH + cellH / 2)
      g.drawString(f"$pct%.1f%%", width - 54, 28 + i * cellH + cellH / 2)
    }
    g.dispose()
    img
  }

  def savePng(img: BufferedImage, path: String): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    javax.imageio.ImageIO.write(img, "png", f)
  }
}
