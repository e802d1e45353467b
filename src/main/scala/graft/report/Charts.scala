package graft.report

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.geom.AffineTransform
import java.awt.image.BufferedImage
import java.nio.file.{Files, Path}
import javax.imageio.ImageIO

/** K5 — PNG chart rendering for the stage-[4] report artifacts
  * (/root/reference/src/generar_reporte.py:71-92): a horizontal bar chart
  * of requests_total per endpoint and a vertical bar chart of
  * p90_elapsed_ms per endpoint, saved as the same two files the reference
  * emits (`requests_por_endpoint.png`, `p90_por_endpoint.png`).
  *
  * Pure-JDK renderer (java.awt + ImageIO — this container has no plotting
  * library, and the engine must stay dependency-free): same geometry as
  * the reference's matplotlib defaults — 6.4x4.8 in at dpi 150 = 960x720,
  * category bars 0.8 of the slot, value axis from 0 with 1/2/5-decade
  * ticks. Rendering is driver-side over the already-collected <=#endpoints
  * rows, so nothing here touches the distributed plan. Output bytes are
  * deterministic for a given input (fixed raster, no timestamps).
  */
object Charts {

  private val BarBlue = new Color(0x1f, 0x77, 0xb4) // matplotlib C0
  private val W = 960
  private val H = 720

  /** matplotlib-style "nice" tick step: smallest 1/2/5 decade multiple
    * giving <= maxTicks intervals over [0, vmax]. */
  private[graft] def tickStep(vmax: Double, maxTicks: Int = 6): Double = {
    require(maxTicks >= 1)
    val target = math.max(vmax, Double.MinPositiveValue) / maxTicks
    val mag = math.pow(10, math.floor(math.log10(target)))
    Seq(1, 2, 5, 10).map(_ * mag).find(_ >= target).get
  }

  private def ticksTo(vmax: Double): Seq[Double] = {
    val step = tickStep(vmax)
    (0 to (vmax / step).toInt).map(_ * step)
  }

  private def fmtTick(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString else f"$v%.1f"

  private def newCanvas(): (BufferedImage, Graphics2D) = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
    g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING, RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, W, H)
    g.setStroke(new BasicStroke(1f))
    (img, g)
  }

  private val tickFont = new Font(Font.SANS_SERIF, Font.PLAIN, 15)
  private val labelFont = new Font(Font.SANS_SERIF, Font.PLAIN, 17)
  private val titleFont = new Font(Font.SANS_SERIF, Font.BOLD, 19)

  private def drawFrame(g: Graphics2D, x0: Int, y0: Int, x1: Int, y1: Int): Unit = {
    g.setColor(Color.BLACK)
    g.drawRect(x0, y0, x1 - x0, y1 - y0)
  }

  private def centerString(g: Graphics2D, s: String, cx: Int, baselineY: Int): Unit = {
    val w = g.getFontMetrics.stringWidth(s)
    g.drawString(s, cx - w / 2, baselineY)
  }

  /** Horizontal bar chart (plt.barh + invert_yaxis: first category at the
    * TOP): requests_total per endpoint_base. */
  def plotRequests(categories: Seq[String], values: Seq[Long], out: Path): Unit = {
    require(categories.length == values.length, "categories/values length mismatch")
    val (img, g) = newCanvas()
    try {
      val (px0, px1, py0, py1) = (170, W - 30, 60, H - 80)
      val vmax = math.max(values.foldLeft(0L)(math.max).toDouble, 1.0)
      val ticks = ticksTo(vmax)
      val axMax = math.max(vmax, ticks.last) * 1.05
      def sx(v: Double): Int = px0 + ((px1 - px0) * v / axMax).toInt

      g.setColor(Color.BLACK)
      g.setFont(titleFont)
      centerString(g,"Requests total por endpoint", (px0 + px1) / 2, 38)
      g.setFont(labelFont)
      centerString(g, "requests_total", (px0 + px1) / 2, H - 25)
      // rotated y-axis label
      val old = g.getTransform
      g.rotate(-math.Pi / 2, 28, (py0 + py1) / 2.0)
      centerString(g, "endpoint_base", 28, (py0 + py1) / 2 + 6)
      g.setTransform(old)

      g.setFont(tickFont)
      ticks.foreach { t =>
        val x = sx(t)
        g.setColor(Color.BLACK)
        g.drawLine(x, py1, x, py1 + 5)
        centerString(g, fmtTick(t), x, py1 + 22)
      }

      val n = categories.length
      val slot = (py1 - py0).toDouble / math.max(n, 1)
      val barH = math.max(1, (slot * 0.8).toInt)
      for (i <- 0 until n) { // i=0 at the top (inverted axis, like the ref)
        val yc = py0 + (slot * i + slot / 2).toInt
        g.setColor(BarBlue)
        g.fillRect(px0 + 1, yc - barH / 2, math.max(sx(values(i).toDouble) - px0 - 1, 0), barH)
        g.setColor(Color.BLACK)
        val lab = categories(i)
        g.drawString(lab, px0 - 8 - g.getFontMetrics.stringWidth(lab), yc + 5)
      }
      drawFrame(g, px0, py0, px1, py1)
    } finally g.dispose()
    writePng(img, out)
  }

  /** Vertical bar chart (plt.bar, xticks rotated 30deg right-anchored):
    * p90_elapsed_ms per endpoint_base. */
  def plotP90(categories: Seq[String], values: Seq[Double], out: Path): Unit = {
    require(categories.length == values.length, "categories/values length mismatch")
    val (img, g) = newCanvas()
    try {
      val (px0, px1, py0, py1) = (90, W - 30, 60, H - 130)
      val vmax = math.max(values.foldLeft(0.0)(math.max), 1.0)
      val ticks = ticksTo(vmax)
      val axMax = math.max(vmax, ticks.last) * 1.05
      def sy(v: Double): Int = py1 - ((py1 - py0) * v / axMax).toInt

      g.setColor(Color.BLACK)
      g.setFont(titleFont)
      centerString(g,"p90_elapsed_ms por endpoint", (px0 + px1) / 2, 38)
      g.setFont(labelFont)
      centerString(g, "endpoint_base", (px0 + px1) / 2, H - 20)
      val old = g.getTransform
      g.rotate(-math.Pi / 2, 28, (py0 + py1) / 2.0)
      centerString(g, "p90_elapsed_ms", 28, (py0 + py1) / 2 + 6)
      g.setTransform(old)

      g.setFont(tickFont)
      ticks.foreach { t =>
        val y = sy(t)
        g.setColor(Color.BLACK)
        g.drawLine(px0 - 5, y, px0, y)
        val s = fmtTick(t)
        g.drawString(s, px0 - 10 - g.getFontMetrics.stringWidth(s), y + 5)
      }

      val n = categories.length
      val slot = (px1 - px0).toDouble / math.max(n, 1)
      val barW = math.max(1, (slot * 0.8).toInt)
      for (i <- 0 until n) {
        val xc = px0 + (slot * i + slot / 2).toInt
        g.setColor(BarBlue)
        g.fillRect(xc - barW / 2, sy(values(i)), barW, py1 - sy(values(i)))
        // 30deg-rotated, right-anchored tick label (ha="right")
        g.setColor(Color.BLACK)
        val lab = categories(i)
        val t = new AffineTransform()
        t.translate(xc.toDouble, (py1 + 16).toDouble)
        t.rotate(-math.Pi / 6)
        val oldT = g.getTransform
        g.transform(t)
        g.drawString(lab, -g.getFontMetrics.stringWidth(lab), 0)
        g.setTransform(oldT)
      }
      drawFrame(g, px0, py0, px1, py1)
    } finally g.dispose()
    writePng(img, out)
  }

  private def writePng(img: BufferedImage, out: Path): Unit = {
    if (out.getParent != null) Files.createDirectories(out.getParent)
    val ok = ImageIO.write(img, "png", out.toFile)
    require(ok, s"no PNG writer available for $out")
  }
}
