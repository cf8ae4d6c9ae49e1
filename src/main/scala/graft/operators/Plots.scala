package graft.operators

import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.nio.file.{Files, Paths}

/** PNG chart sink — the reference's matplotlib/seaborn report figures
  * (reference `generate_benchmark_reports.py:312-550`: histograms, bar
  * charts, projection scatters, correlation heatmaps, per-dimension line
  * plots) re-expressed as a dependency-free `java.awt` renderer.
  *
  * Engine boundary: every chart draws a SMALL, ALREADY-AGGREGATED result —
  * histogram bins, top-k category counts, a 3×3 correlation matrix, a
  * bounded projection sample — so rendering is driver-side by construction,
  * exactly like the reference (pandas aggregates, matplotlib draws). The
  * distributed work happens upstream in [[Profile]] / [[Embedding]]; no
  * plot function ever receives a DataFrame.
  *
  * Rendering is deterministic for fixed inputs (fixed palette, no RNG), so
  * specs can assert structural pixels (bar fill at a computed coordinate)
  * rather than golden files, which would be brittle across JVM font
  * rasterizers.
  */
object Plots {

  /** Categorical palette for scatter classes (matplotlib tab10-like). */
  private val palette: IndexedSeq[Color] = IndexedSeq(
    new Color(0x1f, 0x77, 0xb4), new Color(0xff, 0x7f, 0x0e),
    new Color(0x2c, 0xa0, 0x2c), new Color(0xd6, 0x27, 0x28),
    new Color(0x94, 0x67, 0xbd), new Color(0x8c, 0x56, 0x4b),
    new Color(0xe3, 0x77, 0xc2), new Color(0x7f, 0x7f, 0x7f),
    new Color(0xbc, 0xbd, 0x22), new Color(0x17, 0xbe, 0xcf))

  val defaultBarColor = new Color(0x63, 0x8c, 0xcc)

  private val bg = Color.WHITE
  private val axisColor = new Color(60, 60, 60)
  private val gridColor = new Color(225, 225, 225)

  // margins: left room for y tick labels, bottom for x labels + title strip
  private case class Frame(img: BufferedImage, g: Graphics2D,
      x0: Int, y0: Int, x1: Int, y1: Int) {
    def plotW: Int = x1 - x0
    def plotH: Int = y1 - y0
  }

  private def newFrame(w: Int, h: Int, title: String): Frame = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_ON)
    g.setColor(bg)
    g.fillRect(0, 0, w, h)
    g.setColor(axisColor)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 14))
    val fm = g.getFontMetrics
    g.drawString(title, math.max(8, (w - fm.stringWidth(title)) / 2), 22)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
    Frame(img, g, x0 = 70, y0 = 36, x1 = w - 20, y1 = h - 58)
  }

  /** ~`n` round tick values covering [lo, hi] (1/2/5 × 10^k steps). */
  private[graft] def niceTicks(lo: Double, hi: Double,
      n: Int = 5): Seq[Double] = {
    if (!(hi > lo)) return Seq(lo)
    val raw = (hi - lo) / n
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val step = (raw / mag) match {
      case r if r <= 1.0 => mag
      case r if r <= 2.0 => 2 * mag
      case r if r <= 5.0 => 5 * mag
      case _             => 10 * mag
    }
    val first = math.ceil(lo / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ <= hi + step * 1e-9).toSeq
  }

  private def fmtTick(v: Double): String =
    if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else if (math.abs(v) >= 1000 || (math.abs(v) < 0.01 && v != 0)) f"$v%.2e"
    else f"$v%.2f"

  private def drawAxes(f: Frame, xLo: Double, xHi: Double, yLo: Double,
      yHi: Double, xLabel: String, yLabel: String): Unit = {
    val g = f.g
    val fm = g.getFontMetrics
    // horizontal grid + y ticks
    niceTicks(yLo, yHi).foreach { t =>
      val y = f.y1 - ((t - yLo) / (yHi - yLo) * f.plotH).toInt
      g.setColor(gridColor); g.drawLine(f.x0, y, f.x1, y)
      g.setColor(axisColor)
      val s = fmtTick(t)
      g.drawString(s, f.x0 - fm.stringWidth(s) - 6, y + 4)
    }
    // x ticks
    niceTicks(xLo, xHi).foreach { t =>
      val x = f.x0 + ((t - xLo) / (xHi - xLo) * f.plotW).toInt
      g.setColor(gridColor); g.drawLine(x, f.y0, x, f.y1)
      g.setColor(axisColor)
      val s = fmtTick(t)
      g.drawString(s, x - fm.stringWidth(s) / 2, f.y1 + 16)
    }
    g.setColor(axisColor)
    g.setStroke(new BasicStroke(1.2f))
    g.drawLine(f.x0, f.y0, f.x0, f.y1)
    g.drawLine(f.x0, f.y1, f.x1, f.y1)
    g.drawString(xLabel,
      f.x0 + (f.plotW - fm.stringWidth(xLabel)) / 2, f.y1 + 34)
    // y label, rotated
    val g2 = g.create().asInstanceOf[Graphics2D]
    g2.rotate(-math.Pi / 2)
    g2.drawString(yLabel, -(f.y0 + (f.plotH + fm.stringWidth(yLabel)) / 2), 16)
    g2.dispose()
  }

  /** Widest prefix of `label` (plus ellipsis) that fits in `maxW` pixels.
    * Measured by PREFIX LENGTH, not by character identity — an
    * indexOf-based scan would measure the wrong prefix for any label with
    * repeated characters (i.e. most real category names).
    */
  private[graft] def truncateLabel(fm: java.awt.FontMetrics, label: String,
      maxW: Int): String =
    if (fm.stringWidth(label) <= maxW) label
    else {
      val keepLen = (1 to label.length)
        .takeWhile(i => fm.stringWidth(label.take(i) + "…") <= maxW)
        .lastOption.getOrElse(1)
      label.take(keepLen) + "…"
    }

  private def write(f: Frame, path: String): Unit = {
    f.g.dispose()
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    javax.imageio.ImageIO.write(f.img, "png", p.toFile)
  }

  /** Vertical bar chart with per-bar category labels (the reference's
    * top-15-categories / null-counts-by-column figures).
    */
  def barChart(labels: Seq[String], values: Seq[Double], title: String,
      path: String, yLabel: String = "count",
      color: Color = defaultBarColor): Unit = {
    require(labels.length == values.length, "labels/values length mismatch")
    val f = newFrame(900, 600, title)
    val yHi = math.max(values.foldLeft(0.0)(math.max) * 1.05, 1e-9)
    drawAxes(f, 0, labels.length, 0, yHi, "", yLabel)
    val n = math.max(labels.length, 1)
    val slot = f.plotW.toDouble / n
    val barW = math.max(1, (slot * 0.8).toInt)
    val fm = f.g.getFontMetrics
    labels.indices.foreach { i =>
      val x = f.x0 + (i * slot + slot * 0.1).toInt
      val h = (values(i) / yHi * f.plotH).toInt
      f.g.setColor(color)
      f.g.fillRect(x, f.y1 - h, barW, h)
      // per-bar label, clipped to the slot, angled style simplified to
      // truncation (fonts vary across JVMs; geometry must not)
      f.g.setColor(axisColor)
      val lbl0 = labels(i)
      val maxW = math.max(slot.toInt - 2, 8)
      val lbl = truncateLabel(fm, lbl0, maxW)
      f.g.drawString(lbl, x + math.max(0, (barW - fm.stringWidth(lbl)) / 2),
        f.y1 + 30)
    }
    write(f, path)
  }

  /** Histogram from pre-computed equal-width bin counts over [lo, hi)
    * (the shape [[Profile.histogram]] returns — the reference's
    * rating/price/length histograms).
    */
  def histogram(lo: Double, hi: Double, counts: Seq[Long], title: String,
      xLabel: String, path: String,
      color: Color = defaultBarColor): Unit = {
    val f = newFrame(900, 600, title)
    val yHi = math.max(counts.foldLeft(0L)(math.max).toDouble * 1.05, 1e-9)
    drawAxes(f, lo, hi, 0, yHi, xLabel, "frequency")
    val n = math.max(counts.length, 1)
    val binW = f.plotW.toDouble / n
    counts.indices.foreach { i =>
      val x = f.x0 + (i * binW).toInt
      val h = (counts(i) / yHi * f.plotH).toInt
      f.g.setColor(color)
      f.g.fillRect(x, f.y1 - h, math.max(1, binW.toInt - 1), h)
    }
    write(f, path)
  }

  /** Line plot over an index axis (the reference's mean/std-by-dimension
    * figures).
    */
  def linePlot(values: Seq[Double], title: String, xLabel: String,
      yLabel: String, path: String,
      color: Color = new Color(0x1f, 0x77, 0xb4)): Unit = {
    val f = newFrame(900, 600, title)
    val (yLo0, yHi0) = (values.min, values.max)
    val pad = math.max((yHi0 - yLo0) * 0.05, 1e-9)
    val (yLo, yHi) = (yLo0 - pad, yHi0 + pad)
    drawAxes(f, 0, math.max(values.length - 1, 1), yLo, yHi, xLabel, yLabel)
    f.g.setColor(color)
    f.g.setStroke(new BasicStroke(1.5f))
    values.indices.dropRight(1).foreach { i =>
      def px(j: Int) = f.x0 + (j.toDouble / math.max(values.length - 1, 1) *
        f.plotW).toInt
      def py(j: Int) = f.y1 - ((values(j) - yLo) / (yHi - yLo) * f.plotH).toInt
      f.g.drawLine(px(i), py(i), px(i + 1), py(i + 1))
    }
    write(f, path)
  }

  /** Class-colored 2-D scatter with a legend (the reference's PCA / t-SNE /
    * UMAP projection figures). Coloring is capped at the `maxClasses` most
    * frequent classes — everything else is drawn as a neutral gray "Other"
    * — matching the reference's top-10-categories behavior, so the palette
    * never recycles (distinct classes never share a color) and the legend
    * row count is bounded. Ties and colors break by first-appearance
    * order — deterministic for a deterministically-ordered sample.
    */
  def scatter(points: Seq[(Double, Double)], classes: Seq[String],
      title: String, xLabel: String, yLabel: String, path: String,
      maxClasses: Int = 9): Unit = {
    require(points.length == classes.length, "points/classes length mismatch")
    require(maxClasses >= 1 && maxClasses < palette.size,
      s"maxClasses must be in [1, ${palette.size - 1}]")
    val f = newFrame(900, 600, title)
    val xs = points.map(_._1); val ys = points.map(_._2)
    def padded(lo: Double, hi: Double): (Double, Double) = {
      val pad = math.max((hi - lo) * 0.05, 1e-9); (lo - pad, hi + pad)
    }
    val (xLo, xHi) = padded(xs.min, xs.max)
    val (yLo, yHi) = padded(ys.min, ys.max)
    drawAxes(f, xLo, xHi, yLo, yHi, xLabel, yLabel)
    val firstSeen = scala.collection.mutable.LinkedHashMap[String, Int]()
    classes.foreach(c => firstSeen.getOrElseUpdate(c, firstSeen.size))
    val counts = classes.groupBy(identity).view.mapValues(_.length).toMap
    val top = firstSeen.keys.toSeq
      .sortBy(c => (-counts(c), firstSeen(c)))
      .take(maxClasses)
    val otherColor = new Color(0xbb, 0xbb, 0xbb)
    val classColor = top.sortBy(firstSeen).zipWithIndex // stable palette order
      .map { case (c, i) => c -> palette(i) }.toMap
    def colorOf(c: String): Color = classColor.getOrElse(c, otherColor)
    // draw "Other" first so top classes stay visible on top of the gray
    val order = points.indices.sortBy(i => classColor.contains(classes(i)))
    order.foreach { i =>
      val x = f.x0 + ((points(i)._1 - xLo) / (xHi - xLo) * f.plotW).toInt
      val y = f.y1 - ((points(i)._2 - yLo) / (yHi - yLo) * f.plotH).toInt
      f.g.setColor(colorOf(classes(i)))
      f.g.fillOval(x - 3, y - 3, 6, 6)
    }
    // legend, top-right inside the plot: top classes + a bounded overflow
    // row. The overflow label carries the hidden-class count — which also
    // keeps it distinct from any REAL class named "Other", whose palette
    // color would otherwise be reused for the gray overflow points and
    // leave them without a correctly-colored legend entry.
    val fm = f.g.getFontMetrics
    val overflow = firstSeen.size - top.length
    val legendRows = top.sortBy(firstSeen).map(c => c -> colorOf(c)) ++
      (if (overflow > 0) Seq(s"Other ($overflow more)" -> otherColor) else Nil)
    legendRows.zipWithIndex.foreach { case ((name, c), i) =>
      val y = f.y0 + 14 + i * 16
      val x = f.x1 - 150
      f.g.setColor(c)
      f.g.fillOval(x, y - 8, 8, 8)
      f.g.setColor(axisColor); f.g.drawString(name, x + 12, y)
    }
    write(f, path)
  }

  /** Annotated matrix heatmap on a blue–white–red diverging scale centered
    * at 0 (the reference's seaborn `coolwarm` correlation figure).
    */
  def heatmap(m: Seq[Seq[Double]], labels: Seq[String], title: String,
      path: String, annot: Boolean = true): Unit = {
    require(m.nonEmpty && m.forall(_.length == m.length),
      "heatmap needs a square matrix")
    require(labels.length == m.length, "labels/matrix size mismatch")
    val f = newFrame(760, 700, title)
    val n = m.length
    val absMax = math.max(m.flatten.map(math.abs).max, 1e-9)
    val cell = math.min(f.plotW, f.plotH) / n
    val fm = f.g.getFontMetrics
    for (i <- 0 until n; j <- 0 until n) {
      val v = m(i)(j)
      val t = (v / absMax).max(-1).min(1)
      // diverging: negative → blue, positive → red, 0 → white
      val c =
        if (t >= 0) new Color(255, (255 * (1 - t)).toInt, (255 * (1 - t)).toInt)
        else new Color((255 * (1 + t)).toInt, (255 * (1 + t)).toInt, 255)
      val x = f.x0 + j * cell
      val y = f.y0 + i * cell
      f.g.setColor(c)
      f.g.fillRect(x, y, cell - 1, cell - 1)
      if (annot) {
        f.g.setColor(if (math.abs(t) > 0.6) Color.WHITE else axisColor)
        val s = f"$v%.3f"
        f.g.drawString(s, x + (cell - fm.stringWidth(s)) / 2, y + cell / 2 + 4)
      }
    }
    f.g.setColor(axisColor)
    labels.zipWithIndex.foreach { case (l, i) =>
      f.g.drawString(l, f.x0 + i * cell + 4, f.y0 + n * cell + 14) // cols
      f.g.drawString(l, math.max(4, f.x0 - fm.stringWidth(l) - 6),
        f.y0 + i * cell + cell / 2 + 4) // rows
    }
    write(f, path)
  }
}
