package graft

import java.nio.file.{Files, Paths}

import graft.operators.Plots
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** The PNG report sink (reference `gbr.py:312-550`). Assertions are
  * structural — decoded dimensions, background vs mark pixels at computed
  * coordinates — never golden files, which would couple the spec to the
  * JVM's font rasterizer.
  */
class PlotsSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    Files.createTempDirectory("plots").resolve(name).toString

  private def png(path: String) = {
    val img = ImageIO.read(Paths.get(path).toFile)
    assert(img != null, s"$path did not decode as an image")
    img
  }

  test("nice ticks are round numbers covering the range") {
    val t = Plots.niceTicks(0.0, 100.0)
    assert(t.head >= 0.0 && t.last <= 100.0 + 1e-9)
    assert(t.length >= 3 && t.length <= 12)
    // 1/2/5 steps only
    val step = t(1) - t(0)
    val mant = step / math.pow(10, math.floor(math.log10(step)))
    assert(Seq(1.0, 2.0, 5.0, 10.0).exists(m => math.abs(mant - m) < 1e-9))
  }

  test("bar chart renders bars proportional to values") {
    val p = tmp("bars.png")
    Plots.barChart(Seq("a", "b", "c"), Seq(10.0, 40.0, 20.0), "Bars", p)
    val img = png(p)
    assert(img.getWidth == 900 && img.getHeight == 600)
    // the tall middle bar's fill should be present well above the short
    // first bar's top: sample a pixel in bar-b territory at a height only
    // bar b reaches. Plot rect x:[70, 880], y:[36, 542]; slot = 270.
    val barColor = Plots.defaultBarColor.getRGB
    val xB = 70 + 270 + 135 // middle of slot b
    val plotH = 542 - 36
    val yTall = 542 - (30.0 / 42.0 * plotH).toInt // ~30/42 up: only b (40/42)
    assert(img.getRGB(xB, yTall) == barColor, "tall bar not filled")
    val xA = 70 + 135
    assert(img.getRGB(xA, yTall) != barColor, "short bar should not reach here")
  }

  test("histogram renders and respects empty bins") {
    val p = tmp("hist.png")
    Plots.histogram(0.0, 10.0, Seq(5L, 0L, 9L, 2L), "Hist", "x", p)
    val img = png(p)
    assert(img.getWidth == 900)
    // empty bin area stays background white just above the x-axis
    val binW = (880 - 70) / 4
    val xEmpty = 70 + binW + binW / 2
    assert(new java.awt.Color(img.getRGB(xEmpty, 535)) == java.awt.Color.WHITE)
  }

  test("scatter colors classes differently and draws a legend") {
    val p = tmp("scatter.png")
    val pts = Seq((0.0, 0.0), (1.0, 1.0), (0.1, 0.1), (0.9, 0.95))
    Plots.scatter(pts, Seq("x", "y", "x", "y"), "S", "a", "b", p)
    val img = png(p)
    // collect distinct non-background, non-grid colors: at least 2 classes
    val colors = (for (x <- 0 until img.getWidth by 2;
                       y <- 36 until 542 by 2) yield img.getRGB(x, y)).toSet
    val marks = colors.filter { c0 =>
      val c = new java.awt.Color(c0)
      // saturated, non-gray marks only
      val mx = math.max(c.getRed, math.max(c.getGreen, c.getBlue))
      val mn = math.min(c.getRed, math.min(c.getGreen, c.getBlue))
      mx - mn > 60
    }
    assert(marks.size >= 2, s"expected >= 2 class colors, got $marks")
  }

  test("label truncation fits the budget even with repeated characters") {
    val img = new java.awt.image.BufferedImage(10, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setFont(new java.awt.Font(java.awt.Font.SANS_SERIF,
      java.awt.Font.PLAIN, 11))
    val fm = g.getFontMetrics
    // repeated characters — the indexOf-based prefix scan measured "m…"
    // for every position and never truncated
    val repeated = "m" * 60
    val t = Plots.truncateLabel(fm, repeated, 80)
    assert(t.endsWith("…") && fm.stringWidth(t) <= 80,
      s"'$t' is ${fm.stringWidth(t)}px wide")
    assert(t.length > 2, "should keep more than one char at 80px")
    // short labels pass through untouched; impossible budgets keep 1 char
    assert(Plots.truncateLabel(fm, "ok", 80) == "ok")
    assert(Plots.truncateLabel(fm, repeated, 1) == "m…")
    g.dispose()
  }

  test("scatter caps classes at top-N, colors the rest gray Other") {
    val p = tmp("scatter_cap.png")
    // 3 dominant classes (20 points each) + 12 singleton classes: with the
    // cap, the singletons all render as one gray and the legend is bounded
    val pts = (0 until 72).map(i => (i % 12 / 12.0, i / 72.0))
    val classes = (0 until 60).map(i => s"big${i % 3}") ++
      (0 until 12).map(i => s"rare$i")
    Plots.scatter(pts, classes, "S", "a", "b", p, maxClasses = 3)
    val img = png(p)
    val grayRgb = new java.awt.Color(0xbb, 0xbb, 0xbb).getRGB
    val all = (for (x <- 0 until img.getWidth; y <- 36 until 542)
      yield img.getRGB(x, y)).toSet
    assert(all.contains(grayRgb), "no gray Other marks rendered")
    // saturated mark colors are bounded by the cap (3 classes), so the
    // palette never recycles across the 12 rare classes
    val saturated = all.filter { c0 =>
      val c = new java.awt.Color(c0)
      val mx = math.max(c.getRed, math.max(c.getGreen, c.getBlue))
      val mn = math.min(c.getRed, math.min(c.getGreen, c.getBlue))
      mx - mn > 100 && mx > 120
    }
    // antialiasing multiplies shades; require at least the 3 class colors
    // and that the exact palette colors beyond index 2 are absent
    val palette = Seq(0x1f77b4, 0xff7f0e, 0x2ca02c, 0xd62728, 0x9467bd)
      .map(v => new java.awt.Color(v).getRGB)
    assert(palette.take(3).forall(all.contains),
      "top-3 class colors missing")
    assert(palette.drop(3).forall(c => !all.contains(c)),
      "palette recycled beyond the cap")
    assert(saturated.nonEmpty)
  }

  test("heatmap centers the diverging scale at zero") {
    val p = tmp("heat.png")
    Plots.heatmap(
      Seq(Seq(1.0, -1.0), Seq(-1.0, 1.0)), Seq("u", "v"), "H", p,
      annot = false)
    val img = png(p)
    // diag cell (0,0) strongly red, off-diag (0,1) strongly blue
    val cell = math.min(760 - 70 - 20, 700 - 36 - 58) / 2
    val c00 = new java.awt.Color(img.getRGB(70 + cell / 2, 36 + cell / 2))
    val c01 = new java.awt.Color(img.getRGB(70 + cell + cell / 2, 36 + cell / 2))
    assert(c00.getRed > 200 && c00.getBlue < 80, s"diag not red: $c00")
    assert(c01.getBlue > 200 && c01.getRed < 80, s"off-diag not blue: $c01")
  }

  test("line plot renders within padded bounds") {
    val p = tmp("line.png")
    Plots.linePlot((0 until 100).map(i => math.sin(i / 10.0)), "L", "i", "v", p)
    assert(png(p).getHeight == 600)
  }
}
