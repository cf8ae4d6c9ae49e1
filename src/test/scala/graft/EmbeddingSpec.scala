package graft

import graft.operators.Embedding
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EmbeddingSpec extends SparkSpec {

  private def vecs(rows: Seq[Array[Float]]) = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.zipWithIndex.map { case (a, i) => Row(i.toLong, a.toSeq) }, 2),
      schema)
  }

  test("perDimensionSummary matches hand-computed moments") {
    val df = vecs(Seq(
      Array(1f, 2f, 3f), Array(3f, 4f, 5f), Array(5f, 6f, 10f)))
    val rows = Embedding.perDimensionSummary(df, "v")
      .orderBy("dim").collect()
    assert(rows.length === 3)
    val means = rows.map(_.getAs[Double]("mean"))
    assert(means sameElements Array(3.0, 4.0, 6.0))
    val mins = rows.map(_.getAs[Double]("min"))
    assert(mins sameElements Array(1.0, 2.0, 3.0))
    val maxs = rows.map(_.getAs[Double]("max"))
    assert(maxs sameElements Array(5.0, 6.0, 10.0))
    // sample std of (1,3,5) = 2
    assert(math.abs(rows(0).getAs[Double]("std") - 2.0) < 1e-9)
  }

  test("pcaProject finds the dominant direction") {
    // points on a noisy line y ~ 2x: pc1 must capture almost all variance
    val rnd = new scala.util.Random(7)
    val pts = (0 until 200).map { _ =>
      val x = rnd.nextGaussian().toFloat
      Array(x, 2 * x + 0.01f * rnd.nextGaussian().toFloat)
    }
    val projected = Embedding.pcaProject(vecs(pts), "v", k = 2)
    val stats = projected.select(
      stddev_samp(col("pc").getItem(0)).as("s1"),
      stddev_samp(col("pc").getItem(1)).as("s2")).head()
    assert(stats.getDouble(0) > 100 * stats.getDouble(1),
      "pc1 should dominate on near-collinear data")
    val ev = Embedding.pcaExplainedVariance(vecs(pts), "v", k = 2)
    assert(ev(0) > 0.99 && ev(0) >= ev(1))
  }

  test("pca component signs are canonical (largest-|loading| element positive)") {
    // On y ~ 2x data the first component is ±(1,2)/sqrt(5); the canonical
    // orientation makes the y-loading (largest |.|) positive, so pc1 must
    // covary POSITIVELY with y regardless of which sign MLlib happened to
    // return. Run on two different row layouts to catch layout-dependent
    // sign flips.
    val rnd = new scala.util.Random(11)
    val pts = (0 until 100).map { _ =>
      val x = rnd.nextGaussian().toFloat
      Array(x, 2 * x + 0.01f * rnd.nextGaussian().toFloat)
    }
    for (shuffled <- Seq(pts, pts.reverse)) {
      val c = Embedding.pcaProject(vecs(shuffled), "v", k = 2)
        .select(covar_samp(col("pc").getItem(0), col("v").getItem(1))).head().getDouble(0)
      assert(c > 0, "canonical pc1 must point along +y on y~2x data")
    }
  }

  test("pca projection preserves pairwise distances for k = dims") {
    val pts = Seq(Array(1f, 0f), Array(0f, 1f), Array(-1f, 0f))
    val out = Embedding.pcaProject(vecs(pts), "v", k = 2)
      .orderBy("id").select("pc").collect()
      .map(_.getSeq[Double](0).toArray)
    def d(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // rotation preserves distances: |p0-p2| = 2, |p0-p1| = sqrt(2)
    assert(math.abs(d(out(0), out(2)) - 2.0) < 1e-6)
    assert(math.abs(d(out(0), out(1)) - math.sqrt(2)) < 1e-6)
  }
}
