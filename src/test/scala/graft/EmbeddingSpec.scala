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

  test("parseEmbeddings recovers stringified vectors bit-exactly, tags the rest") {
    import spark.implicits._
    val arr = Seq(
      (1L, Array(0.125f, -0.5f, 0.1f)),
      (2L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "emb")
    // string round trip: cast to string, parse back, values identical
    val roundTrip = Embedding.parseEmbeddings(
      arr.select(col("id"), col("emb").cast("string").as("emb")), "emb", 3)
    assert(roundTrip.select("emb_src").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("string"))
    val back = roundTrip.orderBy("id").select("emb_parsed").collect()
      .map(_.getSeq[Float](0).toSeq).toSeq
    assert(back == Seq(Seq(0.125f, -0.5f, 0.1f), Seq(1.0f, 2.0f, 3.0f)))
    // garbage, wrong-dim, and null-element strings are invalid with a
    // null vector (null elements would feed silent zeros into the kernels)
    val nullElem = Seq((1L, "[0.1, null, 0.2]")).toDF("id", "emb")
    assert(Embedding.parseEmbeddings(nullElem, "emb", 3)
      .head().getAs[String]("emb_src") == "invalid")
    val bad = Seq((1L, "not json"), (2L, "[0.1, 0.2]"), (3L, null))
      .toDF("id", "emb")
    val tagged = Embedding.parseEmbeddings(bad, "emb", 3)
      .orderBy("id").select("emb_src", "emb_parsed").collect()
      .map(r => (r.getString(0), r.isNullAt(1)))
    assert(tagged.toSeq == Seq(("invalid", true), ("invalid", true),
      ("invalid", true)))
    // well-typed array column: tagged array, wrong size invalid
    val mixed = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(1f, 2f)))
      .toDF("id", "emb")
    val t2 = Embedding.parseEmbeddings(mixed, "emb", 3).orderBy("id")
      .select("emb_src").collect().map(_.getString(0))
    assert(t2.toSeq == Seq("array", "invalid"))
  }
}
