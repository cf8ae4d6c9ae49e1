package graft

import graft.functions.VectorMoments
import org.apache.spark.sql.functions._

class VectorMomentsSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator computes per-dim mean and sample std in one pass") {
    val df = Seq(
      Seq(1f, 2f, 3f), Seq(3f, 4f, 5f), Seq(5f, 6f, 10f)
    ).toDF("v")
    val out = df.agg(udaf(VectorMoments.aggregator).apply(col("v")).as("m"))
      .select(explode(col("m")).as("z"))
      .select(col("z.dim"), col("z.mean"), col("z.std"))
      .orderBy(col("dim")).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(out.map(_.getDouble(1)).toSeq == Seq(3.0, 4.0, 6.0))
    assert(math.abs(out(0).getDouble(2) - 2.0) < 1e-9)
    // dim 2: values 3,5,10 → mean 6, sample var = (9+1+16)/2 = 13
    assert(math.abs(out(2).getDouble(2) - math.sqrt(13.0)) < 1e-9)
  }

  test("aggregator matches Summarizer path on larger input") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 500).map(_ => Seq.fill(8)(rnd.nextFloat()))
    val df = rows.toDF("v").repartition(4)
    val viaAgg = df.agg(udaf(VectorMoments.aggregator).apply(col("v")).as("m"))
      .select(explode(col("m")).as("z"))
      .select(col("z.dim"), col("z.mean"), col("z.std"))
      .orderBy(col("dim")).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val viaSummarizer = graft.operators.Embedding.perDimensionSummary(df, "v")
      .orderBy(col("dim")).collect()
      .map(r => (r.getInt(0), r.getAs[Double]("mean"), r.getAs[Double]("std")))
    viaAgg.zip(viaSummarizer).foreach { case ((d1, m1, s1), (d2, m2, s2)) =>
      assert(d1 == d2)
      assert(math.abs(m1 - m2) < 1e-9, s"mean dim $d1")
      assert(math.abs(s1 - s2) < 1e-6, s"std dim $d1")
    }
  }
}
