package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: u at even, v at odd positions") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("u", "v")
    val got = df.select(Layout.zValue(col("u"), col("v"), 8)).as[Long].collect()
    // z(3,5): u=011 → bits 0,2; v=101 → bits 1,5 ⇒ 1+2+4+32 = 39
    assert(got.toSeq == Seq(0L, 1L, 2L, 39L, 65535L))
  }

  test("bucketId clamps edges and is monotone") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 105.0).toDF("x")
    val got = df.select(Layout.bucketId(col("x"), 0.0, 100.0, 4)).as[Long].collect()
    assert(got.head == 0L && got.last == 15L)
    assert(got.toSeq == got.toSeq.sorted)
  }

  test("z-ordered partitions bound the spread of BOTH dimensions") {
    // uniform 64×64 grid; a sort by x alone puts every y value in every
    // partition (full y-spread); the Morton sort must keep both spreads
    // well under the full range in every partition
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toDouble, y.toDouble)).toDF("x", "y")
    val z = Layout.zOrdered(grid, "x", "y", bits = 6, numPartitions = 16)
    val spreads = z.groupBy(spark_partition_id().as("p"))
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .collect()
    assert(spreads.length == 16)
    spreads.foreach { r =>
      assert(r.getDouble(1) <= 32.0, s"x-spread too wide: $r")
      assert(r.getDouble(2) <= 32.0, s"y-spread too wide: $r")
    }
    // zval column present and within the 2*bits budget
    val maxZ = z.agg(max(col("zval"))).head().getLong(0)
    assert(maxZ <= (1L << 12) - 1)
  }

  test("zOrdered plans exactly one shuffle (the range exchange)") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toDouble, y.toDouble)).toDF("x", "y")
    val z = Layout.zOrdered(grid, "x", "y", bits = 5, numPartitions = 8)
    val a = graft.plans.PlanAudit.audit(z)
    assert(a.shuffles == 1, s"expected 1 shuffle, plan had ${a.shuffles}")
  }

  test("zOrdered with one all-null column degrades to single-column clustering") {
    val pts = (0 until 1024)
      .map(i => (Option.empty[java.lang.Double], i.toDouble)).toDF("x", "y")
    val z = Layout.zOrdered(pts, "x", "y", bits = 5, numPartitions = 8)
    // the populated column still clusters: each partition holds a narrow
    // y-range instead of the full spread a zval=0 no-op would give
    val spreads = z.groupBy(spark_partition_id().as("p"))
      .agg((max(col("y")) - min(col("y"))).as("sy")).collect()
    assert(spreads.nonEmpty)
    spreads.foreach(r => assert(r.getDouble(1) <= 512.0, s"y-spread too wide: $r"))
    // both all-null: zval constant 0, no crash
    val nulls = (0 until 8).map(_ =>
      (Option.empty[java.lang.Double], Option.empty[java.lang.Double]))
      .toDF("x", "y")
    val z0 = Layout.zOrdered(nulls, "x", "y")
    assert(z0.select("zval").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
  }
}
