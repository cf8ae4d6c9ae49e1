package graft

import org.apache.spark.sql.functions._

/** The approximate/sketch scale path (SURVEY §2.4: at 100 TB prefer HLL++ /
  * approx quantiles over exact distinct/sort aggregates). Not oracle-checked
  * (estimates differ by engine); these specs pin accuracy contracts against
  * the exact answers instead.
  */
class ApproxSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.lineitem(spark, dir)
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey")).as("approx")).head()
    val exact = r.getLong(0).toDouble
    assert(math.abs(r.getLong(1) - exact) / exact < 0.05)
  }

  test("HLL sketches merge across groups to the union estimate") {
    val li = Tables.lineitem(spark, dir)
    // per-group sketches (what each executor/partition would persist) ...
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
    // ... union-merged equals a sketch over the whole column
    val merged = perGroup.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).head().getLong(0)
    val whole = li.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("est"))
      .head().getLong(0)
    val exact = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
    assert(math.abs(whole - exact).toDouble / exact < 0.05)
  }

  test("approx_percentile within 1% of the exact sort-based answer") {
    val li = Tables.lineitem(spark, dir)
    val approx = li.agg(
      approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    val exact = graft.operators.Percentiles.grouped(
        li.withColumn("g", lit(1)), "g", "l_extendedprice", Seq(0.5), Seq("m"))
      .head().getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.01, s"approx=$approx exact=$exact")
  }
}
