package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped percentiles via distributed sort + rank interpolation —
  * the scale path for exact quantiles.
  *
  * Spark's built-in `percentile`/`median` aggregate buffers every (value →
  * count) per group in an in-memory map inside ObjectHashAggregate: memory
  * ∝ distinct values per group, no whole-stage codegen, and a near-unique
  * column at 100 TB OOMs the reducers. This formulation instead:
  *
  *   1. one shuffle: sort values within each group (window
  *      `row_number`/`count` share a single partitioning);
  *   2. each row decides locally whether it is one of the ≤ 2 support
  *      points of each requested percentile and contributes its
  *      interpolated share;
  *   3. an ordinary partial+final hash aggregation sums the contributions.
  *
  * Memory per task is O(1), everything stays in codegen, and the sort is
  * Spark's spillable external sort. Semantics match `percentile(v, p)`
  * exactly: linear interpolation at rank position (n−1)·p.
  */
object Percentiles {

  /** One output row per group: the requested percentiles of `valueCol` as
    * columns named per `names` (defaults p0, p1, …).
    */
  def grouped(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], names: Seq[String] = Seq.empty): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val outNames =
      if (names.nonEmpty) { require(names.length == ps.length); names }
      else ps.indices.map(i => s"p$i")
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(byGroup.orderBy(col("__v"))).cast("double") - 1)
      .withColumn("__n", count(lit(1)).over(byGroup))
    val aggs = ps.zip(outNames).map { case (p, name) =>
      val pos = (col("__n") - 1) * lit(p)
      val lo = floor(pos)
      val hi = ceil(pos)
      val frac = pos - lo
      sum(
        when(lo === hi && col("__rn") === lo, col("__v"))
          .when(col("__rn") === lo, col("__v") * (lit(1.0) - frac))
          .when(col("__rn") === hi, col("__v") * frac)
          .otherwise(lit(0.0))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
