package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton-curve) clustering for multi-dimensional data layout.
  *
  * A table sorted by ONE column gives parquet row-group min/max stats that
  * prune scans on that column only; a 2-D predicate (the reference's
  * `average_rating <= x AND rating_number > y` selectivity filters,
  * reference `README.md:80-82`) still reads every file. Interleaving the
  * bits of both columns' rank-buckets into one Morton key and range-sorting
  * by it bounds EACH dimension's spread within every file, so row-group
  * stats prune on either column — the standard lakehouse Z-ORDER lever,
  * built here from stock Spark pieces: one min/max pass, a narrow integer
  * projection, `repartitionByRange` + `sortWithinPartitions` (one shuffle,
  * the same cost as any global sort).
  *
  * Bucketing is uniform-width over the observed [min, max]; rank-equalized
  * buckets (via [[graft.operators.Percentiles]] boundaries) would tighten
  * skew further but uniform keeps the key a pure scan-side expression,
  * reproducible by any engine reading the table.
  */
object Layout {

  /** Uniform bucket id in [0, 2^bits) over [lo, hi]; clamped at the edges. */
  def bucketId(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1 << bits
    val width = hi - lo
    if (width <= 0) lit(0L)
    else least(greatest(floor((c.cast("double") - lit(lo)) / lit(width) * lit(n)),
      lit(0)), lit(n - 1)).cast("long")
  }

  /** Morton interleave of two bucket ids: bit b of `u` lands at position 2b,
    * bit b of `v` at 2b+1. Bit positions are disjoint so plain addition
    * assembles the key — the whole expression stays integer arithmetic
    * inside whole-stage codegen.
    */
  def zValue(u: Column, v: Column, bits: Int): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(u, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(v, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** Adds the Morton key as `zval` (one min/max pass over the two columns,
    * then a narrow projection) and returns the frame clustered by it —
    * range-partitioned and sorted within partitions, ready for a
    * stats-tight parquet write. No partitionBy explosion, exactly one
    * shuffle.
    */
  def zOrdered(df: DataFrame, colA: String, colB: String,
      bits: Int = 8, numPartitions: Int = 0): DataFrame = {
    val r = df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val aNull = r.isNullAt(0)
    val bNull = r.isNullAt(2)
    // empty input or both columns all-null: nothing to cluster on
    if (aNull && bNull) return df.withColumn("zval", lit(0L))
    // exactly one all-null column degrades to SINGLE-column clustering on
    // the populated one (its bucket id as zval) instead of silently
    // disabling layout for both — the still-populated column keeps its
    // row-group pruning
    val zcol =
      if (aNull) bucketId(col(colB), r.getDouble(2), r.getDouble(3), bits)
      else if (bNull) bucketId(col(colA), r.getDouble(0), r.getDouble(1), bits)
      else zValue(bucketId(col(colA), r.getDouble(0), r.getDouble(1), bits),
        bucketId(col(colB), r.getDouble(2), r.getDouble(3), bits), bits)
    val withZ = df.withColumn("zval", zcol)
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("zval"))
      else withZ.repartitionByRange(col("zval"))
    parted.sortWithinPartitions(col("zval"))
  }
}
