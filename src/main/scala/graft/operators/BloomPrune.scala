package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-pruned semi join: build a Bloom filter over the small
  * side's keys, push it as a scan-level predicate on the large side, then
  * run the exact semi join on the survivors. The result is EXACTLY the
  * plain semi join (the Bloom pass only admits false positives, which the
  * exact join then removes) — the filter's job is to keep non-matching
  * large-side rows out of the shuffle.
  *
  * This is the hand-rolled version of Spark's runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which only triggers
  * under specific shuffle-join shapes): it uses the engine's own native
  * `BloomFilterAggregate` (distributed, mergeable partials) and
  * `BloomFilterMightContain` (codegen'd) Catalyst expressions via
  * [[Bridge]] — no Scala UDF in the hot path. The serialized filter rides
  * into the plan as a binary literal, so the `might_contain` predicate
  * sits directly above the scan, BEFORE the exchange.
  *
  * Sizing: `fpp` trades filter bits for shuffle rows; n·ln(1/fpp)/ln²2
  * bits ≈ 1.2 MB at 1M keys / 1% — broadcast-cheap. Build cost is one
  * pass over the small side (driver holds one filter, not the key set).
  */
object BloomPrune {

  /** Exact `left_semi` join of `large` on `small`, Bloom-pruned before the
    * shuffle. Keys are hashed to 64-bit via `xxhash64` on both sides (the
    * probe must hash exactly like the build).
    */
  def semiJoin(large: DataFrame, small: DataFrame, largeKey: String,
      smallKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    // xxhash64 hashes the same value differently under different input
    // types (INT 4 vs BIGINT 42 hash differently) — a type mismatch would
    // produce FALSE NEGATIVES, which Bloom semantics forbid
    require(large.schema(largeKey).dataType == small.schema(smallKey).dataType,
      s"key types must match: $largeKey is ${large.schema(largeKey).dataType}, " +
        s"$smallKey is ${small.schema(smallKey).dataType}")
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bloomAgg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col(smallKey))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bytes = small.select(Bridge.column(bloomAgg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      Bridge.expression(xxhash64(col(largeKey)))))
    large.filter(mightContain)
      .join(small.select(col(smallKey).as(largeKey)), Seq(largeKey), "left_semi")
  }
}
