package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations at cluster scale.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
  * [[graft.GraftSession]] defaults) handles most skew at runtime; explicit
  * salting remains the tool when one side has a few pathological hot keys
  * AND the other side is small enough to replicate — e.g. joining 100 TB of
  * events against a dimension where 1% of keys carry 50% of rows.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, salts); the small side is replicated `salts` times; the join key
    * becomes (key, salt), spreading each hot key over `salts` reducers.
    *
    * Correctness: every left row pairs with exactly one replica of each
    * matching right row (the one sharing its salt), so multiplicities are
    * preserved — for inner and left joins. Right/full outer joins are
    * rejected: an unmatched right row survives once per salt replica,
    * yielding `salts` duplicates. Cost: right side is shuffled `salts`
    * times — use only when right is small relative to the skew being spread.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val jt = joinType.toLowerCase.replace("_", "").replace("outer", "")
    require(Set("inner", "left", "leftsemi", "leftanti", "semi", "anti").contains(jt),
      s"saltedJoin supports inner/left join types only (got '$joinType'): " +
        "replicated right rows would duplicate unmatched right output")
    val withSalt = skewed.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    withSalt.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation with an explicit salt for the
    * rare case where even map-side combine leaves one reducer hot (e.g.
    * count-distinct-ish payloads per hot key). Phase 1 aggregates on
    * (key, salt); phase 2 merges the `salts` partials per key.
    *
    * `partial` must be decomposable (sum/count/min/max-like); the caller
    * supplies both phases explicitly to keep semantics visible.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int)(
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame)(
      merge: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn("__salt", (rand(42) * salts).cast("int"))
    val p = partial(salted.groupBy(col(key), col("__salt")))
    merge(p.groupBy(col(key)))
  }

  /** Top-n most frequent values of `key` with their share of total rows —
    * the diagnostic you run before deciding to salt.
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / lit(total.toDouble))
      .orderBy(desc("n"))
      .limit(topN)
  }
}
