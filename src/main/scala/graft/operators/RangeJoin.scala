package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair each point row with every
  * interval row whose `[start, end]` contains it, with NO equi key.
  *
  * Spark plans a bare `p BETWEEN s AND e` join as BroadcastNestedLoopJoin
  * (or a cartesian) — O(points × intervals) compares, a scale-killer. This
  * is the standard bucketization: quantize time into `bucketWidthUs`-wide
  * buckets, explode each interval into the buckets it covers, equi-join on
  * the bucket id (ordinary shuffle-hash machinery, AQE-sized), and keep
  * the exact containment predicate as a post-filter. Each (point,
  * interval) pair meets in exactly one bucket — the point's — so no
  * dedup pass is needed.
  *
  * Cost: intervals are replicated `len/width + 1`× — pick `bucketWidthUs`
  * near the typical interval length so replication is a small constant.
  * Dense buckets (many points AND many intervals in one width) are the
  * residual skew; AQE skew-join splits them.
  */
object RangeJoin {

  /** Join `points` (timestamp `pointTs`) to `intervals` (timestamps
    * `startCol`/`endCol`, inclusive). Returns matched pairs with all
    * columns of both inputs; column names must not collide.
    */
  def bucketed(points: DataFrame, intervals: DataFrame, pointTs: String,
      startCol: String, endCol: String, bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0)
    def bucket(c: Column): Column =
      floor(unix_micros(c) / lit(bucketWidthUs)).cast("long")
    val p = points.withColumn("__b", bucket(col(pointTs)))
    val iv = intervals
      .withColumn("__b",
        explode(sequence(bucket(col(startCol)), bucket(col(endCol)))))
    p.join(iv, Seq("__b"))
      .filter(col(pointTs).between(col(startCol), col(endCol)))
      .drop("__b")
  }
}
