package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (temporal nearest-predecessor join): for each left row,
  * attach the single right row with the greatest `rightTs ≤ leftTs` within
  * the same key — the "what was the latest reading when this happened"
  * primitive (reference workload: timestamped single-object updates,
  * `README.md:69-70`, read back at query time).
  *
  * Spark has no ASOF JOIN operator; the naive formulations are a non-equi
  * theta join (BroadcastNestedLoop — O(n·m) per key) or a per-left-row
  * scalar subquery. This is instead the scale-safe UNION formulation, all
  * shuffle-hash machinery:
  *
  *   1. union the two sides, right rows carrying their payload as one
  *      non-null struct, left rows carrying null;
  *   2. one window per key ordered by (ts, side, seq):
  *      `last(payload, ignoreNulls)` over unbounded-preceding..current
  *      propagates the latest right payload forward onto every left row —
  *      right rows sort BEFORE left rows at equal ts, giving at-or-before
  *      semantics;
  *   3. keep left rows; optionally null the match beyond `toleranceUs`.
  *
  * One shuffle of (left ∪ right), parallelism = key cardinality (high for
  * id-like keys; for few-key skew range-chunk the window like
  * [[Percentiles]]). Ties inside one side at equal (key, ts) are broken by
  * `seqCol` — with distinct timestamps per key (asserted on the test data)
  * results are engine-independent.
  */
object AsOfJoin {

  /** Backward as-of join. `payload` columns are taken from `right` and
    * appended to every `left` row (null where no predecessor exists or the
    * predecessor is older than `toleranceUs` microseconds). `leftTs` /
    * `rightTs` must be TimestampType; `seqCol` is a right-side unique
    * column used only as a deterministic tiebreak.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      seqCol: String, toleranceUs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty && payload.nonEmpty)
    val payStruct = struct(
      (col(rightTs).as("__rts") +: payload.map(col)).toIndexedSeq: _*)
    // __seq keeps its native type (any orderable column works as the
    // right-side tiebreak); left rows carry null — their relative order is
    // irrelevant since last() assigns every left row at equal (key, ts,
    // side) the same propagated payload
    val seqType = right.schema(seqCol).dataType
    val r = right.select(
      keys.map(col) ++ Seq(unix_micros(col(rightTs)).as("__us"),
        lit(0).as("__side"), col(seqCol).as("__seq"),
        payStruct.as("__pay")): _*)
    val l = left.select(
      (keys.map(col) ++ Seq(unix_micros(col(leftTs)).as("__us"),
        lit(1).as("__side"), lit(null).cast(seqType).as("__seq"),
        lit(null).cast(r.schema("__pay").dataType).as("__pay")) ++
        left.columns.filterNot(keys.contains).map(c => col(c).as(s"__l_$c"))
        ).toIndexedSeq: _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__us"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l, allowMissingColumns = true)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = toleranceUs match {
      case Some(tol) => matched.withColumn("__m",
        when(col("__us") - unix_micros(col("__m.__rts")) <= tol, col("__m")))
      case None => matched
    }
    val leftCols = left.columns.toIndexedSeq.map { c =>
      if (keys.contains(c)) col(c) else col(s"__l_$c").as(c)
    }
    val matchCols = col("__m.__rts").as("matched_ts") +:
      payload.map(p => col(s"__m.$p").as(p))
    inTol.select(leftCols ++ matchCols: _*)
  }
}
