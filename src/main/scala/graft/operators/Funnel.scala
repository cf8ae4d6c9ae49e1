package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many users performed stage 1, then stage 2
  * strictly AFTER their first qualifying stage-1 event, then stage 3 after
  * that, … — the classic conversion-funnel primitive (strict-order
  * semantics: each stage's clock starts at the user's first qualifying
  * event of the previous stage, so out-of-order events don't count).
  *
  * Shape at scale: one filtered aggregation per stage over (user, min ts),
  * then an equi-join per stage on the shrinking frontier — every step is
  * hash-partitioned on the user id; nothing is windowed, nothing is
  * per-user serialized. The frontier only shrinks, and AQE broadcasts it
  * once it is small. Result is one row per stage (counted eagerly — the
  * output is `stages.length` rows by construction).
  */
object Funnel {

  /** Returns (`stage_idx`, `stage`, `users`): users reaching each stage
    * under strict-order semantics.
    */
  def stages(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stageSeq: Seq[String]): DataFrame = {
    require(stageSeq.nonEmpty)
    val spark = events.sparkSession
    // each frontier is persisted while the next stage builds on it —
    // otherwise stage N's count + stage N+1's join would both re-execute
    // the whole chain of previous filters/joins from the raw events
    // (O(S²) scans for S stages); a frontier is one (user, ts) row per
    // surviving user, so the cache is small and shrinks per stage
    var frontier = events.filter(col(typeCol) === stageSeq.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = scala.collection.mutable.ListBuffer(
      (0, stageSeq.head, frontier.count()))
    stageSeq.tail.zipWithIndex.foreach { case (st, i) =>
      val prev = frontier
      frontier = events.filter(col(typeCol) === st)
        .join(prev.withColumnRenamed("__t", "__prev"), userCol)
        .filter(col(tsCol) > col("__prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      counts += ((i + 1, st, frontier.count()))
      prev.unpersist(blocking = false)
    }
    frontier.unpersist(blocking = false)
    import spark.implicits._
    counts.toSeq.toDF("stage_idx", "stage", "users")
  }
}
