package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's write path (reference `README.md:69-70`): sustained
  * single-object upserts — replace-by-key including a re-computed embedding —
  * concurrent with reads.
  *
  * Plain parquet has no transactions, so concurrency comes from
  * **snapshot-swap commits** (SURVEY §7.4.7): each commit writes a complete
  * new version directory and atomically flips a `_CURRENT` pointer file.
  * Readers resolve the pointer once per query and only ever see a fully
  * committed version; the upsert stream is the single writer.
  *
  * At scale the same pattern holds with two refinements (documented, not
  * needed at test sizes): partition the base table by a bucket of the key so
  * a micro-batch rewrites only touched buckets, and compact pointers with a
  * manifest of per-bucket versions — i.e. the copy-on-write half of a table
  * format, which is exactly what upsert-on-parquet becomes at 100 TB.
  */
final class SnapshotStore(val root: String) {

  private val pointer = Paths.get(root, "_CURRENT")
  Files.createDirectories(Paths.get(root))

  def currentVersion: Option[Int] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim.toInt) else None

  def currentPath: Option[String] = currentVersion.map(v => s"$root/v$v")

  /** Read the latest committed snapshot. */
  def read(spark: SparkSession): DataFrame =
    spark.read.parquet(currentPath.getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root")))

  /** Write `df` as the next version and atomically flip the pointer. */
  def commit(df: DataFrame): Int = {
    val next = currentVersion.getOrElse(-1) + 1
    df.write.mode("overwrite").parquet(s"$root/v$next")
    val tmp = Paths.get(root, s"_CURRENT.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }
}

object UpsertStream {

  /** Merge semantics: rows of `updates` replace rows of `base` with the same
    * `key`; new keys append. (`base LEFT ANTI updates` ∪ `updates`.)
    */
  def applyUpserts(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val deduped = updates
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(key)).orderBy(monotonically_increasing_id().desc)))
      .filter(col("__rn") === 1).drop("__rn")
    base.join(broadcast(deduped.select(key)), Seq(key), "left_anti")
      .unionByName(deduped)
  }

  /** Run a streaming upsert: each micro-batch merges into the store and
    * commits a new snapshot. `updates` is any streaming DataFrame with the
    * base schema (e.g. rate/kafka source mapped through the embedder).
    */
  def run(updates: DataFrame, store: SnapshotStore, key: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val merged = store.currentPath match {
            case Some(_) => applyUpserts(store.read(spark), batch, key)
            case None => batch
          }
          store.commit(merged)
          ()
        }
      }
      .start()
  }
}

/** Streaming duals of the batch event queries: watermarked windowed
  * aggregation (free from Structured Streaming once the batch plan is
  * declarative).
  */
object EventPipeline {

  /** Hourly tumbling-window counts+sums per event type with a watermark for
    * late data — the streaming form of q22_events_hourly.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("h"), col("event_type"), col("n"),
        col("sum_value"))
  }
}
