package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time operators over the `events` table: tumbling-window rollups,
  * semi-structured JSON extraction, and gap-based sessionization. These are
  * the batch duals of the Structured Streaming pipeline in
  * [[graft.streaming.UpsertStream]] / [[graft.streaming.EventPipeline]] —
  * the reference's write path sustains timestamped single-object updates
  * (reference `README.md:69-70`) and our 100 TB design runs the same
  * aggregations incrementally with watermarks.
  */
object EventQueries {

  val all: Seq[QueryDef] = Seq(

    // ---- tumbling event-time window (epoch-aligned hourly buckets) ----
    QueryDef(
      "q22_events_hourly",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).cast("string").as("h"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
          .orderBy(col("h"), col("event_type"))
      },
      Some("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS h, event_type,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY h, event_type ORDER BY h, event_type""")),

    // ---- JSON attribute extraction from the props column ----
    QueryDef(
      "q23_events_json",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
            max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
        min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- gap-based sessionization (30-min inactivity closes a session) ----
    QueryDef(
      "q24_events_sessions",
      (s, d) => {
        val ev = Tables.events(s, d)
        val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("us", unix_micros(col("ts")))
          .withColumn("brk",
            when(col("us") - lag(col("us"), 1).over(order) > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("sess", sum(col("brk")).over(run))
          .groupBy(col("user_id"), col("sess"))
          .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_event"))
          .orderBy(col("user_id"), col("sess"))
      },
      Some("""WITH g AS (
          SELECT user_id, ts, event_id,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS brk
          FROM events),
        se AS (
          SELECT user_id, event_id,
            CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
          FROM g)
        SELECT user_id, sess, count(*) AS n, min(event_id) AS first_event
        FROM se GROUP BY user_id, sess ORDER BY user_id, sess""")),

    // ---- sliding event-time window (2 h windows, 1 h slide): each event
    //      lands in two windows; oracle = union of the two shifted
    //      hour-truncations ----
    QueryDef(
      "q50_events_sliding",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").cast("string").as("w"),
            col("event_type"), col("n"))
          .orderBy(col("w"), col("event_type"))
      },
      Some("""SELECT CAST(w AS VARCHAR) AS w, event_type, count(*) AS n FROM (
          SELECT date_trunc('hour', ts) AS w, event_type FROM events
          UNION ALL
          SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS w, event_type
          FROM events) t
        GROUP BY w, event_type ORDER BY w, event_type""")),

    // ---- native session_window (gap 30 min), cross-checked against the
    //      lag-based formulation (break when diff >= gap: Spark sessions
    //      are half-open [start, last + gap)) ----
    QueryDef(
      "q51_session_window",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_event"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("session_start_us"),
            col("n"), col("first_event"))
          .orderBy(col("user_id"), col("session_start_us"))
      },
      Some("""WITH g AS (
          SELECT user_id, ts, event_id,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
              THEN 1 ELSE 0 END AS brk
          FROM events),
        se AS (
          SELECT user_id, ts, event_id,
            CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
          FROM g)
        SELECT user_id, min(epoch_us(ts)) AS session_start_us,
          count(*) AS n, min(event_id) AS first_event
        FROM se GROUP BY user_id, sess
        ORDER BY user_id, session_start_us"""))
  )
}
