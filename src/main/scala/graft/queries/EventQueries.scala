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
        ORDER BY user_id, session_start_us""")),

    // ---- as-of join: latest click at-or-before each purchase, per user
    //      (union+window formulation, operators.AsOfJoin; oracle is
    //      DuckDB's native ASOF LEFT JOIN) ----
    QueryDef(
      "q58_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"),
            col("event_id").as("click_id"))
        graft.operators.AsOfJoin.backward(purchases, clicks,
            Seq("user_id"), "ts", "ts", Seq("value"), "click_id")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("matched_ts")).as("click_ts_us"),
            col("value").as("click_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
          epoch_us(c.ts) AS click_ts_us, c.value AS click_value
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id""")),

    // ---- range (interval-containment) join with no equi key: clicks
    //      within 10 minutes after each error (bucketized equi-join,
    //      operators.RangeJoin — NOT a nested-loop theta join) ----
    QueryDef(
      "q59_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 10 MINUTES")).as("end_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("ts").as("cts"), col("value"))
        graft.operators.RangeJoin.bucketed(clicks, errors,
            "cts", "start_ts", "end_ts", 600000000L)
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_clicks"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double")
              .as("sum_click_value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id, count(*) AS n_clicks,
          CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_click_value
        FROM events e JOIN events c
          ON c.ts BETWEEN e.ts AND e.ts + INTERVAL 10 MINUTE
        WHERE e.event_type = 'error' AND c.event_type = 'click'
        GROUP BY e.event_id ORDER BY e.event_id""")),

    // ---- strict-order conversion funnel (operators.Funnel): each stage's
    //      clock starts at the user's first qualifying event of the
    //      previous stage ----
    QueryDef(
      "q64_funnel",
      (s, d) => {
        graft.operators.Funnel.stages(Tables.events(s, d),
            "user_id", "ts", "event_type", Seq("signup", "click", "purchase"))
          .orderBy(col("stage_idx"))
      },
      Some("""WITH su AS (SELECT user_id, min(ts) AS s_ts FROM events
          WHERE event_type = 'signup' GROUP BY user_id),
        cl AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
          JOIN su USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > su.s_ts GROUP BY e.user_id),
        pu AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
          JOIN cl USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > cl.c_ts GROUP BY e.user_id)
        SELECT * FROM (VALUES
          (0, 'signup', (SELECT count(*) FROM su)),
          (1, 'click', (SELECT count(*) FROM cl)),
          (2, 'purchase', (SELECT count(*) FROM pu)))
          AS t(stage_idx, stage, users)
        ORDER BY stage_idx""")),

    // ---- weekly cohort retention: users grouped by first-seen week,
    //      distinct activity counted per week offset ----
    QueryDef(
      "q65_cohort_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
        val first = ev.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).as("cohort"))
        ev.join(first, "user_id")
          .select(col("user_id"), col("cohort"),
            (datediff(date_trunc("week", col("ts")).cast("date"),
              col("cohort").cast("date")) / 7).cast("long").as("week_offset"))
          .distinct()
          .groupBy(col("cohort").cast("date").cast("string").as("cohort"),
            col("week_offset"))
          .agg(count(lit(1)).as("users"))
          .orderBy(col("cohort"), col("week_offset"))
      },
      Some("""WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
          FROM events GROUP BY user_id),
        act AS (SELECT DISTINCT e.user_id, f.cohort,
          datediff('day', CAST(f.cohort AS DATE),
            CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS week_offset
          FROM events e JOIN f USING (user_id))
        SELECT CAST(cohort AS VARCHAR) AS cohort, week_offset,
          count(*) AS users
        FROM act GROUP BY cohort, week_offset ORDER BY cohort, week_offset""")),

    // ---- time-to-conversion quantiles: minutes from first signup to the
    //      first click after it, exact percentiles over the user
    //      population via the range-partitioned Percentiles operator ----
    QueryDef(
      "q68_conversion_latency",
      (s, d) => {
        val ev = Tables.events(s, d)
        val su = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
        val cl = ev.filter(col("event_type") === "click")
          .join(su, "user_id")
          .filter(col("ts") > col("s_ts"))
          .groupBy(col("user_id"), col("s_ts")).agg(min(col("ts")).as("c_ts"))
        val lat = cl.select(lit("all").as("g"),
          ((unix_micros(col("c_ts")) - unix_micros(col("s_ts"))) / 60000000.0)
            .as("mins"))
        graft.operators.Percentiles
          .grouped(lat, "g", "mins", Seq(0.25, 0.5, 0.75),
            Seq("p25_r", "p50_r", "p75_r"))
          .select(round(col("p25_r"), 4).as("p25_mins"),
            round(col("p50_r"), 4).as("p50_mins"),
            round(col("p75_r"), 4).as("p75_mins"))
      },
      Some("""WITH su AS (SELECT user_id, min(ts) AS s_ts FROM events
          WHERE event_type = 'signup' GROUP BY user_id),
        cl AS (SELECT e.user_id, su.s_ts, min(e.ts) AS c_ts FROM events e
          JOIN su USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > su.s_ts
          GROUP BY e.user_id, su.s_ts),
        lat AS (SELECT (epoch_us(c_ts) - epoch_us(s_ts)) / 60000000.0 AS mins
          FROM cl)
        SELECT round(quantile_cont(mins, 0.25), 4) AS p25_mins,
          round(quantile_cont(mins, 0.5), 4) AS p50_mins,
          round(quantile_cont(mins, 0.75), 4) AS p75_mins
        FROM lat HAVING count(*) > 0""")),

    // ---- per-type z-score anomaly detection: the monitoring query a
    //      pipeline runs over its own event stream. Mean/σ from exact
    //      decimal sums (order-independent, cross-engine identical); the
    //      per-row z is then pure IEEE arithmetic. One agg + one broadcast
    //      join back — two scans, no window, no shuffle of the fact rows ----
    QueryDef(
      "q85_event_anomalies",
      (s, d) => {
        val ev = Tables.events(s, d)
        val vDec = col("value").cast(DecimalType(18, 2))
        val stats = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("__n"), sum(vDec).as("__s"),
            sum(vDec * vDec).as("__s2"))
          .select(col("event_type"),
            (col("__s").cast("double") / col("__n")).as("__m"),
            sqrt(greatest(col("__s2").cast("double") / col("__n") -
              (col("__s").cast("double") / col("__n")) *
                (col("__s").cast("double") / col("__n")), lit(0.0))).as("__sd"))
          .filter(col("__sd") > 0)
        ev.join(broadcast(stats), "event_type")
          .select(col("event_id"), col("event_type"),
            (round((col("value") - col("__m")) / col("__sd"), 6) + 0.0).as("z"))
          .orderBy(desc("z"), col("event_id"))
          .limit(20)
      },
      Some(raw"""WITH st AS (SELECT event_type, count(*) AS n,
          sum(CAST(value AS DECIMAL(18,2))) AS s,
          sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS s2
          FROM events GROUP BY event_type),
        sd AS (SELECT event_type, CAST(s AS DOUBLE) / n AS m,
          sqrt(greatest(CAST(s2 AS DOUBLE) / n -
            (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0)) AS sd
          FROM st)
        SELECT e.event_id, e.event_type,
          round((e.value - sd.m) / sd.sd, 6) + 0 AS z
        FROM events e JOIN sd USING (event_type)
        WHERE sd.sd > 0
        ORDER BY z DESC, e.event_id LIMIT 20""")),

    // ---- PSI drift monitor (operators.Profile.psi): population stability
    //      of `value` between the click and purchase segments, 20 bins over
    //      [0, 500], Laplace-smoothed ----
    QueryDef(
      "q98_value_drift",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.operators.Profile.psi(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "value", bins = 20, lo = 0.0, hi = 500.0)
      },
      Some(raw"""WITH ha AS (SELECT CAST(least(greatest(
            floor((value - 0.0) / 500.0 * 20), 0), 19) AS BIGINT) AS bin,
          count(*) AS na
          FROM events WHERE event_type = 'click' AND value IS NOT NULL
          GROUP BY bin),
        hb AS (SELECT CAST(least(greatest(
            floor((value - 0.0) / 500.0 * 20), 0), 19) AS BIGINT) AS bin,
          count(*) AS nb
          FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
          GROUP BY bin),
        bins AS (SELECT unnest(generate_series(0, 19)) AS bin),
        j AS (SELECT coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
          FROM bins LEFT JOIN ha USING (bin) LEFT JOIN hb USING (bin)),
        t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM j),
        p AS (SELECT ta, tb, (na + 0.5) / (ta + 10.0) AS pa,
          (nb + 0.5) / (tb + 10.0) AS pb FROM j, t)
        SELECT round(sum((pa - pb) * ln(pa / pb)), 6) + 0 AS psi,
          CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b
        FROM p GROUP BY ta, tb"""))
  )
}
