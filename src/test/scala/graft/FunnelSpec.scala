package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("strict-order funnel only counts stages in sequence") {
    val events = Seq(
      // u1 completes the whole funnel in order
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // u2 clicked BEFORE signing up → click must not count
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "signup", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 11:00:00")),
      // u3 purchase between signup and click → purchase must not count
      (3L, "signup", ts("2024-01-01 10:00:00")),
      (3L, "purchase", ts("2024-01-01 10:30:00")),
      (3L, "click", ts("2024-01-01 11:00:00")),
      // u4 never signed up
      (4L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.stages(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .orderBy("stage_idx")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("signup", 3L), ("click", 2L), ("purchase", 1L)))
  }

  test("stage clock restarts at the first qualifying previous-stage event") {
    // u1: signup at 10, clicks at 09 (ignored) and 12; purchase at 11 —
    // the purchase precedes the qualifying click, so it must not count
    val events = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 09:00:00")),
      (1L, "click", ts("2024-01-01 12:00:00")),
      (1L, "purchase", ts("2024-01-01 11:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.stages(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .orderBy("stage_idx").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 1L, 0L))
  }
}
