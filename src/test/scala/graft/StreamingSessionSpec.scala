package graft

import graft.streaming.{EventPipeline, StatefulSessions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("session_window rollup groups by gap and finalizes after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
    val q = EventPipeline.sessionRollup(events, gap = "30 minutes").writeStream
      .outputMode("append").format("memory").queryName("sessions").start()
    // user 1: two events 10 min apart (one session), then one 2h later
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),
      (1L, ts("2024-01-01 12:30:00"), 4.0))
    q.processAllAvailable()
    // advance the watermark far enough to close everything
    mem.addData((9L, ts("2024-01-02 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions")
      .filter(col("user_id") === 1L)
      .select(col("session_start").cast("string"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      ("2024-01-01 10:00:00", 2L, 3.0),
      ("2024-01-01 12:30:00", 1L, 4.0)))
  }

  test("stream-stream interval join pairs events within the window per key") {
    implicit val sqlCtx = spark.sqlContext
    val errs = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = EventPipeline.intervalJoin(
      errs.toDF().toDF("user_id", "ts", "id"),
      clicks.toDF().toDF("user_id", "ts", "id"),
      "user_id", "10 minutes")
    val q = joined.select(col("l_id"), col("r_id")).writeStream
      .outputMode("append").format("memory").queryName("ivjoin").start()
    errs.addData(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (2L, ts("2024-01-01 10:00:00"), "e2"))
    clicks.addData(
      (1L, ts("2024-01-01 10:05:00"), "c1"), // within window, same key
      (1L, ts("2024-01-01 10:20:00"), "c2"), // outside window
      (1L, ts("2024-01-01 09:59:00"), "c3"), // before the error
      (2L, ts("2024-01-01 10:10:00"), "c4")) // boundary: exactly +10 min
    q.processAllAvailable()
    // advance both watermarks so results finalize
    errs.addData((8L, ts("2024-01-02 00:00:00"), "ew"))
    clicks.addData((9L, ts("2024-01-02 00:00:01"), "cw"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ivjoin").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("e1", "c1"), ("e2", "c4")))
  }

  test("stateful sessionizer closes sessions via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StatefulSessions.Ev]
    val sessions = StatefulSessions.sessionize(
      mem.toDS(), gapMicros = 30L * 60 * 1000000)
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("stateful").start()
    mem.addData(
      StatefulSessions.Ev(1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
      StatefulSessions.Ev(1L, ts("2024-01-01 10:20:00"), 101L, 2.0),
      StatefulSessions.Ev(2L, ts("2024-01-01 10:00:00"), 200L, 5.0))
    q.processAllAvailable()
    // nothing closed yet: watermark has not passed end + gap
    assert(spark.table("stateful").count() == 0)
    // push the watermark forward; both sessions time out and emit
    mem.addData(StatefulSessions.Ev(9L, ts("2024-01-01 14:00:00"), 900L, 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stateful")
      .filter(col("user_id").isin(1L, 2L))
      .select(col("user_id"), col("n_events"), col("sum_value"),
        col("first_event"), col("last_event"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set((1L, 2L, 3.0, 100L, 101L), (2L, 1L, 5.0, 200L, 200L)))
  }

  test("file-source streaming: parquet directory drives the hourly rollup") {
    val dir = java.nio.file.Files.createTempDirectory("fstream").toString
    val batch = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "view", 3.0)
    ).toDF("ts", "event_type", "value")
    batch.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    assert(stream.isStreaming)
    val q = EventPipeline.hourlyRollup(stream).writeStream
      .outputMode("complete").format("memory").queryName("filerollup")
      .option("checkpointLocation", s"$dir/ck").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("filerollup")
      .select(col("h").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01 10:00:00", "click", 2L),
      ("2024-01-01 11:00:00", "view", 1L)))
  }

  test("streaming dedup: watermarked dropDuplicates suppresses repeats") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val deduped = mem.toDF().toDF("k", "ts", "v")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("k", "ts")
    val q = deduped.writeStream
      .outputMode("append").format("memory").queryName("sdedup").start()
    // same (k, ts) arriving in the same and in later batches: emitted once
    mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 10:01:00"), 2.0))
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0)) // cross-batch repeat
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 10:30:00"), 9.0)) // same key, new ts
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdedup")
      .select(col("k"), col("ts").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.length == 3, s"expected 3 unique rows, got $got")
    assert(got.toSet == Set(
      (1L, "2024-01-01 10:00:00"),
      (2L, "2024-01-01 10:01:00"),
      (1L, "2024-01-01 10:30:00")))
  }

  test("drift monitor: per-batch PSI spikes when the stream distribution shifts") {
    implicit val sqlCtx = spark.sqlContext
    val reference = (0 until 1000).map(i => (i % 100).toDouble).toDF("value")
    val mem = MemoryStream[Double]
    val results = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    val q = graft.streaming.EventPipeline.driftMonitor(
        mem.toDF().toDF("value"), reference, "value",
        bins = 10, lo = 0, hi = 100,
        (id, psi, _, nb) => results.synchronized { results += ((id, psi)) })
      .start()
    // batch 0: same distribution as the reference → psi near 0
    mem.addData((0 until 500).map(i => (i % 100).toDouble): _*)
    q.processAllAvailable()
    // batch 1: mass concentrated in the top decile → psi large
    mem.addData((0 until 500).map(i => 95.0 + (i % 5)): _*)
    q.processAllAvailable()
    q.stop()
    val byBatch = results.sortBy(_._1).map(_._2)
    assert(byBatch.length == 2, results.toString)
    assert(byBatch(0) < 0.05, s"in-distribution batch drifted: $byBatch")
    assert(byBatch(1) > 0.25, s"shifted batch not flagged: $byBatch")
  }

  test("late events beyond the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
    // tight 10-minute watermark so lateness is easy to trigger
    val q = EventPipeline.sessionRollup(events, gap = "5 minutes",
      watermark = "10 minutes").writeStream
      .outputMode("append").format("memory").queryName("late").start()
    mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0))
    q.processAllAvailable()
    // advance watermark to 11:50
    mem.addData((2L, ts("2024-01-01 12:00:00"), 1.0))
    q.processAllAvailable()
    // this event is hours behind the watermark: must be dropped, i.e. the
    // already-finalized 10:00 session is not re-opened or duplicated
    mem.addData((1L, ts("2024-01-01 10:01:00"), 99.0))
    q.processAllAvailable()
    mem.addData((9L, ts("2024-01-02 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val user1 = spark.table("late").filter(col("user_id") === 1L)
      .select(col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(user1.toSeq == Seq((1L, 1.0)), s"late event leaked: ${user1.toSeq}")
  }

  test("dedupStream drops exact re-arrivals within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventPipeline.dedupStream(docs, "text", "ts", watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("sdedup")
      .start()
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), "the quick brown fox"),
      (2L, ts("2024-01-01 10:00:01"), "The  quick  BROWN fox"), // same fp
      (3L, ts("2024-01-01 10:00:02"), "something else entirely"))
    q.processAllAvailable()
    // later batch, still within the horizon: re-arrival must be dropped
    mem.addData((4L, ts("2024-01-01 10:30:00"), "the quick brown fox"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sdedup").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L), s"got $kept")
  }
}
