package graft

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, "k1", ts("2024-01-01 10:00:00"), 100.0),
    (2L, "k1", ts("2024-01-01 10:05:00"), 101.0),
    (3L, "k1", ts("2024-01-01 10:20:00"), 102.0),
    (4L, "k2", ts("2024-01-01 10:02:00"), 200.0))
    .toDF("qid", "k", "qts", "px")

  private lazy val trades = Seq(
    ("t1", "k1", ts("2024-01-01 10:04:59")), // after quote 1, before 2
    ("t2", "k1", ts("2024-01-01 10:05:00")), // exactly at quote 2 → at-or-before picks it
    ("t3", "k1", ts("2024-01-01 09:59:00")), // before any quote → null
    ("t4", "k2", ts("2024-01-01 11:00:00")), // k2's only quote, 58 min earlier
    ("t5", "k3", ts("2024-01-01 10:00:00"))) // key with no quotes → null
    .toDF("tid", "k", "tts")

  test("backward picks the latest at-or-before match per key") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tts", "qts",
        Seq("px"), "qid")
      .select("tid", "px").collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map("t1" -> Some(100.0), "t2" -> Some(101.0),
      "t3" -> None, "t4" -> Some(200.0), "t5" -> None))
  }

  test("tolerance nulls out matches older than the bound") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tts", "qts",
        Seq("px"), "qid", toleranceUs = Some(10L * 60 * 1000000))
      .select("tid", "px").collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("t1").contains(100.0))
    assert(out("t4").isEmpty, "58-minute-old quote must fall outside 10 min")
  }

  test("left columns and match timestamp survive intact") {
    val row = AsOfJoin.backward(trades, quotes, Seq("k"), "tts", "qts",
        Seq("px"), "qid")
      .filter(col("tid") === "t2").head()
    assert(row.getAs[java.sql.Timestamp]("tts") == ts("2024-01-01 10:05:00"))
    assert(row.getAs[java.sql.Timestamp]("matched_ts") == ts("2024-01-01 10:05:00"))
  }

  test("string seq columns work as tiebreaks (no silent null cast)") {
    // two quotes at the same (key, ts): the larger string seq must win
    val tied = Seq(
      ("qa", "k1", ts("2024-01-01 10:00:00"), 1.0),
      ("qb", "k1", ts("2024-01-01 10:00:00"), 2.0))
      .toDF("qid", "k", "qts", "px")
    val t = Seq(("t1", "k1", ts("2024-01-01 11:00:00"))).toDF("tid", "k", "tts")
    val px = AsOfJoin.backward(t, tied, Seq("k"), "tts", "qts",
      Seq("px"), "qid").head().getAs[Double]("px")
    assert(px == 2.0, "qb sorts after qa and must be the surviving match")
  }

  test("no nested-loop join in the physical plan") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tts", "qts",
      Seq("px"), "qid")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("range join matches inclusive bounds across bucket boundaries") {
    val intervals = Seq(
      ("i1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:25:00")), // 3 buckets @10min
      ("i2", ts("2024-01-01 10:24:00"), ts("2024-01-01 10:26:00")))
      .toDF("iid", "s", "e")
    val points = Seq(
      ("p1", ts("2024-01-01 10:00:00")), // inclusive start of i1
      ("p2", ts("2024-01-01 10:25:00")), // inclusive end of i1, inside i2
      ("p3", ts("2024-01-01 10:19:59")), // middle bucket of i1
      ("p4", ts("2024-01-01 10:27:00"))) // no interval
      .toDF("pid", "pts")
    val got = RangeJoin.bucketed(points, intervals, "pts", "s", "e",
        600000000L)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(got == Set(("p1", "i1"), ("p2", "i1"), ("p2", "i2"), ("p3", "i1")))
  }

  test("range join emits each qualifying pair exactly once") {
    val intervals = Seq(("i1", ts("2024-01-01 00:00:00"),
      ts("2024-01-03 00:00:00"))).toDF("iid", "s", "e") // spans many buckets
    val points = Seq(("p1", ts("2024-01-02 05:00:00"))).toDF("pid", "pts")
    val n = RangeJoin.bucketed(points, intervals, "pts", "s", "e",
      600000000L).count()
    assert(n == 1L)
  }
}
