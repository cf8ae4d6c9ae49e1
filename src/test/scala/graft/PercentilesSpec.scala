package graft

import graft.operators.Percentiles
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  test("matches hand-computed interpolated quantiles") {
    // group a: values 1..4 → p50 = 2.5, p25 = 1.75; group b: single value
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 7.0))
      .toDF("g", "v")
    val out = Percentiles.grouped(df, "g", "v", Seq(0.25, 0.5, 0.75),
        Seq("p25", "p50", "p75"))
      .orderBy("g").collect()
    assert(out(0).getDouble(1) === 1.75)
    assert(out(0).getDouble(2) === 2.5)
    assert(out(0).getDouble(3) === 3.25)
    assert(out(1).getDouble(1) === 7.0 && out(1).getDouble(2) === 7.0)
  }

  test("matches Spark's builtin percentile on random data") {
    val rnd = new scala.util.Random(13)
    val df = (0 until 5000)
      .map(i => (s"g${i % 4}", rnd.nextDouble() * 1000))
      .toDF("g", "v")
    val ours = Percentiles.grouped(df, "g", "v", Seq(0.25, 0.5, 0.9),
        Seq("a", "b", "c"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val builtin = df.groupBy(col("g")).agg(
        percentile(col("v"), lit(0.25)).as("a"),
        percentile(col("v"), lit(0.5)).as("b"),
        percentile(col("v"), lit(0.9)).as("c"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    ours.zip(builtin).foreach { case ((g1, a1, b1, c1), (g2, a2, b2, c2)) =>
      assert(g1 == g2)
      assert(math.abs(a1 - a2) < 1e-9 && math.abs(b1 - b2) < 1e-9 &&
        math.abs(c1 - c2) < 1e-9, s"group $g1")
    }
  }

  test("nulls are excluded like the builtin") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val out = Percentiles.grouped(df, "g", "v", Seq(0.5), Seq("med")).head()
    assert(out.getDouble(1) === 2.0)
  }

  test("a single group's sort spreads across multiple tasks (scale path)") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 50000).map(_ => ("only", rnd.nextDouble() * 1e6))
      .toDF("g", "v")
    // the internal ranking must involve >1 range partition for ONE group —
    // the property the per-group window formulation lacks (VERDICT r1 #8)
    val (ranked, cached) = Percentiles.globalRanks(df, "g", "v", 8)
    try {
      val pids = ranked.select("__pid").distinct().count()
      assert(pids > 1, s"expected >1 task for a single group, got $pids")
      // global ranks are a permutation of 0..n-1 and order-consistent
      val stats = ranked.agg(
        count(lit(1)), min(col("__rn")), max(col("__rn")),
        countDistinct(col("__rn"))).head()
      assert(stats.getLong(0) === 50000L)
      assert(stats.getDouble(1) === 0.0 && stats.getDouble(2) === 49999.0)
      assert(stats.getLong(3) === 50000L)
    } finally cached.unpersist()
    val med = Percentiles.grouped(df, "g", "v", Seq(0.5), Seq("med"),
      numPartitions = 8).head().getDouble(1)
    val builtin = df.agg(percentile(col("v"), lit(0.5))).head().getDouble(0)
    assert(math.abs(med - builtin) < 1e-9)
  }

  test("high-cardinality groups return the lazy distributed result") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 4000).map(i => (s"g${i % 100}", rnd.nextDouble()))
      .toDF("g", "v")
    // force the lazy path with a tiny collect threshold
    val lazyOut = Percentiles.grouped(df, "g", "v", Seq(0.5), Seq("med"),
      maxCollectGroups = 10L)
    val eager = Percentiles.grouped(df, "g", "v", Seq(0.5), Seq("med"))
    val a = lazyOut.orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    val b = eager.orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq && a.length == 100)
  }

  test("null group keys form their own group") {
    val df = Seq((Some("a"), 1.0), (None, 2.0), (None, 4.0), (Some("a"), 3.0))
      .toDF("g", "v")
    val out = Percentiles.grouped(df, "g", "v", Seq(0.5), Seq("med"))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toMap
    assert(out(Some("a")) === 2.0)
    assert(out(None) === 3.0)
  }

  test("winsorized clamps only the tails, inside values pass through") {
    // values 1..100 in one group: p10 bound = 10.9, p90 bound = 90.1
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = Percentiles.winsorized(df, "g", "v", 0.10, 0.90, boundScale = 1)
      .select("v", "v_w").collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(out(1.0) === 10.9)     // below lo → clamped up
    assert(out(10.0) === 10.9)
    assert(out(50.0) === 50.0)    // interior untouched
    assert(out(95.0) === 90.1)    // above hi → clamped down
    assert(out(100.0) === 90.1)
    // winsorized mean is pulled toward the center vs the raw mean
    val rawMean = (1 to 100).sum / 100.0
    val wMean = out.values.sum / 100.0
    assert(math.abs(wMean - rawMean) < 1.0)
  }

  test("equiDepthHistogram balances counts on skewed data") {
    // heavily skewed: 900 small values, 100 huge — equi-width would put
    // ~90% of rows in one bin; equi-depth must keep buckets near n/buckets
    val df = ((0 until 900).map(i => (i % 30).toDouble) ++
      (0 until 100).map(i => 1e6 + i)).toDF("v")
    val rows = Percentiles.equiDepthHistogram(df, "v", 4)
      .orderBy("bucket").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    val counts = rows.map(_.getLong(1))
    assert(counts.sum == 1000L)
    counts.foreach(c => assert(c >= 150L && c <= 350L, counts.toSeq.toString))
    // buckets are ordered and non-overlapping
    val (mins, maxs) = (rows.map(_.getDouble(2)), rows.map(_.getDouble(3)))
    (0 until 3).foreach(i => assert(maxs(i) <= mins(i + 1)))
  }

  test("winsorized keeps null groups and leaves null values null") {
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
        (Some("a"), Some(100.0)), (Some("a"), None),
        (None, Some(5.0)), (None, Some(6.0)))
      .toDF("g", "v")
    val out = Percentiles.winsorized(df, "g", "v", 0.10, 0.90, boundScale = 2)
    // no rows lost: null group keys and null values both survive the join
    assert(out.count() == 6)
    val nullValueRow = out.filter(col("g") === "a" && col("v").isNull).head()
    assert(nullValueRow.isNullAt(nullValueRow.fieldIndex("v_w")),
      "null value must stay null, not become the p-lo bound")
    val nullGroup = out.filter(col("g").isNull).collect()
    assert(nullGroup.length == 2 &&
      nullGroup.forall(!_.isNullAt(nullGroup.head.fieldIndex("v_w"))))
  }
}
