package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(10.0), "red", "a longer text value that is descriptive"),
    (2L, Some(20.0), "blue", "another long descriptive text goes right here"),
    (3L, None, "red", "short but still a text column for the profiler"),
    (4L, Some(30.0), null, "the fourth descriptive text value in this table")
  ).toDF("id", "price", "color", "desc")

  test("null profile counts every column in one pass") {
    val nulls = Profile.nullProfile(df)
    assert(nulls == Map("id" -> 0L, "price" -> 1L, "color" -> 1L, "desc" -> 0L))
  }

  test("numeric stats match hand-computed values") {
    val s = Profile.numericStats(df, Seq("price")).head
    assert(s.count == 3 && s.nulls == 1)
    assert(s.mean === 20.0 && s.min === 10.0 && s.max === 30.0)
    assert(math.abs(s.stddev - 10.0) < 1e-9)
  }

  test("categorical stats: counts, percentages, distinct") {
    val c = Profile.categoricalStats(df, "color")
    assert(c.distinct == 2)
    assert(c.top.head == ("red", 2L, 50.0))
  }

  test("histogram clamps to edge bins") {
    val h = Profile.histogram(df, "price", 0.0, 30.0, 3)
    // 10 → bin 1, 20 → bin 2, 30 → clamped to bin 2
    assert(h.counts == Seq(0L, 1L, 2L))
  }

  test("embedding stats + per-dim moments") {
    val vecs = Seq(
      Array(3.0f, 4.0f), Array(0.0f, 5.0f), Array(5.0f, 0.0f)
    ).toDF("embedding")
    val e = Profile.embeddingStats(vecs, "embedding")
    assert(e.count == 3 && e.dims == 2)
    assert(math.abs(e.normMean - 5.0) < 1e-9)
    val dims = Profile.perDimensionMoments(vecs, "embedding").collect()
    assert(dims.length == 2)
    assert(math.abs(dims(0).getAs[Double]("mean") - 8.0 / 3) < 1e-6)
  }

  test("embedding stats via a layout norm column match the full scan " +
      "and never read the payload") {
    val vecs = Seq(
      Array(3.0f, 4.0f), Array(0.0f, 5.0f), Array(5.0f, 0.0f)
    ).toDF("embedding")
    val withNorm = vecs.withColumn("emb_norm",
      graft.functions.vec_norm(col("embedding")))
    val full = Profile.embeddingStats(withNorm, "embedding")
    val fast = Profile.embeddingStats(withNorm, "embedding", Some("emb_norm"))
    assert(fast.count == full.count && fast.dims == full.dims)
    assert(math.abs(fast.normMean - full.normMean) < 1e-9)
    assert(math.abs(fast.normStd - full.normStd) < 1e-9)
    // poisoned norms: if the fast path scanned vectors these would still be
    // 5.0 — getting 42 back proves mean/std came from the stats column only
    val poisoned = vecs.withColumn("emb_norm", lit(42.0))
    val p = Profile.embeddingStats(poisoned, "embedding", Some("emb_norm"))
    assert(p.normMean == 42.0 && p.normStd == 0.0 && p.dims == 2)
    // absent column falls back to the full scan
    val fb = Profile.embeddingStats(vecs, "embedding", Some("emb_norm"))
    assert(math.abs(fb.normMean - 5.0) < 1e-9)
  }

  test("full profile routes columns and renders markdown") {
    val p = Profile.profile(df)
    assert(p.rows == 4)
    assert(p.numeric.map(_.column).toSet == Set("id", "price"))
    assert(p.categorical.map(_.column) == Seq("color"))
    assert(p.text.map(_.column) == Seq("desc"))
    val md = Profile.renderMarkdown("test", p)
    assert(md.contains("# Dataset profile: test") && md.contains("red"))
  }

  test("json sink emits parseable stats with escaping") {
    val quirky = Seq((1L, "va\"lue"), (2L, "plain")).toDF("id", "name")
    val json = Profile.renderJson("ds\"1", Profile.profile(quirky))
    // driver-side check with the JVM's own parser-ish sanity: braces balance
    assert(json.contains("\"dataset\": \"ds\\\"1\""))
    assert(json.contains("\"rows\": 2"))
    assert(json.count(_ == '{') == json.count(_ == '}'))
  }

  test("summary report compares datasets and reports spread") {
    val p1 = Profile.profile(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    val p2 = Profile.profile(Seq((1L, 12.0), (2L, 22.0)).toDF("id", "v"))
    val md = Profile.renderSummaryMarkdown(Seq("small" -> p1, "large" -> p2))
    assert(md.contains("| small | 2 |") && md.contains("| large | 2 |"))
    assert(md.contains("v: mean spread across datasets = 2.0000"))
  }

  test("fileSizeMb measures a written dataset") {
    val dir = java.nio.file.Files.createTempDirectory("szprobe").toString
    df.write.mode("overwrite").parquet(dir)
    val mb = Profile.fileSizeMb(df, dir)
    assert(mb > 0.0 && mb < 10.0)
  }

  test("psi: identical samples score ~0, a shifted sample scores high") {
    import spark.implicits._
    val base = (0 until 2000).map(i => (i % 100).toDouble).toDF("v")
    val same = Profile.psi(base, base, "v", bins = 10, lo = 0, hi = 100)
      .head().getDouble(0)
    assert(same == 0.0, s"identical distributions must give psi 0, got $same")
    // shift the whole mass into the upper half of the range
    val shifted = (0 until 2000).map(i => 50.0 + (i % 50)).toDF("v")
    val drift = Profile.psi(base, shifted, "v", bins = 10, lo = 0, hi = 100)
      .head().getDouble(0)
    assert(drift > 0.25, s"shifted distribution must exceed 0.25, got $drift")
    // out-of-range and null values: clamped / excluded without error
    val dirty = Seq(Some(-5.0), Some(500.0), None, Some(10.0)).toDF("v")
    val r = Profile.psi(base, dirty, "v", bins = 10, lo = 0, hi = 100).head()
    assert(r.getLong(2) == 3L) // null excluded from n_b
    // empty inputs still produce the documented single row (psi 0)
    val none = base.filter(col("v") < -1e9)
    val er = Profile.psi(none, none, "v", bins = 10, lo = 0, hi = 100).head()
    assert(er.getDouble(0) == 0.0 && er.getLong(1) == 0L && er.getLong(2) == 0L)
    // unequal sample sizes concentrated in one bin: the empty bins' smoothed
    // terms must still be counted (regression for the all-bins fix)
    val aOne = (0 until 100).map(_ => 5.0).toDF("v")
    val bOne = (0 until 200).map(_ => 5.0).toDF("v")
    val conc = Profile.psi(aOne, bOne, "v", bins = 20, lo = 0, hi = 100)
      .head().getDouble(0)
    assert(conc > 0.02, s"empty-bin smoothing terms missing: $conc")
  }

  test("schemaDiff reports added, removed, retyped, and renullabled columns") {
    import spark.implicits._
    val before = Seq((1L, "x", 1.0)).toDF("id", "name", "score")
    val after = Seq((1, "x", true)).toDF("id", "flag", "extra")
      .select(col("id"), col("flag"), col("extra"))
    val diff = Profile.schemaDiff(before, after).toMap
    assert(diff("name") == "removed string")
    assert(diff("score") == "removed double")
    assert(diff("flag") == "added string")
    assert(diff("extra") == "added boolean")
    assert(diff("id") == "retyped bigint -> int")
    assert(Profile.schemaDiff(before, before).isEmpty)
  }

  test("fkAudit counts orphans (incl. null FKs) and coverage per edge") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), None)
      .toDF("fk") // one dangling, one null → 2 orphans; fks {1,2,99}
    val r = Profile.fkAudit(Seq(("child.parent", child, "fk", parent, "pk")))
      .head()
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (("child.parent", 5L, 2L, 3L, 3L)))
  }

  test("consistencyVerdict flags drifted variants and passes faithful ones") {
    import spark.implicits._
    val base = spark.range(1000).toDF("id")
      .withColumn("x", (col("id") % 100).cast("double"))
    val faithful = base.filter(col("id") % 2 === 0) // same x distribution
    val drifted = base.filter(col("x") < 50)        // halves the mean
    val out = Profile.consistencyVerdict(
        Seq("full" -> base, "even" -> faithful, "low" -> drifted),
        Seq("x"), tolerance = 0.05)
      .collect().map(r => (r.getString(0), r.getString(2), r.getBoolean(6)))
    // 2 variants × 1 column × 3 metrics, ordered
    assert(out.length == 6)
    val byKey = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(byKey(("even", "mean")) && byKey(("even", "stddev")))
    assert(!byKey(("low", "mean")) && !byKey(("low", "stddev")))
    assert(byKey(("even", "null_frac")) && byKey(("low", "null_frac")))
  }
}
