package graft

import graft.functions._
import org.apache.spark.sql.functions._

class VectorKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def dotRef(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum

  test("dot/norm/cos match scalar reference on float arrays") {
    val a = Array(1.5f, -2.0f, 3.25f)
    val b = Array(0.5f, 4.0f, -1.0f)
    val row = Seq((a, b)).toDF("a", "b")
      .select(vec_dot($"a", $"b"), vec_norm($"a"), vec_cos($"a", $"b")).head()
    assert(math.abs(row.getDouble(0) - dotRef(a.toSeq, b.toSeq)) < 1e-12)
    assert(math.abs(row.getDouble(1) - math.sqrt(dotRef(a.toSeq, a.toSeq))) < 1e-12)
    val expectedCos = dotRef(a.toSeq, b.toSeq) /
      (math.sqrt(dotRef(a.toSeq, a.toSeq)) * math.sqrt(dotRef(b.toSeq, b.toSeq)))
    assert(math.abs(row.getDouble(2) - expectedCos) < 1e-12)
  }

  test("kernels accept double arrays and mixed types") {
    val df = Seq((Array(1.0, 2.0), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(vec_dot($"a", $"b")).head().getDouble(0) === 11.0)
    assert(df.select(vec_norm($"a")).head().getDouble(0) === math.sqrt(5.0))
  }

  test("zero vector cosine is 0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(vec_cos($"a", $"b")).head().getDouble(0) === 0.0)
  }

  test("null input propagates null") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(vec_dot($"a", $"b")).head().isNullAt(0))
  }

  test("SQL registration works") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) === 11.0)
  }

  test("property: dot is symmetric, cos bounded (100 random vectors)") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 100).map { _ =>
      (Array.fill(16)(rnd.nextFloat() * 20 - 10), Array.fill(16)(rnd.nextFloat() * 20 - 10))
    }
    val res = rows.toDF("a", "b").select(vec_dot($"a", $"b"), vec_dot($"b", $"a"),
      vec_cos($"a", $"b")).collect()
    res.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(2) >= -1.0000001 && r.getDouble(2) <= 1.0000001)
    }
  }

  test("interpreted eval matches codegen path") {
    val a = Array.tabulate(64)(i => (i * 0.37 - 8).toFloat)
    val b = Array.tabulate(64)(i => (3.1 - i * 0.21).toFloat)
    val viaDf = Seq((a, b)).toDF("a", "b").select(vec_dot($"a", $"b")).head().getDouble(0)
    // interpreted: direct expression eval
    import org.apache.spark.sql.catalyst.util.ArrayData
    val expr = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)))
    val interpreted = expr.eval(null).asInstanceOf[Double]
    assert(viaDf === interpreted)
  }

  test("nearest_centroid matches brute-force argmin with lower-id ties") {
    val rnd = new scala.util.Random(11)
    val centroids = Array.fill(8)(Array.fill(32)(rnd.nextFloat() * 4 - 2))
    val vecs = (0 until 200).map(_ => Array.fill(32)(rnd.nextFloat() * 4 - 2))
    def brute(v: Array[Float]): Int = {
      val ds = centroids.map { c =>
        c.zip(v).foldLeft(0.0) { case (acc, (ci, vi)) =>
          acc + (ci.toDouble - vi) * (ci.toDouble - vi) }
      }
      ds.indexOf(ds.min)
    }
    val got = vecs.toDF("v")
      .select(graft.functions.nearest_centroid($"v", centroids)).collect()
      .map(_.getInt(0))
    vecs.zip(got).foreach { case (v, g) => assert(g == brute(v), v.toSeq) }
    // exact tie: a duplicated centroid must resolve to the lower index
    val dup = Array(centroids(3), centroids(3), centroids(0))
    val tied = Seq(centroids(3)).toDF("v")
      .select(graft.functions.nearest_centroid($"v", dup)).head().getInt(0)
    assert(tied == 0)
  }

  test("nearest_centroid_dist equals brute-force min squared-L2 distance") {
    val rnd = new scala.util.Random(13)
    val centroids = Array.fill(6)(Array.fill(24)(rnd.nextFloat() * 4 - 2))
    val vecs = (0 until 100).map(_ => Array.fill(24)(rnd.nextFloat() * 4 - 2))
    def brute(v: Array[Float]): Double =
      centroids.map { c =>
        c.zip(v).foldLeft(0.0) { case (acc, (ci, vi)) =>
          acc + (ci.toDouble - vi) * (ci.toDouble - vi) }
      }.min
    val got = vecs.toDF("v")
      .select(graft.functions.nearest_centroid_dist($"v", centroids)).collect()
      .map(_.getDouble(0))
    vecs.zip(got).foreach { case (v, g) =>
      assert(math.abs(g - brute(v)) < 1e-6, s"$g vs ${brute(v)}")
    }
    // a vector sitting exactly on a centroid is distance 0 (clamped, not
    // a tiny negative from accumulation order)
    val onCentroid = Seq(centroids(2)).toDF("v")
      .select(graft.functions.nearest_centroid_dist($"v", centroids))
      .head().getDouble(0)
    assert(onCentroid >= 0.0 && onCentroid < 1e-9)
    // interpreted eval agrees with the codegen path exercised above
    val interp = graft.functions.NearestCentroidDist(
      org.apache.spark.sql.catalyst.expressions.Literal.create(vecs.head,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)),
      centroids).eval(null).asInstanceOf[Double]
    assert(math.abs(interp - brute(vecs.head)) < 1e-6)
  }

  test("vec_dot and nearest_centroid accept array<tinyint> code inputs") {
    // Seq[Byte] (not Array[Byte], which encodes as BINARY) → array<tinyint>
    val dotted = Seq((Seq[Byte](1, -2, 3), Array(2.0f, 3.0f, 4.0f)))
      .toDF("c", "v").select(vec_dot($"c", $"v")).head().getDouble(0)
    assert(dotted === (1 * 2.0 + -2 * 3.0 + 3 * 4.0))
    // codegen path must read bytes as bytes, not reinterpret as floats
    val centroids = Array(Array(1f, 1f, 1f), Array(-1f, -1f, -1f))
    val got = (0 until 10).map(i =>
        (i, Seq[Byte]((if (i % 2 == 0) 50 else -50).toByte, 1, 1)))
      .toDF("i", "c")
      .select($"i", graft.functions.nearest_centroid($"c", centroids).as("n"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    (0 until 10).foreach { i =>
      assert(got(i) == (if (i % 2 == 0) 0 else 1), s"row $i")
    }
  }

  test("nearest_centroid accepts array<double> input") {
    val centroids = Array(Array(1f, 0f), Array(0f, 1f))
    val got = Seq(Array(0.1, 0.9), Array(0.9, 0.2)).toDF("v")
      .select(graft.functions.nearest_centroid($"v", centroids)).collect()
      .map(_.getInt(0)).toSeq
    assert(got == Seq(1, 0))
  }

  test("vec_sign_pack packs sign bits into words, tail bits zero") {
    import graft.functions.vec_sign_pack
    // 3 dims: bits 0,2 set (v >= 0 incl. zero), bit 1 clear → word 5
    val w = Seq(Array(1.0f, -2.0f, 0.0f)).toDF("v")
      .select(vec_sign_pack($"v")).head().getSeq[Long](0)
    assert(w == Seq(5L))
    // 70 dims crossing a word boundary: all non-negative → word0 = -1
    // (all 64 bits), word1 = low 6 bits
    val big = Seq(Array.fill(70)(1.0f)).toDF("v")
      .select(vec_sign_pack($"v")).head().getSeq[Long](0)
    assert(big == Seq(-1L, 63L))
  }

  test("vec_hamming equals brute-force sign disagreement count") {
    import graft.functions.{vec_hamming, vec_sign_pack}
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.fill(130)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("id", "v")
    val q = vecs.head._2
    val got = df.select($"id",
        vec_hamming(vec_sign_pack($"v"), vec_sign_pack(typedLit(q))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      val brute = v.zip(q).count { case (a, b) => (a >= 0) != (b >= 0) }
      assert(got(id) == brute.toLong, s"id $id")
    }
    // SQL registration
    val viaSql = {
      df.createOrReplaceTempView("sv")
      spark.sql("SELECT sum(vec_hamming(vec_sign_pack(v), vec_sign_pack(v))) FROM sv")
        .head().getLong(0)
    }
    assert(viaSql == 0L)
  }

  test("nearest_centroid_grouped with all groups probed EQUALS flat — any grouping") {
    val rnd = new scala.util.Random(17)
    val k = 32
    val centroids = Array.fill(k)(Array.fill(16)(rnd.nextFloat() * 4 - 2))
    // adversarial grouping: arbitrary partition (round-robin), nothing
    // geometric — full-probe parity must hold for ANY grouping
    val nGroups = 6
    val members = Array.tabulate(nGroups)(g =>
      (0 until k).filter(_ % nGroups == g).toArray)
    val coarse = members.map { ms =>
      val s = new Array[Double](16)
      ms.foreach(f => (0 until 16).foreach(i => s(i) += centroids(f)(i)))
      s.map(v => (v / ms.length).toFloat)
    }
    val vecs = (0 until 300).map(_ => Array.fill(16)(rnd.nextFloat() * 4 - 2))
    val rows = vecs.toDF("v").select(
        graft.functions.nearest_centroid($"v", centroids).as("flat"),
        graft.functions.nearest_centroid_grouped(
          $"v", centroids, coarse, members, probes = nGroups).as("grp"),
        graft.functions.nearest_centroid_dist($"v", centroids).as("fd"),
        graft.functions.nearest_centroid_grouped_dist(
          $"v", centroids, coarse, members, probes = nGroups).as("gd"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1))
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9)
    }
    // exact tie across different groups resolves to the lower fine index,
    // like the flat kernel: duplicate centroid 3 into group of 4
    val dup = centroids.updated(4, centroids(3)) // 3 ∈ group 3, 4 ∈ group 4
    val tied = Seq(centroids(3)).toDF("v").select(
        graft.functions.nearest_centroid_grouped(
          $"v", dup, coarse, members, probes = nGroups)).head().getInt(0)
    assert(tied == 3)
  }

  test("grouped kernel with small probes: near-equidistant misses only, empty groups skipped") {
    val rnd = new scala.util.Random(23)
    val dims = 16
    val nHubs = 16
    val perHub = 8
    // hub-structured centroids (the geometry large-k IVF tables have):
    // grouping = the hubs, plus one EMPTY group that must be skipped
    val hubs = Array.fill(nHubs)(Array.fill(dims)(rnd.nextFloat() * 20 - 10))
    val centroids = Array.tabulate(nHubs * perHub) { f =>
      val h = f / perHub
      hubs(h).map(v => v + rnd.nextFloat() - 0.5f)
    }
    val members = Array.tabulate(nHubs + 1)(g =>
      if (g == nHubs) Array.empty[Int]
      else (g * perHub until (g + 1) * perHub).toArray)
    val coarse = (hubs :+ Array.fill(dims)(999f)).toArray
    val vecs = (0 until 400).map { i =>
      centroids(i % centroids.length).map(v => v + rnd.nextFloat() * 0.4f - 0.2f)
    }
    val rows = vecs.toDF("v").select(
        graft.functions.nearest_centroid($"v", centroids).as("flat"),
        graft.functions.nearest_centroid_grouped(
          $"v", centroids, coarse, members, probes = 2).as("grp"),
        graft.functions.nearest_centroid_dist($"v", centroids).as("fd"),
        graft.functions.nearest_centroid_grouped_dist(
          $"v", centroids, coarse, members, probes = 2).as("gd"))
      .collect()
    val agree = rows.count(r => r.getInt(0) == r.getInt(1))
    assert(agree >= (rows.length * 0.9).toInt, s"agreement $agree/${rows.length}")
    rows.foreach { r =>
      // the approximation contract: when the grouped kernel differs, it
      // picked a near-equidistant neighbor — never a far cell
      assert(r.getDouble(3) >= r.getDouble(2) - 1e-9)
      assert(r.getDouble(3) <= r.getDouble(2) * 1.5 + 1e-6,
        s"gd=${r.getDouble(3)} fd=${r.getDouble(2)}")
    }
    // interpreted eval agrees with the codegen path
    val interp = graft.functions.NearestCentroidGrouped(
      org.apache.spark.sql.catalyst.expressions.Literal.create(vecs.head,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)),
      centroids, coarse, members, 2, emitDist = false)
      .eval(null).asInstanceOf[Int]
    assert(interp == rows.head.getInt(1))
  }

  test("assignKernels engages the two-level kernel at the cell threshold, stays faithful") {
    val rnd = new scala.util.Random(31)
    val dims = 8
    val nHubs = 64
    val k = graft.operators.VectorSearch.twoLevelAssignMinCells // 512 (r11)
    val hubs = Array.fill(nHubs)(Array.fill(dims)(rnd.nextFloat() * 40 - 20))
    val centroids = Array.tabulate(k) { f =>
      hubs(f % nHubs).map(v => v + rnd.nextFloat() * 2 - 1)
    }
    val (asg, asgDist) = graft.operators.VectorSearch.assignKernels(centroids)
    val vecs = (0 until 300).map(i =>
      centroids(rnd.nextInt(k)).map(v => v + rnd.nextFloat() * 0.5f - 0.25f))
    val rows = vecs.toDF("v").select(
        asg($"v").as("grp"),
        graft.functions.nearest_centroid($"v", centroids).as("flat"),
        asgDist($"v").as("gd"),
        graft.functions.nearest_centroid_dist($"v", centroids).as("fd"))
      .collect()
    // the kernel actually selected must be the grouped one: below the
    // threshold assignKernels returns the flat pair, and this fixture
    // sits exactly AT it
    val planned = vecs.take(1).toDF("v").select(asg($"v"))
      .queryExecution.analyzed.toString
    assert(planned.contains("nearest_centroid_grouped"), planned)
    val agree = rows.count(r => r.getInt(0) == r.getInt(1))
    assert(agree >= (rows.length * 0.95).toInt, s"agreement $agree/${rows.length}")
    rows.foreach { r =>
      assert(r.getDouble(2) >= r.getDouble(3) - 1e-9)
      assert(r.getDouble(2) <= r.getDouble(3) * 1.5 + 1e-6)
    }
    // and one below the threshold stays flat (exactness is free there)
    val (asgSmall, _) = graft.operators.VectorSearch.assignKernels(
      centroids.take(16))
    val small = vecs.take(1).toDF("v").select(asgSmall($"v"))
      .queryExecution.analyzed.toString
    assert(small.contains("nearest_centroid") &&
      !small.contains("nearest_centroid_grouped"), small)
  }
}
