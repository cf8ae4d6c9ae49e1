package graft

import graft.functions.{vec_cos, vec_dot, vec_norm}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic invariants of the vector kernels (SURVEY §5.2): checked via
  * ScalaCheck through the REAL codegen path (literal columns on a 1-row
  * frame), not a scalar reimplementation.
  */
class VectorPropertySpec extends SparkSpec {

  /** Drive a scalacheck Gen deterministically (no scalatestplus bridge in
    * the offline cache, so sampling is explicit).
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAllPairs(n: Int)(f: (Array[Float], Array[Float]) => Unit): Unit = {
    val vs = samples(genVec, n + 1)
    vs.sliding(2).foreach { case Seq(a, b) => f(a, b); case _ => () }
  }

  private val dim = 16
  private val genVec: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](dim, Gen.chooseNum(-10f, 10f))

  private def eval1(c: org.apache.spark.sql.Column): Double =
    spark.range(1).select(c.as("v")).head().getDouble(0)

  private def scalarDot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { acc += a(i).toDouble * b(i); i += 1 }
    acc
  }

  test("dot is symmetric and matches the scalar reference") {
    forAllPairs(20) { (a, b) =>
      val ab = eval1(vec_dot(typedLit(a), typedLit(b)))
      val ba = eval1(vec_dot(typedLit(b), typedLit(a)))
      assert(ab === ba)
      assert(math.abs(ab - scalarDot(a, b)) < 1e-6)
    }
  }

  test("cosine is bounded in [-1, 1] and cos(a, a) = 1 for nonzero a") {
    forAllPairs(20) { (a, b) =>
      val c = eval1(vec_cos(typedLit(a), typedLit(b)))
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
      if (a.exists(_ != 0f)) {
        val self = eval1(vec_cos(typedLit(a), typedLit(a)))
        assert(math.abs(self - 1.0) < 1e-9)
      }
    }
  }

  test("norm of concatenated segments: norm(u ++ v)^2 = norm(u)^2 + norm(v)^2") {
    forAllPairs(20) { (u, v) =>
      val nu = eval1(vec_norm(typedLit(u)))
      val nv = eval1(vec_norm(typedLit(v)))
      val nc = eval1(vec_norm(typedLit(u ++ v)))
      assert(math.abs(nc * nc - (nu * nu + nv * nv)) < 1e-6 * (1 + nc * nc))
    }
  }

  test("norm(a) = sqrt(dot(a, a))") {
    samples(genVec, 20).foreach { a =>
      val n = eval1(vec_norm(typedLit(a)))
      val d = eval1(vec_dot(typedLit(a), typedLit(a)))
      assert(math.abs(n - math.sqrt(d)) < 1e-9 * (1 + n))
    }
  }

  test("top-k is a prefix of top-(k+m) under a total order") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    def topIds(k: Int) = df
      .select(col("id"), vec_dot(col("v"), typedLit(q)).as("s"))
      .orderBy(desc("s"), col("id")).limit(k)
      .collect().map(_.getLong(0)).toSeq
    val t10 = topIds(10)
    val t25 = topIds(25)
    assert(t25.take(10) == t10)
  }

  test("recall(exact, exact) = 1.0") {
    import spark.implicits._
    val res = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "id")
    val r = graft.operators.VectorSearch
      .recallAtK(res, res, "query_id", "id", 2)
      .head().getDouble(0)
    assert(r === 1.0)
  }

  test("sampling fraction is approximately honored") {
    val n = 20000
    val f = 0.3
    val cnt = spark.range(n).sample(withReplacement = false, f, seed = 11).count()
    assert(math.abs(cnt.toDouble / n - f) < 0.05)
  }
}
