package graft

import graft.operators.Embedding
import org.apache.spark.sql.functions._

/** t-SNE (SURVEY §2.9, reference `gbr.py:459-461`): the projection must
  * preserve cluster structure, be deterministic, and keep its bounded-sample
  * contract.
  */
class TsneSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated deterministic clusters in 16-D: center c has
    * coordinate pattern c*10 on dims [c, c+3], plus a small per-point
    * deterministic offset.
    */
  private def clusteredPoints(perCluster: Int): Array[Array[Double]] =
    (for (c <- 0 until 3; i <- 0 until perCluster) yield {
      val v = new Array[Double](16)
      (0 until 4).foreach(j => v(c * 4 + j) = 10.0 * (c + 1))
      // deterministic jitter, distinct per point
      (0 until 16).foreach(j => v(j) += math.sin(i * 16 + j + c * 997) * 0.3)
      v
    }).toArray

  test("clusters separated in input stay separated in the 2-D projection") {
    val perCluster = 20
    val x = clusteredPoints(perCluster)
    val y = Embedding.tsneLocal(x, perplexity = 10.0, iterations = 300)
    def centroid(c: Int): (Double, Double) = {
      val pts = (0 until perCluster).map(i => y(c * perCluster + i))
      (pts.map(_(0)).sum / perCluster, pts.map(_(1)).sum / perCluster)
    }
    def dist(a: (Double, Double), b: (Double, Double)): Double =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val cents = (0 until 3).map(centroid)
    // mean intra-cluster spread
    val intra = (0 until 3).flatMap { c =>
      (0 until perCluster).map { i =>
        dist((y(c * perCluster + i)(0), y(c * perCluster + i)(1)), cents(c))
      }
    }.sum / (3 * perCluster)
    val interMin = (for (a <- 0 until 3; b <- a + 1 until 3)
      yield dist(cents(a), cents(b))).min
    assert(interMin > 3 * intra,
      f"clusters not separated: inter-min $interMin%.3f vs intra $intra%.3f")
  }

  test("deterministic: identical input gives identical output") {
    val x = clusteredPoints(10)
    val y1 = Embedding.tsneLocal(x, 8.0, 150)
    val y2 = Embedding.tsneLocal(x, 8.0, 150)
    assert(y1.zip(y2).forall { case (a, b) => a.sameElements(b) })
  }

  test("tsneFromD2 over a shared matrix + init is bit-identical to tsneLocal") {
    val x = clusteredPoints(10)
    val d2 = Embedding.pairwiseSquaredDistances(x)
    val init = Embedding.localPca2(x)
    val initCopy = init.map(_.clone())
    val shared = Embedding.tsneFromD2(d2, init, 8.0, 150)
    assert(shared.zip(Embedding.tsneLocal(x, 8.0, 150))
      .forall { case (a, b) => a.sameElements(b) })
    // the caller's init survives (FromD2 clones before optimizing in place)
    assert(init.zip(initCopy).forall { case (a, b) => a.sameElements(b) })
  }

  test("perplexity is clamped for tiny samples instead of diverging") {
    val x = clusteredPoints(2) // n = 6, requested perplexity 30 >> n
    val y = Embedding.tsneLocal(x, 30.0, 100)
    assert(y.length == 6 && y.forall(r => r.forall(v => !v.isNaN)))
  }

  test("tsneProject samples deterministically by id and returns one row per point") {
    val df = (0 until 40).map { i =>
      val c = i % 2
      (i.toLong, Array.tabulate(8)(j =>
        (if (j / 4 == c) 10.0 else 0.0) + math.cos(i * 8 + j) * 0.2))
    }.toDF("doc_id", "embedding")
    val out = Embedding.tsneProject(df, "embedding", "doc_id",
      sampleN = 24, perplexity = 5.0, iterations = 150)
    val rows = out.orderBy(col("doc_id")).collect()
    assert(rows.length == 24)
    // sample is the 24 LOWEST ids (TakeOrdered), not arbitrary
    assert(rows.map(_.getLong(0)).toSeq == (0L until 24L))
    assert(out.columns.toSeq == Seq("doc_id", "tsne_x", "tsne_y"))
    // projection separates the two interleaved clusters
    val byClass = rows.groupBy(_.getLong(0) % 2)
    val c0 = byClass(0L).map(r => (r.getDouble(1), r.getDouble(2)))
    val c1 = byClass(1L).map(r => (r.getDouble(1), r.getDouble(2)))
    def mean(ps: Array[(Double, Double)]): (Double, Double) =
      (ps.map(_._1).sum / ps.length, ps.map(_._2).sum / ps.length)
    val (m0, m1) = (mean(c0), mean(c1))
    assert(math.hypot(m0._1 - m1._1, m0._2 - m1._2) > 1.0,
      "interleaved clusters did not separate")
  }

  test("null vectors on the lowest ids don't shrink the sample (cutoff widens)") {
    // ids 0..9 carry null embeddings; the sample must be the 24 lowest
    // VALID ids (10..33), not 14 survivors of a 24-id cutoff — pins the
    // phase-2 validity + widening contract of Embedding.lowestIdRows,
    // whose phase-1 id scan no longer decodes the vector payload
    val df = (0 until 40).map { i =>
      val c = i % 2
      val v = if (i < 10) null
        else Array.tabulate(8)(j =>
          (if (j / 4 == c) 10.0 else 0.0) + math.cos(i * 8 + j) * 0.2)
      (i.toLong, v)
    }.toDF("doc_id", "embedding")
    val out = Embedding.tsneProject(df, "embedding", "doc_id",
      sampleN = 24, perplexity = 5.0, iterations = 50)
    assert(out.orderBy(col("doc_id")).collect().map(_.getLong(0)).toSeq ==
      (10L until 34L))
    // fewer valid rows than sampleN: returns all of them, terminates
    val tiny = Embedding.tsneProject(df.filter(col("doc_id") < 14),
      "embedding", "doc_id", sampleN = 24, perplexity = 5.0, iterations = 50)
    assert(tiny.orderBy(col("doc_id")).collect().map(_.getLong(0)).toSeq ==
      (10L until 14L))
  }
}
