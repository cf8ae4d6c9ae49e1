package graft

import graft.operators.Embedding
import org.apache.spark.sql.functions._

/** UMAP (SURVEY §2.9, reference `gbr.py:470-478`): the third projection
  * figure. Same contract as [[TsneSpec]]: cluster preservation,
  * determinism, bounded id-ordered sampling, malformed-vector tolerance.
  */
class UmapSpec extends SparkSpec {
  import spark.implicits._

  private def clusteredPoints(perCluster: Int): Array[Array[Double]] =
    (for (c <- 0 until 3; i <- 0 until perCluster) yield {
      val v = new Array[Double](16)
      (0 until 4).foreach(j => v(c * 4 + j) = 10.0 * (c + 1))
      (0 until 16).foreach(j => v(j) += math.sin(i * 16 + j + c * 997) * 0.3)
      v
    }).toArray

  test("curve fit recovers umap-learn's published (a, b) for min_dist 0.1") {
    val (a, b) = Embedding.umapCurveFit(0.1)
    assert(math.abs(a - 1.577) < 0.15, s"a = $a")
    assert(math.abs(b - 0.895) < 0.1, s"b = $b")
  }

  test("clusters separated in input stay separated in the 2-D projection") {
    val perCluster = 20
    val x = clusteredPoints(perCluster)
    val y = Embedding.umapLocal(x, nNeighbors = 10, minDist = 0.1,
      iterations = 200)
    def centroid(c: Int): (Double, Double) = {
      val pts = (0 until perCluster).map(i => y(c * perCluster + i))
      (pts.map(_(0)).sum / perCluster, pts.map(_(1)).sum / perCluster)
    }
    def dist(a: (Double, Double), b: (Double, Double)): Double =
      math.hypot(a._1 - b._1, a._2 - b._2)
    val cents = (0 until 3).map(centroid)
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
    val y1 = Embedding.umapLocal(x, 8, 0.1, 120)
    val y2 = Embedding.umapLocal(x, 8, 0.1, 120)
    assert(y1.zip(y2).forall { case (a, b) => a.sameElements(b) })
  }

  test("umapFromD2 over a shared matrix + init is bit-identical to umapLocal") {
    val x = clusteredPoints(10)
    val d2 = Embedding.pairwiseSquaredDistances(x)
    val init = Embedding.localPca2(x)
    val initCopy = init.map(_.clone())
    val shared = Embedding.umapFromD2(d2, init, 8, 0.1, 120)
    assert(shared.zip(Embedding.umapLocal(x, 8, 0.1, 120))
      .forall { case (a, b) => a.sameElements(b) })
    assert(init.zip(initCopy).forall { case (a, b) => a.sameElements(b) })
  }

  test("a malformed lowest-id vector does not drop the well-formed sample") {
    // row 0 (the LOWEST id) has the wrong dimension — the modal-dimension
    // guard must keep the 8-dim majority rather than filtering to dim-3
    val df = (0 until 20).map { i =>
      (i.toLong,
        if (i == 0) Array(1.0, 2.0, 3.0)
        else Array.tabulate(8)(j =>
          (if (j / 4 == i % 2) 10.0 else 0.0) + math.cos(i * 8 + j) * 0.2))
    }.toDF("doc_id", "embedding")
    val out = Embedding.umapProject(df, "embedding", "doc_id",
      sampleN = 20, nNeighbors = 6, iterations = 60)
    assert(out.count() == 19) // everything except the malformed row 0
    assert(!out.select(col("doc_id")).collect().map(_.getLong(0)).contains(0L))
  }

  test("nNeighbors is clamped for tiny samples instead of diverging") {
    val x = clusteredPoints(2) // n = 6, requested k 15 >> n
    val y = Embedding.umapLocal(x, 15, 0.1, 80)
    assert(y.length == 6 && y.forall(r => r.forall(v => !v.isNaN)))
  }

  test("umapProject samples deterministically by id, skips invalid vectors") {
    val df = (0 until 40).map { i =>
      val c = i % 2
      (i.toLong,
        if (i == 3) null
        else Array.tabulate(8)(j =>
          (if (j / 4 == c) 10.0 else 0.0) + math.cos(i * 8 + j) * 0.2))
    }.toDF("doc_id", "embedding")
    val out = Embedding.umapProject(df, "embedding", "doc_id",
      sampleN = 24, nNeighbors = 6, iterations = 120)
    val rows = out.orderBy(col("doc_id")).collect()
    // null row 3 excluded before the limit: 24 lowest VALID ids
    assert(rows.map(_.getLong(0)).toSeq ==
      (0L until 25L).filterNot(_ == 3L))
    assert(out.columns.toSeq == Seq("doc_id", "umap_x", "umap_y"))
    val byClass = rows.groupBy(_.getLong(0) % 2)
    def mean(ps: Array[(Double, Double)]): (Double, Double) =
      (ps.map(_._1).sum / ps.length, ps.map(_._2).sum / ps.length)
    val m0 = mean(byClass(0L).map(r => (r.getDouble(1), r.getDouble(2))))
    val m1 = mean(byClass(1L).map(r => (r.getDouble(1), r.getDouble(2))))
    assert(math.hypot(m0._1 - m1._1, m0._2 - m1._2) > 1.0,
      "interleaved clusters did not separate")
  }
}
