package graft.tools

/** Driver-side probe-ranking microbench (NO Spark): pins the cost of
  * [[graft.operators.VectorSearch.IvfIndex.nearestClusters]] — one
  * O(numClusters · dims) dot-product pass plus a sort — at 1k / 10k /
  * 65536 centroids × 2688 dims. 65536 is the cluster-count cap
  * ([[graft.operators.VectorSearch.defaultNumClusters]]), so the largest
  * figure is the per-query routing cost ceiling a serving layer pays
  * before any index IO; at the cap that's ~176M multiply-adds per query.
  * Conclusions land in SCALE.md (motivating — or ruling out — a
  * coarse-over-fine two-level router).
  */
object RouteBench {

  def main(args: Array[String]): Unit = {
    val dims = 2688
    val rnd = new java.util.Random(42)
    val q = Array.fill(dims)(rnd.nextFloat())
    Seq(1000, 10000, 65536).foreach { k =>
      val cents = Array.fill(k)(Array.fill(dims)(rnd.nextFloat()))
      val radii = Array.fill(k)(rnd.nextDouble())
      val idx = graft.operators.VectorSearch.IvfIndex(
        "unused", cents, Double.NaN, radii, radii)
      (0 until 5).foreach(_ => idx.nearestClusters(q, 32)) // JIT warmup
      val reps = math.max(10, 2000000 / k)
      val t0 = System.nanoTime()
      var i = 0
      var sink = 0
      while (i < reps) { sink += idx.nearestClusters(q, 32).head; i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"[route] k=$k%-6d dims=$dims $ms%8.3f ms/query  (reps=$reps, sink=$sink)")
    }
  }
}
