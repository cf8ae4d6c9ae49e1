package graft.tools

/** Driver-side probe-ranking microbench (NO Spark): pins the cost of
  * [[graft.operators.VectorSearch.IvfIndex.nearestClusters]] — flat
  * (one O(numClusters · dims) dot-product pass + bounded-heap selection)
  * vs the two-level coarse-over-fine router — at 1k / 10k / 65536
  * centroids × 2688 dims. 65536 is the cluster-count cap
  * ([[graft.operators.VectorSearch.defaultNumClusters]]), so the largest
  * figure is the per-query routing cost ceiling a serving layer pays
  * before any index IO; flat at the cap is ~176M multiply-adds per
  * query, two-level ~(√k + 8·nprobe + 4·√k)·dims ≈ 3.5M. The one-time
  * coarse-router build cost and the selection overlap vs the flat
  * ranking are printed alongside (the overlap is the quality check: the
  * budgeted walk must keep the cells a flat ranking would pick).
  * Conclusions land in SCALE.md.
  */
object RouteBench {

  def main(args: Array[String]): Unit = {
    val dims = 2688
    val nprobe = 32
    val rnd = new java.util.Random(42)
    val q = Array.fill(dims)(rnd.nextFloat())
    Seq(1000, 10000, 65536).foreach { k =>
      // CLUSTERED centroid table — ~√k hubs, fine centroids = hub + noise
      // — the geometry a KMeans fit of real embeddings actually yields.
      // (A uniform-random table was tried first and is the one geometry
      // that blinds ANY coarse router: every group's mean collapses to
      // the hypercube center, group bounds become indistinguishable, and
      // selection overlap drops to the hypergeometric floor — a property
      // of the synthetic data, not of the router. Timing is budget-bound
      // and data-independent; overlap is only meaningful on clusterable
      // tables, so the bench generates one.)
      val nHubs = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
      val hubs = Array.fill(nHubs)(Array.fill(dims)(rnd.nextFloat()))
      val cents = Array.tabulate(k) { i =>
        val h = hubs(i % nHubs)
        Array.tabulate(dims)(d => h(d) + (rnd.nextFloat() - 0.5f) * 0.3f)
      }
      // RMS radii shaped like a real build's: clustered around the data's
      // intra-cell spread (± 20% jitter). An early draft drew radii
      // uniform on [0,1) — uncorrelated, spanning 0–30 in score units —
      // which max-entropy-reshuffles the fine ranking (radius term σ ≈
      // 8.6 vs hub-dot σ ≈ 11) and drags ANY router's overlap to ~0.4;
      // measured per-cell RMS radii on real builds vary ~±20% around one
      // scale, so the bench models that
      val baseR = 0.3 * math.sqrt(dims / 12.0) // the fine cells' own spread
      val radii = Array.fill(k)(baseR * (0.9 + 0.2 * rnd.nextDouble()))
      val flat = graft.operators.VectorSearch.IvfIndex(
        "unused", cents, Double.NaN, radii, radii)
      flat.twoLevelMinCells = Int.MaxValue // keep this handle flat
      val two = graft.operators.VectorSearch.IvfIndex(
        "unused", cents, Double.NaN, radii, radii)
      two.twoLevelMinCells = 0 // force the router at every k
      def bench(idx: graft.operators.VectorSearch.IvfIndex,
          label: String): Seq[Int] = {
        (0 until 5).foreach(_ => idx.nearestClusters(q, nprobe)) // JIT warmup
        val reps = math.max(10, 2000000 / k)
        val t0 = System.nanoTime()
        var i = 0
        var sink = 0
        var last: Seq[Int] = Nil
        while (i < reps) {
          last = idx.nearestClusters(q, nprobe); sink += last.head; i += 1
        }
        val ms = (System.nanoTime() - t0) / 1e6 / reps
        println(f"[route] k=$k%-6d dims=$dims $label%-9s $ms%8.3f ms/query  (reps=$reps, sink=$sink)")
        last
      }
      val fSel = bench(flat, "flat")
      val tBuild0 = System.nanoTime()
      two.nearestClusters(q, nprobe) // triggers the lazy coarse build
      println(f"[route] k=$k%-6d coarse build+first query ${(System.nanoTime() - tBuild0) / 1e6}%8.1f ms (one-time)")
      val tSel = bench(two, "two-level")
      val overlap = fSel.toSet.intersect(tSel.toSet).size.toDouble / nprobe
      println(f"[route] k=$k%-6d selection overlap two-level vs flat: $overlap%.3f (nprobe=$nprobe)")
    }
  }
}
