package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** Measures the r9 conjunction fast path in the IVF probe planner: the
  * reference's selectivity tiers are `category === v && numeric-range`
  * conjunctions, which cannot use the driver-side occupancy lookup
  * directly (occupancy only bounds a conjunction's counts from above) —
  * pre-r9 they paid one FULL pushed count scan per (handle, filter).
  * The fast path intersects first: the categorical conjunct's occupancy
  * candidate cells partition-prune the residual count scan, so the cold
  * scan reads only the cells that can possibly match.
  *
  * Fixture: hub-structured vectors so KMeans cells align with hubs, and
  * a category column derived from the hub id so each category lives in
  * a FEW cells — the locality the reference's `main_category` shows
  * (sf1 measured: "Computers" occupies a small fraction of the 1000
  * derived cells). Prints cold probePlan time through an
  * occupancy-registered handle (pruned scan) vs a bare handle (full
  * scan), plus the warm/memoized time both share. Rows land in
  * SCALE.md.
  */
object ConjunctionBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("conjunction-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    import spark.implicits._

    val dims = 32
    val nHubs = 64
    val n = 500000
    val rnd = new scala.util.Random(42)
    val hubs = Array.fill(nHubs)(Array.fill(dims)(rnd.nextFloat() * 10f))
    val df = (0 until n).map { i =>
      val h = i % nHubs
      (i.toLong, s"cat_${h / 8}", rnd.nextDouble() * 5.0,
        hubs(h).map(v => v + rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "cat", "rating", "embedding")
      .repartition(32)
    val dir = java.nio.file.Files.createTempDirectory("conj_bench").toString
    val t0 = System.nanoTime()
    val idx = graft.operators.VectorSearch.buildIvf(df, "embedding", 256,
      dir, sampleFraction = 0.2, occupancyCols = Seq("cat"))
    println(f"[conj] build=${(System.nanoTime() - t0) / 1e9}%6.2f s cells=${idx.centroids.length}")

    // cat_0 lives in the 8 hubs 0..7 → ~1/8 of the cells; the residual
    // range term forces the count-scan path either way
    val filter: Column = col("cat") === "cat_0" && col("rating") <= 1.0
    val q = hubs(0).map(_ + 0.1f)
    def coldPlan(handle: graft.operators.VectorSearch.IvfIndex,
        label: String): Unit = {
      val t1 = System.nanoTime()
      val plan = handle.probePlan(spark, Seq(q), 100, 8, Some(filter),
        exactFallback = true)
      val cold = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      handle.probePlan(spark, Seq(q), 100, 8, Some(filter),
        exactFallback = true)
      val warm = (System.nanoTime() - t2) / 1e9
      println(f"[conj] $label%-14s coldCountScan=$cold%6.3f s  warmMemo=$warm%6.4f s  probed=${plan.head.length}")
    }
    // bare handle: same routing state, NO occupancy → full count scan
    val bare = graft.operators.VectorSearch.IvfIndex(dir, idx.centroids,
      idx.baselineDist, idx.radii, idx.rmsRadii, idx.cellCounts)
    // interleave order A/B-fairly: bare first (any page-cache warmup
    // favors the later run — the pruned one still has to win on work)
    coldPlan(bare, "fullScan")
    coldPlan(idx, "occPruned")
    // parity: both plans must select identical probe sets
    val a = bare.probePlan(spark, Seq(q), 100, 8, Some(filter), true)
    val b = idx.probePlan(spark, Seq(q), 100, 8, Some(filter), true)
    println(s"[conj] plansEqual=${a == b}")
    spark.stop()
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
