package graft.tools

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the IVF centroid FIT — the one n-independent cost that
  * dominated `ivf_products_build_sf1` (837 s at r9; the assignment term
  * was already cut by the two-level kernel) — flat MLlib Lloyd vs the
  * r10 hierarchical fit, at the exact sf1 fit workload: |train| = 256k
  * sample rows × 2688 dims, k = 1000 cells (reference anchor: the <2 h
  * full build at 10M rows, `README.md:64`, pro-rated ~720 s at 1M).
  *
  * All in-memory, CPU-bound, zero index writes — safe to run while the
  * VM's IO budget is depleted. Reports wall per fit path, the
  * hierarchical per-step split, and the quality envelope both ways:
  * mean quantization distance over the sample (the k-means objective —
  * ratio ≈ 1.0 means the hierarchy placed centroids as well as flat
  * Lloyd did) and cell balance (max / p99 sample occupancy — a lumpy
  * fit would concentrate probe cost).
  *
  * Fixture: hub-structured vectors drawn from k hubs (the geometry a
  * trained product table has — see AssignBench's fixture note: data and
  * centroids must share hubs or every quality number measures
  * tie-breaking noise).
  *
  * SPARK_GRAFT_FIT_ROWS / _DIMS / _K override the workload;
  * SPARK_GRAFT_FIT_SECTIONS=hier skips the flat MLlib side (the ~10 min
  * attribution baseline) and re-measures only the hierarchical path.
  */
object FitBench {

  def main(args: Array[String]): Unit = {
    // heap comes from the forked JVM's -Xmx (build.sbt / SPARK_DRIVER_MEM)
    // — spark.driver.memory set via the builder is a no-op in local mode
    // (the JVM is already running), so no config line pretends otherwise
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("fit-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    import spark.implicits._

    val n = sys.env.getOrElse("SPARK_GRAFT_FIT_ROWS", "256000").toInt
    val dims = sys.env.getOrElse("SPARK_GRAFT_FIT_DIMS", "2688").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_FIT_K", "1000").toInt
    val sections = sys.env.getOrElse("SPARK_GRAFT_FIT_SECTIONS", "all")
    // SPARK_GRAFT_FIT_M sweeps the coarse-group count (0 = the auto rule);
    // SPARK_GRAFT_FIT_SPLIT sweeps balancedCoarse's heavy-cell split
    // threshold (× mean mass — refine cost per group is quadratic in it)
    sys.env.get("SPARK_GRAFT_FIT_M").map(_.toInt)
      .foreach(graft.operators.VectorSearch.hierarchicalFitGroups = _)
    sys.env.get("SPARK_GRAFT_FIT_SPLIT").map(_.toDouble)
      .foreach(graft.operators.VectorSearch.balancedCoarseSplitFactor = _)
    // SPARK_GRAFT_FIT_FULLSPLIT=0 disables the r12 full-mass split pass
    // (the A/B for "does splitting TRUE-heavy groups cut the worst task")
    sys.env.get("SPARK_GRAFT_FIT_FULLSPLIT")
      .foreach(v => graft.operators.VectorSearch.fullMassSplit = v != "0")
    println(s"[fit] rows=$n dims=$dims k=$k sections=$sections " +
      s"m=${graft.operators.VectorSearch.hierarchicalFitGroups} " +
      s"split=${graft.operators.VectorSearch.balancedCoarseSplitFactor} " +
      s"fullsplit=${graft.operators.VectorSearch.fullMassSplit}")

    // k hubs → the sample has k natural clusters, like a real product
    // table the fit must tile with k cells
    val rnd = new scala.util.Random(42)
    val hubs = Array.fill(k)(Array.fill(dims)(rnd.nextFloat() * 20 - 10))
    val hubsB = spark.sparkContext.broadcast(hubs)
    val df = spark.range(0, n, 1, 32).mapPartitions { it =>
      val hs = hubsB.value
      it.map { i =>
        val r = new scala.util.Random(i)
        hs(r.nextInt(hs.length)).map(v => v + r.nextFloat() * 2 - 1)
      }
    }.toDF("__v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()

    def wall[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // mean quantization distance of the sample against a centroid set —
    // the k-means objective both fits minimize, via the same codegen
    // kernel the build's stats pass uses; plus occupancy balance
    def quality(cents: Array[Array[Float]]): (Double, Long, Long) = {
      val rows = df.select(
          graft.functions.nearest_centroid(col("__v"), cents).as("__c"),
          graft.functions.nearest_centroid_dist(col("__v"), cents).as("__d"))
        .groupBy(col("__c")).agg(count(lit(1)).as("n"), sum(col("__d")).as("s"))
        .collect()
      val total = rows.map(_.getLong(1)).sum
      val mean = rows.map(_.getDouble(2)).sum / total
      val sizes = rows.map(_.getLong(1)).sorted
      val p99 = sizes(math.min(sizes.length - 1, (sizes.length * 99) / 100))
      (mean, sizes.last, p99)
    }

    // SPARK_GRAFT_FIT_FULLSPLIT_AB: paired same-session A/B of the r12
    // full-mass split pass. The FIRST arm pays the session's first-call
    // codegen/JIT, which favors whichever arm runs second — so the A/B
    // must be run in BOTH orders ("1" = off-first, "rev" = on-first)
    // and read as an order-controlled pair, same protocol as the
    // routed-vs-flat walls. The [ivf] fit_refine_groups lines carry
    // each arm's worst task.
    val abMode = sys.env.getOrElse("SPARK_GRAFT_FIT_FULLSPLIT_AB", "")
    if (abMode == "1" || abMode == "rev") {
      val arms = if (abMode == "rev") Seq(true, false) else Seq(false, true)
      arms.foreach { fs =>
        graft.operators.VectorSearch.fullMassSplit = fs
        val (cs, t) = wall {
          graft.operators.VectorSearch.hierarchicalFit(spark, df, k, 42L,
            dbg = true)
        }
        val (q2, mx, p99) = quality(cs)
        println(f"[fit] hier-fullsplit=$fs wall=$t%8.2f s cells=${cs.length} " +
          f"meanQdist=$q2%10.4f maxCell=$mx p99Cell=$p99")
      }
      spark.stop()
      return
    }

    val (hier, tHier) = wall {
      graft.operators.VectorSearch.hierarchicalFit(spark, df, k, 42L, dbg = true)
    }
    val (hq, hMax, hP99) = quality(hier)
    println(f"[fit] hierarchical  wall=$tHier%8.2f s cells=${hier.length} " +
      f"meanQdist=$hq%10.4f maxCell=$hMax p99Cell=$hP99")

    if (sections != "hier") {
      val (flat, tFlat) = wall {
        val trainDf = df.select(
            array_to_vector(col("__v").cast("array<double>")).as("__mlvec"))
        val model = new KMeans()
          .setK(k).setSeed(42L).setFeaturesCol("__mlvec")
          .setPredictionCol("__cluster").setMaxIter(10)
          .setInitMode("random")
          .fit(trainDf)
        model.clusterCenters.map(_.toArray.map(_.toFloat))
      }
      val (fq, fMax, fP99) = quality(flat)
      println(f"[fit] flat-mllib    wall=$tFlat%8.2f s cells=${flat.length} " +
        f"meanQdist=$fq%10.4f maxCell=$fMax p99Cell=$fP99")
      println(f"[fit] speedup=${tFlat / tHier}%6.2f× qualityRatio(hier/flat)=" +
        f"${hq / fq}%8.5f (1.0 = parity; <1 hier better)")
    }

    spark.stop()
  }
}
