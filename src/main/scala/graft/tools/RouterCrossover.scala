package graft.tools

import graft.operators.VectorSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-situ two-level-router crossover (r13 verdict task 4). The coarse
  * router has never measured an end-to-end WIN: at its 4096-cell
  * engagement default the order-controlled A/B reads routed 0.597 s vs
  * flat 0.470 s (BENCH_scale_idx2m_r13), and RouteBench's lab rows only
  * price the driver RANKING term (3 ms routed vs 227 ms flat per query
  * at 65536 cells) — not the plan-to-read pipeline it ships inside.
  * This tool builds REAL (small-payload) indexes at cell counts the
  * session's big artifacts never reach — default 16384 and 65536 over a
  * 200k × 384 generated products table (~0.5 GB of index each; the
  * point is the CELL-COUNT regime, which drives both the flat ranking
  * cost and the router's group walk, not the payload bytes) — and runs
  * the same order-controlled routed/flat searchMulti A/B as
  * IndexScale/ScalePoint (R,F,R,F, min per mechanism, router rebuild
  * inside the routed reps), plus plan-only walls so the read term
  * separates from the ranking term.
  *
  * The outcome sets [[VectorSearch.IvfIndex.twoLevelMinCells]]'s
  * default to a measured number: the smallest cell count where routed
  * end-to-end ≤ flat (or above the largest measured count if flat wins
  * everywhere reachable).
  *
  * Env: SPARK_GRAFT_ROUTE_ROWS (default 200000), SPARK_GRAFT_ROUTE_DIMS
  * (default 384), SPARK_GRAFT_ROUTE_CELLS (default "16384,65536"),
  * SPARK_GRAFT_WORK_DIR.
  */
object RouterCrossover {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.get("SPARK_GRAFT_WORK_DIR").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_routex").toString)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$base/spark-local")
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    spark.range(1000).select(sum(col("id"))).collect()

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try {
        f
        results(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[routex] $name FAILED: ${e.getMessage}")
          results(name) = -1.0
      }
    }

    val nRows = sys.env.getOrElse("SPARK_GRAFT_ROUTE_ROWS", "200000").toLong
    val dims = sys.env.getOrElse("SPARK_GRAFT_ROUTE_DIMS", "384").toInt
    val cells = sys.env.getOrElse("SPARK_GRAFT_ROUTE_CELLS", "16384,65536")
      .split(",").map(_.trim.toInt).toSeq

    val source: DataFrame = {
      val baseCols = graft.sources.ProductGen.baseColumns(
        spark.range(0, nRows, 1, cpus.toInt).toDF("id"))
      graft.sources.ProductGen.withDerived(baseCols, dims)
        .select(col("parent_asin"), col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    source.count()

    cells.foreach { k =>
      val tag = s"k$k"
      var ivf: VectorSearch.IvfIndex = null
      timed(s"build_$tag") {
        ivf = VectorSearch.buildIvf(source, "embedding", k,
          s"$base/ivf_$tag", sampleFraction = 1.0)
      }
      if (ivf != null) {
        results(s"cells_${tag}_value") = ivf.centroids.length.toDouble
        val queryVecs = source.select(col("embedding")).head(3)
          .map(_.getSeq[Float](0).toArray).toSeq
        def idSets(df: DataFrame): Map[Int, Set[String]] =
          df.collect().groupBy(_.getInt(0)).map { case (q, rows) =>
            q -> rows.map(_.getString(3)).toSet
          }
        val exact = idSets(VectorSearch.topKMulti(
          spark.read.parquet(s"$base/ivf_$tag"), "__vec", queryVecs, 100,
          "parent_asin"))
        def recallOf(approx: Map[Int, Set[String]]): Double =
          queryVecs.indices.map { i =>
            val e = exact.getOrElse(i, Set.empty)
            if (e.isEmpty) 1.0
            else e.intersect(approx.getOrElse(i, Set.empty)).size.toDouble /
              e.size
          }.sum / queryVecs.length
        def setRouted(on: Boolean): Unit = {
          ivf.twoLevelMinCells = if (on) 2 else Int.MaxValue
          ivf.invalidateRouter()
        }
        // warm the relation + codegen once per mechanism before timing
        setRouted(false)
        ivf.searchMulti(spark, queryVecs, 100, nprobe = 128,
          "parent_asin").collect()
        // one-time coarse-structure build, timed SEPARATELY (r16): the
        // clustering of the centroid table survives invalidateRouter,
        // so the A/B below measures the steady-state routed plan
        // (bounds rebuild + routing) — pre-r16 every measured plan
        // repaid the full re-clustering (the 1.32 s-vs-0.116 s r15 gap)
        setRouted(true)
        timed(s"router_struct_$tag") {
          ivf.probePlan(spark, queryVecs, 100, 128, None,
            exactFallback = true)
          ()
        }
        def once(): (Double, Double, Double) = {
          val tp = System.nanoTime()
          ivf.probePlan(spark, queryVecs, 100, 128, None,
            exactFallback = true)
          val planWall = (System.nanoTime() - tp) / 1e9
          val t0 = System.nanoTime()
          val sets = idSets(ivf.searchMulti(
            spark, queryVecs, 100, nprobe = 128, "parent_asin"))
          ((System.nanoTime() - t0) / 1e9, recallOf(sets), planWall)
        }
        setRouted(true); val r1 = once()
        setRouted(false); val f1 = once()
        setRouted(true); val r2 = once()
        setRouted(false); val f2 = once()
        results(s"ab_routed_${tag}_wall_value") = math.min(r1._1, r2._1)
        results(s"ab_flat_${tag}_wall_value") = math.min(f1._1, f2._1)
        results(s"ab_routed_${tag}_plan_value") = math.min(r1._3, r2._3)
        results(s"ab_flat_${tag}_plan_value") = math.min(f1._3, f2._3)
        results(s"ab_routed_${tag}_recall_value") = math.max(r1._2, r2._2)
        results(s"ab_flat_${tag}_recall_value") = math.max(f1._2, f2._2)
        // r15: probe-set parity ON THE REAL GEOMETRY (the r14 pair read
        // routed 0.317 vs flat 0.330 here — the blind candidate cap,
        // removed this round; the spec pins parity on synthetic
        // geometry, this records it in-situ). 1.0 = every query's routed
        // RANKED probe list is identical to the flat ranking's.
        // try/finally like the IndexScale knob blocks: the parity A/B
        // must not leave the handle forced to either mechanism for
        // whatever runs after it (r15 ADVICE — the block used to end on
        // setRouted(false))
        val tl0 = ivf.twoLevelMinCells
        try {
          setRouted(true)
          val routedPlans = ivf.probePlan(spark, queryVecs, 100, 128, None,
            exactFallback = true)
          setRouted(false)
          val flatPlans = ivf.probePlan(spark, queryVecs, 100, 128, None,
            exactFallback = true)
          results(s"parity_${tag}_value") =
            if (routedPlans == flatPlans) 1.0 else 0.0
        } finally { ivf.twoLevelMinCells = tl0; ivf.invalidateRouter() }
        graft.FsUtil.deleteRecursively(
          java.nio.file.Paths.get(s"$base/ivf_$tag"))
      }
    }

    val qs = results.map { case (k2, v) => "\"" + k2 + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"router_crossover","rows":$nRows,"dims":$dims,"queries":$qs}""")
    if (sys.env.get("SPARK_GRAFT_WORK_DIR").isEmpty)
      graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
