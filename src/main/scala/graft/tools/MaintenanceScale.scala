package graft.tools

import graft.operators.VectorSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-maintenance lifecycle at scale (r16): measures the three
  * maintenance operators — tombstone [[VectorSearch.IvfIndex.delete]],
  * physical [[VectorSearch.IvfIndex.scrub]], and hot-cell
  * [[VectorSearch.IvfIndex.rebalance]] — on a real on-disk index at the
  * 1M × 384 workload shape (≈1.5 GB, 256 cells), in the order an
  * operator would hit them:
  *
  *   1. scattered deletes (1% of ids, uniform): the worst scrub case —
  *      every file holds a tombstoned row, so the rewrite is
  *      corpus-sized; the tombstone exclusion itself must stay ~free on
  *      the serving path (search A/B before/after delete).
  *   2. clustered deletes (one cell's ids): the bounded case the
  *      delete→scrub design is FOR — the scrub rewrites ~1/256 of the
  *      files (`scrub_cell_files_frac_value` pins it).
  *   3. a skewed append (20% of the corpus at one point) followed by
  *      rebalance(): cell count grows by the split, the max cell
  *      shrinks to ~mean, rewrite cost ∝ the hot cell only
  *      (`rebalance_files_frac_value`), and the nprobe ladder
  *      before/after shows what the split buys the probe.
  *
  * Emits one BENCH-style JSON line. Env: SPARK_GRAFT_MAINT_ROWS
  * (default 1000000), SPARK_GRAFT_MAINT_DIMS (384),
  * SPARK_GRAFT_MAINT_CELLS (256), SPARK_GRAFT_WORK_DIR.
  */
object MaintenanceScale {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.get("SPARK_GRAFT_WORK_DIR").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_maint").toString)
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

    def timed[T](name: String)(f: => T): Option[T] = {
      val t0 = System.nanoTime()
      try {
        val r = f
        results(name) = (System.nanoTime() - t0) / 1e9
        Some(r)
      } catch {
        case e: Throwable =>
          System.err.println(s"[maint] $name FAILED: ${e.getMessage}")
          e.printStackTrace()
          results(name) = -1.0
          None
      }
    }

    val nRows = sys.env.getOrElse("SPARK_GRAFT_MAINT_ROWS", "1000000").toLong
    val dims = sys.env.getOrElse("SPARK_GRAFT_MAINT_DIMS", "384").toInt
    val cells = sys.env.getOrElse("SPARK_GRAFT_MAINT_CELLS", "256").toInt
    val idxPath = s"$base/ivf_maint"

    val source: DataFrame = {
      val baseCols = graft.sources.ProductGen.baseColumns(
        spark.range(0, nRows, 1, cpus.toInt).toDF("id"))
      graft.sources.ProductGen.withDerived(baseCols, dims)
        .select(col("parent_asin"), col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    source.count()

    var ivf: VectorSearch.IvfIndex = null
    timed("build") {
      ivf = VectorSearch.buildIvf(source, "embedding", cells, idxPath,
        sampleFraction = 1.0)
    }
    require(ivf != null, "build failed")
    results("cells_value") = ivf.centroids.length.toDouble
    val files0 = spark.read.parquet(idxPath).inputFiles.toSet
    results("files_value") = files0.size.toDouble

    val queryVecs = source.select(col("embedding")).head(3)
      .map(_.getSeq[Float](0).toArray).toSeq
    def idSets(df: DataFrame): Map[Int, Set[String]] =
      df.collect().groupBy(_.getInt(0)).map { case (q, rows) =>
        q -> rows.map(_.getString(3)).toSet
      }
    def exactSets(excluded: Set[String]): Map[Int, Set[String]] =
      idSets(VectorSearch.topKMulti(
        spark.read.parquet(idxPath)
          .filter(if (excluded.isEmpty) lit(true)
            else !col("parent_asin").isin(excluded.toSeq: _*)),
        "__vec", queryVecs, 100, "parent_asin"))
    def recallOf(exact: Map[Int, Set[String]],
        approx: Map[Int, Set[String]]): Double =
      queryVecs.indices.map { i =>
        val e = exact.getOrElse(i, Set.empty)
        if (e.isEmpty) 1.0
        else e.intersect(approx.getOrElse(i, Set.empty)).size.toDouble /
          e.size
      }.sum / queryVecs.length
    def searchOnce(handle: VectorSearch.IvfIndex, np: Int)
        : (Double, Map[Int, Set[String]]) = {
      val t0 = System.nanoTime()
      val sets = idSets(handle.searchMulti(spark, queryVecs, 100,
        nprobe = np, "parent_asin"))
      ((System.nanoTime() - t0) / 1e9, sets)
    }

    // ---- baseline serving wall (warm + min-of-2) ----
    searchOnce(ivf, 32)
    val b1 = searchOnce(ivf, 32); val b2 = searchOnce(ivf, 32)
    results("search_base_np32") = math.min(b1._1, b2._1)

    // ---- 1. scattered deletes: 1% of ids, uniform over the id space ----
    val allIds = source.select(col("parent_asin")).collect()
      .map(_.getString(0))
    val scattered = allIds.zipWithIndex.collect {
      case (id, i) if i % 100 == 7 => id
    }.toSeq
    timed("delete_scattered") {
      ivf.delete(spark, "parent_asin", scattered)
    }
    val exactDel = exactSets(scattered.toSet)
    searchOnce(ivf, 32)
    val d1 = searchOnce(ivf, 32); val d2 = searchOnce(ivf, 32)
    results("search_tombstoned_np32") = math.min(d1._1, d2._1)
    results("tombstone_recall_value") = recallOf(exactDel, d1._2)
    results("tombstone_leak_value") =
      d1._2.values.map(_.count(scattered.toSet)).sum.toDouble
    timed("scrub_scattered") { ivf.scrub(spark) }
    val filesAfterScatter = spark.read.parquet(idxPath).inputFiles
    results("scrub_scattered_files_frac_value") =
      (files0 -- filesAfterScatter.toSet).size.toDouble /
        math.max(1, files0.size)
    results("rows_after_scatter_value") =
      spark.read.parquet(idxPath).count().toDouble
    val s1 = searchOnce(ivf, 32); val s2 = searchOnce(ivf, 32)
    results("search_scrubbed_np32") = math.min(s1._1, s2._1)
    results("scrubbed_recall_value") = recallOf(exactDel, s1._2)

    // ---- 2. clustered deletes: one cell's ids — the bounded scrub ----
    val victimCell = ivf.cellCounts.zipWithIndex.maxBy(_._1)._2
    val cellIds = spark.read.parquet(idxPath)
      .filter(col("__cluster") === victimCell)
      .select(col("parent_asin")).collect().map(_.getString(0)).toSeq
    results("cell_delete_ids_value") = cellIds.size.toDouble
    timed("delete_cell") { ivf.delete(spark, "parent_asin", cellIds) }
    val preFiles = filesAfterScatter.toSet
    timed("scrub_cell") { ivf.scrub(spark) }
    val postFiles = spark.read.parquet(idxPath).inputFiles.toSet
    results("scrub_cell_files_frac_value") =
      (preFiles -- postFiles).size.toDouble / math.max(1, preFiles.size)
    val exactDel2 = exactSets((scattered ++ cellIds).toSet)
    val c1 = searchOnce(ivf, 32)
    results("cell_scrubbed_recall_value") = recallOf(exactDel2, c1._2)

    // ---- 3. skewed append + rebalance ----
    // tight DISTINCT points around one anchor (0.9·anchor + 0.1·noise):
    // they pile into one cell like a real hot-topic crawl burst, but
    // stay spatially divisible — identical copies would pin the cell
    // unsplittable (and unsplittable-by-content is also unsplittable-
    // by-any-index: reading that cell IS reading the answer)
    val skewN = nRows / 5
    val anchor = queryVecs.head
    val noise = graft.sources.ProductGen.withDerived(
      graft.sources.ProductGen.baseColumns(
        spark.range(nRows, nRows + skewN, 1, cpus.toInt).toDF("id")), dims)
      .select(col("parent_asin"), col("embedding"))
    val batch = noise.select(
      concat(lit("skew-"), col("parent_asin")).as("parent_asin"),
      zip_with(typedLit(anchor), col("embedding"),
        (a, b) => a * lit(0.9f) + b * lit(0.1f)).as("embedding"))
    timed("append_skew") { ivf.append(batch, "embedding") }
    results("maxcell_pre_value") = ivf.cellCounts.max.toDouble
    val exactNow = exactSets(Set.empty)
    Seq(4, 16, 64).foreach { np =>
      val (w, sets) = searchOnce(ivf, np)
      results(s"pre_rebal_np${np}_wall") = w
      results(s"pre_rebal_np${np}_recall_value") = recallOf(exactNow, sets)
    }
    val filesPre = spark.read.parquet(idxPath).inputFiles.toSet
    var fresh: VectorSearch.IvfIndex = null
    timed("rebalance") { fresh = ivf.rebalance(spark) }
    require(fresh != null, "rebalance failed")
    results("cells_post_value") = fresh.centroids.length.toDouble
    results("maxcell_post_value") = fresh.cellCounts.max.toDouble
    val filesPost = spark.read.parquet(idxPath).inputFiles.toSet
    results("rebalance_files_frac_value") =
      (filesPre -- filesPost).size.toDouble / math.max(1, filesPre.size)
    results("rows_post_value") =
      spark.read.parquet(idxPath).count().toDouble
    Seq(4, 16, 64).foreach { np =>
      val (w, sets) = searchOnce(fresh, np)
      results(s"post_rebal_np${np}_wall") = w
      results(s"post_rebal_np${np}_recall_value") = recallOf(exactNow, sets)
    }
    // fresh-process serving of the rebalanced index
    timed("load_post") {
      val loaded = VectorSearch.IvfIndex.load(spark, idxPath)
      require(loaded.centroids.length == fresh.centroids.length)
    }

    val json = results.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"maintenance_scale","rows":$nRows,"dims":$dims,""" +
      s""""queries":{$json},"sf":"synthetic"}""")
    spark.stop()
    // sibling-tool convention: only self-created temp dirs are cleaned;
    // a user-supplied WORK_DIR (possibly a shared scratch root) is not
    // ours to delete
    if (sys.env.get("SPARK_GRAFT_WORK_DIR").isEmpty)
      graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
