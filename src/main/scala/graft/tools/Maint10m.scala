package graft.tools

import graft.operators.VectorSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The maintenance lifecycle ON the real 10M × 2688 sq8 index (r17):
  * BENCH_maint1m measured delete/scrub/rebalance at 1M × 384 / 8k files;
  * the scale claim is "cost ∝ affected files", so this probe re-runs the
  * read-mostly slice of that lifecycle where files are 27.5 GB / 4096
  * cells — against an EXISTING index (SPARK_GRAFT_MAINT_INDEX), never a
  * fresh build:
  *
  *   0. cold-cache fresh-process serving: page cache dropped
  *      (`/proc/sys/vm/drop_caches`), load + unfiltered searchMulti at
  *      np128, with `/proc/self/io` read_bytes deltas — the out-of-cache
  *      serving number the PQ-regime question needs as its sq8 anchor.
  *   1. one-cell delete (the topic-purge shape): delete every id of the
  *      LARGEST cell — O(ids) tombstone write + the r17 per-cell count
  *      scan — then the tombstoned search (exclusion on the hot path,
  *      zero leaks) and the bounded scrub (rewrites ~1/4096 of files).
  *   2. skewed append (SPARK_GRAFT_MAINT_SKEW rows at 0.9·anchor, like
  *      BENCH_maint1m's burst) + rebalance(): hot-cell-bounded rewrite,
  *      max cell restored toward mean, recall at matched nprobe pinned
  *      against the FLOAT-exact baseline over the regenerated source
  *      (sq8 layouts have no float corpus on disk — IndexScale's
  *      convention).
  *
  * Emits one BENCH-style JSON line. Env: SPARK_GRAFT_MAINT_INDEX
  * (required), SPARK_GRAFT_MAINT_ROWS (default 10000000, the generator
  * row count the index was built from), SPARK_GRAFT_MAINT_DIMS (2688),
  * SPARK_GRAFT_MAINT_SKEW (200000). The index is MUTATED (rows deleted,
  * skew appended, cells split) — run after every read-only artifact
  * against it is done.
  */
object Maint10m {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
          System.err.println(s"[maint10m] $name FAILED: ${e.getMessage}")
          e.printStackTrace()
          results(name) = -1.0
          None
      }
    }
    def readBytes(): Long = {
      try {
        val src = scala.io.Source.fromFile("/proc/self/io")
        try src.getLines().collectFirst {
          case l if l.startsWith("read_bytes:") =>
            l.split(":")(1).trim.toLong
        }.getOrElse(-1L)
        finally src.close()
      } catch { case _: Exception => -1L }
    }
    def dropCaches(): Unit = {
      try {
        new ProcessBuilder("sh", "-c",
          "sync && echo 3 > /proc/sys/vm/drop_caches").start().waitFor()
        ()
      } catch { case e: Exception =>
        System.err.println(s"[maint10m] drop_caches failed: ${e.getMessage}")
      }
    }

    val idxPath = sys.env.getOrElse("SPARK_GRAFT_MAINT_INDEX",
      sys.error("SPARK_GRAFT_MAINT_INDEX required (an existing index)"))
    val nRows = sys.env.getOrElse("SPARK_GRAFT_MAINT_ROWS", "10000000").toLong
    val dims = sys.env.getOrElse("SPARK_GRAFT_MAINT_DIMS", "2688").toInt
    val skewN = sys.env.getOrElse("SPARK_GRAFT_MAINT_SKEW", "200000").toLong
    println(s"[maint10m] index=$idxPath rows=$nRows dims=$dims skew=$skewN")

    // ---- 0. cold-cache fresh-process serving (sq8 anchor for the PQ
    //         regime question) ----
    dropCaches()
    var ivf: VectorSearch.IvfIndex = null
    val rb0 = readBytes()
    timed("load_cold") { ivf = VectorSearch.IvfIndex.load(spark, idxPath) }
    require(ivf != null, "load failed")
    results("cells_value") = ivf.centroids.length.toDouble

    // FLOAT source regenerated (deterministic) — query vectors + exact
    // baselines, IndexScale's sq8 convention
    val source: DataFrame = {
      val baseCols = graft.sources.ProductGen.baseColumns(
        spark.range(0, nRows, 1, cpus.toInt).toDF("id"))
      graft.sources.ProductGen.withDerived(baseCols, dims)
        .select(col("parent_asin"), col("embedding"))
    }
    val queryVecs = source.select(col("embedding")).head(3)
      .map(_.getSeq[Float](0).toArray).toSeq
    def idSets(df: DataFrame): Map[Int, Set[String]] =
      df.collect().groupBy(_.getInt(0)).map { case (q, rows) =>
        q -> rows.map(_.getString(3)).toSet
      }
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

    val coldBefore = readBytes()
    val (coldWall, coldSets) = searchOnce(ivf, 128)
    results("search_cold_np128") = coldWall
    results("search_cold_gb_read_value") = (readBytes() - coldBefore) / 1e9
    results("load_cold_gb_read_value") = (coldBefore - rb0) / 1e9
    val w1 = searchOnce(ivf, 128); val w2 = searchOnce(ivf, 128)
    results("search_warm_np128") = math.min(w1._1, w2._1)
    require(w1._2 == coldSets, "cold and warm results must agree")
    val files0 = spark.read.parquet(idxPath).inputFiles.toSet
    results("files_value") = files0.size.toDouble

    // ---- 1. one-cell delete + tombstoned serving + bounded scrub ----
    val victimCell = ivf.cellCounts.zipWithIndex.maxBy(_._1)._2
    var cellIds: Seq[String] = Seq.empty
    timed("collect_cell_ids") {
      cellIds = spark.read.parquet(idxPath)
        .filter(col("__cluster") === victimCell)
        .select(col("parent_asin")).collect().map(_.getString(0)).toSeq
    }
    results("cell_delete_ids_value") = cellIds.size.toDouble
    timed("delete_cell") { ivf.delete(spark, "parent_asin", cellIds) }
    val t1 = searchOnce(ivf, 128); val t2 = searchOnce(ivf, 128)
    results("search_tombstoned_np128") = math.min(t1._1, t2._1)
    results("tombstone_leak_value") =
      t1._2.values.map(_.count(cellIds.toSet)).sum.toDouble
    timed("scrub_cell") { ivf.scrub(spark) }
    val filesAfter = spark.read.parquet(idxPath).inputFiles.toSet
    results("scrub_cell_files_frac_value") =
      (files0 -- filesAfter).size.toDouble / math.max(1, files0.size)
    val s1 = searchOnce(ivf, 128); val s2 = searchOnce(ivf, 128)
    results("search_scrubbed_np128") = math.min(s1._1, s2._1)
    // float-exact recall of the post-scrub index (source minus the cell)
    import spark.implicits._
    val deletedDf = cellIds.toDF("parent_asin")
    val exactDel = timed("exact_post_delete") {
      idSets(VectorSearch.topKMulti(
        source.join(broadcast(deletedDf), Seq("parent_asin"), "left_anti"),
        "embedding", queryVecs, 100, "parent_asin"))
    }
    exactDel.foreach { e =>
      results("scrubbed_recall_np128_value") = recallOf(e, s1._2)
    }

    // ---- 2. skewed append + rebalance ----
    val anchor = queryVecs.head
    val skewFloat = {
      val baseCols = graft.sources.ProductGen.baseColumns(
        spark.range(nRows, nRows + skewN, 1, cpus.toInt).toDF("id"))
      graft.sources.ProductGen.withDerived(baseCols, dims)
        .select(
          concat(lit("skew-"), col("parent_asin")).as("parent_asin"),
          zip_with(typedLit(anchor), col("embedding"),
            (a, b) => a * lit(0.9f) + b * lit(0.1f)).as("embedding"))
    }
    timed("append_skew") { ivf.append(skewFloat, "embedding") }
    results("maxcell_pre_value") = ivf.cellCounts.max.toDouble
    results("meancell_value") = ivf.cellCounts.sum.toDouble /
      math.max(1, ivf.centroids.length)
    val exactNow = timed("exact_post_append") {
      idSets(VectorSearch.topKMulti(
        source.join(broadcast(deletedDf), Seq("parent_asin"), "left_anti")
          .unionByName(skewFloat),
        "embedding", queryVecs, 100, "parent_asin"))
    }
    Seq(64, 128).foreach { np =>
      val (w, sets) = searchOnce(ivf, np)
      results(s"pre_rebal_np${np}_wall") = w
      exactNow.foreach { e =>
        results(s"pre_rebal_np${np}_recall_value") = recallOf(e, sets)
      }
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
    Seq(64, 128).foreach { np =>
      val (w, sets) = searchOnce(fresh, np)
      results(s"post_rebal_np${np}_wall") = w
      exactNow.foreach { e =>
        results(s"post_rebal_np${np}_recall_value") = recallOf(e, sets)
      }
    }
    timed("load_post") {
      val loaded = VectorSearch.IvfIndex.load(spark, idxPath)
      require(loaded.centroids.length == fresh.centroids.length,
        "fresh load must see the grown centroid table")
    }
    results("rows_post_value") = fresh.cellCounts.sum.toDouble

    val json = results.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"maint_10m","rows":$nRows,"dims":$dims,""" +
      s""""queries":{$json},"sf":"synthetic"}""")
    spark.stop()
  }
}
