package graft.tools

import graft.operators.VectorSearch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired same-session A/B for the r18 `ann_recall_filtered_eval`
  * batching (r17 verdict task 4): the bench's exact baselines ran one
  * `topKMulti` scan PER TIER (4 scans of the cached eval projection, the
  * shared rows' 2688-dim dots re-scored per tier); `topKMultiTiered`
  * fuses them into ONE scan. This tool builds the bench-shaped products
  * index ONCE, then alternates the r17 per-tier shape and the r18 fused
  * shape — the FULL timed entry body both times (persist, head(3), exact
  * baselines, nprobe ladder, unpersist), exactly as Bench times it — and
  * asserts the recall/nprobe outputs are identical.
  *
  * Env: SPARK_GRAFT_REPS (default 3 pairs), SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_WORK_DIR.
  */
object EvalAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = sys.env.get("SPARK_GRAFT_WORK_DIR").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_evalab").toString)
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$base/spark-local")
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)

    // bench-identical products table (same generator, layout, scale rule)
    val sfFraction = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).toDouble).getOrElse(0.1)
    val nProducts = math.max(10000L, (1000000 * sfFraction).toLong)
    val dims = 2688
    val productsPath = s"$base/products"
    graft.ProductWorkload.writeIndexed(spark, nProducts, dims, cpus.toInt,
      productsPath)
    val products = spark.read.parquet(productsPath)
    val selPreds = graft.ProductWorkload.selPreds
    val pivf = VectorSearch.buildIvf(
      products.select(col("parent_asin"), col("average_rating"),
        col("rating_number"), col("main_category"), col("embedding")),
      "embedding", 16, s"$base/ivf_products", sampleFraction = 0.1,
      occupancyCols = Seq("main_category"))

    def idSets(df: DataFrame): Map[Int, Set[String]] =
      df.collect().groupBy(_.getInt(0)).map { case (q, rows) =>
        q -> rows.map(_.getString(3)).toSet
      }

    // the full entry body; `fused` picks the exact-baseline shape and
    // `cache` whether the projection is persisted (with ONE fused exact
    // scan the cache serves a single full pass — materializing it is a
    // candidate net loss)
    def evalOnce(fused: Boolean, cache: Boolean = true): Seq[(String, Double, Int)] = {
      val evalCols0 = products.select(col("parent_asin"),
          col("average_rating"), col("rating_number"),
          col("main_category"), col("embedding"))
      val evalCols =
        if (cache) evalCols0.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else evalCols0
      val queryVecs = evalCols.select(col("embedding")).head(3)
        .map(_.getSeq[Float](0).toArray).toSeq
      val exactByTier: Int => Map[Int, Set[String]] =
        if (!fused) { t: Int =>
          idSets(VectorSearch.topKMulti(
            evalCols, "embedding", queryVecs, 100, "parent_asin",
            Some(selPreds(t)._2)))
        } else {
          val all = VectorSearch.topKMultiTiered(evalCols, "embedding",
              queryVecs, 100, "parent_asin", selPreds.map(_._2))
            .collect().groupBy(_.getInt(0)).map { case (t, rows) =>
              t -> rows.groupBy(_.getInt(1)).map { case (q, rs) =>
                q -> rs.map(_.getString(4)).toSet }
            }
          t: Int => all.getOrElse(t, Map.empty)
        }
      val out = selPreds.zipWithIndex.map { case ((selName, pred), t) =>
        val exactSets = exactByTier(t)
        var rec = 0.0
        var np = 0
        val nprobes = Iterator(4, 8, 16)
        while (rec < 0.9 && nprobes.hasNext) {
          np = nprobes.next()
          val approxSets = idSets(pivf.searchMulti(
            spark, queryVecs, 100, nprobe = np, "parent_asin", Some(pred)))
          rec = queryVecs.indices.map { i =>
            val exact = exactSets.getOrElse(i, Set.empty)
            if (exact.isEmpty) 1.0
            else exact.intersect(approxSets.getOrElse(i, Set.empty))
              .size.toDouble / exact.size
          }.sum / queryVecs.length
        }
        (selName, rec, np)
      }
      if (cache) evalCols.unpersist(blocking = false)
      out
    }

    evalOnce(fused = true) // warm codegen/readers once
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val modes = Seq(
      ("pertier", () => evalOnce(fused = false)),
      ("fused", () => evalOnce(fused = true)),
      ("fused_nocache", () => evalOnce(fused = true, cache = false)))
    var outs = Map.empty[String, Seq[(String, Double, Int)]]
    (1 to reps).foreach { r =>
      modes.foreach { case (tag, run) =>
        spark.sparkContext.setJobDescription(s"evalab $tag rep$r")
        val t0 = System.nanoTime()
        val out = run()
        val w = (System.nanoTime() - t0) / 1e9
        outs += tag -> out
        val key = s"eval_${tag}_rep${r}_value"
        results(key) = w
        println(f"[evalab] $key = $w%.3f s  out=$out")
      }
      require(outs.values.toSeq.distinct.size == 1,
        s"recall/nprobe outputs differ: $outs")
    }
    println("[evalab] outputs identical across modes: " + outs("fused"))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"eval_ab","queries":$qs}""")
    if (sys.env.get("SPARK_GRAFT_WORK_DIR").isEmpty)
      graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
