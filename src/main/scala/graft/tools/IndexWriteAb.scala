package graft.tools

import graft.operators.VectorSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** index_build write-path A/B (r17 verdict task 7): one session, three
  * layouts of the same sf0.1-sized product table, each written once and
  * then read-probed with the bench's four selectivity tiers:
  *
  *   - `base`   — the shipped layout (4×cores salt, parquet defaults)
  *   - `page8m` — same salt, parquet.page.size 1 MB → 8 MB (the vector
  *                column's ~11 KB cells mean ~90 values/page at the
  *                default; bigger pages cut page-header/stats overhead)
  *   - `salt1x` — cores salt (fewer, larger files) — re-confirming the
  *                r2 adjudication that 4× wins the category-filtered
  *                read tiers (one file = one row group = one task)
  *
  * Writes ~1.4 GB each (3 total) — run mid-session, settle after.
  * Read probes are min-of-N top-k per tier (the read_sel contract shape).
  *
  * Env: SPARK_GRAFT_WRITEAB_ROWS (default sf0.1's 100000),
  * SPARK_GRAFT_REPS (read reps, default 3), SPARK_GRAFT_WORK_DIR.
  */
object IndexWriteAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_WRITEAB_ROWS", "100000").toLong
    val base = sys.env.get("SPARK_GRAFT_WORK_DIR").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_writeab").toString)
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$base/spark-local")
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val dims = 2688

    def writeVariant(tag: String, salt: Int,
        opts: Map[String, String]): String = {
      val path = s"$base/products_$tag"
      spark.sparkContext.setJobDescription(s"writeab write $tag")
      val t0 = System.nanoTime()
      val baseCols = graft.sources.ProductGen.baseColumns(
        spark.range(0, rows, 1, cpus).toDF("id"))
      val balanced = baseCols.repartition(salt * cpus, col("main_category"),
        graft.sources.ProductGen.categorySalt(col("id"), col("main_category"),
          salt * cpus))
      val w = graft.sources.ProductGen.withDerived(balanced, dims)
        .select(graft.sources.ProductGen.schema(dims).fieldNames
          .map(col).toIndexedSeq: _*)
        .withColumn("emb_norm", graft.functions.vec_norm(col("embedding")))
        .write.mode("overwrite").partitionBy("main_category")
      opts.foreach { case (k, v) => w.option(k, v) }
      w.parquet(path)
      results(s"write_${tag}") = (System.nanoTime() - t0) / 1e9
      results(s"files_${tag}_value") = {
        val d = new java.io.File(path)
        def count(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(count).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        count(d).toDouble
      }
      results(s"gb_${tag}_value") =
        graft.FsUtil.sizeBytes(java.nio.file.Paths.get(path)) / 1e9
      path
    }

    def readProbes(tag: String, path: String): Unit = {
      val products = spark.read.parquet(path)
      val queryVec = products.select(col("embedding")).head()
        .getSeq[Float](0).toArray
      graft.ProductWorkload.selPreds.foreach { case (name, pred) =>
        spark.sparkContext.setJobDescription(s"writeab read $tag $name")
        val walls = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          VectorSearch.topK(products, "embedding", queryVec, 100,
            Some(pred), projection = Seq("parent_asin")).collect()
          (System.nanoTime() - t0) / 1e9
        }
        results(s"${name}_${tag}") = walls.min
      }
    }

    val allVariants = Seq(
      ("base", 4, Map.empty[String, String]),
      ("page8m", 4, Map("parquet.page.size" -> (8 * 1024 * 1024).toString)),
      ("salt1x", 1, Map.empty[String, String]))
    // SPARK_GRAFT_WRITEAB_VARIANTS narrows (comma list of tags)
    val variants = sys.env.get("SPARK_GRAFT_WRITEAB_VARIANTS")
      .map(_.split(',').toSet)
      .map(sel => allVariants.filter(v => sel(v._1)))
      .getOrElse(allVariants)
    // untimed warmup write (2k rows): the first timed variant must not
    // carry the session's codegen/JIT cold start
    graft.sources.ProductGen.withDerived(
        graft.sources.ProductGen.baseColumns(
          spark.range(0, 2000, 1, cpus).toDF("id")), dims)
      .write.mode("overwrite").parquet(s"$base/warmup")
    // write all, then probe all (reads on a settled device, order-controlled)
    val paths = variants.map { case (tag, salt, opts) =>
      tag -> writeVariant(tag, salt, opts) }
    paths.foreach { case (tag, path) => readProbes(tag, path) }
    // second read round in reverse order (order-control for cache state)
    paths.reverse.foreach { case (tag, path) => readProbes(s"${tag}_r2", path) }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"index_write_ab","rows":$rows,"queries":$qs}""")
    if (sys.env.get("SPARK_GRAFT_WORK_DIR").isEmpty)
      graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
