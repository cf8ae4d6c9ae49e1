package graft.tools

import graft.{GraftSession, ProductWorkload}
import graft.operators.VectorSearch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** Scratch profiling harness for the read_sel tier latency budget: builds
  * the sf0.1 product table once, then times each selectivity tier repeatedly
  * and reports the scan-side task/file shape (files per category, tasks per
  * tier, rows passing the filter) so the dominant cost — decode parallelism
  * vs per-row scoring — is visible.
  */
object ReadSelProfile {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
    GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    spark.range(1000).select(sum(col("id"))).collect()

    val base = java.nio.file.Files.createTempDirectory("graft_rsel").toString
    val path = s"$base/products"
    val dims = 2688
    val t0 = System.nanoTime()
    ProductWorkload.writeIndexed(spark, 100000L, dims, 32, path)
    println(f"[rsel] index_build: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // file shape per category partition
    val root = new java.io.File(path)
    root.listFiles().filter(_.isDirectory).foreach { d =>
      val fs = d.listFiles().filter(_.getName.endsWith(".parquet"))
      println(f"[rsel] ${d.getName}: ${fs.length} files, " +
        f"${fs.map(_.length()).sum / 1e6}%.1f MB")
    }

    val products = spark.read.parquet(path)
    val queryVec =
      products.select(col("embedding")).head().getSeq[Float](0).toArray

    def tier(name: String, pred: Column): Unit = {
      // rows passing
      val n = products.filter(pred).count()
      (1 to 3).foreach { r =>
        val t = System.nanoTime()
        VectorSearch.topK(products, "embedding", queryVec, 100, Some(pred),
          projection = Seq("parent_asin")).collect()
        println(f"[rsel] $name rep$r: ${(System.nanoTime() - t) / 1e9}%.2f s " +
          s"(rows passing $n)")
      }
    }
    ProductWorkload.selPreds.foreach { case (n, p) => tier(n, p) }

    // explain the widest tier
    VectorSearch.topK(products, "embedding", queryVec, 100,
      Some(ProductWorkload.selPreds.last._2), projection = Seq("parent_asin"))
      .explain("formatted")

    spark.stop()
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
