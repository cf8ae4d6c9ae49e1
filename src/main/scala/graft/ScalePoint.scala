package graft

import graft.operators.{Dedup, VectorSearch}
import graft.sources.ProductGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One ON-DISK sf1 scale point: generates the product table at 1M rows
  * (10× the per-round bench's sf0.1 workload, ~14 GB parquet), runs the
  * read-side workload entries against it — the four selectivity-tier
  * top-k reads, the full profile pipeline — plus the near-dup pipeline
  * over a 10× replicated documents table, and prints one JSON line. Each
  * entry's ratio vs the same entry at sf0.1 goes into SCALE.md: ≈10× (or
  * less) means the operator's cost is linear in rows and survives the
  * 100 TB extrapolation; the single bulk write (index_build) doubles as
  * the proportional "<2 hrs @ 10M rows" index-build anchor at 1/10 scale.
  *
  * This is deliberately a ONE-OFF probe, not part of the per-round bench:
  * the 14 GB write is a real bite out of this VM's burst IO budget, so it
  * runs once, early in a session, and the artifact is committed to
  * SCALE.md rather than re-measured every round.
  */
object ScalePoint {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.get("SPARK_GRAFT_WORK_DIR").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_sf1").toString)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$base/spark-local")
    GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    spark.range(1000).select(sum(col("id"))).collect()

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try {
        f
        results(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[scalepoint] $name FAILED: ${e.getMessage}")
          results(name) = -1.0
      }
    }

    val nProducts = 1000000L
    val dims = 2688
    val productsPath = s"$base/products_sf1"

    // identical layout rules to Bench.index_build — by construction: both
    // call ProductWorkload.writeIndexed, so the ratio isolates data
    // volume, not plan shape
    timed("index_build") {
      ProductWorkload.writeIndexed(spark, nProducts, dims, cpus.toInt,
        productsPath)
    }

    val products = spark.read.parquet(productsPath)
    try { new ProcessBuilder("sync").start().waitFor(); () }
    catch { case _: Throwable => () }
    Thread.sleep(15000) // drain the 14 GB writeback before the read tiers

    val queryVec = products.select(col("embedding")).head().getSeq[Float](0).toArray
    def topk(filter: Column): DataFrame =
      VectorSearch.topK(products, "embedding", queryVec, 100,
        Some(filter), projection = Seq("parent_asin"))
    ProductWorkload.selPreds.foreach { case (name, pred) =>
      timed(name) { topk(pred).collect() }
    }

    timed("profile_pipeline") {
      graft.operators.ProfilePipeline.run(spark,
        Seq("products" -> productsPath), s"$base/reports",
        embeddingCol = Some("embedding"), idCol = Some("parent_asin"))
    }

    // documents at 10× sf0.1 with fresh ids, ON DISK, so the near-dup
    // pipeline reads real parquet at the scaled size
    val docsPath = s"$base/documents_10x"
    timed("documents_10x_write") {
      val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      docs.select(explode(sequence(lit(0L), lit(9L))).as("__k"), col("doc_id"),
          col("text"), col("lang"))
        .select((col("doc_id") + col("__k") * 100000000L).as("doc_id"),
          col("text"), col("lang"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(docsPath)
    }
    timed("near_dup_pipeline") {
      Dedup.nearDuplicatePairs(spark.read.parquet(docsPath), "text", "doc_id",
        threshold = 0.5)
        .write.mode("overwrite").format("noop").save()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"scale_point_sf1","rows":$nProducts,"queries":$qs}""")
    if (sys.env.get("SPARK_GRAFT_WORK_DIR").isEmpty)
      FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
