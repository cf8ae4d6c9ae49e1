package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf-iteration probe for the profile_pipeline bench entry: generates the
  * bench-shaped products table once (tmpfs by default, so the block
  * device's IO-budget state stays out of the measurement) and times
  * `Profile.profile` (non-vector stats) and `Profile.embeddingStats`
  * separately, twice each, so the cold/steady split and the vector/
  * non-vector split are both visible. Usage:
  *   sbt "runMain graft.tools.ProfileProbe [nRows]"
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val base = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
      s"/dev/shm/graft_profile_probe")
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val path = s"$base/products"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("writeIndexed") {
      graft.ProductWorkload.writeIndexed(spark, n, 2688, 32, path)
    }
    val df = spark.read.parquet(path)
    (1 to 2).foreach { rep =>
      t(s"profile_nonvec rep$rep") {
        graft.operators.Profile.profile(df.drop("embedding"))
      }
      t(s"embeddingStats rep$rep") {
        graft.operators.Profile.embeddingStats(df, "embedding")
      }
      // the layout-stats dual: mean/std from the precomputed emb_norm
      // column, payload untouched except a one-row dims probe
      t(s"embeddingStats_norm rep$rep") {
        graft.operators.Profile.embeddingStats(df, "embedding",
          Some("emb_norm"))
      }
      // SPARK_GRAFT_PROBE_NOCACHE=1 A/Bs the prune-then-pin cache
      val cache = !sys.env.contains("SPARK_GRAFT_PROBE_NOCACHE")
      t(s"pipeline rep$rep") {
        graft.operators.ProfilePipeline.run(spark,
          Seq("products" -> path), s"$base/reports",
          embeddingCol = Some("embedding"), normCol = Some("emb_norm"),
          cacheStats = cache)
      }
      // the bench entry's exact shape: label-colored projections over the
      // deterministic lowest-id sample — adds the id scan + pushed fetch
      // and the t-SNE/UMAP fits to the timing
      t(s"pipeline_bench rep$rep") {
        graft.operators.ProfilePipeline.run(spark,
          Seq("products" -> path), s"$base/reports_bench",
          embeddingCol = Some("embedding"),
          labelCol = Some("main_category"), idCol = Some("parent_asin"),
          normCol = Some("emb_norm"), cacheStats = cache)
      }
    }
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
    spark.stop()
  }
}
