package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-lab for the profile figures' deterministic sample fetch
  * (Embedding.lowestIdRows): ProfileProbe r8 measured its FIRST call at
  * 32 s on tmpfs (4.5 s warm) — not device IO, so something in the plan
  * pays a large one-time cost. This times each candidate sub-shape
  * separately, first call then warm, to pin which operator carries it:
  *   a. the narrow id scan (orderBy + limit over one string column)
  *   b. the wide fetch: filter(id <= t) + select(cast vec) + orderBy + limit
  *   c. the wide fetch without the sort (filter + select + collect)
  *   d. the wide fetch without the cast (raw float array)
  *   e. limit-only (the no-idCol path for comparison)
  * Usage: sbt "runMain graft.tools.SampleFetchLab [nRows]"
  */
object SampleFetchLab {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val base = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
      "/dev/shm/graft_samplefetch_lab")
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
      println(f"[lab] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("writeIndexed") {
      graft.ProductWorkload.writeIndexed(spark, n, 2688, 32, path)
    }
    val df = spark.read.parquet(path)
    val embD = col("embedding").cast("array<double>")
    (1 to 2).foreach { rep =>
      val ids = t(s"a_id_scan rep$rep") {
        df.select(col("parent_asin")).orderBy(col("parent_asin")).limit(500)
          .collect().map(_.getString(0))
      }
      val tmax = ids.last
      t(s"b_fetch_sorted_cast rep$rep") {
        df.filter(col("parent_asin") <= lit(tmax))
          .select(embD, col("main_category").cast("string"))
          .orderBy(col("parent_asin")).limit(500).collect()
      }
      t(s"c_fetch_nosort_cast rep$rep") {
        df.filter(col("parent_asin") <= lit(tmax))
          .select(embD, col("main_category").cast("string")).collect()
      }
      t(s"d_fetch_sorted_nocast rep$rep") {
        df.filter(col("parent_asin") <= lit(tmax))
          .select(col("embedding"), col("main_category"))
          .orderBy(col("parent_asin")).limit(500).collect()
      }
      t(s"e_limit_only rep$rep") {
        df.select(embD, col("main_category").cast("string"))
          .filter(col("embedding").isNotNull).limit(500).collect()
      }
      // f/g: the pipeline_bench context's EXACT phase shapes — unlike a–e,
      // both phases carry filter(embedding.isNotNull), so the id scan
      // must decode the whole vector column just to test null-ness
      val fbase = df.filter(col("embedding").isNotNull)
        .filter(col("parent_asin").isNotNull)
      t(s"f_id_scan_nullfiltered rep$rep") {
        fbase.select(col("parent_asin")).orderBy(col("parent_asin"))
          .limit(500).collect()
      }
      t(s"g_fetch_nullfiltered rep$rep") {
        fbase.filter(col("parent_asin") <= lit(tmax))
          .select(embD, col("main_category").cast("string"))
          .orderBy(col("parent_asin")).limit(500).collect()
      }
    }
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
    spark.stop()
  }
}
