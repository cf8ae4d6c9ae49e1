package graft

import graft.operators.VectorSearch
import graft.sources.ProductGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Phase-level profiling of the heavy bench entries (not part of the driver
  * contract): generates the same product table Bench uses, then times each
  * phase of the IVF build and the bucketed-store init separately so perf
  * work targets the real bottleneck instead of the aggregate number.
  */
object BenchProbe {
  private def t(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
    GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    val dims = 2688
    val n = 100000L
    val base = java.nio.file.Files.createTempDirectory("graft_probe").toString
    val productsPath = s"$base/products"

    t("gen_products") {
      val baseCols = ProductGen.baseColumns(spark.range(0, n, 1, 32).toDF("id"))
      val balanced = baseCols.repartition(32, col("main_category"),
        ProductGen.categorySalt(col("id"), col("main_category"), 32))
      ProductGen.withDerived(balanced, dims)
        .select(ProductGen.schema(dims).fieldNames.map(col).toIndexedSeq: _*)
        .write.mode("overwrite").partitionBy("main_category").parquet(productsPath)
    }
    val products = spark.read.parquet(productsPath)
      .select(col("parent_asin"), col("average_rating"),
        col("rating_number"), col("main_category"), col("embedding"))

    // --- IVF build phases ---
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    var model: org.apache.spark.ml.clustering.KMeansModel = null
    t("kmeans_fit_sample01") {
      val trainDf = products.sample(withReplacement = false, 0.1, 42L)
        .select(array_to_vector(col("embedding").cast("array<double>")).as("__mlvec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      model = new KMeans().setK(16).setSeed(42L).setFeaturesCol("__mlvec")
        .setPredictionCol("__cluster").setMaxIter(10).fit(trainDf)
      trainDf.unpersist(blocking = false)
    }
    t("kmeans_fit_random_init") {
      val trainDf = products.sample(withReplacement = false, 0.1, 42L)
        .select(array_to_vector(col("embedding").cast("array<double>")).as("__mlvec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      model = new KMeans().setK(16).setSeed(42L).setFeaturesCol("__mlvec")
        .setPredictionCol("__cluster").setMaxIter(10)
        .setInitMode("random").fit(trainDf)
      trainDf.unpersist(blocking = false)
    }
    t("kmeans_fit_random_5k_iter5") {
      val trainDf = products.sample(withReplacement = false, 0.05, 42L)
        .select(array_to_vector(col("embedding").cast("array<double>")).as("__mlvec"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      model = new KMeans().setK(16).setSeed(42L).setFeaturesCol("__mlvec")
        .setPredictionCol("__cluster").setMaxIter(5)
        .setInitMode("random").fit(trainDf)
      trainDf.unpersist(blocking = false)
    }
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    t("assign_only") {
      products.withColumn("__cluster",
          graft.functions.nearest_centroid(col("embedding"), centroids))
        .write.mode("overwrite").format("noop").save()
    }
    t("assign_repartition_write") {
      products.withColumn("__cluster",
          graft.functions.nearest_centroid(col("embedding"), centroids))
        .withColumnRenamed("embedding", "__vec")
        .repartition(col("__cluster"))
        .write.mode("overwrite").partitionBy("__cluster").parquet(s"$base/ivf_a")
    }
    t("assign_sortwithin_write") {
      products.withColumn("__cluster",
          graft.functions.nearest_centroid(col("embedding"), centroids))
        .withColumnRenamed("embedding", "__vec")
        .sortWithinPartitions(col("__cluster"))
        .write.mode("overwrite").partitionBy("__cluster").parquet(s"$base/ivf_b")
    }

    t("assign_sortwithin_write_uncompressed") {
      products.withColumn("__cluster",
          graft.functions.nearest_centroid(col("embedding"), centroids))
        .withColumnRenamed("embedding", "__vec")
        .sortWithinPartitions(col("__cluster"))
        .write.mode("overwrite").option("compression", "uncompressed")
        .partitionBy("__cluster").parquet(s"$base/ivf_c")
    }
    t("assign_sortwithin_write_zstd") {
      products.withColumn("__cluster",
          graft.functions.nearest_centroid(col("embedding"), centroids))
        .withColumnRenamed("embedding", "__vec")
        .sortWithinPartitions(col("__cluster"))
        .write.mode("overwrite").option("compression", "zstd")
        .partitionBy("__cluster").parquet(s"$base/ivf_d")
    }

    t("buildIvf_current_end_to_end") {
      VectorSearch.buildIvf(products, "embedding", 16, s"$base/ivf_now",
        sampleFraction = 0.1)
    }

    // --- store init ---
    t("store_init") {
      new graft.streaming.BucketedStore(s"$base/store", nBuckets = 64)
        .initialize(spark.read.parquet(productsPath), "parent_asin")
    }

    spark.stop()
    FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
