package graft.tools

import graft.operators.VectorSearch
import graft.{GraftSession, ProductWorkload}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness for the IVF cell-routing question: which
  * probe ordering actually recovers the exact top-k on the product
  * embeddings at FINE cluster granularity (k ≈ √n), where the sf1 probe
  * measured the max-radius bound ranking 128 junk cells (few members,
  * outlier-driven radii) ahead of every cell holding a true hit?
  *
  * Candidate orderings, all driver-side over (centroids, per-cell stats):
  *   dot     raw q·c (r5 behavior)
  *   l2      assignment distance |q−c|
  *   bmax    q·c + r_max·|q|   (admissible bound, outlier-fragile)
  *   brms    q·c + r_rms·|q|   (RMS radius — robust-ish bound)
  *   cos     q·c / |c|         (normalized-centroid direction)
  *
  * Prints per-ordering recall at a sweep of nprobe plus cell-occupancy
  * diagnostics. Not part of the bench — a design probe; conclusions land
  * in VectorSearch scaladoc + SCALE.md.
  */
object ProbeOrderLab {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_LAB_ROWS", "100000").toLong
    val base = java.nio.file.Files.createTempDirectory("probe_lab").toString
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$base/spark-local")
    GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    val productsPath = s"$base/products"
    ProductWorkload.writeIndexed(spark, n, 2688, cpus.toInt, productsPath)
    val products = spark.read.parquet(productsPath)

    val t0 = System.nanoTime()
    val ivf = VectorSearch.buildIvf(products.select(col("parent_asin"),
      col("embedding")), "embedding", 0, s"$base/ivf")
    println(f"[lab] build ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      s"clusters=${ivf.centroids.length}")

    // per-cell stats from the index itself: occupancy + rms radius
    val idx = spark.read.parquet(s"$base/ivf")
    val cellStats = idx.select(col("__cluster"),
        graft.functions.nearest_centroid_dist(col("__vec"), ivf.centroids)
          .as("__d"))
      .groupBy("__cluster")
      .agg(count(lit(1)).as("n"), sum(col("__d")).as("s"), max(col("__d")).as("m"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val k = ivf.centroids.length
    val occ = (0 until k).map(c => cellStats.get(c).map(_._1).getOrElse(0L))
    println(s"[lab] occupancy: min=${occ.min} p50=${occ.sorted.apply(k / 2)} " +
      s"max=${occ.max} empty=${occ.count(_ == 0)} under10=${occ.count(_ < 10)}")

    def dotL(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }; s
    }
    val rMax = (0 until k).map(c =>
      math.sqrt(cellStats.get(c).map(_._3).getOrElse(0.0))).toArray
    val rRms = (0 until k).map { c =>
      cellStats.get(c).filter(_._1 > 0)
        .map(t => math.sqrt(t._2 / t._1)).getOrElse(0.0)
    }.toArray
    val cNorm = ivf.centroids.map(c => math.max(math.sqrt(dotL(c, c)), 1e-12))

    val queryVecs = products.select(col("embedding")).head(3)
      .map(_.getSeq[Float](0).toArray).toSeq
    // exact top-100 ids + their assigned cells (unfiltered — routing
    // quality is independent of the metadata predicate)
    val exact = VectorSearch.topKMulti(products, "embedding", queryVecs, 100,
        "parent_asin")
      .collect().groupBy(_.getInt(0))
      .map { case (q, rows) => q -> rows.map(_.getString(3)).toSet }
    val allIds = exact.values.flatten.toSet.toSeq
    val assign = products.filter(col("parent_asin").isin(allIds: _*))
      .select(col("parent_asin"),
        graft.functions.nearest_centroid(col("embedding"), ivf.centroids)
          .as("__c"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

    val orderings: Seq[(String, Array[Float] => Array[Int])] = Seq(
      "dot" -> (q => (0 until k).sortBy(c => -dotL(ivf.centroids(c), q)).toArray),
      "l2" -> (q => (0 until k).sortBy(c =>
        dotL(ivf.centroids(c), ivf.centroids(c)) - 2 * dotL(ivf.centroids(c), q)).toArray),
      "bmax" -> { q =>
        val qn = math.sqrt(dotL(q, q))
        (0 until k).sortBy(c => -(dotL(ivf.centroids(c), q) + rMax(c) * qn)).toArray
      },
      "brms" -> { q =>
        val qn = math.sqrt(dotL(q, q))
        (0 until k).sortBy(c => -(dotL(ivf.centroids(c), q) + rRms(c) * qn)).toArray
      },
      "cos" -> (q => (0 until k).sortBy(c => -dotL(ivf.centroids(c), q) / cNorm(c)).toArray))

    val nps = Seq(4, 8, 16, 32, 64, 128).filter(_ <= k)
    println(f"[lab] ${"order"}%-6s ${nps.map(np => f"np$np%-5d").mkString(" ")}  probedOcc@32")
    orderings.foreach { case (name, f) =>
      val orders = queryVecs.map(f)
      val recalls = nps.map { np =>
        queryVecs.indices.map { i =>
          val probed = orders(i).take(np).toSet
          val ex = exact(i)
          ex.count(id => probed(assign(id))).toDouble / ex.size
        }.sum / queryVecs.length
      }
      val probedOcc = queryVecs.indices.map { i =>
        orders(i).take(32).map(c => occ(c)).sum
      }.sum / queryVecs.length
      println(f"[lab] $name%-6s ${recalls.map(r => f"$r%.3f").mkString(" ")}  $probedOcc")
    }
    spark.stop()
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
