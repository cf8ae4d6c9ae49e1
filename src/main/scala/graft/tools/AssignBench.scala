package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r9 two-level IVF ASSIGNMENT kernel against the flat one
  * at the cell counts where it engages (k ≥
  * `VectorSearch.twoLevelAssignMinCells`): per-row cost drops from k·d
  * to ~(1+probes)·√k·d mul-adds — the factor that keeps the index build
  * sub-quadratic under the √n cell-sizing rule (flat assignment at the
  * reference's 10M tier is ~8.5e13 mul-adds, the one super-linear cost
  * in the whole index path).
  *
  * Fixture: hub-structured vectors (large real centroid tables are
  * hub-structured by construction — they come from KMeans over
  * clustered data). Reports, per k: steady-state wall time of a full
  * assignment pass through each kernel (same cached input, warm-up pass
  * first), the disagreement fraction, and the mean/max inflation of the
  * chosen-cell distance over the true nearest distance — the
  * recall-relevant quality number (a mis-assigned row sits in a cell
  * whose centroid is nearly as close, so probe rankings still reach
  * it). All in-memory; no index writes; CPU-bound.
  */
object AssignBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("assign-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    import spark.implicits._

    val dims = 384
    val n = 200000
    val rnd = new scala.util.Random(42)

    // ONE hub set shared by data and centroids: in a real build the
    // centroids are KMeans-fit to the data, so rows sit close to their
    // centroid and assignment boundaries are meaningful. Centroids
    // jitter the hubs (k/256 fine cells per hub), data jitters the same
    // hubs — the geometry a trained large-k table actually has. (An
    // earlier fixture drew data hubs independently of centroid hubs;
    // every row then saw hundreds of near-equidistant cells and the
    // "miss" rate measured tie-breaking noise, not assignment quality —
    // meanDistInfl stayed ≈1.02 precisely because the ties were real.)
    val nHubs = 256
    val hubs = Array.fill(nHubs)(Array.fill(dims)(rnd.nextFloat() * 20 - 10))
    def mkCentroids(k: Int): Array[Array[Float]] = {
      val r = new scala.util.Random(1000 + k)
      Array.tabulate(k)(f => hubs(f % nHubs).map(v => v + r.nextFloat() * 2 - 1))
    }

    val hubsB = spark.sparkContext.broadcast(hubs)
    val df = spark.range(0, n, 1, 32).mapPartitions { it =>
      val hs = hubsB.value
      it.map { i =>
        val r = new scala.util.Random(i)
        hs(r.nextInt(hs.length)).map(v => v + r.nextFloat() * 2 - 1)
      }
    }.toDF("v").persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    df.count()

    // cap-scale rows (k = 65536) measure on a 20k-row slice: the flat
    // side alone is 5·10¹¹ mul-adds per pass there — the point being
    // demonstrated — and per-row cost is what the table reports
    val dfSmall = df.limit(20000).repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    dfSmall.count()

    def timePassOn(in: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.Column): Double = {
      in.select(sum(c.cast("long"))).collect() // warm-up (codegen + JIT)
      val reps = 3
      (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        in.select(sum(c.cast("long"))).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    Seq(512, 1024, 4096, 8192, 65536).foreach { k =>
      val rows = if (k >= 65536) dfSmall else df
      val nRows = if (k >= 65536) 20000 else n
      def timePass(c: org.apache.spark.sql.Column): Double =
        timePassOn(rows, c)
      val cents = mkCentroids(k)
      val flatCol = graft.functions.nearest_centroid($"v", cents)
      // build the grouping the engine would use (assignKernels' rule,
      // forced two-level regardless of k so the 1024 row is measurable)
      val grouped = graft.operators.VectorSearch.forcedGroupedKernels(cents)
      val tFlat = timePass(flatCol)
      val tGrp = timePass(grouped._1($"v"))
      val q = rows.select(
          flatCol.as("f"), grouped._1($"v").as("g"),
          graft.functions.nearest_centroid_dist($"v", cents).as("fd"),
          grouped._2($"v").as("gd"))
        .agg(
          sum(when($"f" =!= $"g", 1L).otherwise(0L)).as("miss"),
          avg(when($"fd" > 0, $"gd" / $"fd").otherwise(1.0)).as("meanInfl"),
          max(when($"fd" > 0, $"gd" / $"fd").otherwise(1.0)).as("maxInfl"))
        .head()
      val sizes = graft.operators.VectorSearch.assignGroupingSizes(cents)
        .sorted.reverse
      println(f"[assign] k=$k%5d rows=$nRows%6d flat=${tFlat}%6.2f s " +
        f"grouped=${tGrp}%6.2f s " +
        f"speedup=${tFlat / tGrp}%5.2f× miss=${q.getLong(0).toDouble / nRows}%8.6f " +
        f"meanDistInfl=${q.getDouble(1)}%8.6f maxDistInfl=${q.getDouble(2)}%6.3f " +
        f"groups=${sizes.length} maxGrp=${sizes.head} top4=${sizes.take(4).sum}")
    }

    // SPARK_GRAFT_ASSIGN_SECTIONS=kernels skips the e2e build (its
    // KMeans fit is ~4 min — the kernel table re-measures in ~2)
    if (sys.env.getOrElse("SPARK_GRAFT_ASSIGN_SECTIONS", "all") != "kernels") {
    // ---- end-to-end: a REAL buildIvf at the engagement threshold ----
    // 4096 explicit cells over the same 200k rows: assignment, the
    // stats/radii pass, and (via one append) the fold-in all run the
    // grouped kernel — then searches on the grouped-assigned index are
    // recall-checked against exact brute force. This is the engagement
    // proof the kernel specs can't give (they pin the kernel, not the
    // built artifact).
    val dfId = df.withColumn("id", monotonically_increasing_id().cast("string"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    dfId.count()
    val dir = java.nio.file.Files.createTempDirectory("assign_e2e").toString
    val t0 = System.nanoTime()
    val idx = graft.operators.VectorSearch.buildIvf(
      dfId.select($"id", $"v"), "v", 4096, s"$dir/ivf")
    val tBuild = (System.nanoTime() - t0) / 1e9
    val queryVecs = dfId.orderBy("id").select($"v").head(3)
      .map(_.getSeq[Float](0).toArray).toSeq
    def sets(rows: Array[org.apache.spark.sql.Row]): Map[Int, Set[String]] =
      rows.groupBy(_.getInt(0)).map { case (qi, rs) =>
        qi -> rs.map(_.getString(3)).toSet
      }
    val exact = sets(graft.operators.VectorSearch.topKMulti(
      dfId, "v", queryVecs, 100, "id").collect())
    Seq(32, 64).foreach { np =>
      val approx = sets(idx.searchMulti(spark, queryVecs, 100, nprobe = np,
        "id").collect())
      val rec = queryVecs.indices.map { i =>
        val e = exact.getOrElse(i, Set.empty)
        if (e.isEmpty) 1.0
        else e.intersect(approx.getOrElse(i, Set.empty)).size.toDouble / e.size
      }.sum / queryVecs.length
      println(f"[assign-e2e] k=4096 build=${tBuild}%6.1f s nprobe=$np%3d " +
        f"recall@100=${rec}%5.3f")
    }
    // append through the same grouped rule, then recall against a fresh
    // exact ground truth over the grown corpus: the appended rows (data-
    // shaped jitters of existing vectors) must land in servable cells
    // and the folded radii/counts must keep routing truthful
    val batch = dfId.limit(2000)
      .select(concat(lit("app_"), $"id").as("id"),
        transform($"v", x => x + lit(0.05f)).as("v"))
    idx.append(batch, "v")
    val grown = dfId.select($"id", $"v").union(batch)
    val exactA = sets(graft.operators.VectorSearch.topKMulti(
      grown, "v", queryVecs, 100, "id").collect())
    val afterAppend = sets(idx.searchMulti(spark, queryVecs, 100,
      nprobe = 64, "id").collect())
    val recA = queryVecs.indices.map { i =>
      val e = exactA.getOrElse(i, Set.empty)
      if (e.isEmpty) 1.0
      else e.intersect(afterAppend.getOrElse(i, Set.empty))
        .size.toDouble / e.size
    }.sum / queryVecs.length
    println(f"[assign-e2e] post-append nprobe=64 recall@100=${recA}%5.3f")
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(dir))
    } // sections != kernels
    spark.stop()
  }
}
