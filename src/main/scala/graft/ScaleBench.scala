package graft

import graft.operators.{Dedup, VectorSearch}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-curve probe: measures the headline operators at every available
  * scale factor (sf0.001 / sf0.01 / sf0.1 — a 100× row-count span on the
  * driver's real testdata) plus a synthetic 10× point for the
  * structure-independent vector scan, and prints one JSON line with
  * per-entry seconds at each point. The point of the artifact is the
  * RATIO column: an operator whose cost curve bends super-linearly across
  * 100× is an operator that dies at 100 TB, whatever its absolute number.
  *
  * Deliberately low-IO: inputs are read-only parquet, dedup intermediates
  * are memory-backed localCheckpoints, sinks are `noop`. The write-heavy
  * workload entries (index build, store init, streaming tiers) are NOT
  * probed at 10× here — on this VM's burst-budgeted disk a ~25 GB
  * synthetic sf1 workload would deplete the IO budget the per-round bench
  * depends on; their scale evidence is the r2→r4 bench artifacts at
  * sf0.01 vs sf0.1 (10×) instead.
  *
  * The dedup session memo is cleared before every timed query so each
  * point measures the full pipeline, not a memo hit (the suite's shared
  * behavior is measured by Bench; this probe isolates per-operator cost).
  */
object ScaleBench {

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private val queryNames = Seq(
    "q01_pricing_summary", "q19_percentiles", "q26_vec_topk",
    "q56_near_dedup", "q62_dup_clusters",
    "q105_substring_dups", "q106_substring_scrub")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val results =
      scala.collection.mutable.LinkedHashMap[String, Map[String, Double]]()

    def timeOne(name: String, sfDir: String): Double = {
      Dedup.clearMemo(spark)
      val q = SparkEntry.allQueries.find(_.name == name).get
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // untimed warmup at the smallest sf: JIT + codegen are one-off costs
    // that would otherwise read as super-linear "growth" at the next point
    queryNames.foreach(timeOne(_, sfDirs.head))

    sfDirs.foreach { dir =>
      val docs = Tables.documents(spark, dir).count()
      val entries = queryNames.map(n => n -> timeOne(n, dir)).toMap
      results(dir.split('/').last) = entries + ("doc_rows" -> docs.toDouble)
    }

    // synthetic in-memory points for the structure-independent scan:
    // brute-force top-k cost is rows × dims regardless of similarity
    // structure, so replication (fresh ids via one explode, not an N-way
    // union) is a faithful larger workload with zero disk writes. Two
    // points — 100× and 1000× the testdata table — sized so compute, not
    // per-query fixed cost, dominates both; their ratio is the measured
    // 10× scaling. Cached to memory so neither point measures first-touch
    // IO.
    val emb = Tables.embeddings(spark, sfDirs.last)
      .select(col("vec_id"), col("embedding"))
    val baseRows = emb.count()
    val q64 = emb.head().getSeq[Float](1).toArray
    def replicate(copies: Long): DataFrame =
      emb.select(explode(sequence(lit(0L), lit(copies - 1))).as("__k"),
          col("vec_id"), col("embedding"))
        .select((col("vec_id") + col("__k") * 10000000L).as("vec_id"),
          col("embedding"))
    // MEMORY_AND_DISK, not MEMORY_ONLY: on a heap too small for the larger
    // point MEMORY_ONLY silently evicts and the timed pass re-executes the
    // explode/projection, skewing the "compute-dominated" ratio with no
    // signal in the artifact. Spilled blocks read back sequentially
    // instead; the cached-fraction is recorded next to the timing so a
    // not-fully-resident point is self-evident.
    def topkTime(df: DataFrame): (Double, Double) = {
      val cached =
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached.count()
      VectorSearch.topK(cached, "embedding", q64, 100,
        projection = Seq("vec_id")).collect() // warm codegen
      val t0 = System.nanoTime()
      (0 until 3).foreach { _ =>
        VectorSearch.topK(cached, "embedding", q64, 100,
          projection = Seq("vec_id")).collect()
      }
      val sec = (System.nanoTime() - t0) / 1e9 / 3
      val memFraction = spark.sparkContext.getRDDStorageInfo
        .find(_.numCachedPartitions > 0)
        .map(i => if (i.memSize + i.diskSize == 0) 1.0
          else i.memSize.toDouble / (i.memSize + i.diskSize))
        .getOrElse(Double.NaN)
      cached.unpersist(blocking = true)
      (sec, memFraction)
    }
    val (t100, f100) = topkTime(replicate(100))
    val (t1000, f1000) = topkTime(replicate(1000))
    results("vec_topk_100x_mem") = Map("seconds" -> t100,
      "rows" -> (baseRows * 100).toDouble, "mem_fraction" -> f100)
    results("vec_topk_1000x_mem") = Map("seconds" -> t1000,
      "rows" -> (baseRows * 1000).toDouble, "mem_fraction" -> f1000)

    val json = results.map { case (point, m) =>
      "\"" + point + "\":" + m.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    }.mkString("{\"metric\":\"scale_curve\",", ",", "}")
    spark.stop()
    println(json)
  }
}
