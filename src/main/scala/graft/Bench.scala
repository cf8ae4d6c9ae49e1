package graft

import graft.operators.{Dedup, VectorSearch}
import graft.sources.ProductGen
import graft.streaming.{BucketedStore, UpsertStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — prints ONE JSON line with per-query seconds.
  *
  * Two sections:
  *   1. the full oracle suite (SparkEntry.allQueries) over the driver's testdata at
  *      `SPARK_GRAFT_SF_DIR`;
  *   2. the reference's own workload shape (reference `README.md:58-83`) at
  *      a scale-proportional synthetic product table: index build (embed +
  *      write = the "<2 hrs for 10M rows" target, `README.md:64`), the four
  *      filter-selectivity top-100 reads (`README.md:80-83`), a bulk upsert
  *      merge (`README.md:69-70`), an IVF build + probe, and the near-dup
  *      dedup pipeline over `documents`.
  */
object Bench {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def newSession(): SparkSession = {
      val builder = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
      GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
      val s = builder.getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      GraftSession.prepare(s)
      // warm the JVM/codegen once so timings measure the engine, not
      // startup, and pre-read every column of the suite's tables (footers +
      // page cache) so the first timed query per table doesn't absorb
      // first-touch IO
      s.range(1000).select(sum(col("id"))).collect()
      Seq("lineitem", "orders", "customer", "documents", "embeddings")
        .foreach { t =>
          try {
            val df = s.read.parquet(s"$sfDir/$t.parquet")
            df.select(df.columns.toIndexedSeq.map(c => count(col(c))): _*).collect()
          } catch { case _: Throwable => () }
        }
      s
    }
    var spark = newSession()

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // ---- section 1: oracle suite ----
    // SPARK_GRAFT_BENCH_SECTIONS=workload skips it during perf iteration
    val sections = sys.env.getOrElse("SPARK_GRAFT_BENCH_SECTIONS", "all")
    if (sections != "workload") {
      SparkEntry.allQueries.foreach { q =>
        results(q.name) = time {
          try q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
          catch { case _: Throwable => -1.0 }
        }
      }
      // fresh context for the workload section: the suite leaves shuffle
      // files, broadcast blocks and codegen caches behind that distort the
      // write-heavy workload timings
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      spark = newSession()
    }

    // ---- section 2: reference workload at scale-proportional size ----
    val sfFraction = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).toDouble).getOrElse(0.1)
    val nProducts = math.max(10000L, (1000000 * sfFraction).toLong)
    val dims = 2688
    val userWorkDir = sys.env.get("SPARK_GRAFT_WORK_DIR")
    val base = userWorkDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_bench").toString)
    val productsPath = s"$base/products"

    // index build: generate + embed + write, partitioned by the filter
    // column so selective reads prune directories (reference README.md:64)
    results("index_build") = time {
      ProductGen.products(spark, nProducts, dims, partitions = cpus.toInt)
        .write.mode("overwrite").partitionBy("main_category")
        .parquet(productsPath)
    }

    val products = spark.read.parquet(productsPath)

    // surface C at proportional scale: full statistical profile + report
    // rendering for the product table (reference ran 10k full + 3 fast
    // profiles in ~15 s wall, reports/*/README.md:3)
    results("profile_pipeline") = time {
      graft.operators.ProfilePipeline.run(spark,
        Seq("products" -> productsPath), s"$base/reports",
        embeddingCol = Some("embedding"))
    }
    val queryVec = products.select(col("embedding")).head().getSeq[Float](0).toArray
    def topk(filter: org.apache.spark.sql.Column): DataFrame =
      VectorSearch.topK(products, "embedding", queryVec, 100,
        Some(filter), projection = Seq("parent_asin"))

    // the four selectivity tiers (reference README.md:80-83); observed
    // selectivity of each predicate on the generated data is reported as a
    // pseudo-entry so the tiers are auditable
    val selPreds = Seq(
      "read_sel_0001" -> (col("average_rating") <= 3.0 &&
        col("rating_number") > 130 && col("main_category") === "Computers"),
      "read_sel_01" -> (col("average_rating") <= 3.5 &&
        col("rating_number") > 15 && col("main_category") === "Computers"),
      "read_sel_1" -> (col("average_rating") >= 3.5 &&
        col("rating_number") > 10 && col("main_category") === "Computers"),
      "read_sel_10" ->
        col("main_category").isin("Computers", "All Beauty", "Buy a Kindle"))
    val selCounts = products.agg(
      count(lit(1)).as("total"),
      selPreds.map { case (n, p) => sum(p.cast("long")).as(n) }: _*).head()
    selPreds.zipWithIndex.foreach { case ((name, pred), i) =>
      results(name) = time { topk(pred).collect() }
      results(s"${name}_pct_value") =
        selCounts.getLong(i + 1) * 100.0 / selCounts.getLong(0)
    }

    // upserts (reference README.md:69-70): copy-on-write bucketed store —
    // single-object batches rewrite only touched buckets, not the table
    val store = new BucketedStore(s"$base/store", nBuckets = 64)
    results("upsert_store_init") = time {
      store.initialize(products, "parent_asin")
    }
    results("upsert_batch10") = time {
      val updates = ProductGen.products(spark, 10, dims, partitions = 1)
      store.upsert(updates, "parent_asin")
    }
    results("upsert_read_after") = time {
      store.read(spark).count()
    }

    // sustained streaming upserts (reference README.md:69-70 QPS shape):
    // 100 single-object re-embedded updates in 20 micro-batches through the
    // merge-on-read streaming path (delta appends + periodic compaction);
    // objects/sec reported as a pseudo-entry
    val nStreamUpserts = 100
    results("upsert_stream") = time {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val s = spark
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val mem = MemoryStream[Long]
      val updates = ProductGen.fromIds(
        mem.toDF().withColumnRenamed("value", "id"), dims)
      // compaction disabled during the stream so the timing isolates the
      // append path (the per-object p95 analogue); compaction is timed
      // separately below
      val q = UpsertStream.runDelta(updates, store, "parent_asin",
        java.nio.file.Files.createTempDirectory("graft_ck").toString,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
        compactEvery = Int.MaxValue)
      (0 until 20).foreach { b =>
        mem.addData((0 until nStreamUpserts / 20).map(i => (b * 5 + i).toLong): _*)
        q.processAllAvailable()
      }
      q.stop()
    }
    results("upsert_stream_qps_value") =
      nStreamUpserts / math.max(results("upsert_stream"), 1e-9)
    results("upsert_stream_read") = time {
      store.read(spark).count()
    }
    results("upsert_compaction") = time {
      store.compact(spark, "parent_asin")
    }

    // IVF: build coarse index on a 64-dim slice-scale table + probe
    val emb = Tables.embeddings(spark, sfDir)
    val ivfPath = s"$base/ivf"
    var ivf: VectorSearch.IvfIndex = null
    results("ivf_build") = time {
      ivf = VectorSearch.buildIvf(emb, "embedding", 16, ivfPath)
    }
    val q64 = emb.select(col("embedding")).head().getSeq[Float](0).toArray
    results("ivf_probe") = time {
      ivf.search(spark, q64, 100, nprobe = 4).collect()
    }

    // ANN recall vs exact (reference requires > 0.9, README.md:76). IVF
    // recall scales with nprobe/nclusters (uniform synthetic vectors don't
    // cluster, so the knob matters more here than on real embeddings) —
    // sweep nprobe up to the smallest operating point meeting the bar and
    // report it plus its recall as pseudo-entries (the "_value" suffix
    // excludes them from the total).
    var chosenRecall = 0.0
    var chosenNprobe = 0
    val nRecallQueries = 5
    results("ann_recall_eval") = time {
      val queryRows = emb.filter(col("vec_id") < nRecallQueries)
        .select(col("vec_id"), col("embedding")).collect()
      val queryVecs = queryRows.map(_.getSeq[Float](1).toArray)
      val exactSets = queryVecs.map { qv =>
        VectorSearch.topK(emb, "embedding", qv, 100)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      }
      val nprobes = Iterator(4, 8, 12, 16)
      while (chosenRecall < 0.9 && nprobes.hasNext) {
        val np = nprobes.next()
        val rec = queryVecs.zip(exactSets).map { case (qv, exact) =>
          val approx = ivf.search(spark, qv, 100, nprobe = np)
            .select(col("vec_id")).collect().map(_.getLong(0)).toSet
          exact.intersect(approx).size.toDouble / exact.size
        }.sum / nRecallQueries
        chosenRecall = rec
        chosenNprobe = np
      }
    }
    results("ann_nprobe_value") = chosenNprobe
    results("ann_recall_value") = chosenRecall

    // near-dup dedup pipeline over documents
    val docs = Tables.documents(spark, sfDir)
    results("near_dup_pipeline") = time {
      Dedup.nearDuplicatePairs(docs, "text", "doc_id", threshold = 0.5)
        .write.mode("overwrite").format("noop").save()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.collect {
      case (k, v) if v >= 0 && !k.endsWith("_value") => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    // clean the scratch data (2+ GB per run) unless the caller pinned a dir
    if (userWorkDir.isEmpty) {
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(base)
      if (Files.exists(root)) {
        Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => try Files.delete(p) catch { case _: Throwable => () })
      }
    }
  }
}
