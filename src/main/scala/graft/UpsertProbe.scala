package graft

import graft.sources.ProductGen
import graft.streaming.{BucketedStore, UpsertStream}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Phase-level profiling of the streaming-upsert open loop (not part of the
  * driver contract): feeds single-object updates at a fixed offered rate and
  * prints every commit's size and latency so the sustained-QPS work targets
  * the real bottleneck (per-commit fixed cost vs queue growth).
  */
object UpsertProbe {
  private def t(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
    GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    val dims = 2688
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val base = java.nio.file.Files.createTempDirectory("graft_uprobe").toString

    val store = new BucketedStore(s"$base/store", nBuckets = 64)
    t("store_init") {
      store.initialize(ProductGen.products(spark, n, dims, partitions = 32),
        "parent_asin")
    }

    def tier(name: String, nObjects: Int, offeredQps: Double, idOffset: Long,
        readsDuring: Boolean = false): Unit = {
      val arrivals = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
      val lats = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]()
      val readLats = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]()
      @volatile var reading = true
      // prepared serving reads at ~1/s against the live store, as Bench's
      // 200-tier does — validates the snapshot-prepared read path under a
      // real commit stream without the full bench's IO bill
      val pq = if (!readsDuring) None
        else {
          val queryVec = store.read(spark)
            .select(org.apache.spark.sql.functions.col("embedding"))
            .head().getSeq[Float](0).toArray
          Some(store.prepareTopK(spark, "embedding", queryVec, 100,
            projection = Seq("parent_asin")))
        }
      val reader = pq.map { p =>
        new Thread(() => {
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", "graft-read")
          var nextDue = System.nanoTime()
          while (reading) {
            val rt0 = System.nanoTime()
            try {
              p.read()
              readLats.add((System.nanoTime() - rt0) / 1e9)
            } catch { case e: Throwable =>
              println(s"[probe] read FAILED: ${e.getClass.getName}: ${e.getMessage}")
            }
            nextDue += 1000000000L
            val waitMs = (nextDue - System.nanoTime()) / 1000000L
            if (waitMs > 0 && reading) Thread.sleep(waitMs)
            else nextDue = System.nanoTime()
          }
        }, s"$name-reader")
      }
      var lastCommit = System.nanoTime()
      t(name) {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        import spark.implicits._
        val mem = MemoryStream[Long]
        // BENCH's shape: ids-only stream, per-object re-embed driver-local
        // (runDelta's localMap) — the plan-per-micro-batch alternative
        // measured as a catch-up spiral at 200 QPS (see Bench.streamTier)
        val updates = mem.toDF().withColumnRenamed("value", "id")
        val embedLocal: Seq[org.apache.spark.sql.Row] => Seq[org.apache.spark.sql.Row] =
          rows => rows.map(r => ProductGen.localRow(r.getLong(0), dims))
        // the PRODUCTION commit path (runDelta), instrumented through its
        // onCommit hook — a hand-rolled copy here drifts from the code the
        // probe exists to profile (it already had: no delta consolidation)
        val q = UpsertStream.runDelta(updates, store, "parent_asin",
          java.nio.file.Files.createTempDirectory("graft_ck").toString,
          trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
          compactEvery = Int.MaxValue,
          localMap = Some((embedLocal, ProductGen.schema(dims))),
          onCommit = (v, rows) => {
            val now = System.nanoTime()
            println(f"[probe]   commit v=$v n=${rows.size} " +
              f"interCommit=${(now - lastCommit) / 1e9}%.3f s")
            lastCommit = now
            rows.foreach { r =>
              val id = r.getAs[String]("parent_asin").substring(1).toLong
              val t0 = arrivals.get(id)
              if (t0 != 0L) lats.add((now - t0) / 1e9)
            }
          })
        mem.addData(idOffset - 1)
        q.processAllAvailable()
        // drain pending writeback (store init / previous tier) so the
        // kernel's aged-dirty-page flush doesn't land mid-window
        try { new ProcessBuilder("sync").start().waitFor(); () }
        catch { case _: Throwable => () }
        pq.foreach(p => try p.read() catch { case _: Throwable => () })
        reader.foreach(_.start())
        val t0 = System.nanoTime()
        var i = 0
        while (i < nObjects) {
          val nowNs = System.nanoTime()
          val due = math.min(nObjects.toLong,
            ((nowNs - t0) / 1e9 * offeredQps).toLong + 1).toInt
          if (due > i) {
            (i until due).foreach { j =>
              arrivals.put(idOffset + j, t0 + (j / offeredQps * 1e9).toLong)
            }
            mem.addData((i until due).map(j => idOffset + j): _*)
            i = due
          }
          Thread.sleep(50)
        }
        q.processAllAvailable()
        q.stop()
      }
      // reader drains OUTSIDE the timed block (Bench stops its reader in
      // the finally for the same reason): its last sleep slot or an
      // in-flight read must not inflate the tier wall-clock
      reading = false
      reader.foreach(_.join(10000))
      import scala.jdk.CollectionConverters._
      val xs = lats.asScala.map(_.toDouble).toArray.sorted
      if (xs.nonEmpty) {
        val p95 = xs(math.min(xs.length - 1, math.ceil(0.95 * xs.length).toInt - 1))
        println(f"[probe] ${name}_p95: $p95%.3f s over ${xs.length} objects")
      }
      val rs = readLats.asScala.map(_.toDouble).toArray.sorted
      if (rs.nonEmpty) {
        val p95 = rs(math.min(rs.length - 1, math.ceil(0.95 * rs.length).toInt - 1))
        println(f"[probe] ${name}_read_p95: $p95%.3f s over ${rs.length} reads, " +
          s"fallbacks=${pq.map(_.fallbackReadCount).getOrElse(0L)}")
      }
    }

    tier("open40", 200, 40.0, 2000000L)
    tier("open200", 1000, 200.0, 3000000L, readsDuring = true)

    spark.stop()
    FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
