package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the q71 incremental-dedup latency budget
  * (VERDICT r4 task #6): times each sub-chain of
  * [[Dedup.dropDuplicatesAgainst]] cold, then the full operator cold in a
  * fresh session, at the per-round bench scale (sf0.1 documents).
  */
object Q71Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def newSession(): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
      GraftSession.defaults.foreach { case (k, v) => b.config(k, v) }
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      GraftSession.prepare(s)
      s.range(1000).select(sum(col("id"))).collect()
      // warm the documents footers/pages like Bench does
      val df = s.read.parquet(s"$sfDir/documents.parquet")
      df.select(df.columns.toIndexedSeq.map(c => count(col(c))): _*).collect()
      s
    }
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[q71profile] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // pass 1: sub-chains, cold memo each (fresh session per step group)
    {
      val s = newSession()
      val docs = Tables.documents(s, sfDir)
      val corpus = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      timed("corpus_index_build")(
        Dedup.NearDupIndex.build(corpus, "text", "doc_id", 3, 8, 2))
      timed("batch_neardupcore")(
        Dedup.nearDuplicatePairs(batch, "text", "doc_id", threshold = 0.5)
          .write.mode("overwrite").format("noop").save())
      val idx = Dedup.NearDupIndex.build(corpus, "text", "doc_id", 3, 8, 2)
      timed("dedup_batch_final_warm")(
        idx.dedupBatch(batch, "text", 0.5)
          .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))
          .write.mode("overwrite").format("noop").save())
      s.stop()
    }

    // pass 1b: final-query variants, memo warm (fresh session)
    {
      val s = newSession()
      val docs = Tables.documents(s, sfDir)
      val corpus = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      val idx = Dedup.NearDupIndex.build(corpus, "text", "doc_id", 3, 8, 2)
      Dedup.nearDuplicatePairs(batch, "text", "doc_id", threshold = 0.5)
        .write.mode("overwrite").format("noop").save()
      def finalQ(): Unit =
        idx.dedupBatch(batch, "text", 0.5)
          .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))
          .write.mode("overwrite").format("noop").save()
      timed("final_warm_baseline")(finalQ())
      timed("final_warm_again")(finalQ())
      s.conf.set("spark.sql.adaptive.enabled", "false")
      timed("final_warm_aqe_off")(finalQ())
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      timed("final_warm_sp8")(finalQ())
      s.conf.set("spark.sql.adaptive.enabled", "false")
      timed("final_warm_sp8_aqe_off")(finalQ())
      s.stop()
    }

    // pass 2: the exact q71 shape, cold, fresh session, with per-job times
    {
      val s = newSession()
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val site = e.stageInfos.lastOption.map(_.details.linesIterator
              .find(l => l.contains("graft") && !l.contains("Q71Profile"))
              .getOrElse("")).getOrElse("")
            jobs.put(e.jobId, (e.time,
              s"${e.stageInfos.size}st $site".take(110)))
          }
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (t0, desc) = jobs.getOrDefault(e.jobId, (e.time, "?"))
            println(f"[q71profile]   job ${e.jobId}: ${(e.time - t0) / 1e3}%.2f s  $desc")
          }
        })
      timed("q71_total_cold") {
        graft.SparkEntry.queries("q71_dedup_against")(s, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      Thread.sleep(500)
      s.stop()
    }

    // pass 3: again to see session-warm effects
    {
      val s = newSession()
      timed("q71_total_cold2") {
        graft.SparkEntry.queries("q71_dedup_against")(s, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      timed("q71_total_memo_warm") {
        graft.SparkEntry.queries("q71_dedup_against")(s, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      s.stop()
    }
  }
}
