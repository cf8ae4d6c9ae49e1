package graft.tools

import graft.operators.VectorSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PQ's claimed regime, MEASURED (r17): SCALE.md r16 showed pq ~2×
  * slower than sq8 when the index is page-cache-resident and ARGUED it
  * wins out-of-cache (phase 1 reads d/8 bytes/row vs d). This probe
  * produces the number: an order-controlled pq-vs-sq8 serving A/B on
  * ONE pq-layout index (its files carry BOTH code columns, so column
  * pruning — not file layout — decides bytes), with the page cache
  * DROPPED before every cold rep (`sync; echo 3 >
  * /proc/sys/vm/drop_caches`, the box is root) and `/proc/self/io`
  * read_bytes deltas per rep. Arms alternate P,S,S,P (cold) then P,S,
  * S,P (warm, same handles) so device drift cancels; the sq8 arm is the
  * same handle with codebooks nulled (r16's same-layout A/B).
  *
  * Env: SPARK_GRAFT_PQAB_ROWS (default 1000000), _DIMS (2688), _CELLS
  * (1024), SPARK_GRAFT_PQAB_REUSE=<path> to skip the build,
  * SPARK_GRAFT_WORK_DIR. One BENCH-style JSON line.
  */
object PqColdAb {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.get("SPARK_GRAFT_WORK_DIR").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pqab").toString)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$base/spark-local")
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    spark.range(1000).select(sum(col("id"))).collect()

    def timed[T](name: String)(f: => T): Option[T] = {
      val t0 = System.nanoTime()
      try {
        val r = f
        results(name) = (System.nanoTime() - t0) / 1e9
        Some(r)
      } catch {
        case e: Throwable =>
          System.err.println(s"[pqab] $name FAILED: ${e.getMessage}")
          e.printStackTrace()
          results(name) = -1.0
          None
      }
    }
    def readBytes(): Long = {
      try {
        val src = scala.io.Source.fromFile("/proc/self/io")
        try src.getLines().collectFirst {
          case l if l.startsWith("read_bytes:") =>
            l.split(":")(1).trim.toLong
        }.getOrElse(-1L)
        finally src.close()
      } catch { case _: Exception => -1L }
    }
    def dropCaches(): Unit = {
      try {
        new ProcessBuilder("sh", "-c",
          "sync && echo 3 > /proc/sys/vm/drop_caches").start().waitFor()
        ()
      } catch { case e: Exception =>
        System.err.println(s"[pqab] drop_caches failed: ${e.getMessage}")
      }
    }

    val nRows = sys.env.getOrElse("SPARK_GRAFT_PQAB_ROWS", "1000000").toLong
    val dims = sys.env.getOrElse("SPARK_GRAFT_PQAB_DIMS", "2688").toInt
    val cells = sys.env.getOrElse("SPARK_GRAFT_PQAB_CELLS", "1024").toInt
    val reuse = sys.env.get("SPARK_GRAFT_PQAB_REUSE")
    val idxPath = reuse.getOrElse(s"$base/ivf_pqab")
    println(s"[pqab] rows=$nRows dims=$dims cells=$cells path=$idxPath")

    val source: DataFrame = {
      val baseCols = graft.sources.ProductGen.baseColumns(
        spark.range(0, nRows, 1, cpus.toInt).toDF("id"))
      graft.sources.ProductGen.withDerived(baseCols, dims)
        .select(col("parent_asin"), col("embedding"))
    }
    if (reuse.isEmpty) {
      timed("pqab_build") {
        VectorSearch.buildIvf(source, "embedding", cells, idxPath,
          sampleFraction = math.min(1.0, (256.0 * cells) / nRows),
          storage = "pq", pqIdCol = "parent_asin")
      }
      try { new ProcessBuilder("sync").start().waitFor(); () }
      catch { case _: Throwable => () }
    }
    results("index_size_gb_value") =
      graft.FsUtil.sizeBytes(java.nio.file.Paths.get(idxPath)) / 1e9

    val queryVecs = source.select(col("embedding")).head(3)
      .map(_.getSeq[Float](0).toArray).toSeq

    /** One rep: optionally drop caches, FRESH load (a cold serving
      * process — in-JVM relation caches from prior reps must not leak
      * in), set the arm, one searchMulti np128, wall + bytes + ids.
      */
    def rep(arm: String, cold: Boolean, repIdx: Int): Set[String] = {
      if (cold) dropCaches()
      val b0 = readBytes()
      val t0 = System.nanoTime()
      val h = VectorSearch.IvfIndex.load(spark, idxPath)
      if (arm == "sq8") h.pqCodebooksNow = null // same-layout sq8 serving
      val ids = h.searchMulti(spark, queryVecs, 100, nprobe = 128,
        "parent_asin").collect().map(_.getString(3)).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      val kind = if (cold) "cold" else "warm"
      results(s"pqab_${arm}_${kind}_r${repIdx}_wall") = wall
      results(s"pqab_${arm}_${kind}_r${repIdx}_gb_value") =
        (readBytes() - b0) / 1e9
      ids
    }

    // order-controlled cold alternation: P,S,S,P — each rep pays its own
    // load (fresh handle) so the arm's bytes include manifest + data
    val p1 = rep("pq", cold = true, 1)
    val s1 = rep("sq8", cold = true, 1)
    val s2 = rep("sq8", cold = true, 2)
    val p2 = rep("pq", cold = true, 2)
    // warm pairs on a hot cache (the r16 story should reproduce)
    val p3 = rep("pq", cold = false, 3)
    val s3 = rep("sq8", cold = false, 3)
    val s4 = rep("sq8", cold = false, 4)
    val p4 = rep("pq", cold = false, 4)
    results("pqab_pq_cold_wall") = math.min(
      results("pqab_pq_cold_r1_wall"), results("pqab_pq_cold_r2_wall"))
    results("pqab_sq8_cold_wall") = math.min(
      results("pqab_sq8_cold_r1_wall"), results("pqab_sq8_cold_r2_wall"))
    results("pqab_pq_warm_wall") = math.min(
      results("pqab_pq_warm_r3_wall"), results("pqab_pq_warm_r4_wall"))
    results("pqab_sq8_warm_wall") = math.min(
      results("pqab_sq8_warm_r3_wall"), results("pqab_sq8_warm_r4_wall"))
    // result parity across arms/reps: the A/B compares COST only when
    // both serve the same answer set (pq's overfetch budget covers)
    results("pqab_pq_stable_value") = if (p1 == p2 && p3 == p4) 1.0 else 0.0
    results("pqab_sq8_stable_value") =
      if (s1 == s2 && s2 == s3 && s3 == s4) 1.0 else 0.0
    val inter = p1.intersect(s1).size.toDouble
    results("pqab_arm_overlap_value") = inter / math.max(1, s1.size)

    val json = results.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"pq_cold_ab","rows":$nRows,"dims":$dims,""" +
      s""""queries":{$json},"sf":"synthetic"}""")
    spark.stop()
    if (sys.env.get("SPARK_GRAFT_WORK_DIR").isEmpty)
      graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
