package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One ON-DISK 10M-row profiling scale point — the reference's largest
  * dataset tier (reference README.md:26-29) measured directly on the
  * profile pipeline, not extrapolated. The r7/r8 `emb_norm` layout-stats
  * argument ("profiling never reads the vector payload, so its cost is
  * rows-linear and payload-independent") was IO arithmetic at 10M
  * (~100 GB payload vs ~80 MB norm column at 2688 dims); this probe
  * generates the 10M-row product table through the SAME layout writer as
  * the bench/ScalePoint (`ProductWorkload.writeIndexed`) and times
  * `ProfilePipeline.run` against it.
  *
  * The embedding width is budget-scaled (default 384, the reference
  * encoder's native bge-small width, vs the benchmark table's 7×384
  * concat) because this VM's burst IO budget cannot absorb a ~140 GB
  * 10M×2688 write — and the measured path is payload-width-independent
  * BY CONSTRUCTION: stats read `emb_norm` (8 B/row, plan-asserted in
  * PlanAuditSpec), figures read aggregates plus one bounded sample whose
  * phase-1 scan is id-only. Dim affects only generation cost and the
  * bounded sample fetch, neither of which is the claim under test; the
  * rows axis — the one that DOES drive profiling cost — is at full
  * reference scale.
  *
  * Like ScalePoint this is a one-off probe, run once early in a session
  * (the ~17 GB write is a real bite out of the burst IO budget), its
  * artifact committed rather than re-measured per round. Smoke-test
  * changes with SPARK_GRAFT_PROFILE_ROWS=200000 first.
  */
object ProfileScale {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.get("SPARK_GRAFT_WORK_DIR").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_prof10m").toString)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$base/spark-local")
    GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    spark.range(1000).select(sum(col("id"))).collect()

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try {
        f
        results(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[profilescale] $name FAILED: ${e.getMessage}")
          results(name) = -1.0
      }
    }

    val nRows = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ROWS", "10000000").toLong
    val dims = sys.env.getOrElse("SPARK_GRAFT_PROFILE_DIMS", "384").toInt
    val path = s"$base/products_10m"

    timed("table_write") {
      ProductWorkload.writeIndexed(spark, nRows, dims, cpus.toInt, path)
    }
    results("table_size_gb_value") =
      FsUtil.sizeBytes(java.nio.file.Paths.get(path)) / 1e9
    try { new ProcessBuilder("sync").start().waitFor(); () }
    catch { case _: Throwable => () }
    Thread.sleep(15000) // drain writeback before the timed reads

    // Cold = first pass over the table (page cache holds at most the
    // writeback residue); warm = identical second run, isolating the
    // IO share of the cold number. Both are end-to-end pipeline runs:
    // stats + figures + markdown/json reports per dataset.
    timed("profile_pipeline_cold") {
      graft.operators.ProfilePipeline.run(spark,
        Seq("products10m" -> path), s"$base/reports_cold",
        embeddingCol = Some("embedding"), idCol = Some("parent_asin"),
        normCol = Some("emb_norm"))
    }
    timed("profile_pipeline_warm") {
      graft.operators.ProfilePipeline.run(spark,
        Seq("products10m" -> path), s"$base/reports_warm",
        embeddingCol = Some("embedding"), idCol = Some("parent_asin"),
        normCol = Some("emb_norm"))
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"profile_scale_10m","rows":$nRows,"dims":$dims,"queries":$qs}""")
    if (sys.env.get("SPARK_GRAFT_WORK_DIR").isEmpty)
      FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
