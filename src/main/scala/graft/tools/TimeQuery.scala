package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for perf iteration: runs the named
  * SparkEntry queries against a testdata dir (default sf0.1) with the
  * Bench session shape (local[32], 32 shuffle partitions), repeating
  * `SPARK_GRAFT_REPS` times (default 2) so the steady-state cost is
  * visible next to the cold one. Usage:
  *   sbt "runMain graft.tools.TimeQuery q71_dedup_against [q72 ...]"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // r18: honor SPARK_GRAFT_CPUS like the bench, so paired core-count
    // scaling runs (8 vs 32) can use the same harness; default unchanged
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val byName = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    args.foreach { name =>
      val q = byName.getOrElse(name,
        sys.error(s"unknown query $name; have ${byName.keys.toSeq.sorted.take(5)}..."))
      var lastDf: org.apache.spark.sql.DataFrame = null
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        lastDf = q.run(spark, sfDir)
        lastDf.write.mode("overwrite").format("noop").save()
        println(f"[timequery] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      // SPARK_GRAFT_EXPLAIN=1 (r16): print the EXECUTED plan's join
      // strategies — the post-AQE truth (`explain()` on an unexecuted
      // frame shows pre-adaptive placeholders). Rerun-free: reads the
      // last rep's executedPlan.
      // SPARK_GRAFT_PLAN_DIR=<dir> (r17): dump the query's
      // explain("formatted") to <dir>/<name>_<SPARK_GRAFT_PLAN_TAG>.txt —
      // the committed before/after plan evidence for optimization rounds.
      sys.env.get("SPARK_GRAFT_PLAN_DIR").foreach { dir =>
        val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
        val df = q.run(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(dir, s"${name}_$tag.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
        println(s"[timequery] $name plan -> $p")
      }
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1") && lastDf != null) {
        // the noop writes above ran their own QueryExecutions — AQE
        // finalizes per-execution, so drive THIS frame's before reading
        // it (suite queries return bounded, oracle-compared results)
        lastDf.collect()
        val executed = lastDf.queryExecution.executedPlan.toString
        println(s"[timequery] $name executed plan joins:")
        executed.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange"))
          .foreach(l => println("  " + l.trim.take(160)))
      }
    }
    spark.stop()
  }
}
