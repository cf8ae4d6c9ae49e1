package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Paired same-session A/B for the r18 scan fan-out (Tables.fanOut): the
  * bench tables are single-row-group files, so narrow compute off the scan
  * runs in ONE task; the fan-out trades one tiny round-robin exchange for
  * cores-wide parallelism. Both modes run ALTERNATING (off, on, off, on)
  * inside one session so device drift cancels; each timed point is the full
  * declared query through the noop sink (guide §1.4). Covers the
  * narrow-compute winners (lineitem decimal aggs, documents tokenize
  * family) AND the exchange-bound queries the fan-out could only hurt
  * (joins, rank/range pipelines) so the per-table keep/drop decision is
  * measured, not assumed.
  *
  * Env: SPARK_GRAFT_REPS (default 3 pairs), SPARK_GRAFT_AB_QUERIES
  * (comma-separated override of the query list).
  */
object FanoutAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    spark.range(1000).select(sum(col("id"))).collect()

    val defaultList = Seq(
      // lineitem narrow-agg (expected winners)
      "q01_pricing_summary", "q13_distinct_parts", "q17_price_histogram",
      "q18_moment_stats", "q02_filtered_topk",
      // lineitem exchange-bound (regression watch)
      "q03_top_revenue_orders", "q19_percentiles", "q93_winsorized",
      "q99_equidepth", "q52_range_frame",
      // documents tokenize family (expected winners)
      "q86_boilerplate", "q73_decontam", "q74_redact", "q81_dup_ngrams",
      "q84_source_quality", "q37_minhash_sigs", "q38_lsh_candidates",
      "q60_tfidf_top_terms", "q105_substring_dups", "q106_substring_scrub",
      // documents join/pipeline (regression watch)
      "q71_dedup_against", "q115_est_dedup_against", "q56_near_dedup")
    val list = sys.env.get("SPARK_GRAFT_AB_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaultList)

    val byName = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    val onSet = graft.Tables.fanOutTables
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    list.foreach { name =>
      val q = byName.getOrElse(name, sys.error(s"unknown query $name"))
      // warm codegen/readers once per query so rep1 isn't the cold outlier
      graft.Tables.fanOutTables = Set.empty
      q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
      (1 to reps).foreach { r =>
        Seq(false, true).foreach { on =>
          graft.Tables.fanOutTables = if (on) onSet else Set.empty
          spark.sparkContext.setJobDescription(s"fanoutab $name on=$on rep$r")
          val t0 = System.nanoTime()
          q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
          val w = (System.nanoTime() - t0) / 1e9
          results(s"${name}_${if (on) "on" else "off"}_rep${r}_value") = w
        }
      }
      val offMin = (1 to reps).map(r => results(s"${name}_off_rep${r}_value")).min
      val onMin = (1 to reps).map(r => results(s"${name}_on_rep${r}_value")).min
      println(f"[fanoutab] $name off=$offMin%.3f on=$onMin%.3f " +
        f"speedup=${offMin / onMin}%.2f")
    }
    graft.Tables.fanOutTables = onSet
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"fanout_ab","queries":$qs}""")
  }
}
