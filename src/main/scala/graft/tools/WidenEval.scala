package graft.tools

import graft.operators.VectorSearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-only evaluator for the r12 filtered-probe AUTO-WIDEN
  * ([[VectorSearch.probeWidenFactor]]) on an EXISTING on-disk IVF index
  * — built to re-use the session's 2M × 2688 `IndexScale` artifact
  * without paying its 22 GB build again (zero writes; safe at any point
  * of the IO budget).
  *
  * For each ProductWorkload selectivity tier it records the filter's
  * support shape (total matches, match-bearing cells, their read-volume
  * fraction — the thin-support rule's exact inputs), computes the exact
  * filtered top-100 baseline over the index files, then measures
  * recall/wall of `searchMulti` at nprobe 64 and 128 under
  *   - "wf1": the classic plan (candidate target k, support scan off) —
  *     the pre-r12 behavior, and
  *   - "wfdef": the shipped defaults ([[VectorSearch.probeWidenFactor]]
  *     + the [[VectorSearch.thinSupportFactor]] support scan),
  * plus each setting's planned probe-set size (driver arithmetic — the
  * plan itself never runs a job beyond the once-per-filter memoized
  * count scan). The r11 2M point's thinnest number — 0.633 recall @
  * np64 on the 0.06% tier — is the row this mechanism exists to move.
  * (The first r12 run of this tool REFUTED the candidate-volume
  * hypothesis: factor 4 left every tier's plan bit-identical; the
  * support scan is the fix that shipped.)
  *
  * Env: SPARK_GRAFT_WIDEN_IVF (index path, required),
  * SPARK_GRAFT_CPUS (default 32).
  */
object WidenEval {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ivfPath = sys.env.getOrElse("SPARK_GRAFT_WIDEN_IVF",
      sys.error("SPARK_GRAFT_WIDEN_IVF required (existing IVF index path)"))
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)

    val ivf = VectorSearch.IvfIndex.load(spark, ivfPath)
    results("cells_value") = ivf.centroids.length.toDouble
    val idxDf = spark.read.parquet(ivfPath)
    val queryVecs = idxDf.select(col("__vec")).head(3)
      .map(_.getSeq[Float](0).toArray).toSeq
    def idSets(df: DataFrame): Map[Int, Set[String]] =
      df.collect().groupBy(_.getInt(0)).map { case (q, rows) =>
        q -> rows.map(_.getString(3)).toSet
      }
    def recallVs(exact: Map[Int, Set[String]],
        approx: Map[Int, Set[String]]): Double =
      queryVecs.indices.map { i =>
        val e = exact.getOrElse(i, Set.empty)
        if (e.isEmpty) 1.0
        else e.intersect(approx.getOrElse(i, Set.empty)).size.toDouble / e.size
      }.sum / queryVecs.length

    graft.ProductWorkload.selPreds.foreach { case (selName, pred) =>
      val tier = selName.stripPrefix("read_")
      var exact: Map[Int, Set[String]] = Map.empty
      val t0 = System.nanoTime()
      val exactOk =
        try {
          exact = idSets(VectorSearch.topKMulti(
            idxDf, "__vec", queryVecs, 100, "parent_asin", Some(pred)))
          results(s"exact_${tier}_value") = (System.nanoTime() - t0) / 1e9
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[widen] exact $tier FAILED: ${e.getMessage}")
            results(s"exact_${tier}_value") = -1.0
            false
        }
      // support shape per tier (driver arithmetic off the memoized count
      // scan): total matching rows, match-bearing cells, and their read
      // volume as a fraction of the index — the thin-support rule's
      // exact inputs
      val mc = ivf.matchCounts(spark, pred)
      results(s"match_rows_${tier}_value") = mc.valuesIterator.sum.toDouble
      results(s"match_cells_${tier}_value") = mc.size.toDouble
      // mirror probePlan's bounds guard: an out-of-range cell id (stale
      // occupancy after a retrain) counts 0 rows instead of crashing
      results(s"match_vol_frac_${tier}_value") =
        mc.keysIterator
          .map(c => if (c < ivf.cellCounts.length) ivf.cellCounts(c) else 0L)
          .sum.toDouble / ivf.cellCounts.sum
      // "wf1" = the classic plan (candidate target k, support scan off);
      // "wfdef" = the shipped defaults (thin-support scan active)
      Seq("wf1" -> 1.0, "wfdef" -> Double.NaN).foreach { case (wtag, wf) =>
        ivf.widenFactor = wf
        ivf.thinFactor = if (wf.isNaN) Double.NaN else 0.0
        // plan telemetry: probed cells + planned candidate rows per query
        // (first query's numbers are representative; all three recorded
        // as the mean)
        Seq(64, 128).foreach { np =>
          val plans = ivf.probePlan(spark, queryVecs, 100, np, Some(pred),
            exactFallback = true)
          results(s"plan_cells_${tier}_${wtag}_np${np}_value") =
            plans.map(_.size).sum.toDouble / plans.length
          if (!exactOk) ()
          else {
            val sw0 = ivf.exactSwitchCount
            val t1 = System.nanoTime()
            val approx = idSets(ivf.searchMulti(
              spark, queryVecs, 100, nprobe = np, "parent_asin", Some(pred)))
            results(s"wall_${tier}_${wtag}_np${np}_value") =
              (System.nanoTime() - t1) / 1e9
            results(s"recall_${tier}_${wtag}_np${np}_value") =
              recallVs(exact, approx)
            results(s"path_exact_${tier}_${wtag}_np${np}_value") =
              if (ivf.exactSwitchCount > sw0) 1.0 else 0.0
          }
        }
      }
      ivf.widenFactor = Double.NaN
      ivf.thinFactor = Double.NaN
    }

    val qs = results.map { case (k2, v) => "\"" + k2 + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"widen_eval","queries":$qs}""")
  }
}
