package graft

import graft.operators.VectorSearch
import org.apache.spark.sql.functions._

/** The r16 persisted predicate-count memo: exact per-(filter, cluster)
  * match counts ride the manifest under the census epoch gate, so a
  * fresh process's conjunction-filtered probe plan — the one shape
  * occupancy cannot serve driver-side — runs jobless for every filter a
  * prior process planned, with counts (and every widening/thin-support/
  * exact-switch decision) IDENTICAL by construction.
  */
class CountMemoSpec extends SparkSpec {
  import spark.implicits._

  private def mkData(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val centers = Seq(Array.fill(8)(5.0f), Array.fill(8)(-5.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 5.0f else -5.0f))
    (0 until n).map { i =>
      val c = centers(i % 3)
      (i.toLong, i % 3, (i % 7).toDouble,
        c.map(v => v + rnd.nextFloat() - 0.5f))
    }.toDF("vec_id", "cat", "score_col", "embedding")
  }

  // a conjunction over a non-occupancy column pair: always count-scan
  private def pred = col("cat") === 1 && col("score_col") < 3.0

  test("persisted count memo: fresh load plans the same filter jobless with identical decisions") {
    val dir = java.nio.file.Files.createTempDirectory("cmemo_rt").toString
    val data = mkData(150, 3)
    val built = VectorSearch.buildIvf(data, "embedding", 3, dir,
      sampleFraction = 1.0)
    val q = Array.fill(8)(5.0f)
    // plan once: fills the in-memory memo with the count scan's result
    val builtPlan = built.probePlan(spark, Seq(q), 5, 1, Some(pred),
      exactFallback = true)
    assert(built.memoizedCountKeys.nonEmpty, "count scan did not memoize")
    built.saveManifest(spark)
    val loaded = VectorSearch.IvfIndex.load(spark, dir)
    // the memo came back BEFORE any search ran on the fresh handle...
    assert(loaded.memoizedCountKeys == built.memoizedCountKeys,
      "persisted memo keys diverge from the in-memory memo")
    // ...and the fresh handle's plan — cells, order, widening stop —
    // is identical to the one computed from the live count scan
    val loadedPlan = loaded.probePlan(spark, Seq(q), 5, 1, Some(pred),
      exactFallback = true)
    assert(loadedPlan == builtPlan, "decision parity broken across load")
    // results agree too (same plan, same files)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids(loaded.search(spark, q, 10, nprobe = 3, Some(pred))) ==
      ids(built.search(spark, q, 10, nprobe = 3, Some(pred))))
    FsUtil.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("zero-match filters persist as a served zero (no re-scan, no fabricated rows)") {
    val dir = java.nio.file.Files.createTempDirectory("cmemo_zero").toString
    val built = VectorSearch.buildIvf(mkData(120, 5), "embedding", 3, dir,
      sampleFraction = 1.0)
    val nohit = col("score_col") > 100.0
    val q = Array.fill(8)(5.0f)
    // nprobe strictly below the cell count: at nprobe == cells the
    // filter-aware plan (and its count scan) is bypassed by design
    assert(built.search(spark, q, 5, nprobe = 2, Some(nohit)).count() == 0)
    assert(built.memoizedCountKeys.nonEmpty)
    built.saveManifest(spark)
    val loaded = VectorSearch.IvfIndex.load(spark, dir)
    assert(loaded.memoizedCountKeys == built.memoizedCountKeys,
      "zero-match memo entry not persisted (sentinel row)")
    assert(loaded.search(spark, q, 5, nprobe = 2, Some(nohit)).count() == 0)
    FsUtil.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("append invalidates persisted counts (stale counts never served)") {
    val dir = java.nio.file.Files.createTempDirectory("cmemo_ap").toString
    val built = VectorSearch.buildIvf(mkData(120, 7), "embedding", 3, dir,
      sampleFraction = 1.0)
    val q = Array.fill(8)(5.0f)
    built.probePlan(spark, Seq(q), 5, 1, Some(pred), exactFallback = true)
    built.saveManifest(spark)
    // append clears the memo; its auto-checkpoint persists the cleared
    // state — a fresh load must re-scan rather than serve counts that
    // predate the batch
    built.append(Seq((900L, 1, 1.0, Array.fill(8)(5.3f)))
      .toDF("vec_id", "cat", "score_col", "embedding"), "embedding")
    assert(built.memoizedCountKeys.isEmpty, "append must clear the memo")
    val loaded = VectorSearch.IvfIndex.load(spark, dir)
    assert(loaded.memoizedCountKeys.isEmpty,
      "stale persisted counts admitted after an append")
    // and the re-scan sees the appended row
    val hits = loaded.search(spark, q, 121, nprobe = 3, Some(pred))
      .select("vec_id").collect().map(_.getLong(0))
    assert(hits.contains(900L))
    FsUtil.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
