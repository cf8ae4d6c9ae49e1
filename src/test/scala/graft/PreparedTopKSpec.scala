package graft

import graft.operators.VectorSearch
import graft.streaming.BucketedStore
import org.apache.spark.sql.functions._

/** Exactness of the snapshot-prepared top-k serving read
  * (BucketedStore.PreparedTopK) against the full merged-store scan, across
  * the delta lifecycle: fresh store, new-key deltas, displacing updates,
  * filter-failing updates, displacement overflow (fallback), and a bucket
  * fold (cache refresh).
  */
class PreparedTopKSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8

  /** Deterministic tie-free vectors: v(i) has score i·q₀ against q. */
  private def vec(i: Long, scale: Float = 1e-4f): Seq[Float] =
    Seq.tabulate(dims)(d =>
      if (d == 0) i * scale else 1.0f / (d + math.floorMod(i, 7) + 1))

  private def mkStore(n: Long): BucketedStore = {
    val root = java.nio.file.Files.createTempDirectory("ptk").toString
    val store = new BucketedStore(root, nBuckets = 4)
    val df = (0L until n).map(i => (s"k$i", i % 5, vec(i)))
      .toDF("id", "grp", "embedding")
    store.initialize(df, "id")
    store
  }

  private val q: Array[Float] = Array.tabulate(dims)(d => if (d == 0) 1f else 0f)

  private def full(store: BucketedStore,
      filter: Option[org.apache.spark.sql.Column]): Seq[(String, Double)] =
    VectorSearch.topK(store.read(spark), "embedding", q, 10, filter,
      Seq("id")).collect()
      .map(r => (r.getString(0), r.get(1).asInstanceOf[Number].doubleValue()))
      .toSeq

  private def served(pq: BucketedStore#PreparedTopK): Seq[(String, Double)] =
    pq.read().map(r =>
      (r.getString(0), r.get(1).asInstanceOf[Number].doubleValue())).toSeq

  test("no deltas: prepared read equals the full scan") {
    val store = mkStore(200)
    val pq = store.prepareTopK(spark, "embedding", q, 10,
      projection = Seq("id"))
    assert(served(pq) == full(store, None))
    assert(pq.fastReadCount == 1 && pq.fallbackReadCount == 0)
  }

  test("new-key deltas enter the top-k without rescanning the base") {
    val store = mkStore(200)
    val pq = store.prepareTopK(spark, "embedding", q, 10,
      projection = Seq("id"))
    served(pq) // prime the base cache
    // two new keys that outscore everything, one that scores below
    store.appendDelta(Seq(("n1", 1, vec(500)), ("n2", 2, vec(400)),
      ("n3", 3, vec(-50))).toDF("id", "grp", "embedding"), "id")
    val got = served(pq)
    assert(got == full(store, None))
    assert(got.take(2).map(_._1) == Seq("n1", "n2"))
    assert(pq.fallbackReadCount == 0)
  }

  test("updates displace their base rows even when the update scores lower") {
    val store = mkStore(200)
    val pq = store.prepareTopK(spark, "embedding", q, 10,
      projection = Seq("id"))
    served(pq)
    // k199 was the best base row; its update drops it far down
    store.appendDelta(Seq(("k199", 0, vec(-100)))
      .toDF("id", "grp", "embedding"), "id")
    val got = served(pq)
    assert(got == full(store, None))
    assert(!got.map(_._1).contains("k199"))
    // a second update restores it to the top (latest __seq wins)
    store.appendDelta(Seq(("k199", 0, vec(999)))
      .toDF("id", "grp", "embedding"), "id")
    val got2 = served(pq)
    assert(got2 == full(store, None))
    assert(got2.head._1 == "k199")
    assert(pq.fallbackReadCount == 0)
  }

  test("a delta failing the filter still displaces its base row") {
    val store = mkStore(200)
    val filt = Some(col("grp") < 4)
    val pq = store.prepareTopK(spark, "embedding", q, 10, filt,
      projection = Seq("id"))
    served(pq)
    // k198 (grp 3) passes the filter in the base; its update moves it to
    // grp 4 — it must vanish from the filtered top-k even though the
    // update itself never matches the filter
    store.appendDelta(Seq(("k198", 4, vec(198)))
      .toDF("id", "grp", "embedding"), "id")
    val got = served(pq)
    assert(got == full(store, filt))
    assert(!got.map(_._1).contains("k198"))
    assert(pq.fallbackReadCount == 0)
  }

  test("displacement past the slack budget falls back to the full scan, still exact") {
    val store = mkStore(60)
    val pq = store.prepareTopK(spark, "embedding", q, 10,
      projection = Seq("id"), slack = 2)
    // complete-base case first: 60 rows < 10+2 is false, cache holds 12
    served(pq)
    // update the top 5 cached rows downward: 12 − 5 = 7 survivors < k=10
    store.appendDelta((55L until 60L).map(i => (s"k$i", 0, vec(-i)))
      .toDF("id", "grp", "embedding"), "id")
    val got = pq.read().map(_.getString(0)).toSeq
    val want = VectorSearch.topK(store.read(spark), "embedding", q, 10,
      projection = Seq("id")).collect().map(_.getString(0)).toSeq
    assert(got == want)
    assert(pq.fallbackReadCount == 1)
  }

  test("cache holding the complete filtered base never falls back") {
    val store = mkStore(60)
    // only 12 rows have grp == 0 — fewer than k+slack, cache is complete
    val filt = Some(col("grp") === 0)
    val pq = store.prepareTopK(spark, "embedding", q, 10, filt, Seq("id"),
      slack = 40)
    served(pq)
    store.appendDelta((0L until 12L).map(i => (s"k${i * 5}", 0, vec(-i)))
      .toDF("id", "grp", "embedding"), "id")
    assert(served(pq) == full(store, filt))
    assert(pq.fallbackReadCount == 0)
  }

  test("delta volume past the cache guard serves distributed, still exact") {
    val store = mkStore(200)
    val pq = store.prepareTopK(spark, "embedding", q, 10,
      projection = Seq("id"), deltaCacheRows = 5)
    served(pq)
    // a 10-row delta exceeds the 5-row guard: never cached, every read
    // runs the distributed merge — counted as fallback, exact regardless
    store.appendDelta((0L until 10L).map(i => (s"n$i", 1, vec(300 + i)))
      .toDF("id", "grp", "embedding"), "id")
    assert(served(pq) == full(store, None))
    assert(served(pq) == full(store, None))
    assert(pq.fallbackReadCount == 2 && pq.fastReadCount == 1)
  }

  test("small deltas after an oversized one are still admitted; consolidation restores the fast path") {
    val store = mkStore(200)
    val pq = store.prepareTopK(spark, "embedding", q, 10,
      projection = Seq("id"), deltaCacheRows = 5)
    served(pq)
    // bulk backfill past the guard, then a normal small commit
    store.appendDelta((0L until 10L).map(i => (s"n$i", 1, vec(300 + i)))
      .toDF("id", "grp", "embedding"), "id")
    store.appendDelta(Seq(("s0", 1, vec(400L))).toDF("id", "grp", "embedding"),
      "id")
    // oversized delta live → distributed merge, exact; the small delta is
    // admitted to the cache regardless
    assert(served(pq) == full(store, None))
    assert(pq.fallbackReadCount == 1)
    // consolidating folds the oversized slab away; the consolidated slab
    // exceeds the tiny guard too, so force a bucket fold instead: deltas
    // clear entirely and reads serve fast again
    store.compact(spark, "id")
    assert(served(pq) == full(store, None))
    assert(pq.fallbackReadCount == 1 && pq.fastReadCount >= 2)
  }

  test("bucket fold refreshes the cache and stays exact") {
    val store = mkStore(200)
    val pq = store.prepareTopK(spark, "embedding", q, 10,
      projection = Seq("id"))
    served(pq)
    store.appendDelta(Seq(("n9", 1, vec(300))).toDF("id", "grp", "embedding"),
      "id")
    store.compact(spark, "id") // folds deltas into buckets: new manifest
    val got = served(pq)
    assert(got == full(store, None))
    assert(got.head._1 == "n9")
  }
}
