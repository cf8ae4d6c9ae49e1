package graft

import graft.streaming.BucketedStore
import org.apache.spark.sql.functions._

class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("initialize + read round-trips all rows") {
    val root = java.nio.file.Files.createTempDirectory("bstore").toString
    val store = new BucketedStore(root, nBuckets = 4)
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
    store.initialize(df, "k")
    assert(store.currentVersion.contains(0))
    assert(store.read(spark).count() == 100)
  }

  test("upsert rewrites only touched buckets and preserves the rest") {
    val root = java.nio.file.Files.createTempDirectory("bstore2").toString
    val store = new BucketedStore(root, nBuckets = 8)
    store.initialize((0L until 200L).map(i => (i, "orig")).toDF("k", "v"), "k")
    store.upsert(Seq((5L, "updated"), (999L, "new")).toDF("k", "v"), "k")
    val m = store.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m.size == 201)
    assert(m(5L) == "updated" && m(999L) == "new" && m(7L) == "orig")
    // only the touched buckets' dirs exist under v1
    val v1Buckets = new java.io.File(s"$root/v1").listFiles()
      .filter(_.getName.startsWith("b=")).map(_.getName).toSet
    assert(v1Buckets.nonEmpty && v1Buckets.size <= 2,
      s"expected <=2 rewritten buckets, got $v1Buckets")
  }

  test("repeated upserts accumulate versions with correct latest state") {
    val root = java.nio.file.Files.createTempDirectory("bstore3").toString
    val store = new BucketedStore(root, nBuckets = 4)
    store.initialize(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k")
    store.upsert(Seq((1L, "a2")).toDF("k", "v"), "k")
    store.upsert(Seq((1L, "a3"), (3L, "c")).toDF("k", "v"), "k")
    val m = store.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "a3", 2L -> "b", 3L -> "c"))
    assert(store.currentVersion.contains(2))
  }
}
