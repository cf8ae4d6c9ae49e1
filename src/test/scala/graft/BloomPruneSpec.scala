package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val large = (0L until 10000L).map(i => (i, s"v$i"))
    .toDF("k", "payload")
  private lazy val small = Seq(3L, 7L, 4242L, 9999L, 20000L).toDF("sk")

  test("bloom-pruned semi join returns exactly the plain semi join") {
    val got = BloomPrune.semiJoin(large, small, "k", "sk",
        expectedItems = 100L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 7L, 4242L, 9999L)) // 20000 has no large-side row
  }

  test("duplicate small-side keys do not duplicate output rows") {
    val dupSmall = Seq(3L, 3L, 7L).toDF("sk")
    val got = BloomPrune.semiJoin(large, dupSmall, "k", "sk", 100L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 7L))
  }

  test("the filter prunes the large side before the exact join") {
    // LocalRelations get filters folded at optimization time, hiding the
    // predicate — use a file-backed table like the real queries do
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    large.write.mode("overwrite").parquet(dir)
    val fileLarge = spark.read.parquet(dir)
    val pruned = BloomPrune.semiJoin(fileLarge, small, "k", "sk",
      expectedItems = 100L, fpp = 0.001)
    assert(pruned.select("k").as[Long].collect().sorted.toSeq ==
      Seq(3L, 7L, 4242L, 9999L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom predicate missing from plan:\n$plan")
    assert(!plan.toLowerCase.contains("udf"), "must use native expressions")
  }
}
