package graft

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.{Ingest, Layout}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Results must not depend on how the input happens to be partitioned — the
  * property that makes an operator's answer stable when the cluster scales
  * from 32 tasks to 32,000 or when an upstream stage changes its layout.
  * Each test runs the same operator over 1-partition and 13-partition copies
  * of the same data and asserts row-identical output.
  */
class PartitionInvarianceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val dup = "the quick brown fox jumps over the lazy dog near the river bank"
    ((0 until 200).map { i =>
      val text =
        if (i % 17 == 0) dup
        else s"document $i about topic ${i % 7} with words ${"w" + i} " +
          s"${"x" + i % 13} ${"y" + i % 5} and shared trailing content"
      (i.toLong, text)
    }).toDF("doc_id", "text")
  }

  private def both(op: DataFrame => DataFrame): (Seq[String], Seq[String]) = {
    def run(parts: Int) =
      op(corpus.repartition(parts)).collect().map(_.toString).sorted.toSeq
    (run(1), run(13))
  }

  test("minhash signatures are partition-invariant") {
    val (a, b) = both(Dedup.minhashSignatures(_, "text", "doc_id"))
    assert(a == b)
  }

  test("hash split labels are partition-invariant") {
    val (a, b) = both(df => Ingest.hashSplit(df, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split"))
    assert(a == b)
  }

  test("balanced shard assignment is partition-invariant") {
    val (a, b) = both { df =>
      val withTok = df.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("nt"))
      TextAnalysis.balancedShards(withTok, "nt", "doc_id", 8)
        .select("doc_id", "shard")
    }
    assert(a == b)
  }

  test("keep-K near-dedup keeps the same documents regardless of layout") {
    val (a, b) = both(df => Dedup.capNearDuplicates(df, "text", "doc_id",
      maxCopies = 1, threshold = 0.5).select("doc_id"))
    assert(a == b)
  }

  test("estimated-Jaccard pairs are partition-invariant") {
    // the estimate is a pure function of md5-derived signatures, so the
    // pair set AND each pair's estimate must survive any re-layout (and
    // any retry/speculative re-execution, which is the same property)
    val (a, b) = both { df =>
      Dedup.clearMemo(df.sparkSession)
      Dedup.estimatedNearDuplicatePairs(df, "text", "doc_id",
        threshold = 0.3)
    }
    assert(a.nonEmpty && a == b)
  }

  test("z-order keys are partition-invariant") {
    val pts = (0 until 300).map(i =>
      (i.toLong, (i % 23).toDouble, (i % 31).toDouble)).toDF("id", "x", "y")
    def run(parts: Int) =
      Layout.zOrdered(pts.repartition(parts), "x", "y", bits = 5)
        .select("id", "zval").collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(13))
  }

  test("group top-k selection is partition-invariant") {
    val df = (0 until 3000).map(i =>
      (s"g${i % 5}", (i % 61).toDouble, i.toLong)).toDF("g", "v", "id")
    def run(parts: Int) =
      graft.functions.GroupTopK.perGroup(df.repartition(parts), "g", "v", "id", 7)
        .collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(13))
  }

  test("token-budget selection is partition-invariant") {
    val df = (0 until 1500).map(i =>
      (s"s${i % 4}", i.toLong, (i % 37).toDouble, (i % 9 + 1).toLong))
      .toDF("src", "doc_id", "q", "nt")
    def run(parts: Int) =
      TextAnalysis.tokenBudgetSelect(df.repartition(parts),
          "src", "q", "nt", "doc_id", 400L)
        .select("doc_id").collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(13))
  }

  test("equi-depth bucket assignment is partition-invariant") {
    val df = (0 until 2500).map(i => ((i * 31 % 997).toDouble)).toDF("v")
    def run(parts: Int) =
      graft.operators.Percentiles.equiDepthHistogram(df.repartition(parts), "v", 8)
        .collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(13))
  }
}
