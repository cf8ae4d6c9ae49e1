package graft

import graft.operators.KeywordSearch
import org.apache.spark.sql.functions._

class KeywordSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark join shuffle codegen plan"),
    (2L, "spark spark spark filler filler filler filler filler"),
    (3L, "cooking recipes and gardening tips"),
    (4L, "join orders with lineitem using spark join")).toDF("doc_id", "text")

  test("matching docs rank above non-matching; multi-term beats one-term") {
    val got = KeywordSearch.bm25TopK(docs, "text", "doc_id",
        Seq("spark", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val ids = got.map(_._1)
    assert(!ids.contains(3L), "doc without any query term must not appear")
    // doc 4 matches both terms (join twice) — must beat the one-term docs
    assert(ids.head == 4L, got.toSeq.toString)
    assert(got.forall(_._2 > 0))
  }

  test("tf saturation: repeating a term does not grow the score linearly") {
    val rep = Seq(
      (1L, "spark alpha beta gamma delta"),
      (2L, "spark spark spark spark spark alpha beta gamma delta spark"))
      .toDF("doc_id", "text")
    val scores = KeywordSearch.bm25TopK(rep, "text", "doc_id",
        Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 6x the tf must yield far less than 6x the score (k1 saturation)
    assert(scores(2L) < scores(1L) * 3, scores.toString)
  }
}
