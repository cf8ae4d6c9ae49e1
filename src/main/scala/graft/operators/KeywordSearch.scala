package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 keyword search over a text column — the lexical complement to
  * [[VectorSearch]] (hybrid retrieval = BM25 candidates ∪ ANN candidates,
  * the standard recipe for training-data curation queries).
  *
  * Score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
  * with the Lucene idf form ln(1 + (N − df + ½)/(df + ½)).
  *
  * Shape at scale: tokens are filtered to the QUERY terms immediately
  * after the explode, so the per-(doc, term) aggregation touches only
  * matching postings — the corpus-wide stats (N, avgdl) are one-row
  * frames cross-joined in (broadcast, no shuffle of the corpus), and df
  * per term is a |q|-row frame. Everything downstream of the explode is
  * ordinary partial+final hash aggregation; top-k is
  * TakeOrderedAndProject.
  */
object KeywordSearch {

  /** Top-`k` docs for `queryTerms`, scored by BM25; returns (idCol,
    * `score` rounded to 4 dp) ordered by (score desc, id). Rounding
    * happens BEFORE ranking so the cut is reproducible across engines.
    */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty)
    val lens = df.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).as("__dl"))
    val stats = lens.agg(count(lit(1)).as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val toks = df.select(col(idCol),
        explode(TextAnalysis.words(col(textCol))).as("__t"))
      .filter(col("__t").isin(queryTerms: _*))
    val tf = toks.groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    // dfreq (|q| rows) and stats (1 row) broadcast; the doc-length join is
    // an ordinary id-keyed join — lens is corpus-sized, never broadcast
    val scored = tf
      .join(broadcast(dfreq), "__t")
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s",
        col("__idf") * (col("__tf") * (k1 + 1)) /
          (col("__tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg((round(sum(col("__s")), 4) + 0.0).as("score"))
    scored.orderBy(desc("score"), col(idCol)).limit(k)
  }

  /** Reciprocal-rank fusion of ranked candidate lists (hybrid retrieval:
    * BM25 ∪ ANN): rrf(d) = Σ_lists 1/(kRrf + rank_d), docs absent from a
    * list contribute nothing. Inputs carry (idCol, rankCol) with ranks
    * 1-based; each list is top-k-bounded, so the fold of full-outer joins
    * touches ≤ Σ k rows — driver-light, shuffle-tiny.
    */
  def reciprocalRankFusion(lists: Seq[DataFrame], idCol: String,
      rankCol: String, kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty)
    val contribs = lists.zipWithIndex.map { case (l, i) =>
      l.select(col(idCol), col(rankCol).cast("long").as(s"__r$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val rrf = contribs.indices
      .map(i => coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"__r$i")), lit(0.0)))
      .reduce(_ + _)
    joined.select(col(idCol), (round(rrf, 6) + 0.0).as("rrf"))
  }
}
