package graft.queries

import graft.Tables
import graft.functions.{vec_cos, vec_dot, vec_norm}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector/embedding operator inventory (the reference's distinctive
  * surface): L2-norm profiling (reference `gbr.py:271-273`), dot-product
  * top-k retrieval (reference `README.md:73-75`), per-dimension moments
  * (reference `gbr.py:511-512`), pairwise cosine similarity (reference
  * `gbr.py:527-539`) and k-NN. All scoring goes through the codegen'd
  * kernels in [[graft.functions]].
  *
  * Scale notes: top-k is planned as `TakeOrderedAndProject` (per-partition
  * heaps, no shuffle of the embedding column); k-NN broadcasts the query
  * side; at 100 TB the same plans hold because the big side never shuffles.
  */
object VectorQueries {

  /** DuckDB-side dot product with the same double-precision sequential
    * accumulation as [[graft.functions.DotProduct]].
    */
  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * x[2]))"

  private def sqlNormSq(a: String): String =
    s"list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * x))"

  val all: Seq[QueryDef] = Seq(

    // ---- L2 norm profile per label (gbr.py:271-272 norm stats) ----
    QueryDef(
      "q25_vec_norm_stats",
      (s, d) => {
        Tables.embeddings(s, d)
          .select(col("label"), vec_norm(col("embedding")).as("nm"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("nm")), 4).as("avg_norm"),
            round(min(col("nm")), 4).as("min_norm"),
            round(max(col("nm")), 4).as("max_norm"))
          .orderBy(col("label"))
      },
      Some(s"""SELECT label, count(*) AS n,
        round(avg(nm), 4) AS avg_norm,
        round(min(nm), 4) AS min_norm,
        round(max(nm), 4) AS max_norm
        FROM (SELECT label, sqrt(${sqlNormSq("embedding")}) AS nm FROM embeddings) t
        GROUP BY label ORDER BY label""")),

    // ---- the marquee operator: dot-product top-k (README.md:73-75) ----
    QueryDef(
      "q26_vec_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).toArray
        e.select(col("vec_id"),
            (round(vec_dot(col("embedding"), typedLit(q)), 4) + 0.0).as("score"))
          .orderBy(desc("score"), col("vec_id"))
          .limit(20)
      },
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, round(${sqlDot("e.embedding", "q.qv")}, 4) + 0 AS score
        FROM embeddings e CROSS JOIN q
        ORDER BY score DESC, vec_id LIMIT 20""")),

    // ---- per-dimension moments (gbr.py:511-512), first 8 dims ----
    QueryDef(
      "q27_vec_dim_stats",
      (s, d) => {
        Tables.embeddings(s, d)
          .select(posexplode(col("embedding")).as(Seq("pos", "e")))
          .filter(col("pos") < 8)
          .groupBy((col("pos") + 1).cast("long").as("dim"))
          .agg((round(avg(col("e").cast("double")), 5) + 0.0).as("mean"),
            (round(min(col("e").cast("double")), 5) + 0.0).as("mn"),
            (round(max(col("e").cast("double")), 5) + 0.0).as("mx"))
          .orderBy(col("dim"))
      },
      Some("""SELECT i AS dim, round(avg(CAST(e AS DOUBLE)), 5) + 0 AS mean,
        round(min(CAST(e AS DOUBLE)), 5) + 0 AS mn,
        round(max(CAST(e AS DOUBLE)), 5) + 0 AS mx
        FROM (SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS e
          FROM embeddings) t
        WHERE i <= 8 GROUP BY i ORDER BY i""")),

    // ---- sampled pairwise cosine distribution (gbr.py:527-539) ----
    QueryDef(
      "q28_vec_cosine_pairs",
      (s, d) => {
        val e = Tables.embeddings(s, d).filter(col("vec_id") < 30)
        val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"))
        val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"))
        a.join(b, col("id1") < col("id2"))
          .select(col("id1"), col("id2"),
            (round(vec_cos(col("e1"), col("e2")), 4) + 0.0).as("cos"))
          .orderBy(col("id1"), col("id2"))
      },
      Some(s"""SELECT a.vec_id AS id1, b.vec_id AS id2,
        round(${sqlDot("a.embedding", "b.embedding")} /
          (sqrt(${sqlNormSq("a.embedding")}) * sqrt(${sqlNormSq("b.embedding")})), 4) + 0 AS cos
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < 30 AND b.vec_id < 30 AND a.vec_id < b.vec_id
        ORDER BY id1, id2""")),

    // ---- k-NN: top-3 neighbors by dot product for the first 10 vectors ----
    QueryDef(
      "q29_vec_knn",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val cand = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
        val scored = broadcast(q).join(cand, col("qid") =!= col("nid"))
          .select(col("qid"), col("nid"),
            (round(vec_dot(col("qe"), col("ne")), 4) + 0.0).as("score"))
        val w = Window.partitionBy(col("qid")).orderBy(desc("score"), col("nid"))
        scored.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("qid"), col("nid"), col("rnk"), col("score"))
          .orderBy(col("qid"), col("rnk"))
      },
      Some(s"""SELECT qid, nid, rnk, score FROM (
        SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rnk, score
        FROM (SELECT a.vec_id AS qid, b.vec_id AS nid,
          round(${sqlDot("a.embedding", "b.embedding")}, 4) + 0 AS score
          FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id <> a.vec_id) t0) t1
        WHERE rnk <= 3 ORDER BY qid, rnk""")),

    // ---- single-pass per-dim moments via MLlib Summarizer (the 100 TB
    //      alternative to the posexplode path of q27) ----
    QueryDef(
      "q44_dim_summary",
      (s, d) => {
        graft.operators.Embedding.perDimensionSummary(
            Tables.embeddings(s, d), "embedding")
          .filter(col("dim") < 8)
          .select((col("dim") + 1).cast("long").as("dim"),
            (round(col("mean"), 5) + 0.0).as("mean"),
            (round(col("min"), 5) + 0.0).as("mn"),
            (round(col("max"), 5) + 0.0).as("mx"))
          .orderBy(col("dim"))
      },
      Some("""SELECT i AS dim, round(avg(CAST(e AS DOUBLE)), 5) + 0 AS mean,
        round(min(CAST(e AS DOUBLE)), 5) + 0 AS mn,
        round(max(CAST(e AS DOUBLE)), 5) + 0 AS mx
        FROM (SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS e
          FROM embeddings) t
        WHERE i <= 8 GROUP BY i ORDER BY i""")),

    // ---- embedding-cosine near-dup via sign-LSH buckets (axis-aligned
    //      planes so the oracle reproduces the bucketing exactly) ----
    QueryDef(
      "q45_embed_near_dup",
      (s, d) => {
        graft.operators.Dedup.embeddingNearDupPairs(
            Tables.embeddings(s, d), "embedding", "vec_id",
            threshold = 0.3, planes = 8)
          .select(col("id1"), col("id2"),
            (round(col("cosine"), 4) + 0.0).as("cosine"))
          .orderBy(col("id1"), col("id2"))
      },
      Some(s"""WITH e AS (
        SELECT vec_id, embedding,
          concat(
            CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
            CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
            CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
            CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
            CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
            CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
            CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
            CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) AS bucket
        FROM embeddings)
        SELECT id1, id2, round(cos, 4) + 0 AS cosine FROM (
          SELECT a.vec_id AS id1, b.vec_id AS id2,
            ${sqlDot("a.embedding", "b.embedding")} /
              (sqrt(${sqlNormSq("a.embedding")}) * sqrt(${sqlNormSq("b.embedding")})) AS cos
          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) t
        WHERE cos >= 0.3 ORDER BY id1, id2""")),

    // ---- per-dim moments via the typed Aggregator (UDAF surface,
    //      SURVEY §2.12) — third execution path for the same semantics ----
    QueryDef(
      "q48_dim_udaf",
      (s, d) => {
        Tables.embeddings(s, d)
          .agg(udaf(graft.functions.VectorMoments.aggregator)
            .apply(col("embedding")).as("m"))
          .select(explode(col("m")).as("z"))
          .select((col("z.dim") + 1).cast("long").as("dim"),
            (round(col("z.mean"), 5) + 0.0).as("mean"),
            (round(col("z.std"), 4) + 0.0).as("std"))
          .filter(col("dim") <= 8)
          .orderBy(col("dim"))
      },
      Some("""SELECT i AS dim, round(avg(CAST(e AS DOUBLE)), 5) + 0 AS mean,
        round(stddev(CAST(e AS DOUBLE)), 4) + 0 AS std
        FROM (SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS e
          FROM embeddings) t
        WHERE i <= 8 GROUP BY i ORDER BY i""")),

    // ---- PCA(2) projection (gbr.py:449-450). Component signs are
    //      implementation-defined, so no SQL oracle: the driver records the
    //      rows-only check; PCASpec asserts the math (variance ordering,
    //      orthogonality, reconstruction) ----
    QueryDef(
      "q46_pca_project",
      (s, d) => {
        graft.operators.Embedding.pcaProject(
            Tables.embeddings(s, d), "embedding", k = 2)
          .select(col("vec_id"), col("label"),
            round(col("pc").getItem(0), 4).as("pc1"),
            round(col("pc").getItem(1), 4).as("pc2"))
          .orderBy(col("vec_id"))
      },
      None)
  )
}
