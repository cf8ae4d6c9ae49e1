package graft

import graft.queries._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] implements one operator family from SURVEY.md §2
  * with idiomatic Spark; [[oracleSql]] carries the DuckDB-equivalent SQL the
  * driver hash-compares against (TESTDATA.md star schema at sf0.01).
  */
object SparkEntry {

  val allQueries: Seq[QueryDef] =
    RelationalQueries.all ++ EventQueries.all ++ VectorQueries.all ++ TextQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's marquee operator (reference `README.md:72-83`): filtered
    * dot-product top-k over the embedding column, planned as a single scan +
    * `TakeOrderedAndProject` (per-partition heaps, no shuffle of vectors).
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    val dir = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    e.filter(col("label").isin(1, 3, 5, 7))
      .select(col("vec_id"), col("label"),
        graft.functions.vec_dot(col("embedding"), typedLit(q)).as("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(10)
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map { q =>
      q.name -> ((s: SparkSession, dir: String) => {
        GraftSession.prepare(s)
        q.run(s, dir)
      })
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
