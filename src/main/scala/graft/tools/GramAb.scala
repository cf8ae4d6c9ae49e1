package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired same-session A/B for the r18 q105/q106 gram-persist question
  * (r17 verdict task 1): `duplicatedWindows` feeds both the dup aggregate
  * and the join probe side, so WITHOUT a persist the corpus
  * split+posexplode+xxhash64 pass runs twice per query. The persist trades
  * one tokenize pass for writing/reading the narrow (id, pos, gh) cache
  * (~20 B per token position, MEMORY_AND_DISK_SER).
  *
  * Methodology: both modes run ALTERNATING (off, on, off, on, ...) inside
  * ONE session so device drift cancels; each timed point is the full
  * declared-query computation (q105 substringDupStats + orderBy, q106
  * scrubRepeatedSubstrings + md5 projection) driven through the noop sink
  * (guide §1.4). Two corpora: the sf0.1 documents table (the bench scale)
  * and a token-renamed `SPARK_GRAFT_GRAM_REPLICAS`× replication (replicas
  * share no 5-gram windows — scales the tokenize pass without collapsing
  * the dup structure; NearDupScale's corpus recipe), which stands in for
  * the at-scale regime where the tokenize pass dominates.
  *
  * Env: SPARK_GRAFT_GRAM_REPLICAS (default 10; 0 skips the scaled tier),
  * SPARK_GRAFT_REPS (default 3 pairs per mode), SPARK_GRAFT_WORK_DIR.
  */
object GramAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val replicas = sys.env.getOrElse("SPARK_GRAFT_GRAM_REPLICAS", "10").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = sys.env.get("SPARK_GRAFT_WORK_DIR").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_gramab").toString)
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$base/spark-local")
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    spark.range(1000).select(sum(col("id"))).collect()

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    def q105(df: DataFrame): DataFrame =
      Dedup.substringDupStats(df, "text", "doc_id", k = 5)
        .orderBy(col("doc_id"))
    def q106(df: DataFrame): DataFrame =
      Dedup.scrubRepeatedSubstrings(df, "text", "doc_id", k = 5)
        .select(col("doc_id"), md5(col("scrubbed")).as("scrub_md5"),
          col("kept_tokens"))
        .orderBy(col("doc_id"))

    def timeOne(tag: String, mk: DataFrame => DataFrame,
        corpus: DataFrame): Unit = {
      (1 to reps).foreach { r =>
        Seq(false, true).foreach { mode =>
          Dedup.gramPersist = mode
          spark.sparkContext.setJobDescription(
            s"gramab $tag persist=$mode rep$r")
          val t0 = System.nanoTime()
          mk(corpus).write.mode("overwrite").format("noop").save()
          val w = (System.nanoTime() - t0) / 1e9
          val key = s"${tag}_${if (mode) "on" else "off"}_rep${r}_value"
          results(key) = w
          println(f"[gramab] $key = $w%.3f s")
        }
      }
      // leave nothing cached between tiers
      Dedup.gramPersist = false
      spark.catalog.clearCache()
      Dedup.gramPersist = true
    }

    val docs = graft.Tables.documents(spark, sfDir)
    // warm codegen/readers once so rep1 of the A/B is not the cold outlier
    q105(docs).write.mode("overwrite").format("noop").save()
    timeOne("q105_1x", q105, docs)
    timeOne("q106_1x", q106, docs)

    if (replicas > 0) {
      val path = s"$base/docs_${replicas}x"
      docs.select(explode(sequence(lit(0L), lit(replicas - 1L))).as("__k"),
          col("doc_id"), col("text"), col("lang"))
        .select((col("doc_id") + col("__k") * 100000000L).as("doc_id"),
          when(col("__k") === 0, col("text")).otherwise(
            concat_ws(" ", transform(split(col("text"), " "),
              w => concat(w, lit("_"), col("__k"))))).as("text"),
          col("lang"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(path)
      val corpus = spark.read.parquet(path)
      results(s"corpus_rows_${replicas}x_value") = corpus.count().toDouble
      q105(corpus).write.mode("overwrite").format("noop").save() // warm
      timeOne(s"q105_${replicas}x", q105, corpus)
      timeOne(s"q106_${replicas}x", q106, corpus)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"gram_ab","replicas":$replicas,"queries":$qs}""")
    if (sys.env.get("SPARK_GRAFT_WORK_DIR").isEmpty)
      graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
