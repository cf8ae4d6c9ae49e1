package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Surface A of the reference: the dataset production pipeline (reference
  * `README.md:45-56`) — ingest Amazon-Reviews-2023-shaped product metadata
  * JSONL, flatten the nested `categories` list and `details` map to strings
  * (reference `README.md:17`), derive `combined_text` / `has_price` /
  * `rating_tier` / `review_volume`, embed the 7 text fields and concatenate
  * (stub embedder, same shape contract), then cut per-source quota samples
  * and write parquet size variants.
  *
  * Scale notes: JSONL ingest is a narrow scan (Spark's native JSON source
  * with an explicit schema — no inference pass over 100 TB); all derivations
  * are column expressions; sampling uses `stat.sampleBy` (per-stratum
  * Bernoulli, no shuffle); the only wide operation in the whole pipeline is
  * the final `repartition` that controls output file sizes.
  */
object Ingest {

  /** Upstream Amazon-metadata-ish schema (pre-flattening): `categories` is a
    * real list and `details` a real map, as in the raw source.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("parent_asin", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("features", StringType),
    StructField("average_rating", DoubleType),
    StructField("rating_number", LongType),
    StructField("price", DoubleType),
    StructField("main_category", StringType),
    StructField("categories", ArrayType(StringType)),
    StructField("store", StringType),
    StructField("details", MapType(StringType, StringType)),
    StructField("source_dataset", StringType)))

  /** Read JSONL with the explicit schema (no sampling/inference job). */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(rawSchema).json(path)

  /** Flatten nested columns to the published string forms: `categories` list
    * → stringified list (null/empty → `[]`, not `['']`), `details` map →
    * stringified JSON object.
    */
  def flatten(df: DataFrame): DataFrame = df
    .withColumn("categories",
      when(col("categories").isNull || size(col("categories")) === 0, lit("[]"))
        .otherwise(concat(lit("['"), array_join(col("categories"), "', '"),
          lit("']"))))
    .withColumn("details", coalesce(to_json(col("details")), lit("{}")))

  /** Full production pipeline: raw JSONL → 17-column embedded table. */
  def produce(spark: SparkSession, jsonlPath: String, dims: Int = 2688): DataFrame = {
    val flat = flatten(readJsonl(spark, jsonlPath))
      .na.fill(Map("title" -> "", "description" -> "", "features" -> "",
        "source_dataset" -> "unknown"))
    ProductGen.withDerived(flat, dims)
      .select(ProductGen.schema(dims).fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Cut the reference's size variants by per-source quota sampling (the
    * published per-source counts are round numbers ⇒ stratified quotas,
    * SURVEY §2.10) and write one parquet dataset per variant.
    */
  def writeVariants(df: DataFrame, outRoot: String,
      variants: Map[String, Double], seed: Long = 42L,
      filesPerVariant: Int = 32): Unit = {
    val strata = df.select("source_dataset").distinct()
      .collect().map(_.getString(0))
    variants.foreach { case (name, fraction) =>
      val fractions = strata.map(_ -> fraction).toMap
      df.stat.sampleBy("source_dataset", fractions, seed)
        .repartition(filesPerVariant)
        .write.mode("overwrite").parquet(s"$outRoot/$name")
    }
  }
}
