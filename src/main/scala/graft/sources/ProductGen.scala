package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Deterministic synthetic generator for the reference's 17-column product
  * table (schema per reference `reports/benchmark_100k/README.md:16-32`,
  * documented in SURVEY §1.2 / FIXTURES.md §1), including the embedding
  * contract: 7 per-field segments, each L2-normalized, concatenated — total
  * norm √7 ≈ 2.6458 (reference `reports/benchmark_10k/README.md:68-70`,
  * `README.md:51-55`).
  *
  * Everything except the embedder is pure column expressions over
  * `spark.range(n)` — fully codegen'd, no shuffle, embarrassingly parallel:
  * generating 10M rows is a single narrow stage. The embedder is the one
  * legitimate UDF boundary (it stands in for model inference, which at scale
  * runs as batched `mapPartitions` against an inference runtime; here it is
  * a seeded hash → unit-norm pseudo-embedding with the same shape contract).
  */
object ProductGen {

  /** Category weights mirroring reference `reports/sampling_analysis.json`
    * (Books ≈ 41%, long tail behind).
    */
  val categoryWeights: Seq[(String, Double)] = Seq(
    "Books" -> 0.41, "Automotive" -> 0.16, "Tools & Home Improvement" -> 0.12,
    "All Beauty" -> 0.07, "Computers" -> 0.04, "Buy a Kindle" -> 0.026,
    "Home & Kitchen" -> 0.03, "Electronics" -> 0.025, "Sports & Outdoors" -> 0.02,
    "Toys & Games" -> 0.015, "Office Products" -> 0.012, "Pet Supplies" -> 0.01,
    "Health & Personal Care" -> 0.01, "Cell Phones & Accessories" -> 0.008,
    "Grocery" -> 0.007, "Industrial & Scientific" -> 0.007)

  val sourceDatasets: Seq[String] = Seq(
    "Books", "Automotive", "Tools_and_Home_Improvement", "Electronics",
    "Beauty_and_Personal_Care")

  private val vocab: Seq[String] = Seq(
    "premium", "classic", "portable", "wireless", "steel", "cotton", "digital",
    "compact", "ergonomic", "vintage", "adjustable", "durable", "lightweight",
    "professional", "universal", "waterproof", "heavy", "duty", "kit", "set",
    "pack", "series", "edition", "guide", "manual", "handbook", "novel",
    "collection", "deluxe", "standard", "mini", "ultra", "pro", "max")

  /** Uniform [0,1) derived from the row id and a salt (xxhash64-based). */
  private def u(id: Column, salt: Int): Column =
    (pmod(xxhash64(id, lit(salt)), lit(1000000L)).cast("double") / 1000000.0)

  /** Approximate N(0,1) via sum of 4 uniforms (Irwin–Hall). */
  private def gauss(id: Column, salt: Int): Column =
    ((0 until 4).map(i => u(id, salt * 31 + i)).reduce(_ + _) - lit(2.0)) * math.sqrt(3.0)

  /** Weighted categorical pick from (value, weight) pairs. */
  private def weightedPick(id: Column, salt: Int, weights: Seq[(String, Double)],
      fallback: String): Column = {
    val r = u(id, salt)
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    weights.zip(cum).foldRight(lit(fallback): Column) {
      case (((v, _), c), acc) => when(r < c, v).otherwise(acc)
    }
  }

  /** Deterministic word salad of `n` vocab words seeded by (id, salt). */
  private def wordSalad(id: Column, salt: Int, nWords: Column): Column = {
    val vocabCol = typedLit(vocab)
    array_join(
      transform(sequence(lit(0), nWords - 1),
        i => element_at(vocabCol, (pmod(xxhash64(id, lit(salt), i), lit(vocab.size)) + 1).cast("int"))),
      " ")
  }

  /** The embedding kernel shared by the Spark UDF and the driver-local row
    * generator — one implementation, zero drift between the two paths.
    */
  def embedFields(fields: Seq[String], segDim: Int): Array[Float] = {
    val out = new Array[Float](fields.length * segDim)
    var s = 0
    while (s < fields.length) {
      var seed = scala.util.hashing.MurmurHash3.stringHash(
        if (fields(s) == null) "" else fields(s), 0x9747b28c + s).toLong
      var norm2 = 0.0
      var i = 0
      val base = s * segDim
      while (i < segDim) {
        // splitmix64 stream
        seed += 0x9e3779b97f4a7c15L
        var z = seed
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        val v = ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
        out(base + i) = v.toFloat
        norm2 += v * v
        i += 1
      }
      val inv = if (norm2 == 0.0) 0.0 else 1.0 / math.sqrt(norm2)
      i = 0
      while (i < segDim) {
        out(base + i) = (out(base + i) * inv).toFloat
        i += 1
      }
      s += 1
    }
    out
  }

  /** Distributed embedding through the [[FieldEmbedder]] seam: the UDF
    * closes over the (Serializable) embedder and ships it to executors.
    * Rows reach the adapter as size-1 batches here; an adapter that needs
    * larger batches plugs into the `mapPartitions` boundary instead (the
    * [[graft.operators.Multimodal]] pattern).
    */
  def embedUdf(embedder: FieldEmbedder): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { fields: Seq[String] => embedder.embedBatch(Seq(fields)).head }

  /** [[embedUdf]] with the deterministic stub at `segDim` per field. */
  def embedUdf(segDim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    embedUdf(StubFieldEmbedder(segDim))

  /** Generate `n` products. `dims` must be divisible by 7 (7 embedded
    * fields, reference `README.md:54`).
    */
  def products(spark: SparkSession, n: Long, dims: Int = 2688,
      partitions: Int = 32): DataFrame =
    fromIds(spark.range(0, n, 1, partitions).toDF("id"), dims)

  /** Deterministic product rows from any frame with a long `id` column —
    * batch (`spark.range`) and streaming (rate / memory source) alike, so
    * the upsert stream produces full re-embedded objects the same way the
    * bulk generator does.
    */
  def fromIds(ids: DataFrame, dims: Int = 2688): DataFrame = {
    require(dims % 7 == 0, "dims must be 7 segments")
    withDerived(baseColumns(ids), dims)
      .select(schema(dims).fieldNames.map(col).toIndexedSeq: _*)
  }

  /** The 12 base (pre-derived, pre-embedding) product columns plus the
    * original `id`. Split out of [[fromIds]] so callers that need a specific
    * write layout can repartition between generation and the (expensive)
    * embedding step — the shuffle then moves only ~1 KB of text per row, not
    * the ~11 KB embedding.
    */
  def baseColumns(ids: DataFrame): DataFrame = {
    val id = col("id")
    ids
      .withColumn("parent_asin", format_string("B%09d", id))
      .withColumn("title", wordSalad(id, 1, (pmod(xxhash64(id, lit(101)), lit(8)) + 3).cast("int")))
      .withColumn("description", wordSalad(id, 2, (pmod(xxhash64(id, lit(102)), lit(80)) + 10).cast("int")))
      .withColumn("features", wordSalad(id, 3, (pmod(xxhash64(id, lit(103)), lit(40)) + 5).cast("int")))
      .withColumn("average_rating",
        round(greatest(lit(1.0), least(lit(5.0), gauss(id, 11) * 0.76 + 4.23)), 1))
      .withColumn("rating_number",
        greatest(lit(1L), exp(gauss(id, 12) * 1.6 + 3.8).cast("long")))
      .withColumn("price",
        when(u(id, 13) < 0.42, lit(null).cast("double"))
          .otherwise(round(exp(gauss(id, 14) * 1.2 + 3.0) + 0.01, 2)))
      .withColumn("main_category",
        when(u(id, 15) < 0.007, lit(null).cast("string"))
          .otherwise(weightedPick(id, 16, categoryWeights, "Misc")))
      .withColumn("categories",
        concat(lit("['"), weightedPick(id, 17, categoryWeights, "Misc"), lit("', '"),
          wordSalad(id, 18, lit(2)), lit("']")))
      .withColumn("store",
        when(u(id, 19) < 0.026, lit(null).cast("string"))
          .otherwise(concat(lit("Store "), pmod(xxhash64(id, lit(20)), lit(5000)).cast("string"))))
      .withColumn("details",
        concat(lit("{\"brand\": \""), wordSalad(id, 21, lit(1)),
          lit("\", \"weight\": \""), pmod(xxhash64(id, lit(22)), lit(100)).cast("string"),
          lit(" oz\"}")))
      .withColumn("source_dataset",
        element_at(typedLit(sourceDatasets),
          (pmod(xxhash64(id, lit(23)), lit(sourceDatasets.size)) + 1).cast("int")))
  }

  /** Salt for repartitioning by (category, salt) ahead of a
    * `partitionBy(category)` write: each category gets a salt range sized to
    * its weight (Books ≈ 41% → ~0.41·parallelism salts), so the shuffle is
    * compute-balanced — no task owns a whole heavy category — while output
    * file count stays bounded by the total salt count (~parallelism + one
    * per tail category) instead of tasks × categories.
    */
  def categorySalt(id: Column, category: Column, parallelism: Int): Column = {
    val saltCount = categoryWeights.foldRight(lit(1L): Column) {
      case ((c, w), acc) =>
        when(category === c, lit(math.max(1L, math.ceil(w * parallelism).toLong)))
          .otherwise(acc)
    }
    pmod(xxhash64(id, lit(977)), saltCount)
  }

  /** Derived columns + embedding, applied to any frame with the 12 base
    * product columns (surface A of the reference: `combined_text`,
    * `has_price`, `rating_tier`, `review_volume`, `embedding`).
    */
  def withDerived(df: DataFrame, dims: Int): DataFrame =
    withDerived(df, StubFieldEmbedder(dims / 7))

  /** [[withDerived]] against an explicit embedding model — the adapter
    * seam for a real encoder (vector width = 7 × `embedder.segDim`).
    */
  def withDerived(df: DataFrame, embedder: FieldEmbedder): DataFrame = {
    df
      .withColumn("combined_text",
        concat_ws(" ", col("title"), col("description"), col("features"),
          col("main_category"), col("store"), col("categories"), col("details")))
      .withColumn("has_price", col("price").isNotNull)
      .withColumn("rating_tier", ratingTier(col("average_rating")))
      .withColumn("review_volume", reviewVolume(col("rating_number")))
      // embedded fields in reference order (README.md:54): title,
      // description, features, main_category, store, categories, details
      .withColumn("embedding", embedUdf(embedder)(array(
        col("title"), col("description"), col("features"),
        coalesce(col("main_category"), lit("")), coalesce(col("store"), lit("")),
        col("categories"), col("details"))))
  }

  /** 4-way rating bucket (reference `reports/summary_report.md:26-31`;
    * boundary 4.5 belongs to excellent).
    */
  def ratingTier(rating: Column): Column =
    when(rating >= 4.5, "excellent")
      .when(rating >= 4.0, "high")
      .when(rating >= 3.0, "medium")
      .otherwise("low")

  /** 4-way review-count bucket. Thresholds are unpublished (SURVEY §7.4.1);
    * cut points 50/500/5000 reproduce the published ≈48.8/34.3/13.1/3.8%
    * split on the reference's log-normal-ish count distribution.
    */
  def reviewVolume(n: Column): Column =
    when(n < 50, "few")
      .when(n < 500, "moderate")
      .when(n < 5000, "many")
      .otherwise("popular")

  /** Spark schema of the full 17-column table (SURVEY §1.2). */
  def schema(dims: Int = 2688): StructType = StructType(Seq(
    StructField("parent_asin", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("description", StringType, nullable = false),
    StructField("features", StringType, nullable = false),
    StructField("combined_text", StringType, nullable = false),
    StructField("average_rating", DoubleType, nullable = false),
    StructField("rating_number", LongType, nullable = false),
    StructField("price", DoubleType, nullable = true),
    StructField("main_category", StringType, nullable = true),
    StructField("categories", StringType, nullable = false),
    StructField("store", StringType, nullable = true),
    StructField("details", StringType, nullable = false),
    StructField("source_dataset", StringType, nullable = false),
    StructField("has_price", BooleanType, nullable = false),
    StructField("rating_tier", StringType, nullable = false),
    StructField("review_volume", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Stratified down-sampling by source file with fixed per-stratum
    * fractions (the reference's size variants are per-source quota samples,
    * SURVEY §2.10).
    */
  def sampleBySource(df: DataFrame, fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy("source_dataset", fractions, seed)

  // ---- driver-local row generation (the single-object re-embed path) ----
  //
  // A single-object upsert's "re-embedding" is an inference call, not a
  // distributed job — running the full 2688-wide column plan per streaming
  // micro-batch puts plan analysis + codegen + job scheduling on the commit
  // latency path (measured: the per-commit cost balloons under concurrent
  // readers and the stream falls into a catch-up spiral). This mirror
  // computes the EXACT same rows in plain Scala: every hash goes through the
  // same XXH64 primitives the `xxhash64` expression uses, the embedder is
  // literally the same function ([[embedFields]]), and ProductGenSpec
  // asserts column-exact parity against [[fromIds]].

  private object LocalGen {
    import org.apache.spark.sql.catalyst.expressions.XXH64

    /** xxhash64(idCol, lit(i1), ...) with Spark's seed 42 and per-type
      * hash steps (long column first, int literals after).
      */
    def xxLong(id: Long, salts: Int*): Long =
      salts.foldLeft(XXH64.hashLong(id, 42L))((h, s) => XXH64.hashInt(s, h))

    def pmod(a: Long, m: Long): Long = { val r = a % m; if (r < 0) r + m else r }

    def u(id: Long, salt: Int): Double =
      pmod(xxLong(id, salt), 1000000L).toDouble / 1000000.0

    def gauss(id: Long, salt: Int): Double =
      ((0 until 4).map(i => u(id, salt * 31 + i)).sum - 2.0) * math.sqrt(3.0)

    /** Mirrors the expression fold in [[weightedPick]] (same cumulative-sum
      * association, so double rounding matches).
      */
    def weightedPick(id: Long, salt: Int, weights: Seq[(String, Double)],
        fallback: String): String = {
      val r = u(id, salt)
      val cum = weights.scanLeft(0.0)(_ + _._2).tail
      weights.zip(cum).foldRight(fallback) {
        case (((v, _), c), acc) => if (r < c) v else acc
      }
    }

    def wordSalad(id: Long, salt: Int, nWords: Int): String =
      (0 until nWords).map { i =>
        vocab(pmod(xxLong(id, salt, i), vocab.size.toLong).toInt)
      }.mkString(" ")

    /** Spark's round(): HALF_UP decimal rounding. */
    def roundAt(x: Double, scale: Int): Double =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** One product row (the 17-column [[schema]] layout) computed entirely on
    * the calling thread — exact parity with [[fromIds]] asserted by spec.
    */
  def localRow(id: Long, dims: Int = 2688): org.apache.spark.sql.Row =
    localRow(id, dims, StubFieldEmbedder(dims / 7))

  /** [[localRow]] with an explicit embedding model — the single-object
    * re-embed seam of the streaming upsert path (runDelta's `localMap`
    * collects a micro-batch and calls this per object, the shape of
    * hitting an inference endpoint); a real adapter replaces the stub
    * here and in [[withDerived]] and the two paths stay column-exact.
    */
  def localRow(id: Long, dims: Int,
      embedder: FieldEmbedder): org.apache.spark.sql.Row = {
    import LocalGen.{pmod, roundAt, xxLong}
    require(dims % 7 == 0, "dims must be 7 segments")
    require(embedder.segDim == dims / 7,
      s"embedder segDim ${embedder.segDim} != ${dims / 7}")
    val parentAsin = "B%09d".format(id)
    val title = LocalGen.wordSalad(id, 1, (pmod(xxLong(id, 101), 8L) + 3).toInt)
    val description =
      LocalGen.wordSalad(id, 2, (pmod(xxLong(id, 102), 80L) + 10).toInt)
    val features =
      LocalGen.wordSalad(id, 3, (pmod(xxLong(id, 103), 40L) + 5).toInt)
    val averageRating =
      roundAt(math.max(1.0, math.min(5.0, LocalGen.gauss(id, 11) * 0.76 + 4.23)), 1)
    val ratingNumber = math.max(1L, math.exp(LocalGen.gauss(id, 12) * 1.6 + 3.8).toLong)
    val price: java.lang.Double =
      if (LocalGen.u(id, 13) < 0.42) null
      else java.lang.Double.valueOf(
        roundAt(math.exp(LocalGen.gauss(id, 14) * 1.2 + 3.0) + 0.01, 2))
    val mainCategory: String =
      if (LocalGen.u(id, 15) < 0.007) null
      else LocalGen.weightedPick(id, 16, categoryWeights, "Misc")
    val categories = "['" + LocalGen.weightedPick(id, 17, categoryWeights, "Misc") +
      "', '" + LocalGen.wordSalad(id, 18, 2) + "']"
    val store: String =
      if (LocalGen.u(id, 19) < 0.026) null
      else "Store " + pmod(xxLong(id, 20), 5000L)
    val details = "{\"brand\": \"" + LocalGen.wordSalad(id, 21, 1) +
      "\", \"weight\": \"" + pmod(xxLong(id, 22), 100L) + " oz\"}"
    val sourceDataset =
      sourceDatasets(pmod(xxLong(id, 23), sourceDatasets.size.toLong).toInt)
    // concat_ws skips nulls
    val combinedText = Seq(title, description, features, mainCategory, store,
      categories, details).filter(_ != null).mkString(" ")
    val hasPrice = price != null
    val ratingTier =
      if (averageRating >= 4.5) "excellent"
      else if (averageRating >= 4.0) "high"
      else if (averageRating >= 3.0) "medium"
      else "low"
    val reviewVolume =
      if (ratingNumber < 50) "few"
      else if (ratingNumber < 500) "moderate"
      else if (ratingNumber < 5000) "many"
      else "popular"
    val embedding = embedder.embedBatch(Seq(
      Seq(title, description, features,
        if (mainCategory == null) "" else mainCategory,
        if (store == null) "" else store, categories, details)))
      .head.toIndexedSeq
    // with-schema row so consumers can use name-based access (getAs),
    // matching what a collected DataFrame row provides
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](parentAsin, title, description, features, combinedText,
        averageRating, ratingNumber, price, mainCategory, categories, store,
        details, sourceDataset, hasPrice, ratingTier, reviewVolume, embedding),
      schema(dims))
  }
}
