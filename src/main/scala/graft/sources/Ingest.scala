package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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
  * are column expressions; sampling cuts EXACT per-stratum quotas (the
  * published variant counts are round numbers) via a hash-derived uniform
  * key + Bernoulli pre-restriction, so the only per-stratum sort is over
  * ~quota candidate rows — the output size — never the stratum; the only
  * other wide operation in the whole pipeline is the final `repartition`
  * that controls output file sizes.
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

  /** Exact per-stratum quota sample: for each key of `quotas` keep exactly
    * `min(quota, stratum size)` rows of that stratum, chosen uniformly at
    * random but fully deterministic in `seed`; strata absent from `quotas`
    * (and null strata) are dropped.
    *
    * Scale path: each row gets a uniform key `u` derived from
    * `xxhash64(row, seed)` (not `rand()`, which depends on physical
    * partition layout). The quota smallest `u` per stratum are the sample.
    * Ranking every row per stratum would serialize the stratum through one
    * task, so a Bernoulli pre-restriction `u < (q + 6√q + 20)/n` first
    * shrinks candidates to ~quota rows — the top-q set is a subset of the
    * candidates unless the q-th order statistic exceeds the cut, a >6σ
    * event — and only candidates are ranked: the per-stratum sort is
    * bounded by the OUTPUT size, not the stratum size. `strict` (default)
    * counts the picked rows per stratum (they are only ~Σ quotas rows) and
    * re-ranks any undershot stratum without the pre-restriction, making
    * exactness unconditional rather than whp.
    */
  def exactQuotaSample(df: DataFrame, stratumCol: String,
      quotas: Map[String, Long], seed: Long = 42L,
      strict: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val all = struct(df.columns.toIndexedSeq.map(col): _*)
    val m = 2147483647L // 2^31-1: u has ~9 decimal digits; __u2 breaks ties
    val withU = df
      .withColumn("__u", pmod(xxhash64(all, lit(seed)), lit(m)).cast("double") / m)
      .withColumn("__u2", xxhash64(all, lit(seed + 1)))
    val sizes = withU.groupBy(col(stratumCol).as("__s")).count()
      .collect().filter(!_.isNullAt(0)).map(r => r.getString(0) -> r.getLong(1)).toMap

    def pick(restricted: Boolean, only: Set[String]): DataFrame = {
      val qrows = quotas.toSeq.collect {
        case (s, q) if only.contains(s) && sizes.getOrElse(s, 0L) > 0 =>
          val n = sizes(s)
          val qq = math.min(q, n)
          val cut =
            if (!restricted || qq == n) 1.1 // keep all candidates
            else math.min(1.0, (qq + 6 * math.sqrt(qq.toDouble) + 20) / n)
          (s, qq, cut)
      }
      if (qrows.isEmpty) return withU.limit(0)
      val qdf = spark.createDataFrame(qrows).toDF("__s", "__q", "__cut")
      val w = Window.partitionBy(col(stratumCol))
        .orderBy(col("__u"), col("__u2"))
      withU.join(broadcast(qdf), col(stratumCol) === col("__s"))
        .filter(col("__u") < col("__cut"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= col("__q"))
        .drop("__s", "__q", "__cut", "__rn")
    }

    // the strict check consumes `fast` once for counts and the caller
    // consumes it again — persist it (it is only ~Σ quotas rows) so the
    // corpus-wide hash/join/window job runs once; the cache is released
    // by Spark's ContextCleaner when the returned frame is dropped
    val fast = pick(restricted = true, quotas.keySet)
    if (!strict) return fast.drop("__u", "__u2")
    fast.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val got = fast.groupBy(col(stratumCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val undershot = quotas.keySet.filter { s =>
      val want = math.min(quotas(s), sizes.getOrElse(s, 0L))
      got.getOrElse(s, 0L) < want
    }
    val result =
      if (undershot.isEmpty) fast
      else pick(restricted = true, quotas.keySet -- undershot)
        .unionByName(pick(restricted = false, undershot))
    result.drop("__u", "__u2")
  }

  /** Cut the reference's size variants as EXACT per-source quotas (the
    * published per-source counts are round numbers ⇒ stratified quotas,
    * SURVEY §2.10): each variant keeps `round(fraction · stratum size)`
    * rows per `source_dataset`, and writes one parquet dataset per variant.
    */
  def writeVariants(df: DataFrame, outRoot: String,
      variants: Map[String, Double], seed: Long = 42L,
      filesPerVariant: Int = 32): Unit = {
    val sizes = df.groupBy(col("source_dataset")).count()
      .collect().filter(!_.isNullAt(0)).map(r => r.getString(0) -> r.getLong(1)).toMap
    variants.foreach { case (name, fraction) =>
      val quotas = sizes.map { case (s, n) => s -> math.round(fraction * n) }
      exactQuotaSample(df, "source_dataset", quotas, seed)
        .repartition(filesPerVariant)
        .write.mode("overwrite").parquet(s"$outRoot/$name")
    }
  }

  /** Cross-engine uniform key in [0,1): the top 52 bits of md5(id:seed),
    * scaled by 2^-52. 52 bits keeps the integer exactly representable in a
    * double, so Spark and any SQL oracle computing the same expression get
    * bit-identical keys — sampling decisions replay everywhere. Pure
    * column expression; no rand(), so results don't depend on partition
    * layout.
    */
  /** 52-bit cross-engine hash of a string column: first 13 hex chars of the
    * md5 parsed as an integer — 52 bits so the value (and any ratio of it)
    * fits a double exactly; reproducible verbatim in DuckDB SQL.
    */
  def hash52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  def uniformKey(id: Column, seed: Long): Column =
    hash52(concat(id.cast("string"), lit(s":$seed")))
      .cast("double") / lit(4503599627370496.0)

  /** Training-mixture sampling: keep each row with a per-stratum rate —
    * "30% web, 100% books, 5% logs" dataset mixing. Deterministic in
    * (id, seed); strata absent from `weights` use `default`.
    * One narrow filter over the scan — no shuffle, any skew irrelevant.
    */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
      weights: Map[String, Double], default: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    require((weights.values ++ Seq(default)).forall(w => w >= 0 && w <= 1))
    val rate = weights.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(uniformKey(col(idCol), seed) < rate)
  }

  /** Temperature-scaled mixture: derive the per-stratum keep rates from the
    * corpus itself so a dominant source is down-sampled and rare sources
    * keep more of their data — stratum s gets share n_s^alpha / Σ n_t^alpha
    * of a `targetFraction`·N-row budget (alpha=1 reproduces the natural
    * distribution, alpha→0 approaches uniform across strata; the standard
    * rebalancing for multilingual/multi-source training corpora). Rates are
    * rounded to 9 decimals (so any engine recomputing them agrees bitwise)
    * and capped at 1 — a stratum whose fair share exceeds its size keeps
    * everything, it is never upsampled with replacement.
    *
    * Cost: one tiny count-by-stratum pass (collected — stratum cardinality
    * is small by definition), then [[mixtureSample]]'s narrow filter.
    */
  def temperatureMixture(df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double, targetFraction: Double, seed: Long = 42L): DataFrame = {
    require(alpha >= 0 && targetFraction > 0 && targetFraction <= 1)
    // null strata fall through to mixtureSample's default rate 0 (dropped).
    // The stratum is cast to string on BOTH sides — here for the counts AND
    // below for the sampling comparison — so non-string stratum columns (an
    // int language id, a date, a float bucket) work exactly: comparing the
    // original column against the string key would coerce through double
    // for float strata ((double)1.1f != 1.1) and silently match nothing.
    val counts = df
      .groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect().filter(!_.isNullAt(0)).map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val powSum = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    val rates = counts.map { case (s, n) =>
      val share = math.pow(n.toDouble, alpha) / powSum
      val rate = targetFraction * total * share / n
      s -> math.min(1.0, BigDecimal(rate)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    mixtureSample(
      df.withColumn("__stratum_str", col(stratumCol).cast("string")),
      idCol, "__stratum_str", rates, default = 0.0, seed)
      .drop("__stratum_str")
  }

  /** Contrastive negative sampling: for every row, `m` pseudo-random OTHER
    * rows of the corpus — the (anchor, negative) pair generator behind
    * contrastive / triplet embedding training. Negatives are drawn by
    * hashing (id, j, seed) onto the corpus's dense rank space, so the draw
    * is deterministic, uniform, and replayable on any cluster layout; a
    * self-collision shifts to the next rank. Output: (idCol, j, neg_<idCol>).
    *
    * Scale shape: the dense rank is computed with the range-partition +
    * offset trick (no single-task global sort), the generator is a narrow
    * m-way explode, and both joins are keyed on uniform ranks — everything
    * shuffles on ids/ranks, never on payload columns.
    *
    * Ids must be unique and non-null: a duplicated id would occupy two
    * ranks and could draw its own twin as a "negative"; null ids are
    * excluded up front (they cannot be hashed or referenced).
    */
  def contrastiveNegatives(df: DataFrame, idCol: String, m: Int,
      seed: Long = 42L): DataFrame = {
    require(m > 0)
    // dense rank 0..n-1 over idCol, scale-safe
    val parted = df.select(col(idCol))
      .filter(col(idCol).isNotNull)
      .repartitionByRange(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col(idCol))
    val local = parted.withColumn("__lrn",
      row_number().over(w).cast("long") - 1L)
    val byPid = org.apache.spark.sql.expressions.Window.orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .select(col("__pid"), coalesce(sum(col("__c")).over(byPid), lit(0L)).as("__off"))
    val ranks = local.join(broadcast(offsets), "__pid")
      .select(col(idCol), (col("__off") + col("__lrn")).as("__rank"))
      .localCheckpoint()
    // counting the checkpointed projection avoids a second scan of df
    val n = ranks.count()
    require(n > 1, "need at least two rows to draw negatives")
    // m hash draws per row, shifted off self-collisions
    val draws = ranks
      .select(col(idCol), col("__rank").as("__self"),
        explode(array((1 to m).map(lit): _*)).as("j"))
      .withColumn("__r",
        hash52(concat(col(idCol).cast("string"), lit(":"),
          col("j").cast("string"), lit(s":$seed"))) % n)
      .withColumn("__r",
        when(col("__r") === col("__self"), (col("__r") + 1) % n)
          .otherwise(col("__r")))
    draws.join(ranks.select(col(idCol).as(s"neg_$idCol"),
        col("__rank").as("__r")), Seq("__r"))
      .select(col(idCol), col("j"), col(s"neg_$idCol"))
  }

  /** Deterministic global corpus shuffle — "shuffle the training data,
    * reproducibly": order rows by their [[uniformKey]] via ONE
    * `repartitionByRange` + in-task sort, so shard i's every row precedes
    * shard i+1's (writing shards in filename order replays the exact
    * permutation on any cluster size). Seed changes give independent
    * epoch orders; no `rand()`, so the permutation survives retries,
    * repartitioning, and speculative execution.
    *
    * This is the one operation where a full shuffle is the POINT — range
    * partitioning on the 52-bit key splits uniformly (keys are uniform by
    * construction), so no skew, and each task sorts only its range.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 42L,
      numShards: Option[Int] = None): DataFrame = {
    val keyed = df.withColumn("__shuffle_key", uniformKey(col(idCol), seed))
    val shards = numShards.getOrElse(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    // idCol as a secondary key everywhere ties can occur: colliding 52-bit
    // keys (duplicate ids, or birthday collisions at ~10^8+ rows) would
    // otherwise order by arrival, breaking determinism under retries
    keyed.repartitionByRange(shards, col("__shuffle_key"), col(idCol))
      .sortWithinPartitions(col("__shuffle_key"), col(idCol))
      .drop("__shuffle_key")
  }

  /** Deterministic train/val/test assignment: label each row by where its
    * uniform key falls in the cumulative `fractions` ranges (must sum to
    * 1). Hash-based, so membership is stable under reprocessing, appends,
    * and repartitioning — the property a training split needs; adds a
    * `split` column. Narrow projection, no shuffle.
    */
  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9)
    val u = uniformKey(col(idCol), seed)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val first = when(u < cum.head, fractions.head._1)
    val label = fractions.tail.zip(cum.tail).dropRight(1)
      .foldLeft(first) { case (acc, ((name, _), hi)) => acc.when(u < hi, name) }
      .otherwise(fractions.last._1)
    df.withColumn("split", label)
  }

  /** Weighted sample WITHOUT replacement of n rows, inclusion probability
    * proportional to `weightCol` — "sample training docs by quality score"
    * in one pass. Efraimidis–Spirakis A-ES keys: each row draws
    * key = ln(u)/w (u uniform from the row's id hash), and the n LARGEST
    * keys are exactly a weight-proportional sample; equivalent to u^(1/w)
    * but ln keeps the full double range for tiny weights instead of
    * underflowing to 1.
    *
    * Scale shape: a narrow per-row projection followed by ORDER BY+LIMIT —
    * Spark plans `TakeOrderedAndProject` (per-partition n-row heaps, only
    * n·partitions rows ever move). No groupBy, no window, no full sort.
    * The ordering key is NOT pre-rounded: keys crowd toward 0 as the corpus
    * grows, so any fixed rounding would collapse the whole selection
    * boundary into ties and hand the choice to the id tiebreak. The raw
    * key is a pure function of (id hash, weight) — deterministic under
    * retries — and the id tiebreak covers exact hash collisions. Rows with
    * null or non-positive weight are excluded (zero inclusion probability
    * by definition).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int, seed: Long = 42L): DataFrame = {
    require(n > 0)
    // (hash+1)/2^52 ∈ (0,1]: ln is finite for every row (ln(0) would send
    // an unlucky 1-in-2^52 row to -inf, silently unsampleable)
    val u = (hash52(concat(col(idCol).cast("string"), lit(s":$seed")))
      .cast("double") + 1.0) / lit(4503599627370496.0)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("sample_key", log(u) / col(weightCol))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(n)
  }

  /** Epoch-repetition mixture: emit each row `epochs(stratum)` times in
    * expectation — the fractional-epoch upsampling of data-mixing recipes
    * ("2.7 epochs of books, 0.3 of web"). A weight e repeats every row
    * ⌊e⌋ times plus one more for the hash-chosen e−⌊e⌋ fraction of ids,
    * so the OUTPUT is deterministic row-exact, not an expectation over
    * rand(): reruns, retries, and any partition layout produce the same
    * multiset. Adds `epoch` (1-based copy index) — downstream shuffling by
    * (id, epoch) interleaves copies across the corpus. Weights < 1
    * subsample (0 copies possible); strata absent from `epochs` use
    * `default`.
    *
    * Narrow generate over the scan — per-row fan-out is ⌈e⌉, no shuffle.
    */
  def epochRepeat(df: DataFrame, idCol: String, stratumCol: String,
      epochs: Map[String, Double], default: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    require((epochs.values ++ Seq(default)).forall(_ >= 0))
    // compare as string on BOTH sides (same fix as temperatureMixture):
    // a numeric stratum column compared against a string key would
    // otherwise cast the strings to numbers and silently match nothing
    val e = epochs.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (k, v)) =>
        when(col(stratumCol).cast("string") === k, lit(v)).otherwise(acc)
    }
    val u = uniformKey(col(idCol), seed)
    val copies = (floor(e) +
      when(u < e - floor(e), 1L).otherwise(0L)).cast("int")
    df.withColumn("epoch", explode(
      when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }
}
