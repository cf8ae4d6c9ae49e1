package graft

import graft.sources.Ingest
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  private lazy val jsonl = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl")
    val lines = Seq(
      """{"parent_asin":"B01","title":"premium widget","description":"a durable widget","features":"compact","average_rating":4.6,"rating_number":120,"price":19.99,"main_category":"Computers","categories":["Electronics","Widgets"],"store":"Acme","details":{"brand":"Acme","weight":"3 oz"},"source_dataset":"Electronics"}""",
      """{"parent_asin":"B02","title":"classic novel","description":"a long story","features":"hardcover","average_rating":3.2,"rating_number":8,"main_category":"Books","categories":["Books"],"store":null,"details":{},"source_dataset":"Books"}""")
    java.nio.file.Files.write(dir.resolve("part0.jsonl"),
      lines.mkString("\n").getBytes)
    dir.toString
  }

  test("JSONL ingest produces the 17-column embedded table") {
    val out = Ingest.produce(spark, jsonl, dims = 70)
    assert(out.schema.fieldNames.toSeq ==
      graft.sources.ProductGen.schema(70).fieldNames.toSeq)
    val rows = out.orderBy("parent_asin").collect()
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getAs[String]("categories") == "['Electronics', 'Widgets']")
    assert(r0.getAs[String]("details").contains("\"brand\":\"Acme\""))
    assert(r0.getAs[Boolean]("has_price"))
    assert(r0.getAs[String]("rating_tier") == "excellent")
    assert(r0.getAs[String]("review_volume") == "moderate")
    assert(r0.getSeq[Float](r0.fieldIndex("embedding")).length == 70)
    val r1 = rows(1)
    assert(!r1.getAs[Boolean]("has_price"))
    assert(r1.getAs[String]("rating_tier") == "medium")
    assert(r1.getAs[String]("review_volume") == "few")
  }

  test("embedding norm contract holds for ingested rows") {
    val out = Ingest.produce(spark, jsonl, dims = 70)
    val norms = out.select(graft.functions.vec_norm(col("embedding"))).collect()
    norms.foreach(r => assert(math.abs(r.getDouble(0) - math.sqrt(7)) < 1e-3))
  }

  test("variant sampling writes per-variant parquet") {
    val out = Ingest.produce(spark, jsonl, dims = 70)
    val root = java.nio.file.Files.createTempDirectory("variants").toString
    Ingest.writeVariants(out, root, Map("tiny" -> 1.0), filesPerVariant = 1)
    assert(spark.read.parquet(s"$root/tiny").count() == 2)
  }

  private lazy val strataDf = {
    import spark.implicits._
    ((0 until 1000).map(i => (s"id_a$i", "a")) ++
      (0 until 50).map(i => (s"id_b$i", "b")) ++
      (0 until 7).map(i => (s"id_c$i", "c")))
      .toDF("id", "source_dataset")
  }

  test("exactQuotaSample hits quotas exactly, not ±√n") {
    val got = Ingest.exactQuotaSample(strataDf, "source_dataset",
        Map("a" -> 300L, "b" -> 50L, "c" -> 100L))
      .groupBy("source_dataset").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: exact 300 of 1000; b: full stratum; c: quota over size → all 7;
    // no stratum outside the quota map
    assert(got == Map("a" -> 300L, "b" -> 50L, "c" -> 7L))
  }

  test("exactQuotaSample is deterministic in seed and a subset of input") {
    val s1 = Ingest.exactQuotaSample(strataDf, "source_dataset",
      Map("a" -> 100L), seed = 7L).select("id").collect().map(_.getString(0)).toSet
    val s2 = Ingest.exactQuotaSample(strataDf, "source_dataset",
      Map("a" -> 100L), seed = 7L).select("id").collect().map(_.getString(0)).toSet
    val s3 = Ingest.exactQuotaSample(strataDf, "source_dataset",
      Map("a" -> 100L), seed = 8L).select("id").collect().map(_.getString(0)).toSet
    assert(s1 == s2 && s1.size == 100)
    assert(s1 != s3, "different seeds should draw different samples")
    assert(s1.forall(_.startsWith("id_a")))
  }

  test("mixtureSample rates track weights and replay deterministically") {
    val df = spark.range(10000).toDF("id")
      .withColumn("src", concat(lit("s"), pmod(col("id"), lit(2))))
    val kept = Ingest.mixtureSample(df, "id", "src",
      Map("s0" -> 0.5), default = 0.1)
    val counts = kept.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5000 rows per stratum; binomial 3σ ≈ 106 (s0), 64 (s1)
    assert(math.abs(counts("s0") - 2500L) < 150, counts.toString)
    assert(math.abs(counts("s1") - 500L) < 100, counts.toString)
    val again = Ingest.mixtureSample(df, "id", "src",
      Map("s0" -> 0.5), default = 0.1).select("id").collect().map(_.getLong(0)).toSet
    assert(kept.select("id").collect().map(_.getLong(0)).toSet == again)
  }

  test("hashSplit covers every row once; membership stable under appends") {
    val df = spark.range(5000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = Ingest.hashSplit(df, "id", splits)
    val counts = labeled.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000L)
    assert(math.abs(counts("train") - 4000L) < 170, counts.toString)
    // the same ids keep their split when the table doubles (append-stable)
    val bigger = Ingest.hashSplit(spark.range(10000).toDF("id"), "id", splits)
    val before = labeled.filter(col("split") === "val")
      .select("id").collect().map(_.getLong(0)).toSet
    val after = bigger.filter(col("id") < 5000 && col("split") === "val")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(before == after)
  }

  test("deterministicShuffle: a permutation, globally ordered across shards") {
    val df = spark.range(2000).toDF("id")
    val shuffled = Ingest.deterministicShuffle(df, "id", seed = 7L,
      numShards = Some(8))
    // same rows, new order
    assert(shuffled.select("id").collect().map(_.getLong(0)).toSet ==
      (0L until 2000L).toSet)
    // every row of shard i precedes shard i+1: per-shard key ranges disjoint
    // and increasing (recompute the key the operator ordered by)
    val ranges = shuffled
      .withColumn("k", Ingest.uniformKey(col("id"), 7L))
      .withColumn("p", org.apache.spark.sql.functions.spark_partition_id())
      .groupBy("p").agg(min("k").as("lo"), max("k").as("hi"))
      .orderBy("p").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, ranges.toSeq.toString)
      case _ => ()
    }
    // a different seed yields a different permutation
    val other = Ingest.deterministicShuffle(df, "id", seed = 8L,
      numShards = Some(8)).collect().map(_.getLong(0)).toSeq
    assert(other != shuffled.collect().map(_.getLong(0)).toSeq)
  }

  test("writeVariants cuts exact round(fraction*stratum) counts") {
    val root = java.nio.file.Files.createTempDirectory("variants2").toString
    Ingest.writeVariants(strataDf, root, Map("v10" -> 0.1), filesPerVariant = 1)
    val got = spark.read.parquet(s"$root/v10")
      .groupBy("source_dataset").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 100L, "b" -> 5L, "c" -> 1L))
  }

  test("temperatureMixture: alpha=1 reduces to plain fractional sampling") {
    // rate_s = F·N·(n_s/N)/n_s = F for every stratum regardless of size
    val df = spark.range(9000).toDF("id")
      .withColumn("src", concat(lit("s"), pmod(col("id"), lit(3))))
    val kept = Ingest.temperatureMixture(df, "id", "src",
        alpha = 1.0, targetFraction = 0.4)
      .groupBy("src").count().collect().map(r => r.getLong(1))
    // each stratum has 3000 rows → expect ~1200 each (3σ ≈ 90)
    kept.foreach(n => assert(math.abs(n - 1200L) < 130, kept.toSeq.toString))
  }

  test("contrastiveNegatives draws m non-self negatives per row, replayably") {
    val df = spark.range(500).toDF("id")
    val negs = Ingest.contrastiveNegatives(df, "id", m = 3)
    val rows = negs.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 1500)
    // no self-negatives, all negatives exist in the corpus
    rows.foreach { case (id, _, neg) =>
      assert(neg != id && neg >= 0 && neg < 500)
    }
    // deterministic replay, and partition-layout independent
    val again = Ingest.contrastiveNegatives(df.repartition(7), "id", m = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
    // negatives are spread across the corpus, not clustered
    assert(rows.map(_._3).distinct.length > 300)
  }

  test("temperatureMixture: low alpha boosts rare strata, caps at keep-all") {
    // 9900 rows of s0, 100 of s1; alpha=0 gives each stratum HALF the
    // 0.2·10000 = 2000-row budget → s1's fair share (1000) exceeds its
    // size, so the cap keeps all 100; s0 keeps ~1000 not ~1980
    val df = spark.range(10000).toDF("id")
      .withColumn("src", when(col("id") < 9900, "s0").otherwise("s1"))
    val counts = Ingest.temperatureMixture(df, "id", "src",
        alpha = 0.0, targetFraction = 0.2)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("s1") == 100L, counts.toString)
    assert(math.abs(counts("s0") - 1010L) < 110, counts.toString)
  }

  test("temperatureMixture accepts a non-string stratum column") {
    // int language-id stratum: the count pass casts to string and
    // mixtureSample's equality coerces the same way
    val df = spark.range(6000).toDF("id")
      .withColumn("lang", pmod(col("id"), lit(3)).cast("int"))
    val kept = Ingest.temperatureMixture(df, "id", "lang",
        alpha = 1.0, targetFraction = 0.5)
      .groupBy("lang").count().collect().map(r => r.getLong(1))
    assert(kept.length == 3)
    kept.foreach(n => assert(math.abs(n - 1000L) < 120, kept.toSeq.toString))
    // FLOAT strata: comparing the raw column against a string key would
    // coerce through double ((double)1.1f != 1.1) and silently keep
    // nothing; both sides must compare as strings
    val fdf = spark.range(4000).toDF("id")
      .withColumn("b", (pmod(col("id"), lit(2)).cast("float") + 0.1f))
    val fkept = Ingest.temperatureMixture(fdf, "id", "b",
        alpha = 1.0, targetFraction = 0.5)
      .count()
    assert(math.abs(fkept - 2000L) < 150, fkept.toString)
  }
}
