package graft

import graft.functions.vec_norm
import graft.sources.ProductGen
import org.apache.spark.sql.functions._

class ProductGenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = ProductGen.products(spark, 2000, dims = 70, partitions = 4).cache()

  test("schema matches the 17-column contract") {
    assert(df.schema.fieldNames.toSeq == ProductGen.schema(70).fieldNames.toSeq)
  }

  test("embedding norm contract: every vector has norm sqrt(7)") {
    val norms = df.select(vec_norm($"embedding").as("n"))
      .agg(min("n"), max("n")).head()
    assert(math.abs(norms.getDouble(0) - math.sqrt(7)) < 1e-3)
    assert(math.abs(norms.getDouble(1) - math.sqrt(7)) < 1e-3)
  }

  test("generation is deterministic") {
    val again = ProductGen.products(spark, 50, dims = 70, partitions = 2)
    val a = df.filter($"parent_asin" < "B000000050")
      .orderBy("parent_asin").select("parent_asin", "title", "average_rating").collect()
    val b = again.orderBy("parent_asin")
      .select("parent_asin", "title", "average_rating").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("null rates approximate the reference (price ~42%, category ~0.7%)") {
    val r = df.agg(
      avg($"price".isNull.cast("double")),
      avg($"main_category".isNull.cast("double"))).head()
    assert(math.abs(r.getDouble(0) - 0.42) < 0.05)
    assert(r.getDouble(1) < 0.03)
  }

  test("rating_tier boundary: 4.5 is excellent, 4.4 high, 2.9 low") {
    val t = Seq(4.5, 4.4, 3.0, 2.9).toDF("r")
      .select(ProductGen.ratingTier($"r")).as[String].collect().toSeq
    assert(t == Seq("excellent", "high", "medium", "low"))
  }

  test("review_volume buckets roughly match published distribution") {
    val dist = df.groupBy("review_volume").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) * 1.0 / 2000).toMap
    // reference: few 48.8 / moderate 34.3 / many 13.1 / popular 3.8 (%)
    assert(math.abs(dist.getOrElse("few", 0.0) - 0.488) < 0.15)
    assert(math.abs(dist.getOrElse("moderate", 0.0) - 0.343) < 0.15)
    assert(dist.getOrElse("popular", 0.0) < 0.12)
  }

  test("has_price / combined_text derivations hold") {
    assert(df.filter($"has_price" =!= $"price".isNotNull).count() == 0)
    assert(df.filter(length($"combined_text") === 0).count() == 0)
  }

  test("localRow mirrors fromIds column-exactly (the re-embed parity contract)") {
    // small ids + the tier's far-offset id range, incl. enough rows to hit
    // the null branches (price ~42%, store ~2.6%, category ~0.7%)
    val ids = (0L until 400L) ++ (10000000000L until 10000000100L) ++
      (20000000000L until 20000000050L)
    val dims = 70
    val sparkRows = ProductGen.fromIds(
        ids.toDF("id").repartition(4), dims)
      .collect().map(r => r.getString(0) -> r).toMap
    ids.foreach { id =>
      val local = ProductGen.localRow(id, dims)
      val viaSpark = sparkRows(local.getString(0))
      (0 until local.length).foreach { i =>
        val (a, b) = (viaSpark.get(i), local.get(i))
        assert(a == b,
          s"id=$id col=${ProductGen.schema(dims).fieldNames(i)}: spark=$a local=$b")
      }
    }
    assert(ids.forall(id => sparkRows.contains("B%09d".format(id))))
  }

  test("FieldEmbedder seam: a custom adapter drives both embed paths") {
    // a trivially-verifiable "model": every field embeds to a constant
    // unit vector scaled by the field's length parity — distinguishable
    // from the stub on every row
    final case class FakeModel(segDim: Int) extends graft.sources.FieldEmbedder {
      override def embedBatch(rows: Seq[Seq[String]]): Seq[Array[Float]] =
        rows.map { fields =>
          fields.toArray.flatMap { f =>
            val v = if (f != null && f.length % 2 == 0) 1.0f else -1.0f
            Array.tabulate(segDim)(i => if (i == 0) v else 0.0f)
          }
        }
      override def name: String = "fake-parity-model"
    }
    val dims = 14
    val viaSpark = ProductGen.withDerived(
        ProductGen.baseColumns((0L until 20L).toDF("id")), FakeModel(2))
      .select($"parent_asin", $"embedding")
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    (0L until 20L).foreach { id =>
      val local = ProductGen.localRow(id, dims, FakeModel(2))
      val emb = local.getAs[Seq[Float]]("embedding")
      assert(viaSpark(local.getString(0)) == emb, s"id=$id")
      // the fake model's signature, not the stub's: segments are one-hot
      assert(emb.count(_ != 0.0f) == 7, s"id=$id got $emb")
    }
    // segDim mismatch is a compile-to-runtime contract violation
    intercept[IllegalArgumentException] {
      ProductGen.localRow(0L, dims, FakeModel(3))
    }
  }
}
