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
}
