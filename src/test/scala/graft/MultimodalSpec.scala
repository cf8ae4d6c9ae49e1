package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthesize(spark, 30, partitions = 2).cache()

  test("synthetic media has binary payloads and typed metadata") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.count() == 30)
    val mods = media.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("feature extraction decodes headers and is deterministic") {
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 30)
    f1.foreach { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w >= 32 && w < 128 && h >= 32 && h < 128)
      val entropy = r.getAs[Double]("byte_entropy")
      assert(entropy >= 0.0 && entropy <= 4.0) // 16-bucket entropy bound
    }
    // metadata in features must match the meta struct
    val meta = media.select(col("media_id"), col("meta.width"), col("meta.height")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    f1.foreach(r => assert(meta(r.getAs[Long]("media_id")) ==
      (r.getAs[Int]("width"), r.getAs[Int]("height"))))
  }

  test("resize updates metadata and shrinks payloads, schema preserved") {
    val resized = Multimodal.resize(media, 16, 16)
    assert(resized.schema.fieldNames.toSeq == media.schema.fieldNames.toSeq)
    val rows = resized.select(col("media_id"), col("meta.width"),
      col("meta.height"), length(col("payload")).as("len")).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      assert(r.getInt(1) == 16 && r.getInt(2) == 16)
      assert(r.getInt(3) <= 6 + 64) // header + at most original content
    }
    // resized payloads decode through the same feature extractor
    val feats = Multimodal.extractFeatures(resized).collect()
    assert(feats.forall(f => f.getAs[Int]("width") == 16))
    // deterministic
    val again = Multimodal.resize(media, 16, 16)
      .select("media_id", "payload").collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    val first = resized.select("media_id", "payload").collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    assert(again.sortBy(_._1).toSeq == first.sortBy(_._1).toSeq)
  }

  test("frame sampling emits only video rows with bounded frame count") {
    val frames = Multimodal.sampleFrames(media)
    val ids = frames.select("media_id").distinct().count()
    val videos = media.filter(col("modality") === "video").count()
    assert(ids == videos)
    assert(frames.groupBy("media_id").count().agg(max("count")).head().getLong(0) <= 8)
  }
}
