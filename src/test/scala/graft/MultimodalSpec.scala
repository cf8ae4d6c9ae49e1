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

  test("frame sampling emits only video rows with bounded frame count") {
    val frames = Multimodal.sampleFrames(media)
    val ids = frames.select("media_id").distinct().count()
    val videos = media.filter(col("modality") === "video").count()
    assert(ids == videos)
    assert(frames.groupBy("media_id").count().agg(max("count")).head().getLong(0) <= 8)
  }
}
