package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / frame-sample operators.
  *
  * The actual codecs are NOT in this container, so the decode kernels are
  * clearly-marked deterministic STUBS (they parse our own synthetic header
  * layout). Everything Spark-side — schema, batched `mapPartitions`
  * execution, partitioning, output shapes — is real: swapping the stub for
  * a JNI/FFmpeg/Pillow-equivalent call changes only the function body.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no row-level decode
  * until the extract operator), decode runs batched per partition so a real
  * codec amortizes init cost, and outputs are fixed-width feature rows —
  * orders of magnitude smaller than inputs, which is what you shuffle, never
  * the payloads.
  */
object Multimodal {

  /** Synthetic payload header: [modality:1][width:2][height:2][channels:1]
    * then pseudo-random content bytes.
    */
  val ModImage: Byte = 1
  val ModAudio: Byte = 2
  val ModVideo: Byte = 3

  def mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false))), nullable = false)))

  /** Deterministic synthetic media table (id-seeded payloads). */
  def synthesize(spark: SparkSession, n: Long, partitions: Int = 8): DataFrame = {
    val rdd = spark.range(0, n, 1, partitions).rdd.map { id =>
      val mod = (id % 3 + 1).toByte
      val w = (32 + (id * 7) % 96).toInt
      val h = (32 + (id * 11) % 96).toInt
      val ch = if (mod == ModAudio) 1 else 3
      val content = new Array[Byte](64)
      var s = id * 0x9e3779b97f4a7c15L
      var i = 0
      while (i < content.length) {
        s = s * 6364136223846793005L + 1442695040888963407L
        content(i) = (s >>> 56).toByte
        i += 1
      }
      val header = Array[Byte](mod,
        (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte, ch.toByte)
      val modName = mod match {
        case ModImage => "image"; case ModAudio => "audio"; case _ => "video" }
      Row(id, modName, header ++ content, Row(w, h, ch))
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Feature row produced by the stub decoder. */
  final case class MediaFeatures(media_id: Long, modality: String,
      width: Int, height: Int, channels: Int, mean_byte: Double,
      byte_entropy: Double)

  /** STUB decode + feature extraction, batched per partition.
    *
    * A real implementation replaces the body of `decodeOne` with a codec
    * call (e.g. JPEG decode + pooled CNN features); the operator shape —
    * `mapPartitions` over (id, payload) batches returning fixed-width
    * feature rows — is exactly what a production pipeline uses, because it
    * amortizes model/codec initialization once per partition.
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE in a real codec (once, not per row)
        it.map { case (id, modality, payload) => decodeOne(id, modality, payload) }
      }
      .toDF()
  }

  private def decodeOne(id: Long, modality: String, payload: Array[Byte]): MediaFeatures = {
    // STUB: parse the synthetic header; a real decoder replaces from here —
    val w = ((payload(1) & 0xff) << 8) | (payload(2) & 0xff)
    val h = ((payload(3) & 0xff) << 8) | (payload(4) & 0xff)
    val ch = payload(5) & 0xff
    val content = payload.drop(6)
    val mean = content.map(b => (b & 0xff).toDouble).sum / math.max(content.length, 1)
    val hist = new Array[Int](16)
    content.foreach(b => hist((b & 0xff) >> 4) += 1)
    val total = content.length.toDouble
    val entropy = -hist.filter(_ > 0)
      .map(c => c / total * math.log(c / total) / math.log(2)).sum
    MediaFeatures(id, modality, w, h, ch, mean, entropy)
  }

  /** STUB resize: re-encode each payload to `targetW`×`targetH` metadata
    * with proportionally subsampled content bytes (a real implementation
    * swaps the body for a codec resize; the operator contract — binary in,
    * binary out, metadata updated in the same row, batched per partition —
    * is the production shape). Output schema = input schema.
    */
  def resize(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    import df.sparkSession.implicits._
    val out = df.select(col("media_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, modality, payload) =>
          // STUB: subsample content proportionally to the area change —
          val w = ((payload(1) & 0xff) << 8) | (payload(2) & 0xff)
          val h = ((payload(3) & 0xff) << 8) | (payload(4) & 0xff)
          val ch = payload(5) & 0xff
          val content = payload.drop(6)
          val scale = math.min(1.0,
            (targetW.toLong * targetH).toDouble / math.max(w.toLong * h, 1L))
          val outLen = math.max(1, (content.length * scale).toInt)
          val sampled = Array.tabulate(outLen)(i =>
            content((i.toLong * content.length / outLen).toInt))
          val header = Array[Byte](payload(0),
            (targetW >> 8).toByte, targetW.toByte,
            (targetH >> 8).toByte, targetH.toByte, ch.toByte)
          (id, modality, header ++ sampled, targetW, targetH, ch)
        }
      }
      .toDF("media_id", "modality", "payload", "w", "h", "ch")
    out.select(col("media_id"), col("modality"), col("payload"),
      struct(col("w").as("width"), col("h").as("height"),
        col("ch").as("channels")).as("meta"))
  }

  /** Frame-sampling row shape for video: every `everyN`-th synthetic frame
    * index with a per-frame feature hash (STUB for "decode frame i").
    * Output: (media_id, frame_idx, frame_feature).
    */
  def sampleFrames(df: DataFrame, everyN: Int = 10, maxFrames: Int = 8): DataFrame = {
    import df.sparkSession.implicits._
    df.filter(col("modality") === "video")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nFrames = math.min(maxFrames, payload.length / everyN)
        (0 until nFrames).map { f =>
          val off = f * everyN % math.max(payload.length - 1, 1)
          (id, f * everyN, (payload(off) & 0xff).toDouble / 255.0)
        }
      }
      .toDF("media_id", "frame_idx", "frame_feature")
  }
}
