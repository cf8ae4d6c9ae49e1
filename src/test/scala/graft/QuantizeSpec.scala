package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(5)
    (0 until 200).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() * 6 - 3)))
      .toDF("id", "v")
  }

  test("codes are int8 and reconstruction error is within half a step") {
    val q = Quantize.quantize(vecs, "v")
    val errStats = Quantize.reconstructionError(vecs, "v")
      .select(max(col("max_err") - (col("__qmax") - col("__qmin")) / 510.0
        // float rounding of the reconstruction adds one ulp on top of the
        // half-step analytic bound
        - lit(1e-3)))
      .head().getDouble(0)
    assert(errStats <= 0.0, s"error exceeded half-step bound by $errStats")
    val schema = q.schema("__codes").dataType
    assert(schema == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType))
  }

  test("a constant vector reconstructs exactly") {
    val df = Seq((1L, Array(2.5f, 2.5f, 2.5f))).toDF("id", "v")
    val err = Quantize.reconstructionError(df, "v").head()
    assert(err.getAs[Double]("mean_err") == 0.0)
    assert(err.getAs[Double]("max_err") == 0.0)
  }

  test("quantized two-stage top-k recalls the exact top-k") {
    import graft.functions.vec_dot
    val named = vecs.withColumnRenamed("id", "vec_id")
    val query = Array.fill(64)(0.5f)
    val exact = named
      .select(col("vec_id"), vec_dot(col("v"), typedLit(query)).as("s"))
      .orderBy(desc("s"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val approx = Quantize.topKQuantized(named, "v", query, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9: $exact vs $approx")
    // a pre-quantized frame (stored code table) takes the same path and
    // must give the same answer
    val pre = Quantize.quantize(named, "v")
    val approx2 = Quantize.topKQuantized(pre, "v", query, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(approx2 == approx)
  }

  test("topKSignHamming recalls most of the exact top-k") {
    val rnd = new scala.util.Random(11)
    val named = (0L until 400L).map(i =>
      (i, Array.fill(128)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "v")
    val query = Array.fill(128)(rnd.nextFloat() - 0.5f)
    val exact = named
      .select(col("vec_id"), graft.functions.vec_dot(col("v"),
        typedLit(query)).as("s"))
      .orderBy(desc("s"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val approx = Quantize.topKSignHamming(named, "v", query, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"sign-hamming recall $recall: $exact vs $approx")
  }

  test("roundtrip preserves extremes exactly") {
    // min and max elements map to codes 0 and 255 → reconstruct to the
    // float-rounded originals
    val df = Seq((1L, Array(-1.0f, 0.25f, 3.0f))).toDF("id", "v")
    val q = Quantize.quantize(df, "v")
    val recon = q.select(Quantize.dequantize(col("__codes"),
      col("__qmin"), col("__qmax")).as("r")).head().getSeq[Float](0)
    assert(recon.head == -1.0f && recon.last == 3.0f)
    assert(math.abs(recon(1) - 0.25f) <= (3.0 - -1.0) / 510.0 + 1e-6)
  }
}
