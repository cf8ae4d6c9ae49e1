package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization for embedding columns — the storage-scale
  * path for vector corpora: 4 bytes/dim float32 → 1 byte/dim codes plus
  * two doubles per vector, a ~4× cut in scan bytes for ANN candidate
  * generation (re-rank reads the float column for the shortlist only).
  *
  * Per-vector asymmetric quantization (each row carries its own
  * `[min, max]` range): code = round((v − min) / (max − min) · 255),
  * reconstruction = min + code · (max − min) / 255, worst-case error =
  * half a step, (max − min) / 510. Everything is built from higher-order
  * column functions (`transform`, `aggregate`) — no UDF, stays in
  * whole-stage codegen, never shuffles the vector.
  *
  * Codes are stored as `array<tinyint>` shifted by −128 (tinyint is
  * signed); parquet's RLE/bit-packing brings the on-disk cost to ~1
  * byte/dim. A constant vector (max = min) quantizes to code 0 and
  * reconstructs exactly.
  */
object Quantize {

  /** Add `__qmin`, `__qmax`, `__codes` (array<tinyint>) for `vecCol`. */
  def quantize(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val mn = array_min(v).cast("double")
    val mx = array_max(v).cast("double")
    val span = mx - mn
    df.withColumn("__qmin", mn)
      .withColumn("__qmax", mx)
      .withColumn("__codes",
        transform(v, e => when(col("__qmax") === col("__qmin"), lit(0))
          .otherwise(round((e.cast("double") - col("__qmin")) /
            (col("__qmax") - col("__qmin")) * 255).cast("int"))
          .minus(128).cast("byte")))
  }

  /** Reconstructed `array<float>` from quantize()'s columns. */
  def dequantize(codes: Column, qmin: Column, qmax: Column): Column =
    transform(codes, c =>
      (qmin + (c.cast("double") + 128.0) * (qmax - qmin) / 255.0)
        .cast("float"))

  /** Two-stage quantized top-k by dot product: stage 1 ranks every row by
    * the dot against the int8-RECONSTRUCTED vector — algebraically
    * `qmin·Σq + span/255 · (codes·q + 128·Σq)`, so the scan reads only the
    * code array and two doubles (~1/4 the bytes of the float column when
    * codes are stored in their own column/table) and the code·query dot
    * runs through the same codegen kernel; stage 2 re-ranks the
    * `k · shortlistFactor` candidates with exact float dots. Recall is
    * governed by the shortlist factor (half-step quantization error vs
    * the score gaps at the boundary).
    */
  def topKQuantized(df: DataFrame, vecCol: String, query: Array[Float],
      k: Int, shortlistFactor: Int = 4,
      tieBreak: String = "vec_id"): DataFrame = {
    import graft.functions.vec_dot
    val qsum = query.foldLeft(0.0)((acc, v) => acc + v)
    // a pre-quantized input (columns from quantize(), e.g. a stored code
    // table) is used as-is — that is the path where stage 1 actually reads
    // ~1/4 the bytes; quantizing on the fly is the convenience fallback
    // and reads the float column in stage 1 anyway
    val q =
      if (df.columns.contains("__codes")) df else quantize(df, vecCol)
    val approx = col("__qmin") * lit(qsum) +
      (col("__qmax") - col("__qmin")) / 255.0 *
        (vec_dot(col("__codes"), typedLit(query)) + lit(128.0 * qsum))
    q.withColumn("__approx", approx)
      .orderBy(desc("__approx"), col(tieBreak))
      .limit(k * shortlistFactor)
      .withColumn("score", vec_dot(col(vecCol), typedLit(query)))
      .orderBy(desc("score"), col(tieBreak))
      .limit(k)
      .drop("__codes", "__qmin", "__qmax", "__approx")
  }

  /** Two-stage BINARY-quantized top-k — the storage tier below
    * [[topKQuantized]]'s int8 path: stage 1 ranks every row by Hamming
    * distance between packed sign signatures
    * ([[graft.functions.vec_sign_pack]], 32× fewer bytes than float32 when
    * the signature is stored in its own column — sign-random-projection
    * LSH with axis-aligned planes), stage 2 re-ranks the
    * `k · shortlistFactor` shortlist with exact float dots. Both stages
    * plan as `TakeOrderedAndProject`; the signature never shuffles. Recall
    * is governed by the shortlist factor — Hamming approximates ANGULAR
    * order, so a larger factor than int8's is the right default.
    */
  def topKSignHamming(df: DataFrame, vecCol: String, query: Array[Float],
      k: Int, shortlistFactor: Int = 8,
      tieBreak: String = "vec_id"): DataFrame = {
    import graft.functions.{vec_dot, vec_hamming, vec_sign_pack}
    val sig =
      if (df.columns.contains("__sig")) df
      else df.withColumn("__sig", vec_sign_pack(col(vecCol)))
    sig
      .withColumn("__ham",
        vec_hamming(col("__sig"), vec_sign_pack(typedLit(query))))
      .orderBy(col("__ham"), col(tieBreak))
      .limit(k * shortlistFactor)
      .withColumn("score", vec_dot(col(vecCol), typedLit(query)))
      .orderBy(desc("score"), col(tieBreak))
      .limit(k)
      .drop("__sig", "__ham")
  }

  /** Per-row reconstruction-error stats against the original vector:
    * (`mean_err`, `max_err`), both double.
    */
  def reconstructionError(df: DataFrame, vecCol: String): DataFrame = {
    val q = quantize(df, vecCol)
    val recon = dequantize(col("__codes"), col("__qmin"), col("__qmax"))
    val errs = zip_with(col(vecCol), recon,
      (a, b) => abs(a.cast("double") - b.cast("double")))
    q.withColumn("__errs", errs)
      .withColumn("mean_err",
        aggregate(col("__errs"), lit(0.0), (acc, e) => acc + e) /
          size(col("__errs")))
      .withColumn("max_err", array_max(col("__errs")))
      .drop("__errs", "__codes")
  }
}
