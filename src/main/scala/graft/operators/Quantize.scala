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

  // ---- Product quantization (r16): the storage tier below int8 —
  // m contiguous subspaces, 256 centroids each, one byte per subspace
  // (Jégou et al. 2011; the FAISS IndexIVFPQ layout is the public
  // reference shape). At m = 96 over 2688 dims the code column is
  // 96 B/row vs 2688 B int8 — the phase-1 candidate-generation scan
  // reads 28× fewer bytes; the shortlist re-ranks against the stored
  // sq8 codes. Training is driver-side (the sample is bounded and the
  // per-subspace Lloyd is embarrassingly parallel across subspaces);
  // everything is deterministic — evenly-spaced sample seeding, no RNG.

  /** Subspace count targeting the FAISS-default width dsub = 8:
    * the largest divisor of `d` with d/m ≥ 8, capped at 384 codes/row;
    * 1 for tiny dims. 2688 → 336 (dsub 8); 384 → 48 (dsub 8); 64 → 8;
    * 16 → 2. Wider subspaces (smaller m) cut more bytes but 256
    * centroids cover a ≥ 16-dim subspace too coarsely on
    * high-intrinsic-dimension data — measured on the synthetic corpus
    * at dsub 28: ADC shortlist loss pinned recall at 0.6–0.8
    * independent of nprobe, while dsub 8 tracks the sq8 ranking. At
    * dsub 8 the code column is d bytes/row ÷ 8 — an 8× phase-1 byte
    * cut vs the sq8 codes, 32× vs float32.
    */
  def defaultPqM(d: Int): Int = {
    val cap = math.min(384, d / 8)
    (cap to 1 by -1).find(m => m >= 1 && d % m == 0).getOrElse(1)
  }

  /** Train PQ codebooks on a driver-side sample: per subspace, Lloyd
    * over the sample's subvectors — deterministic (evenly-spaced sample
    * seeding, ties → lower index; empty cells keep their previous
    * centroid). Returns `codebooks(j)(c)` = centroid `c` of subspace
    * `j`; `d` must be divisible by `m`. Cost: m · ksub · |sample| ·
    * dsub · iters mul-adds total = ksub · |sample| · d · iters across
    * all subspaces (~1.4e11 at 20k × 2688 × 10 — seconds on 32 threads,
    * parallelized across subspaces).
    */
  def pqFit(sample: Array[Array[Float]], m: Int, ksub: Int = 256,
      iters: Int = 10): Array[Array[Array[Float]]] = {
    require(sample.nonEmpty, "pqFit: empty training sample")
    val d = sample(0).length
    require(m >= 1 && d % m == 0,
      s"pqFit: d=$d not divisible by m=$m (use defaultPqM)")
    val dsub = d / m
    val n = sample.length
    val k = math.min(ksub, n)
    def fitSub(j: Int): Array[Array[Float]] = {
      val off = j * dsub
      // seed: evenly-spaced sample subvectors (deterministic; distinct
      // rows when n ≥ k)
      val cents = Array.tabulate(k) { c =>
        val r = sample(((c.toLong * n) / k).toInt)
        java.util.Arrays.copyOfRange(r, off, off + dsub)
      }
      val asg = new Array[Int](n)
      var it = 0
      while (it < iters) {
        val c2 = cents.map(_.foldLeft(0.0)((a, v) => a + v.toDouble * v))
        var r = 0
        while (r < n) {
          val x = sample(r)
          var best = Double.MaxValue; var bi = 0; var c = 0
          while (c < k) {
            val cv = cents(c)
            var acc = 0.0; var i = 0
            while (i < dsub) { acc += x(off + i).toDouble * cv(i); i += 1 }
            val dd = c2(c) - 2.0 * acc
            if (dd < best) { best = dd; bi = c }
            c += 1
          }
          asg(r) = bi
          r += 1
        }
        val sums = Array.ofDim[Double](k, dsub)
        val cnt = new Array[Long](k)
        r = 0
        while (r < n) {
          val x = sample(r); val c = asg(r)
          cnt(c) += 1
          var i = 0
          while (i < dsub) { sums(c)(i) += x(off + i); i += 1 }
          r += 1
        }
        var c = 0
        while (c < k) {
          if (cnt(c) > 0) {
            var i = 0
            while (i < dsub) {
              cents(c)(i) = (sums(c)(i) / cnt(c)).toFloat; i += 1
            }
          } // empty cell: keep previous centroid (deterministic)
          c += 1
        }
        it += 1
      }
      cents
    }
    // parallel across subspaces — each is independent
    val out = new Array[Array[Array[Float]]](m)
    val threads = math.min(m,
      Runtime.getRuntime.availableProcessors())
    val jdx = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = (0 until threads).map { _ =>
      val t = new Thread(() => {
        var j = jdx.getAndIncrement()
        while (j < m) { out(j) = fitSub(j); j = jdx.getAndIncrement() }
      })
      t.start(); t
    }
    pool.foreach(_.join())
    out
  }

  /** A query's ADC lookup table over `codebooks`: flat m × ksub doubles,
    * `lut(j·ksub + c)` = dot(query subvector j, codebooks(j)(c)) — so
    * Σ_j lut(j·ksub + code_j) is the dot of the query against a coded
    * row's codebook reconstruction ([[graft.functions.PqAdc]]).
    */
  def pqLut(query: Array[Float], codebooks: Array[Array[Array[Float]]],
      ksub: Int = 256): Array[Double] = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val off = j * dsub
      val cbj = codebooks(j)
      var c = 0
      while (c < cbj.length) {
        val cv = cbj(c)
        var acc = 0.0; var i = 0
        val lim = math.min(dsub, math.max(0, query.length - off))
        while (i < lim) { acc += query(off + i).toDouble * cv(i); i += 1 }
        lut(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    lut
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
