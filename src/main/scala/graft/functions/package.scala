package graft

import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.{Column, SparkSession}

/** Column-API entry points for graft's custom expressions, mirroring
  * `org.apache.spark.sql.functions`. Also registers SQL names so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works.
  */
package object functions {

  /** Dot product of two `array<float|double>` columns (double result). */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm of an `array<float|double>` column (double result). */
  def vec_norm(a: Column): Column =
    Bridge.column(L2Norm(Bridge.expression(a)))

  /** Cosine similarity of two `array<float|double>` columns. */
  def vec_cos(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Index of the nearest centroid (squared-L2, ties → lower index) — the
    * fused IVF assignment kernel.
    */
  def nearest_centroid(v: Column, centroids: Array[Array[Float]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(v), centroids))

  /** True squared-L2 distance to the nearest centroid — the IVF
    * drift-probe kernel ([[graft.operators.VectorSearch.IvfIndex.driftRatio]]).
    */
  def nearest_centroid_dist(v: Column, centroids: Array[Array[Float]]): Column =
    Bridge.column(NearestCentroidDist(Bridge.expression(v), centroids))

  /** True squared-L2 distance to the GIVEN centroid id — the one-pass
    * build/append stats kernel: O(d) over an already-assigned cluster
    * column, bit-identical to [[nearest_centroid_dist]] for the cell the
    * assignment chose (see [[graft.functions.CentroidDistAt]]).
    */
  def centroid_dist_at(v: Column, cluster: Column,
      centroids: Array[Array[Float]]): Column =
    Bridge.column(CentroidDistAt(Bridge.expression(v),
      Bridge.expression(cluster), centroids))

  /** Two-level nearest-centroid index: rank `coarse` group centroids,
    * exact-scan the top-`probes` groups' `members` — the large-k IVF
    * assignment kernel (see
    * [[graft.functions.NearestCentroidGrouped]]).
    */
  def nearest_centroid_grouped(v: Column, centroids: Array[Array[Float]],
      coarse: Array[Array[Float]], members: Array[Array[Int]],
      probes: Int): Column =
    Bridge.column(NearestCentroidGrouped(Bridge.expression(v), centroids,
      coarse, members, probes, emitDist = false))

  /** True squared-L2 distance to the centroid
    * [[nearest_centroid_grouped]] selects (the grouped stats/radii
    * variant — same selection rule as the assignment pass).
    */
  def nearest_centroid_grouped_dist(v: Column, centroids: Array[Array[Float]],
      coarse: Array[Array[Float]], members: Array[Array[Int]],
      probes: Int): Column =
    Bridge.column(NearestCentroidGrouped(Bridge.expression(v), centroids,
      coarse, members, probes, emitDist = true))

  /** Packed sign signature (`array<long>`) of an `array<float|double>`
    * column — binary quantization, 32× smaller than float32.
    */
  def vec_sign_pack(a: Column): Column =
    Bridge.column(SignPack(Bridge.expression(a)))

  /** Hamming distance between two packed sign signatures. */
  def vec_hamming(a: Column, b: Column): Column =
    Bridge.column(HammingDistance(Bridge.expression(a), Bridge.expression(b)))

  /** Product-quantization codes (`array<tinyint>`, one byte per
    * subspace, −128 shift) for an `array<float|double>` column — the
    * IVF-PQ candidate-generation storage tier (see
    * [[graft.functions.PqEncode]]).
    */
  def pq_encode(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(v), codebooks))

  /** ADC score of a PQ code array against a query's precomputed lookup
    * table ([[graft.operators.Quantize.pqLut]]).
    */
  def pq_adc(codes: Column, lut: Array[Double], ksub: Int): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), lut, ksub))

  /** Register vec_dot / vec_norm / vec_cos / vec_sign_pack / vec_hamming
    * with the session's function registry for SQL use.
    */
  def registerAll(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "vec_dot", es => DotProduct(es(0), es(1)))
    Bridge.registerFunction(spark, "vec_norm", es => L2Norm(es.head))
    Bridge.registerFunction(spark, "vec_cos", es => CosineSimilarity(es(0), es(1)))
    Bridge.registerFunction(spark, "vec_sign_pack", es => SignPack(es.head))
    Bridge.registerFunction(spark, "vec_hamming", es => HammingDistance(es(0), es(1)))
  }
}
