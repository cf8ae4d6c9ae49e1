package graft.operators

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding analytics beyond the scoring kernels: single-pass per-dimension
  * moments and PCA projection (reference `gbr.py:449-450` PCA viz,
  * `gbr.py:511-512` per-dim mean/std).
  *
  * Two per-dim strategies, both kept on purpose:
  *   - [[Profile.perDimensionMoments]] (posexplode + groupBy) shuffles
  *     (dim, partial) pairs — simple, oracle-checkable, but the explode
  *     multiplies row count by dims;
  *   - [[perDimensionSummary]] (MLlib `Summarizer`) is ONE narrow pass with a
  *     per-partition vector accumulator — at 10M×2688 it touches each vector
  *     once and reduces 2688-wide partials, no explode, no wide shuffle.
  *     This is the 100 TB path.
  */
object Embedding {

  /** Embedding validity scan with string-fallback recovery (reference
    * `scripts/generate_benchmark_reports.py:401-416`: corpora where some
    * files deliver the embedding column as its STRING form — the
    * `eval(str)` rows the reference recovers). Adds two columns:
    * `emb_parsed` (array&lt;float&gt; of exactly `dims`, null when
    * unrecoverable) and `emb_src` tagging where each row's vector came
    * from: `array` (well-typed column, right size), `string` (recovered
    * via `from_json`), or `invalid` (null, wrong dimension, or unparseable
    * text).
    *
    * For an array-typed column the parse branch never materializes; for a
    * string-typed column the recovery is one codegen'd `from_json` per row
    * — a narrow projection either way, no shuffle, so the scan cost at
    * 100 TB is the read itself. A float array survives Spark's
    * string-cast round trip bit-exactly (shortest-round-trip formatting),
    * so recovered vectors are safe to mix with natively typed ones
    * downstream.
    */
  def parseEmbeddings(df: DataFrame, embCol: String, dims: Int): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
    df.schema(embCol).dataType match {
      case StringType =>
        val parsed = from_json(col(embCol), ArrayType(FloatType))
        // null ELEMENTS are invalid too: "[1, null, 2]" parses to the right
        // size but would feed silent zeros into the dense-vector kernels
        val ok = parsed.isNotNull && size(parsed) === dims &&
          forall(parsed, e => e.isNotNull)
        df.withColumn("emb_parsed", when(ok, parsed))
          .withColumn("emb_src", when(ok, lit("string")).otherwise(lit("invalid")))
      case _: ArrayType =>
        val cast = col(embCol).cast(ArrayType(FloatType))
        val ok = cast.isNotNull && size(cast) === dims &&
          forall(cast, e => e.isNotNull)
        df.withColumn("emb_parsed", when(ok, cast))
          .withColumn("emb_src", when(ok, lit("array")).otherwise(lit("invalid")))
      case other =>
        throw new IllegalArgumentException(
          s"$embCol must be an array or string column, got ${other.simpleString}")
    }
  }

  /** Per-dimension mean/variance/min/max in one narrow pass via
    * `Summarizer`. Output: one row per dimension (dim, mean, std, min, max).
    */
  def perDimensionSummary(df: DataFrame, vecCol: String): DataFrame = {
    val v = df.select(array_to_vector(col(vecCol).cast("array<double>")).as("__v"))
    val summary = v.select(
      Summarizer.metrics("mean", "std", "min", "max").summary(col("__v")).as("s"))
      .select(
        vector_to_array(col("s.mean")).as("mean"),
        vector_to_array(col("s.std")).as("std"),
        vector_to_array(col("s.min")).as("mn"),
        vector_to_array(col("s.max")).as("mx"))
    summary.select(posexplode(arrays_zip(col("mean"), col("std"), col("mn"), col("mx")))
        .as(Seq("dim", "z")))
      .select(col("dim"), col("z.mean").as("mean"), col("z.std").as("std"),
        col("z.mn").as("min"), col("z.mx").as("max"))
  }

  /** PCA projection to `k` components (reference `gbr.py:449-450`). Returns
    * the input plus `pc` = Array[Double] of length k. The model fit is a
    * distributed covariance/SVD over vectors; transform is a broadcast
    * matrix-multiply — no shuffle of the data.
    *
    * Component signs are canonicalized: an eigenvector is only defined up to
    * ±1 and MLlib's choice is implementation-defined, so each component is
    * flipped to make its largest-|loading| element positive (lowest index
    * wins ties). Projections are then deterministic and comparable across
    * engines — this is what lets q46 carry a SQL oracle.
    */
  def pcaProject(df: DataFrame, vecCol: String, k: Int = 2): DataFrame = {
    val withVec = df.withColumn("__mlvec", array_to_vector(col(vecCol).cast("array<double>")))
    val model = new PCA().setK(k).setInputCol("__mlvec").setOutputCol("__pc")
      .fit(withVec.select("__mlvec"))
    val signs: Array[Double] = Array.tabulate(k) { j =>
      val loadings = Array.tabulate(model.pc.numRows)(i => model.pc(i, j))
      val abs = loadings.map(math.abs)
      if (loadings(abs.indexOf(abs.max)) < 0) -1.0 else 1.0
    }
    model.transform(withVec)
      .withColumn("pc",
        zip_with(vector_to_array(col("__pc")), lit(signs), (x, s) => x * s))
      .drop("__mlvec", "__pc")
  }

  /** Explained-variance ratios of the top `k` principal components — the
    * scalar the reference's PCA plot annotates.
    */
  def pcaExplainedVariance(df: DataFrame, vecCol: String, k: Int = 2): Array[Double] = {
    val withVec = df.select(array_to_vector(col(vecCol).cast("array<double>")).as("__mlvec"))
    val model = new PCA().setK(k).setInputCol("__mlvec").setOutputCol("__pc")
      .fit(withVec)
    model.explainedVariance.toArray
  }
}
