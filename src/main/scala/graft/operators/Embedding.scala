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

  /** t-SNE projection to 2-D (reference `gbr.py:459-461`:
    * `TSNE(n_components=2, random_state=42, perplexity=min(30, n-1))` over a
    * bounded embedding sample). Exact Barnes-Hut-free t-SNE (van der Maaten
    * & Hinton, JMLR 2008) — O(sample² · iters), which is exactly why the
    * SAMPLE is the scale contract: the distributed side is a deterministic
    * `TakeOrdered` of `sampleN` rows (no shuffle, no full collect), and the
    * driver-side optimization is bounded by `sampleN`, independent of table
    * size — the same boundary the reference draws (sklearn fits a ≤1k-row
    * sample regardless of corpus scale). A visualization projection of more
    * than ~1k points is unreadable anyway; this is NOT a distributed-ML
    * seam, by design.
    *
    * Deterministic end-to-end: the sample is id-ordered, the init is the
    * canonicalized local PCA (no RNG anywhere), and the gradient loop is
    * fixed-iteration — same inputs give bit-identical projections, so specs
    * can assert exact reruns.
    *
    * Returns (idCol, tsne_x, tsne_y), one row per sampled valid input row
    * (null or wrong-dimension vectors are excluded, the reference's
    * validity-scan tolerance).
    */
  def tsneProject(df: DataFrame, vecCol: String, idCol: String,
      sampleN: Int = 1000, perplexity: Double = 30.0,
      iterations: Int = 400): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val spark = df.sparkSession
    val rows = lowestIdRows(df, idCol,
      Seq(col(idCol), col(vecCol).cast("array<double>")), sampleN,
      valid = Some(col(vecCol).isNotNull))
    val valid = modalDimensionRows(rows, 1)
    val x = valid.map(_.getSeq[Double](1).toArray)
    val y = tsneLocal(x, perplexity, iterations)
    val out = valid.zipWithIndex.map { case (r, i) =>
      Row(r.get(0), y(i)(0), y(i)(1)) }
    val schema = StructType(Seq(df.schema(idCol),
      StructField("tsne_x", DoubleType, nullable = false),
      StructField("tsne_y", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq, 1), schema)
  }

  /** UMAP projection to 2-D (reference `gbr.py:470-478`:
    * `umap.UMAP(n_components=2, random_state=42)` over the same bounded
    * embedding sample as the other projections). Same scale contract as
    * [[tsneProject]]: the distributed side is a deterministic id-ordered
    * `TakeOrdered` of `sampleN` rows, and the driver-side optimization is
    * bounded by `sampleN` — a visualization projection, NOT a
    * distributed-ML seam, exactly the boundary the reference draws
    * (umap-learn fits a ≤1k-row sample regardless of corpus scale).
    *
    * Deterministic end-to-end: fixed k-NN graph (index-ordered
    * tie-breaks), PCA init, full-batch gradient descent with a fixed
    * schedule — no RNG, unlike umap-learn's negative-sampling SGD, so
    * identical inputs give bit-identical projections and specs can assert
    * exact reruns. Null and wrong-dimension vectors are excluded from the
    * sample (the reference's validity-scan tolerance).
    *
    * Returns (idCol, umap_x, umap_y), one row per sampled valid input row.
    */
  def umapProject(df: DataFrame, vecCol: String, idCol: String,
      sampleN: Int = 1000, nNeighbors: Int = 15, minDist: Double = 0.1,
      iterations: Int = 200): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val spark = df.sparkSession
    val rows = lowestIdRows(df, idCol,
      Seq(col(idCol), col(vecCol).cast("array<double>")), sampleN,
      valid = Some(col(vecCol).isNotNull))
    val valid = modalDimensionRows(rows, 1)
    val x = valid.map(_.getSeq[Double](1).toArray)
    val y = umapLocal(x, nNeighbors, minDist, iterations)
    val out = valid.zipWithIndex.map { case (r, i) =>
      Row(r.get(0), y(i)(0), y(i)(1)) }
    val schema = StructType(Seq(df.schema(idCol),
      StructField("umap_x", DoubleType, nullable = false),
      StructField("umap_y", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq, 1), schema)
  }

  /** Fit the UMAP low-dimensional similarity curve 1/(1 + a·d^(2b)) to the
    * target membership psi(d) = 1 for d ≤ minDist, exp(−(d − minDist))
    * beyond — the (a, b) calibration umap-learn does with scipy
    * curve_fit. Deterministic coarse log-grid search plus two local
    * refinement passes over 300 curve samples on (0, 3]; for the default
    * minDist = 0.1 this lands at a ≈ 1.58, b ≈ 0.90 (umap-learn's
    * published values ≈ 1.577, 0.895).
    */
  private[graft] def umapCurveFit(minDist: Double): (Double, Double) = {
    val ds = Array.tabulate(300)(i => (i + 1) * 0.01)
    val target = ds.map(d => if (d <= minDist) 1.0 else math.exp(-(d - minDist)))
    def sse(a: Double, b: Double): Double = {
      var s = 0.0
      var i = 0
      while (i < ds.length) {
        val f = 1.0 / (1.0 + a * math.pow(ds(i), 2 * b))
        val e = f - target(i)
        s += e * e
        i += 1
      }
      s
    }
    var best = (1.0, 1.0)
    var bestS = Double.MaxValue
    var aStep = 0
    while (aStep < 120) { // a on a log grid [1e-2, 1e2]
      val a = math.pow(10.0, -2.0 + aStep * (4.0 / 119))
      var bStep = 0
      while (bStep < 96) { // b linear on [0.1, 2.0]
        val b = 0.1 + bStep * (1.9 / 95)
        val s = sse(a, b)
        if (s < bestS) { bestS = s; best = (a, b) }
        bStep += 1
      }
      aStep += 1
    }
    // two shrinking local refinements around the grid optimum
    var (ba, bb) = best
    var span = 0.2
    var pass = 0
    while (pass < 2) {
      var i = -10
      while (i <= 10) {
        var j = -10
        while (j <= 10) {
          val a = ba * math.pow(10.0, i * span / 10)
          val b = math.max(0.05, bb + j * span / 10)
          val s = sse(a, b)
          if (s < bestS) { bestS = s; best = (a, b) }
          j += 1
        }
        i += 1
      }
      ba = best._1; bb = best._2; span /= 10
      pass += 1
    }
    best
  }

  /** Deterministic UMAP over a local matrix (McInnes, Healy & Melville,
    * arXiv:1802.03426): exact k-NN graph, per-point (rho, sigma)
    * calibration to log2(k) effective neighbors, fuzzy-union
    * symmetrization w = w + wᵀ − w∘wᵀ, then full-batch gradient descent
    * on the fuzzy cross-entropy with the fitted (a, b) kernel, linearly
    * decaying learning rate and ±4 gradient clipping (umap-learn's clip),
    * PCA init scaled to max-|coord| 10. Full-batch instead of
    * negative-sampling SGD trades a constant factor (n ≤ ~1k here) for
    * bit-exact determinism.
    */
  private[graft] def umapLocal(x: Array[Array[Double]], nNeighbors: Int,
      minDist: Double, iterations: Int): Array[Array[Double]] =
    umapFromD2(pairwiseSquaredDistances(x), localPca2(x), nNeighbors,
      minDist, iterations)

  /** [[umapLocal]] over a precomputed squared-distance matrix and initial
    * 2-D layout (cloned before the in-place optimization, so a caller may
    * share `init` with other consumers) — the entry point for callers
    * that already paid the pairwise pass and the PCA init
    * ([[ProfilePipeline]] shares both with t-SNE and the PCA figure).
    * Bit-identical to [[umapLocal]]: the distance and init arithmetic is
    * unchanged, only hoisted.
    */
  private[graft] def umapFromD2(d2: Array[Array[Double]],
      init: Array[Array[Double]], nNeighbors: Int,
      minDist: Double, iterations: Int): Array[Array[Double]] = {
    val n = d2.length
    require(n >= 4, s"UMAP needs >= 4 sample rows, got $n")
    val k = math.max(2, math.min(nNeighbors, n - 1))
    val dist = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = math.sqrt(d2(i)(j))
        dist(i)(j) = d; dist(j)(i) = d
        j += 1
      }
      i += 1
    }
    // k nearest neighbors per point, index-ordered tie-break
    val knn = Array.tabulate(n) { p =>
      (0 until n).filter(_ != p).sortBy(q => (dist(p)(q), q)).take(k).toArray
    }
    // per-point rho (nearest distance) and sigma via binary search so that
    // sum_j exp(-(max(0, d - rho))/sigma) = log2(k)
    val logK = math.log(k) / math.log(2.0)
    val w = Array.ofDim[Double](n, n)
    i = 0
    while (i < n) {
      val rho = dist(i)(knn(i)(0))
      var lo = 1e-20
      var hi = 1e4
      var sigma = 1.0
      var it = 0
      while (it < 64) {
        sigma = (lo + hi) / 2
        var s = 0.0
        var jj = 0
        while (jj < k) {
          val d = math.max(0.0, dist(i)(knn(i)(jj)) - rho)
          s += math.exp(-d / sigma)
          jj += 1
        }
        if (s > logK) hi = sigma else lo = sigma
        it += 1
      }
      var jj = 0
      while (jj < k) {
        val q = knn(i)(jj)
        w(i)(q) = math.exp(-math.max(0.0, dist(i)(q) - rho) / sigma)
        jj += 1
      }
      i += 1
    }
    // fuzzy union symmetrization
    val sym = Array.ofDim[Double](n, n)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val v = w(i)(j) + w(j)(i) - w(i)(j) * w(j)(i)
        sym(i)(j) = v; sym(j)(i) = v
        j += 1
      }
      i += 1
    }
    val (a, b) = umapCurveFit(minDist)
    // PCA init scaled to max-|coordinate| 10 (the spectral-init range)
    val y = init.map(_.clone())
    var mx = 1e-12
    y.foreach(r => { mx = math.max(mx, math.max(math.abs(r(0)), math.abs(r(1)))) })
    y.foreach { r => r(0) = r(0) / mx * 10.0; r(1) = r(1) / mx * 10.0 }
    def clip(v: Double): Double = math.max(-4.0, math.min(4.0, v))
    val grad = Array.ofDim[Double](n, 2)
    var epoch = 0
    while (epoch < iterations) {
      val alpha = 1.0 - epoch.toDouble / iterations
      // Per-point gradients over ALL partners, parallel over point chunks.
      // Bit-identical to the previous pair-at-a-time accumulation: that
      // shape added point p's contributions in ascending-partner order too
      // (outer loops i < p contribute while ascending, then i = p covers
      // j > p), and the (j, p) pair's term is exactly the negation of the
      // (p, j) term — dx flips sign exactly, d2/attr/rep are unchanged, and
      // clip is odd (clip(-v) = -clip(v)), so the summands match to the
      // last bit. Twice the flops, divided over every core: the epoch loop
      // at 500 points × 200 epochs was ~1.3 s of single-threaded pow().
      parRanges(n) { (lo, hi) =>
        var p = lo
        while (p < hi) {
          var g0 = 0.0; var g1 = 0.0
          var j = 0
          while (j < n) {
            if (j != p) {
              val dx = y(p)(0) - y(j)(0)
              val dy = y(p)(1) - y(j)(1)
              val d2 = dx * dx + dy * dy
              val wij = sym(p)(j)
              // attractive: w * dCE/dd of the a,b kernel; repulsive: (1-w)
              val attr =
                if (wij > 0.0 && d2 > 0.0)
                  wij * (-2.0 * a * b * math.pow(d2, b - 1.0)) /
                    (1.0 + a * math.pow(d2, b))
                else 0.0
              val rep = (1.0 - wij) * (2.0 * b) /
                ((0.001 + d2) * (1.0 + a * math.pow(d2, b)))
              g0 += clip(attr * dx) + clip(rep * dx)
              g1 += clip(attr * dy) + clip(rep * dy)
            }
            j += 1
          }
          grad(p)(0) = g0; grad(p)(1) = g1
          p += 1
        }
      }
      // full-batch: each point accumulates O(n) clipped pair interactions,
      // so normalize by n to keep the per-epoch step in umap-learn's
      // per-interaction range (its SGD applies each interaction alone)
      i = 0
      while (i < n) {
        y(i)(0) += alpha * grad(i)(0) / n
        y(i)(1) += alpha * grad(i)(1) / n
        i += 1
      }
      epoch += 1
    }
    // recenter for stable assertions/plots
    var m0 = 0.0; var m1 = 0.0
    y.foreach { r => m0 += r(0); m1 += r(1) }
    m0 /= n; m1 /= n
    y.foreach { r => r(0) -= m0; r(1) -= m1 }
    y
  }

  /** Ragged-corpus guard shared by the projection operators (the
    * reference's try/except tolerance around its projection fits): keep
    * only rows whose vector at ordinal `vecIdx` is non-null, has the
    * MODAL dimension of the sample, and contains no null elements. The
    * modal — not first — dimension means a single malformed lowest-id
    * vector cannot silently drop every well-formed row (ties break to the
    * larger dimension, matching [[ProfilePipeline]]'s figure sampling).
    */
  private[operators] def modalDimensionRows(
      rows: Array[org.apache.spark.sql.Row],
      vecIdx: Int): Array[org.apache.spark.sql.Row] = {
    val present = rows.filter(!_.isNullAt(vecIdx))
    val modal = present.map(_.getSeq[Double](vecIdx).length)
      .groupBy(identity).map { case (d, g) => (g.length, d) }
      .maxOption.map(_._2)
    present.filter(r => modal.contains(r.getSeq[Double](vecIdx).length) &&
      !r.getSeq[Double](vecIdx).contains(null))
  }

  /** Pairwise SQUARED Euclidean distances of local row vectors, computed
    * once and shared: t-SNE consumes the squared matrix directly, UMAP its
    * element-wise square root — so a caller rendering both projections
    * over the same sample ([[ProfilePipeline]]) pays the O(n²·d) pass
    * once, not per projection (at 500×2688 the distance pass dominates
    * both fits).
    */
  private[graft] def pairwiseSquaredDistances(
      x: Array[Array[Double]]): Array[Array[Double]] = {
    val n = x.length
    val d2 = Array.ofDim[Double](n, n)
    // parallel over row chunks (the localLloyd idiom): each (i, j > i)
    // pair is owned by exactly one i-chunk and writes two distinct cells,
    // no cell is read — bit-identical to the sequential fill, and at the
    // profile figures' 500 × 2688 sample this pass dominated both
    // projection fits (O(n²·d) ≈ 0.9 s single-threaded).
    parRanges(n) { (lo, hi) =>
      var i = lo
      while (i < hi) {
        var j = i + 1
        while (j < n) {
          val a = x(i); val b = x(j)
          var s = 0.0; var k = 0
          while (k < a.length) { val t = a(k) - b(k); s += t * t; k += 1 }
          d2(i)(j) = s; d2(j)(i) = s
          j += 1
        }
        i += 1
      }
    }
    d2
  }

  /** Chunked parallel driver loop over [0, n) (the localLloyd idiom).
    * Callers write disjoint per-index outputs and read only state that is
    * constant for the duration of the call, so the result is bit-identical
    * to the sequential run — chunking only reorders WHICH independent
    * index runs when, never the arithmetic inside one index. Small inputs
    * run sequentially (pool handoff costs more than the work).
    */
  private def parRanges(n: Int, minN: Int = 64)(f: (Int, Int) => Unit): Unit =
    if (n < minN) f(0, n)
    else {
      val chunk =
        math.max(16, n / (Runtime.getRuntime.availableProcessors * 4))
      java.util.stream.IntStream.rangeClosed(0, (n - 1) / chunk).parallel()
        .forEach(b => f(b * chunk, math.min(n, (b + 1) * chunk)))
    }

  /** Deterministic bounded sample for the projection operators: the
    * `sampleN` LOWEST ids, collected in two phases so the driver-bound
    * data is O(sampleN) WIDE rows regardless of table size. A direct
    * `orderBy(id).limit(n)` over (id, vector) plans as
    * TakeOrderedAndProject, which returns each task's local top-n WIDE
    * rows to the driver — tasks × n × vector-bytes, measured 1.03 GB
    * (> spark.driver.maxResultSize) at 1M rows × 2688 dims × 98 tasks.
    * Phase 1 runs the TakeOrdered over the id column alone (bytes per
    * task); phase 2 fetches exactly those rows through a RANGE predicate:
    * the sample is the n lowest ids, so membership ≡ `id <= max(ids)` —
    * one comparison that prunes on parquet min/max row-group stats,
    * where the `isin` form it replaces paid the analysis + codegen of a
    * sampleN-literal In (measured 13.7 s first-call / 3.8 s steady at
    * 500 string ids vs sub-second for the range form). Null ids are
    * excluded up front: ascending order sorts nulls FIRST, so they could
    * otherwise fill the phase-1 sample with rows no equality or range
    * predicate can fetch back.
    *
    * `valid` (e.g. `vector IS NOT NULL`) is applied in phase 2 ONLY.
    * Array-column predicates don't push to parquet, so filtering before
    * phase 1 forces the id scan to decode the FULL vector payload — the
    * r8 profile probe measured that shape at 73 s first-call (old-gen
    * churn from 100k × 2688-double decodes, multi-second G1 evacuation
    * pauses) vs sub-second for the id-only scan. Phase 2 evaluates the
    * predicate only on the range-pruned row groups. When invalid rows
    * occupy lowest ids the fetch comes up short; the id cutoff then
    * doubles until sampleN valid rows are in range or ids are exhausted —
    * same final set as filter-first, without the payload decode (zero
    * extra passes in the common all-valid case).
    */
  private[operators] def lowestIdRows(df: DataFrame, idCol: String,
      cols: Seq[org.apache.spark.sql.Column],
      sampleN: Int,
      valid: Option[org.apache.spark.sql.Column] = None)
      : Array[org.apache.spark.sql.Row] = {
    val base = df.filter(col(idCol).isNotNull)
    val fetchBase = valid.foldLeft(base)(_.filter(_))
    var want = sampleN
    var out = Array.empty[org.apache.spark.sql.Row]
    var done = false
    while (!done) {
      val ids = base.select(col(idCol)).orderBy(col(idCol)).limit(want)
        .collect().map(_.get(0))
      if (ids.isEmpty) done = true
      else {
        out = fetchBase.filter(col(idCol) <= lit(ids.last))
          .select(cols: _*)
          .orderBy(col(idCol)).limit(sampleN).collect()
        // enough valid rows in range, or the table has no more ids to widen to
        if (out.length >= sampleN || ids.length < want) done = true
        else want = math.multiplyExact(want, 2)
      }
    }
    out
  }

  /** Top-2 principal directions of a small local matrix by power iteration
    * with deflation, signs canonicalized like [[pcaProject]]. Rows of the
    * result are the projected 2-D coordinates of the centered input.
    */
  private[graft] def localPca2(x: Array[Array[Double]]): Array[Array[Double]] = {
    val n = x.length
    val d = x(0).length
    val mean = new Array[Double](d)
    x.foreach(r => { var j = 0; while (j < d) { mean(j) += r(j); j += 1 } })
    var j = 0
    while (j < d) { mean(j) /= n; j += 1 }
    val c = x.map { r =>
      val o = new Array[Double](d)
      var j = 0; while (j < d) { o(j) = r(j) - mean(j); j += 1 }; o
    }
    // power-iterate v <- Cᵀ(Cv) without materializing the d×d covariance
    def topDirection(exclude: Option[Array[Double]]): Array[Double] = {
      var v = Array.tabulate(d)(i => 1.0 / math.sqrt(d.toDouble))
      exclude.foreach { u => // start orthogonal to the first component
        val dot = v.zip(u).map { case (a, b) => a * b }.sum
        v = v.zipWithIndex.map { case (a, i) => a - dot * u(i) }
        if (math.sqrt(v.map(a => a * a).sum) < 1e-12)
          v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
      }
      var it = 0
      while (it < 100) {
        val proj = c.map(r => { // C v
          var s = 0.0; var j = 0
          while (j < d) { s += r(j) * v(j); j += 1 }; s
        })
        val next = new Array[Double](d)
        var i = 0
        while (i < n) {
          val p = proj(i); val r = c(i); var j = 0
          while (j < d) { next(j) += r(j) * p; j += 1 }
          i += 1
        }
        exclude.foreach { u => // deflate
          var dot = 0.0; var j = 0
          while (j < d) { dot += next(j) * u(j); j += 1 }
          j = 0; while (j < d) { next(j) -= dot * u(j); j += 1 }
        }
        val norm = math.sqrt(next.map(a => a * a).sum)
        if (norm < 1e-12) return v
        var j2 = 0
        while (j2 < d) { next(j2) /= norm; j2 += 1 }
        v = next
        it += 1
      }
      // canonical sign: largest-|loading| element positive, lowest index wins
      val absMax = v.map(math.abs).max
      val k = v.indexWhere(a => math.abs(a) == absMax)
      if (v(k) < 0) v.map(-_) else v
    }
    val v1 = topDirection(None)
    val v2 = topDirection(Some(v1))
    c.map { r =>
      var s1 = 0.0; var s2 = 0.0; var j = 0
      while (j < d) { s1 += r(j) * v1(j); s2 += r(j) * v2(j); j += 1 }
      Array(s1, s2)
    }
  }

  /** Exact t-SNE over a local matrix; standard formulation — perplexity
    * calibration by per-point bisection, symmetrized affinities, early
    * exaggeration (×12 for the first quarter of iterations), gradient
    * descent with momentum (0.5 → 0.8) and per-parameter gains, PCA init
    * scaled to 1e-4 std. Deterministic (no RNG).
    */
  private[graft] def tsneLocal(x: Array[Array[Double]],
      perplexity: Double, iterations: Int): Array[Array[Double]] =
    tsneFromD2(pairwiseSquaredDistances(x), localPca2(x), perplexity,
      iterations)

  /** [[tsneLocal]] over a precomputed squared-distance matrix and initial
    * 2-D layout (cloned before the in-place optimization) — shares the
    * O(n²·d) pairwise pass and the PCA power iteration with other
    * consumers of the same sample. Bit-identical to [[tsneLocal]]: the
    * distance and init arithmetic is unchanged, only hoisted.
    */
  private[graft] def tsneFromD2(d2: Array[Array[Double]],
      init: Array[Array[Double]],
      perplexity: Double, iterations: Int): Array[Array[Double]] = {
    val n = d2.length
    require(n >= 4, s"t-SNE needs >= 4 sample rows, got $n")
    val perp = math.max(2.0, math.min(perplexity, (n - 1) / 3.0))
    val logU = math.log(perp)
    // conditional affinities via bisection on beta = 1/(2 sigma^2)
    val p = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var beta = 1.0
      var betaLo = Double.NegativeInfinity
      var betaHi = Double.PositiveInfinity
      var it = 0
      while (it < 50) {
        var sum = 0.0
        var hBeta = 0.0 // beta * sum_j p_j d_ij (for entropy)
        var j = 0
        while (j < n) {
          if (j != i) {
            val e = math.exp(-beta * d2(i)(j))
            p(i)(j) = e; sum += e; hBeta += e * d2(i)(j)
          }
          j += 1
        }
        if (sum < 1e-300) sum = 1e-300
        val h = math.log(sum) + beta * hBeta / sum // Shannon entropy of P_i
        if (math.abs(h - logU) < 1e-5) it = 50
        else {
          if (h > logU) { betaLo = beta
            beta = if (betaHi.isInfinite) beta * 2 else (beta + betaHi) / 2 }
          else { betaHi = beta
            beta = if (betaLo.isInfinite) beta / 2 else (beta + betaLo) / 2 }
        }
        var j2 = 0
        while (j2 < n) { if (j2 != i) p(i)(j2) /= sum; j2 += 1 }
        it += 1
      }
      i += 1
    }
    // symmetrize + floor
    val pSym = Array.ofDim[Double](n, n)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val v = math.max((p(i)(j) + p(j)(i)) / (2.0 * n), 1e-12)
        pSym(i)(j) = v; pSym(j)(i) = v
        j += 1
      }
      i += 1
    }
    // init: PCA scaled to std 1e-4 per component
    val y = init.map(_.clone())
    var comp = 0
    while (comp < 2) {
      var m = 0.0
      y.foreach(r => m += r(comp)); m /= n
      var v = 0.0
      y.foreach(r => { val t = r(comp) - m; v += t * t }); v = math.sqrt(v / n)
      val s = if (v < 1e-12) 0.0 else 1e-4 / v
      y.foreach(r => r(comp) = (r(comp) - m) * s)
      comp += 1
    }
    val grad = Array.ofDim[Double](n, 2)
    val vel = Array.ofDim[Double](n, 2)
    val gains = Array.fill(n, 2)(1.0)
    val num = Array.ofDim[Double](n, n)
    val exaggerationEnd = math.max(iterations / 4, 1)
    // sklearn's learning_rate='auto' heuristic: n / early_exaggeration / 4,
    // floored at 50 — a fixed 200 overshoots small samples into diffuse
    // overlapping blobs
    val lr = math.max(n / (12.0 * 4.0), 50.0)
    var t = 0
    while (t < iterations) {
      val exag = if (t < exaggerationEnd) 12.0 else 1.0
      val momentum = if (t < exaggerationEnd) 0.5 else 0.8
      // student-t kernel
      var z = 0.0
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val dx = y(i)(0) - y(j)(0); val dy = y(i)(1) - y(j)(1)
          val q = 1.0 / (1.0 + dx * dx + dy * dy)
          num(i)(j) = q; num(j)(i) = q; z += 2 * q
          j += 1
        }
        i += 1
      }
      if (z < 1e-300) z = 1e-300
      // already per-point over all partners — parallel over point chunks is
      // bit-identical (grad(i) is the only write; pSym/num/z/y are constant
      // for the pass). The kernel pass above stays sequential: z is one
      // global sum whose addition order must not change, and it is O(n²)
      // cheap next to this O(n²)-with-divides gradient.
      val zc = z
      parRanges(n) { (lo, hi) =>
        var p = lo
        while (p < hi) {
          var g0 = 0.0; var g1 = 0.0
          var j = 0
          while (j < n) {
            if (j != p) {
              val mult = (exag * pSym(p)(j) - num(p)(j) / zc) * num(p)(j) * 4.0
              g0 += mult * (y(p)(0) - y(j)(0))
              g1 += mult * (y(p)(1) - y(j)(1))
            }
            j += 1
          }
          grad(p)(0) = g0; grad(p)(1) = g1
          p += 1
        }
      }
      var my0 = 0.0; var my1 = 0.0
      i = 0
      while (i < n) {
        var c2 = 0
        while (c2 < 2) {
          gains(i)(c2) =
            if (math.signum(grad(i)(c2)) != math.signum(vel(i)(c2)))
              gains(i)(c2) + 0.2
            else math.max(gains(i)(c2) * 0.8, 0.01)
          vel(i)(c2) = momentum * vel(i)(c2) -
            lr * gains(i)(c2) * grad(i)(c2)
          y(i)(c2) += vel(i)(c2)
          c2 += 1
        }
        my0 += y(i)(0); my1 += y(i)(1)
        i += 1
      }
      // recenter
      my0 /= n; my1 /= n
      i = 0
      while (i < n) { y(i)(0) -= my0; y(i)(1) -= my1; i += 1 }
      t += 1
    }
    y
  }
}
