package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end profiling pipeline — the reference's `run_full_analysis`
  * (`gbr.py:816-848`): profile each dataset, render a markdown + JSON report
  * per dataset plus the PNG report figures, then a cross-dataset summary.
  *
  * Execution shape per dataset: the §2.4 aggregation passes (each a narrow
  * multi-agg job; only the categorical top-k and embedding stats shuffle,
  * both on tiny key spaces), a few collected stat rows, then driver-side
  * rendering. The embedding column is read ONLY by the embedding stats pass
  * (column pruning keeps it out of every other scan — it is ~90% of the
  * bytes at the reference's 10M scale).
  *
  * Plot rendering (reference `gbr.py:268-550`) follows the same boundary:
  * every figure draws an already-aggregated driver-side result (histogram
  * bins, top-k counts, a tiny correlation matrix, a bounded projection
  * sample), so the PNG step adds a handful of narrow single-column jobs and
  * zero driver-side data volume that scales with the table.
  */
object ProfilePipeline {

  final case class DatasetReport(name: String, profile: Profile.TableProfile,
      embedding: Option[Profile.EmbeddingStats], sizeMb: Double)

  /** Profile one parquet dataset; `embeddingCol` adds vector analytics.
    * `normCol` names a layout-precomputed per-row norm column (see
    * [[Profile.embeddingStats]]'s normCol overload): when present the
    * embedding stats never scan the vector payload, and the column is
    * excluded from the generic profile (it is storage metadata, not a
    * dataset feature — the report must not change shape when a layout
    * happens to carry stats columns).
    */
  def analyzeDataset(spark: SparkSession, name: String, path: String,
      embeddingCol: Option[String] = None,
      normCol: Option[String] = None): DatasetReport = {
    val df = spark.read.parquet(path)
    analyzeFrames(df, prunedStats(df, embeddingCol, normCol), name, path,
      embeddingCol, normCol)
  }

  /** The table minus payload/stats columns — what every profile pass and
    * stats figure actually touches.
    */
  private def prunedStats(df: DataFrame, embeddingCol: Option[String],
      normCol: Option[String]): DataFrame =
    (embeddingCol.toSeq ++ normCol.toSeq).foldLeft(df)((d, c) => d.drop(c))

  private def analyzeFrames(df: DataFrame, statsDf: DataFrame, name: String,
      path: String, embeddingCol: Option[String],
      normCol: Option[String]): DatasetReport = {
    val profile = step("profile_scan")(Profile.profile(statsDf))
    val emb = embeddingCol
      .filter(df.columns.contains)
      .map(c => step("embedding_stats")(Profile.embeddingStats(df, c, normCol)))
    DatasetReport(name, profile, emb, Profile.fileSizeMb(df, path))
  }

  // SPARK_GRAFT_PROFILE_DEBUG=1: per-step stderr timings — the perf
  // attribution for the bench's profile_pipeline entry (covers the analyze
  // phase and every figure job, so "where did the time go" is one env var
  // away instead of a guess; the r7 500-literal-In discovery came from
  // exactly this)
  private val debug = sys.env.contains("SPARK_GRAFT_PROFILE_DEBUG")
  private def step[A](name: String)(f: => A): A = {
    if (!debug) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
  }

  /** Render the reference's report figures for one profiled dataset into
    * `dir`: category / null-count bars, per-numeric-column histograms, the
    * numeric correlation heatmap, and — when an embedding column is present
    * — norm histogram, per-dimension mean/std lines and PCA + t-SNE
    * projection scatters over a bounded sample (colored by `labelCol` when
    * given, mirroring `gbr.py`'s category-colored projections).
    */
  private def renderPlots(df: DataFrame, statsDf: DataFrame,
      report: DatasetReport,
      embeddingCol: Option[String], labelCol: Option[String],
      sampleN: Int, dir: java.nio.file.Path,
      idCol: Option[String] = None): Unit = {
    val p = report.profile
    p.categorical.headOption.filter(_.top.nonEmpty).foreach { c =>
      Plots.barChart(c.top.map(_._1), c.top.map(_._2.toDouble),
        s"Top categories — ${c.column}",
        dir.resolve("category_analysis.png").toString)
    }
    if (p.nulls.nonEmpty) {
      val cols = p.nulls.toSeq.sortBy(_._1)
      Plots.barChart(cols.map(_._1), cols.map(_._2.toDouble),
        "Null values by column", dir.resolve("null_analysis.png").toString,
        yLabel = "nulls")
    }
    // The three numeric histograms and the correlation matrix fuse into ONE
    // global-aggregate job (r17): each histogram bin is a conditional count
    // over the SAME bucket expression Profile.histogram groups by (so the
    // counts are bit-identical), and the corr() terms ride the same pass —
    // 4 scans + 3 exchanges of the (cached) stats projection become one
    // exchange-free scan (guide §2.4).
    val histCols = p.numeric.filter(s => s.max > s.min).take(3)
    val corrCols = p.numeric.filter(s => s.max > s.min).map(_.column).take(4)
    val pairs = for (a <- corrCols; b <- corrCols if a < b) yield (a, b)
    val bins = 30
    val figureAggs =
      histCols.flatMap { s =>
        val width = (s.max - s.min) / bins
        val bucket = least(greatest(
          floor((col(s.column) - s.min) / width).cast("int"), lit(0)),
          lit(bins - 1))
        (0 until bins).map(b =>
          count(when(bucket === b, 1)).as(s"__h_${s.column}_$b"))
      } ++ pairs.map { case (a, b) => corr(col(a), col(b)).as(s"__c_${a}__$b") }
    if (figureAggs.nonEmpty) {
      val row = step("stats_figures_scan")(
        statsDf.agg(figureAggs.head, figureAggs.tail: _*).head())
      histCols.foreach { s =>
        val counts = (0 until bins).map(b =>
          row.getAs[Long](s"__h_${s.column}_$b"))
        Plots.histogram(s.min, s.max, counts,
          s"${s.column} distribution", s.column,
          dir.resolve(s"${s.column}_hist.png").toString)
      }
      if (corrCols.length >= 2) {
      val byPair = pairs.map { case (a, b) =>
        val i = row.fieldIndex(s"__c_${a}__$b")
        (a, b) -> (if (row.isNullAt(i)) 0.0 else row.getDouble(i)) }.toMap
      val m = corrCols.map(a => corrCols.map { b =>
        if (a == b) 1.0
        else byPair.getOrElse((a, b), byPair.getOrElse((b, a), 0.0))
      })
      Plots.heatmap(m, corrCols, "Correlation matrix — numerical features",
        dir.resolve("correlation_analysis.png").toString)
      }
    }
    // Embedding figures compute over ONE bounded sample, collected once —
    // the reference's exact shape (`gbr.py:423-520` loads `sample_size`
    // embeddings and derives norms, per-dim mean/std AND the projections
    // from that same array). The full-table duals of these stats stay
    // available as distributed oracled operators ([[Profile.embeddingStats]],
    // [[Embedding.perDimensionSummary]], q25/q44/q48); the figures are
    // sample sketches by design, so the plot step adds exactly one
    // limit-pushdown collect regardless of table size.
    for (embCol <- embeddingCol if df.columns.contains(embCol)) {
      val lbl = labelCol.filter(df.columns.contains)
      val sel = col(embCol).cast("array<double>") +:
        lbl.map(col(_).cast("string")).toSeq
      // With an id column the sample is the deterministic lowest-id set
      // (same contract as Embedding.tsneProject/umapProject — identical
      // figures run to run, at the cost of an id scan + a pushed-filter
      // fetch; Embedding.lowestIdRows explains why a direct wide
      // TakeOrdered breaks at scale); without one, limit() keeps the
      // cheap read-few-rows plan and the figures are best-effort sketches
      // of an arbitrary sample.
      val raw = step("sample_collect")((idCol.filter(df.columns.contains) match {
        case Some(id) => Embedding.lowestIdRows(
          df, id, sel, sampleN, valid = Some(col(embCol).isNotNull))
        case None => df.select(sel: _*).filter(col(embCol).isNotNull)
          .limit(sampleN).collect()
      }).filter(!_.isNullAt(0)))
      // ragged-corpus guard (the reference tolerates malformed embeddings
      // via try/except): keep only vectors of the modal dimension so a
      // short or null-element vector can't abort the whole report
      val modalDim = raw.map(_.getSeq[Double](0).length).groupBy(identity)
        .map { case (d, g) => (g.length, d) }.maxOption.map(_._2)
      val sample = raw.filter(r => modalDim.contains(r.getSeq[Double](0).length)
        && !r.getSeq[Double](0).contains(null))
      if (sample.length >= 4) {
        val x = sample.map(_.getSeq[Double](0).toArray)
        val n = x.length
        val d = x(0).length
        val norms = x.map(v => math.sqrt(v.map(a => a * a).sum))
        val (nLo, nHi0) = (norms.min, norms.max)
        val nHi = if (nHi0 > nLo) nHi0 else nLo + 1e-9
        val bins = 30
        val counts = Array.fill(bins)(0L)
        norms.foreach { v =>
          val b = math.min(((v - nLo) / (nHi - nLo) * bins).toInt, bins - 1)
          counts(b) += 1
        }
        Plots.histogram(nLo, nHi, counts.toIndexedSeq,
          s"Embedding vector norms ($n samples)", "L2 norm",
          dir.resolve("embedding_norms.png").toString)
        val mean = Array.tabulate(d)(j => x.map(_(j)).sum / n)
        val std = Array.tabulate(d) { j =>
          math.sqrt(x.map(v => { val t = v(j) - mean(j); t * t }).sum /
            math.max(n - 1, 1))
        }
        Plots.linePlot(mean.toIndexedSeq,
          s"Mean by embedding dimension ($n samples)", "dimension", "mean",
          dir.resolve("embedding_dim_mean.png").toString)
        Plots.linePlot(std.toIndexedSeq,
          s"Std by embedding dimension ($n samples)", "dimension", "std",
          dir.resolve("embedding_dim_std.png").toString)
        val classes = sample.map(r =>
          if (lbl.isEmpty || r.isNullAt(1)) "sample" else r.getString(1))
          .toIndexedSeq
        // the three projection figures share ONE O(n²·d) pairwise pass and
        // ONE PCA power iteration: localPca2 is both the PCA figure and the
        // t-SNE/UMAP init, and the squared-distance matrix feeds both fits
        // (each *FromD2 clones the init before optimizing in place) — at
        // 500×2688 the distance pass dominates each fit, so sharing it
        // halves the figures' driver-side cost vs independent tsneLocal +
        // umapLocal calls
        val pca = step("pca_fit")(Embedding.localPca2(x))
        Plots.scatter(pca.map(r => (r(0), r(1))).toIndexedSeq, classes,
          "PCA projection of embeddings", "PC1", "PC2",
          dir.resolve("pca_projection.png").toString)
        val d2 = step("pairwise")(Embedding.pairwiseSquaredDistances(x))
        val ts = step("tsne_fit")(Embedding.tsneFromD2(d2, pca,
          perplexity = 30.0, iterations = 300))
        Plots.scatter(ts.map(r => (r(0), r(1))).toIndexedSeq, classes,
          "t-SNE projection of embeddings", "t-SNE 1", "t-SNE 2",
          dir.resolve("tsne_projection.png").toString)
        val um = step("umap_fit")(Embedding.umapFromD2(d2, pca,
          nNeighbors = 15, minDist = 0.1, iterations = 200))
        Plots.scatter(um.map(r => (r(0), r(1))).toIndexedSeq, classes,
          "UMAP projection of embeddings", "UMAP 1", "UMAP 2",
          dir.resolve("umap_projection.png").toString)
        // pairwise cosine similarity over a ≤64 subsample (reference
        // `gbr.py:530-550` uses ≤200; a 64² annot-free heatmap stays
        // legible at our canvas size) + the upper-triangle distribution
        val m = math.min(n, 64)
        val unit = x.take(m).map { v =>
          val nm = math.sqrt(v.map(a => a * a).sum)
          if (nm < 1e-12) v else v.map(_ / nm)
        }
        val cosM = unit.map(a => unit.map(b =>
          a.zip(b).map { case (p, q) => p * q }.sum).toIndexedSeq).toIndexedSeq
        // index labels unreadable past ~12 cells — draw none
        val cellLabels =
          if (m <= 12) (0 until m).map(_.toString) else Seq.fill(m)("")
        Plots.heatmap(cosM, cellLabels,
          s"Cosine similarity matrix ($m samples)",
          dir.resolve("cosine_similarity.png").toString, annot = false)
        val sims = for (i <- 0 until m; j <- i + 1 until m) yield cosM(i)(j)
        if (sims.nonEmpty) {
          val (sLo0, sHi0) = (sims.min, sims.max)
          val sHi2 = if (sHi0 > sLo0) sHi0 else sLo0 + 1e-9
          val sCounts = Array.fill(30)(0L)
          sims.foreach { v =>
            val b = math.min(((v - sLo0) / (sHi2 - sLo0) * 30).toInt, 29)
            sCounts(b) += 1
          }
          Plots.histogram(sLo0, sHi2, sCounts.toIndexedSeq,
            "Pairwise cosine similarity distribution", "cosine similarity",
            dir.resolve("cosine_distribution.png").toString)
        }
      }
    }
  }

  /** Analyze every (name → path) dataset and write
    * `outDir/<name>/README.md`, `outDir/<name>/stats.json`, the PNG report
    * figures (disable with `plots = false`) and a top-level
    * `outDir/summary_report.md` — the reference's report tree
    * (`reports/benchmark_{10k,100k,1M,10M}/README.md`, the `*.png` figures
    * and `reports/summary_report.md`).
    */
  /** `cacheStats = true` (default) pins the pruned non-payload projection
    * (in-memory columnar, MEMORY_ONLY) for the duration of one dataset's
    * analysis: the profile's pass structure plus the stats figures touch
    * that same projection ~12 times (fused multi-agg, multi-distinct,
    * top-k per categorical, three histograms, the correlation scan), and
    * on a device where reads are metered, twelve scans of the text columns
    * is the difference between a latency-bound report and an IO-bound one.
    * MEMORY_ONLY deliberately: an overflow drops blocks and recomputes
    * from parquet rather than writing spill to the same metered device.
    * The payload columns never enter the cache (the projection is pruned
    * BEFORE persist), so at the reference's 10M×2688 scale the pinned set
    * is the ~1% non-vector slice, not the 100 GB payload — the same
    * prune-then-pin shape a cluster-scale profiler wants.
    */
  def run(spark: SparkSession, datasets: Seq[(String, String)], outDir: String,
      embeddingCol: Option[String] = None, plots: Boolean = true,
      labelCol: Option[String] = None,
      plotSampleN: Int = 500,
      idCol: Option[String] = None,
      normCol: Option[String] = None,
      cacheStats: Boolean = true): Seq[DatasetReport] = {
    val reports = datasets.map { case (name, path) =>
      val df = spark.read.parquet(path)
      val statsDf0 = prunedStats(df, embeddingCol, normCol)
      val statsDf =
        if (cacheStats)
          statsDf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        else statsDf0
      try {
        val r = analyzeFrames(df, statsDf, name, path, embeddingCol, normCol)
        val dir = Paths.get(outDir, name)
        Files.createDirectories(dir)
        val md = new StringBuilder(Profile.renderMarkdown(name, r.profile))
        md.append(f"\n## Dataset file\n\n- size: ${r.sizeMb}%.1f MB\n")
        r.embedding.foreach { e =>
          md.append(s"\n## Embedding\n\n- vectors: ${e.count}\n- dims: ${e.dims}\n")
          md.append(f"- mean L2 norm: ${e.normMean}%.4f ± ${e.normStd}%.4f\n")
        }
        Files.writeString(dir.resolve("README.md"), md.toString)
        Files.writeString(dir.resolve("stats.json"),
          Profile.renderJson(name, r.profile))
        if (plots)
          renderPlots(df, statsDf, r, embeddingCol, labelCol,
            plotSampleN, dir, idCol)
        r
      } finally if (cacheStats) { statsDf.unpersist(); () }
    }
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(outDir, "summary_report.md"),
      Profile.renderSummaryMarkdown(reports.map(r => r.name -> r.profile)))
    reports
  }
}
