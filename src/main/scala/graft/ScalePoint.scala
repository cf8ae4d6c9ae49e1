package graft

import graft.operators.{Dedup, VectorSearch}
import graft.sources.ProductGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One ON-DISK sf1 scale point: generates the product table at 1M rows
  * (10× the per-round bench's sf0.1 workload, ~14 GB parquet), runs the
  * read-side workload entries against it — the four selectivity-tier
  * top-k reads, the full profile pipeline — plus the near-dup pipeline
  * over a 10× replicated documents table, and prints one JSON line. Each
  * entry's ratio vs the same entry at sf0.1 goes into SCALE.md: ≈10× (or
  * less) means the operator's cost is linear in rows and survives the
  * 100 TB extrapolation; the single bulk write (index_build) doubles as
  * the proportional "<2 hrs @ 10M rows" index-build anchor at 1/10 scale.
  *
  * This is deliberately a ONE-OFF probe, not part of the per-round bench:
  * the 14 GB write is a real bite out of this VM's burst IO budget, so it
  * runs once, early in a session, and the artifact is committed to
  * SCALE.md rather than re-measured every round.
  */
object ScalePoint {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.get("SPARK_GRAFT_WORK_DIR").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_sf1").toString)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$base/spark-local")
    GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    spark.range(1000).select(sum(col("id"))).collect()

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try {
        f
        results(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[scalepoint] $name FAILED: ${e.getMessage}")
          results(name) = -1.0
      }
    }

    // SPARK_GRAFT_SCALE_ROWS: smoke-test override (the committed artifact
    // always runs the default 1M — the 10× point vs the sf0.1 bench)
    val nProducts = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "1000000").toLong
    val dims = 2688
    val productsPath = s"$base/products_sf1"

    // SPARK_GRAFT_SCALE_SECTIONS picks the slice, sized to this VM's
    // write-IO budget:
    //   all  — the full point (~25 GB of writes)
    //   docs — only the documents-scale dedup entries (~1 GB)
    //   ivf  — only the IVF build + ANN eval over an EXISTING products
    //          table at productsPath (requires SPARK_GRAFT_WORK_DIR from
    //          a prior run or a fresh generation below; ~11 GB — the
    //          index write only). The r11 assign_write verification runs
    //          this slice so the products table is generated once per
    //          session, not once per build measurement.
    val sections = sys.env.getOrElse("SPARK_GRAFT_SCALE_SECTIONS", "all")
    if (sections != "docs") {

    // presence check must not key on _SUCCESS: GraftSession disables the
    // marker (ScalePoint's own writeIndexed output has none) — any
    // parquet content under the path is the signal
    val productsReady = sections == "ivf" && FsUtil.hasParquet(productsPath)
    if (productsReady) {
      results("index_build_reused_value") = 1.0
    } else {
      // identical layout rules to Bench.index_build — by construction:
      // both call ProductWorkload.writeIndexed, so the ratio isolates
      // data volume, not plan shape
      timed("index_build") {
        ProductWorkload.writeIndexed(spark, nProducts, dims, cpus.toInt,
          productsPath)
      }
    }

    val products = spark.read.parquet(productsPath)
    try { new ProcessBuilder("sync").start().waitFor(); () }
    catch { case _: Throwable => () }
    Thread.sleep(15000) // drain the 14 GB writeback before the read tiers

    if (sections == "all") {
    val queryVec = products.select(col("embedding")).head().getSeq[Float](0).toArray
    def topk(filter: Column): DataFrame =
      VectorSearch.topK(products, "embedding", queryVec, 100,
        Some(filter), projection = Seq("parent_asin"))
    ProductWorkload.selPreds.foreach { case (name, pred) =>
      timed(name) { topk(pred).collect() }
    }

    timed("profile_pipeline") {
      graft.operators.ProfilePipeline.run(spark,
        Seq("products" -> productsPath), s"$base/reports",
        embeddingCol = Some("embedding"), idCol = Some("parent_asin"),
        normCol = Some("emb_norm"))
    }
    } // sections == all (read tiers + profile)

    // ANN at scale: IVF over the 1M-row table with the DERIVED cluster
    // count (defaultNumClusters(1M) = 1000) — the ~√n sizing rule's first
    // measurement at its own scale (the per-round bench pins 16 clusters
    // at sf0.1) — then the four filtered selectivity tiers evaluated with
    // one-scan-per-(tier, nprobe) multi-query search, recall vs the exact
    // multi-query baseline. The nprobe sweep stays ≤ ~√numClusters (32 of
    // 1000 clusters ≈ 3% of the index probed).
    val pivfPath = s"$base/ivf_products_sf1"
    var pivf: VectorSearch.IvfIndex = null
    timed("ivf_products_build_sf1") {
      pivf = VectorSearch.buildIvf(
        products.select(col("parent_asin"), col("average_rating"),
          col("rating_number"), col("main_category"), col("embedding")),
        "embedding", 0, pivfPath, occupancyCols = Seq("main_category"))
    }
    if (pivf != null) {
      results("ivf_num_clusters_value") = pivf.centroids.length.toDouble
      // r9: ENGAGE the two-level router on this real index — the derived
      // 1000 cells sit below the 4096 default, so without this the sf1
      // point never exercises routeTwoLevel end-to-end. Every routing
      // call below (filtered evals in full-ranking mode, the unfiltered
      // nprobe-32 probe with genuine early termination) then goes
      // through the router; the telemetry keys in the artifact are the
      // proof it served real queries.
      pivf.twoLevelMinCells = 2
      // Recall methodology at this scale: recall(np) depends only on which
      // clusters hold each query's exact top-100, so the FULL
      // recall-vs-nprobe curve per tier comes from one bounded scan (the
      // exact baselines + the assignments of their ≤ 1200 ids) plus driver
      // arithmetic — no index rescan per (tier, nprobe) point. The chosen
      // operating point is then CONFIRMED physically through
      // IvfIndex.searchMulti (which adds the exact-fallback widening, so
      // physical recall ≥ the analytic curve).
      def dotL(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }; s
      }
      // same assignment metric as the index build (NearestCentroid: L2 via
      // |c|^2 - 2 x.c) and same probe order as IvfIndex.nearestClusters
      // (dot product, descending)
      def assignL(v: Array[Float], cents: Array[Array[Float]]): Int =
        cents.indices.minBy(c => dotL(cents(c), cents(c)) - 2.0 * dotL(v, cents(c)))
      // same routing bound as IvfIndex.nearestClusters: q·c + r_c·|q| desc
      def probeOrder(q: Array[Float], cents: Array[Array[Float]],
          radii: Array[Double]): Array[Int] = {
        val qn = math.sqrt(dotL(q, q))
        cents.indices
          .sortBy(c => -(dotL(cents(c), q) +
            (if (c < radii.length) radii(c) else 0.0) * qn))
          .toArray
      }
      val nprobeGrid = Seq(8, 16, 32, 64, 128)
      var exactTops: Map[String, Map[Int, Set[String]]] = Map.empty
      var assignDerived: Map[String, Int] = Map.empty
      val queryVecs = products.select(col("embedding")).head(3)
        .map(_.getSeq[Float](0).toArray).toSeq
      def idSets(df: DataFrame): Map[Int, Set[String]] =
        df.collect().groupBy(_.getInt(0)).map { case (q, rows) =>
          q -> rows.map(_.getString(3)).toSet
        }
      timed("ann_exact_baselines_sf1") {
        exactTops = ProductWorkload.selPreds.map { case (selName, pred) =>
          selName -> idSets(VectorSearch.topKMulti(
            products, "embedding", queryVecs, 100, "parent_asin", Some(pred)))
        }.toMap
        val allIds = exactTops.values.flatMap(_.values).flatten.toSet.toSeq
        // PHYSICAL cell of each exact-top id, read from the index files —
        // not a driver-side exact re-assignment. The two diverge once the
        // build assigns through the grouped kernel (r11: 1.7% of rows sit
        // in a near-equidistant neighbor cell), and the curve's job is to
        // model the ENGINE's probe outcomes, whose ground truth is where
        // the rows physically landed. One pushed id-scan, no vector bytes.
        assignDerived = spark.read.parquet(pivfPath)
          .filter(col("parent_asin").isin(allIds: _*))
          .select(col("parent_asin"), col("__cluster")).collect()
          .map(r => r.getString(0) -> r.getInt(1)).toMap
      }
      // the analytic curve models the ENGINE's filter-aware probe plan
      // (IvfIndex.probePlan): cells ranked by the routing bound,
      // restricted to cells holding matching rows, widened until ≥ k
      // candidates — `tierCounts` carries the per-(tier, cell) match
      // counts that plan keys on
      def planProbe(order: Array[Int], counts: Map[Int, Long], np: Int,
          k: Int): Set[Int] = {
        val ranked = order.filter(c => counts.getOrElse(c, 0L) > 0L)
        val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
        var cum = 0L
        var i = 0
        while (i < ranked.length && (i < np || cum < k)) {
          sel += ranked(i); cum += counts(ranked(i)); i += 1
        }
        sel.toSet
      }
      def curve(cents: Array[Array[Float]], radii: Array[Double],
          assign: Map[String, Int], tag: String,
          tierCounts: Map[String, Map[Int, Long]]): Map[String, Int] = {
        val orders = queryVecs.map(q => probeOrder(q, cents, radii))
        ProductWorkload.selPreds.map { case (selName, _) =>
          val tier = selName.stripPrefix("read_")
          val chosen = nprobeGrid.map { np =>
            val rec = queryVecs.indices.map { i =>
              val probed = planProbe(orders(i), tierCounts(selName), np, 100)
              val exact = exactTops(selName).getOrElse(i, Set.empty)
              if (exact.isEmpty) 1.0
              else exact.count(id => probed(assign(id))).toDouble / exact.size
            }.sum / queryVecs.length
            results(s"ann_recall_${tier}_${tag}_np${np}_value") = rec
            np -> rec
          }.collectFirst { case (np, rec) if rec >= 0.9 => np }
            .getOrElse(nprobeGrid.last)
          selName -> chosen
        }.toMap
      }
      // per-(tier, cell) match counts from the physical index — ONE scan
      // of the filter columns with conditional sums, no vector bytes
      val idxDf = spark.read.parquet(pivfPath)
      val derivedCounts: Map[String, Map[Int, Long]] = {
        val aggs = ProductWorkload.selPreds.map { case (n, p) =>
          sum(p.cast("long")).as(n) }
        val rows = idxDf.groupBy(col("__cluster")).agg(aggs.head, aggs.tail: _*)
          .collect()
        ProductWorkload.selPreds.zipWithIndex.map { case ((n, _), i) =>
          n -> rows.map(r => r.getInt(0) ->
            (if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)))
            .filter(_._2 > 0).toMap
        }.toMap
      }
      // the analytic curve must model the ENGINE's routing radius — RMS
      // when the build recorded one (round 7 default), max otherwise
      val routing =
        if (pivf.rmsRadii.nonEmpty) pivf.rmsRadii else pivf.radii
      val opPoints = curve(pivf.centroids, routing, assignDerived,
        "derived", derivedCounts)
      // physical confirmation at each tier's analytic operating point,
      // r10: per-tier the ENGINE's path choice (cost-based exact-scan
      // switch) is recorded alongside a forced-probe A/B — alternated
      // E,P,E,P on the same cache state, min per mechanism — so the
      // artifact carries chosen path + wall + recall for both sides
      timed("ann_recall_filtered_eval_sf1") {
        ProductWorkload.selPreds.foreach { case (selName, pred) =>
          val tier = selName.stripPrefix("read_")
          val np = opPoints(selName)
          def recallOf(sets: Map[Int, Set[String]]): Double =
            queryVecs.indices.map { i =>
              val exact = exactTops(selName).getOrElse(i, Set.empty)
              if (exact.isEmpty) 1.0
              else exact.intersect(sets.getOrElse(i, Set.empty))
                .size.toDouble / exact.size
            }.sum / queryVecs.length
          def runOnce(): (Map[Int, Set[String]], Double, Boolean) = {
            val sw0 = pivf.exactSwitchCount
            val t0 = System.nanoTime()
            val sets = idSets(pivf.searchMulti(
              spark, queryVecs, 100, nprobe = np, "parent_asin", Some(pred)))
            (sets, (System.nanoTime() - t0) / 1e9,
              pivf.exactSwitchCount > sw0)
          }
          def forcedProbe[T](body: => T): T = {
            // handle-level override (r11): the process-global default is
            // never touched — see IvfIndex.exactScanFraction
            pivf.exactScanFraction = -1.0
            try body finally pivf.exactScanFraction = Double.NaN
          }
          val e1 = runOnce()
          val p1 = forcedProbe(runOnce())
          val e2 = runOnce()
          val p2 = forcedProbe(runOnce())
          // NOTE (cross-round comparisons): from r10 on,
          // ann_recall_{tier}_value is PATH-DEPENDENT — it records the
          // engine's chosen path, which is trivially 1.0 whenever the
          // exact-scan switch fires (ann_path_exact_* = 1). The
          // nprobe-meaningful number is ann_recall_probe_* (the forced
          // probe) — gate the ≥0.9 recall claim on THAT key, and do not
          // read an engine-path 1.0 as a probe-recall improvement.
          results(s"ann_recall_${tier}_value") = recallOf(e1._1)
          results(s"ann_nprobe_${tier}_value") = np.toDouble
          results(s"ann_path_exact_${tier}_value") = if (e1._3) 1.0 else 0.0
          results(s"ann_wall_engine_${tier}_value") = math.min(e1._2, e2._2)
          results(s"ann_wall_probe_${tier}_value") = math.min(p1._2, p2._2)
          results(s"ann_recall_probe_${tier}_value") = recallOf(p1._1)
        }
      }
      // Two-level router end-to-end (r9). The filtered evals above route
      // through routeTwoLevel in FULL-ranking mode (the filter-aware
      // plan ranks every cell; full ranking expands every group and
      // provably returns the flat order). The UNFILTERED nprobe-32 probe
      // is where the walk terminates early — its per-query expanded-cell
      // count being well under numClusters is the sub-linear-routing
      // proof, and the flat A/B right after pins the candidate cap's
      // end-to-end recall cost (expected 0.000).
      var exactNF: Map[Int, Set[String]] = Map.empty
      timed("ann_unfiltered_exact_sf1") {
        exactNF = idSets(VectorSearch.topKMulti(
          products, "embedding", queryVecs, 100, "parent_asin"))
      }
      def recallVsExactNF(approx: Map[Int, Set[String]]): Double =
        queryVecs.indices.map { i =>
          val e = exactNF.getOrElse(i, Set.empty)
          if (e.isEmpty) 1.0
          else e.intersect(approx.getOrElse(i, Set.empty))
            .size.toDouble / e.size
        }.sum / queryVecs.length
      def unfilteredOnce(): (Map[Int, Set[String]], Double) = {
        val t0 = System.nanoTime()
        val s = idSets(pivf.searchMulti(
          spark, queryVecs, 100, nprobe = 32, "parent_asin"))
        (s, (System.nanoTime() - t0) / 1e9)
      }
      def setRouted(on: Boolean): Unit = {
        pivf.twoLevelMinCells = if (on) 2 else Int.MaxValue
        pivf.invalidateRouter()
      }
      val telBefore = pivf.routerTelemetry
      timed("ann_unfiltered_routed_np32_sf1") {
        results("ann_recall_unfiltered_routed_np32_value") =
          recallVsExactNF(unfilteredOnce()._1)
      }
      val telAfter = pivf.routerTelemetry
      results("two_level_routed_queries_value") = telAfter._1.toDouble
      results("two_level_early_stops_value") = telAfter._3.toDouble
      results("two_level_unfiltered_avg_expanded_cells_value") =
        if (telAfter._1 > telBefore._1)
          (telAfter._2 - telBefore._2).toDouble / (telAfter._1 - telBefore._1)
        else -1.0
      // flat A/B at the same operating point: recall delta of the
      // router's cap truncation, measured end-to-end
      setRouted(false)
      timed("ann_unfiltered_flat_np32_sf1") {
        results("ann_recall_unfiltered_flat_np32_value") =
          recallVsExactNF(unfilteredOnce()._1)
      }
      // r10: ORDER-CONTROLLED wall A/B — the r9 numbers (routed 1.68 s
      // vs flat 1.07 s) were confounded by scan temperature (routed ran
      // first, cold). Both mechanisms above have now each touched the
      // scan once; alternate R,F,R,F and take min per mechanism so both
      // see the same cache state. Router rebuild cost (invalidate +
      // first route) is inside the routed reps — the honest end-to-end
      // price at this cell count.
      setRouted(true); val rw1 = unfilteredOnce()._2
      setRouted(false); val fw1 = unfilteredOnce()._2
      setRouted(true); val rw2 = unfilteredOnce()._2
      setRouted(false); val fw2 = unfilteredOnce()._2
      results("ann_unfiltered_routed_np32_wall_value") = math.min(rw1, rw2)
      results("ann_unfiltered_flat_np32_wall_value") = math.min(fw1, fw2)
      setRouted(true)
      // Macro-granularity comparison WITHOUT a second 11 GB index write:
      // the per-round bench pins 16 clusters at sf0.1; fit the same
      // granularity here (KMeans on a bounded sample, same seed family)
      // and derive its analytic curve — recall at scale is a property of
      // cluster-granularity vs the data's intrinsic structure, and this
      // records both sides of the dial in one artifact.
      timed("ann_recall_macro16_eval_sf1") {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val sample = products.select(
            array_to_vector(col("embedding").cast("array<double>")).as("__v"))
          .sample(withReplacement = false, fraction = 0.05, seed = 42L)
        val model = new KMeans().setK(16).setSeed(42L).setInitMode("random")
          .setFeaturesCol("__v").fit(sample)
        val cents16 = model.clusterCenters
          .map(_.toArray.map(_.toFloat))
        // RMS radii over the same sample, mirroring buildIvf's stats pass
        // and the engine's routing default
        val radii16 = new Array[Double](16)
        products.select(col("embedding"))
          .sample(withReplacement = false, fraction = 0.05, seed = 42L)
          .select(
            graft.functions.nearest_centroid(col("embedding"), cents16).as("__c"),
            graft.functions.nearest_centroid_dist(col("embedding"), cents16).as("__d"))
          .groupBy(col("__c"))
          .agg(count(lit(1)).as("__n"), sum(col("__d")).as("__s"))
          .collect()
          .foreach(r => radii16(r.getInt(0)) =
            math.sqrt(r.getDouble(2) / math.max(r.getLong(1), 1L)))
        val allIds = exactTops.values.flatMap(_.values).flatten.toSet.toSeq
        val assign16 = products
          .filter(col("parent_asin").isin(allIds: _*))
          .select(col("parent_asin"), col("embedding")).collect()
          .map(r => r.getString(0) ->
            assignL(r.getSeq[Float](1).toArray, cents16)).toMap
        // per-(tier, cell) match counts for this granularity: one pass
        // with the assignment kernel + conditional sums
        val aggs16 = ProductWorkload.selPreds.map { case (n, p) =>
          sum(p.cast("long")).as(n) }
        val rows16 = products
          .withColumn("__c16",
            graft.functions.nearest_centroid(col("embedding"), cents16))
          .groupBy(col("__c16")).agg(aggs16.head, aggs16.tail: _*)
          .collect()
        val counts16: Map[String, Map[Int, Long]] =
          ProductWorkload.selPreds.zipWithIndex.map { case ((n, _), i) =>
            n -> rows16.map(r => r.getInt(0) ->
              (if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1)))
              .filter(_._2 > 0).toMap
          }.toMap
        val orders16 = queryVecs.map(q => probeOrder(q, cents16, radii16))
        ProductWorkload.selPreds.foreach { case (selName, _) =>
          val tier = selName.stripPrefix("read_")
          Seq(2, 4, 8, 16).foreach { np =>
            val rec = queryVecs.indices.map { i =>
              val probed = planProbe(orders16(i), counts16(selName), np, 100)
              val exact = exactTops(selName).getOrElse(i, Set.empty)
              if (exact.isEmpty) 1.0
              else exact.count(id => probed(assign16(id))).toDouble / exact.size
            }.sum / queryVecs.length
            results(s"ann_recall_${tier}_macro16_np${np}_value") = rec
          }
        }
      }
    }

    } // sections != "docs"

    if (sections != "ivf") {
    // documents at 10× sf0.1 with fresh ids, ON DISK, so the near-dup
    // pipeline reads real parquet at the scaled size
    val docsPath = s"$base/documents_10x"
    timed("documents_10x_write") {
      val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      docs.select(explode(sequence(lit(0L), lit(9L))).as("__k"), col("doc_id"),
          col("text"), col("lang"))
        .select((col("doc_id") + col("__k") * 100000000L).as("doc_id"),
          col("text"), col("lang"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(docsPath)
    }
    timed("near_dup_pipeline") {
      Dedup.nearDuplicatePairs(spark.read.parquet(docsPath), "text", "doc_id",
        threshold = 0.5)
        .write.mode("overwrite").format("noop").save()
    }
    // PAIRED estimated-mode run at the same docs scale: same LSH banding
    // shape, verify = MinHash agreement (numHashes 32), NO shingle store.
    // The index-size rows alongside are the measured counterpart of
    // SCALE.md's bytes/doc table at 10× docs: exact mode stores the
    // distinct (doc, shingle) frame, estimated mode stores 32 signature
    // rows/doc — the build-time delta plus both stored-row counts land in
    // the artifact.
    timed("near_dup_pipeline_estimated") {
      Dedup.estimatedNearDuplicatePairs(spark.read.parquet(docsPath),
          "text", "doc_id", threshold = 0.5)
        .write.mode("overwrite").format("noop").save()
    }
    timed("near_dup_index_exact_build") {
      val idx = Dedup.NearDupIndex.build(spark.read.parquet(docsPath),
        "text", "doc_id")
      results("near_dup_index_exact_shingle_rows_value") =
        idx.shingles.get.count().toDouble
      results("near_dup_index_exact_band_rows_value") =
        idx.bands.count().toDouble
    }
    timed("near_dup_index_est_build") {
      val idx = Dedup.NearDupIndex.build(spark.read.parquet(docsPath),
        "text", "doc_id", estimatedJaccard = true)
      results("near_dup_index_est_sig_rows_value") =
        idx.signatures.get.count().toDouble
      results("near_dup_index_est_band_rows_value") =
        idx.bands.count().toDouble
    }
    } // sections != "ivf"

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"scale_point_sf1","rows":$nProducts,"queries":$qs}""")
    if (sys.env.get("SPARK_GRAFT_WORK_DIR").isEmpty)
      FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
