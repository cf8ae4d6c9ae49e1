package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup index growth point (r10 verdict task 5): the
  * signature-sized-index claim's largest prior measurement is the 500k-doc
  * `documents_10x` table (SCALE.md r7); this probe pins TWO claims an
  * order of magnitude up, at 5M documents in estimated mode:
  *
  *   1. the index stays SIGNATURE-SIZED — stored rows ∝ exact-group
  *      representatives × (numHashes + bands), independent of corpus
  *      token count;
  *   2. [[Dedup.NearDupIndex.dedupBatch]] is O(batch) new work — the
  *      same fixed batch classifies against a 0.5M-doc and a 5M-doc
  *      index at comparable wall (candidate fan-in is bounded by true
  *      band-key multiplicity, not corpus size).
  *
  * Corpus: the sf0.1 documents table replicated with PER-REPLICA TOKEN
  * RENAMING (every word suffixed `_k`), so replicas share no 3-shingles
  * — a distinct-document corpus, not a 100×-dense near-dup ball. A
  * plain replication (ScalePoint's `documents_10x`) collapses to the
  * ORIGINAL corpus's ~5k exact-group reps and the index provably does
  * not grow at all; the renamed corpus is the adversarial case where
  * every doc is its own rep and the index must hold 5M signature sets.
  *
  * Batch (10k docs — the sf0.1 table holds 5,000 docs, and the batch
  * takes each one twice): half near-duplicates of corpus docs (one
  * appended token — J ≈ n/(n+2) over 3-shingles, above the 0.7
  * threshold for the table's longer docs), half novel (batch-token
  * renaming) — so the classification exercises real candidate
  * verification and real survival, at both corpus sizes. Each tier
  * gets a FRESH batch of identical shape but distinct ids/tokens, so
  * the session-level plan memo cannot serve the larger tier's timed
  * call with frames derived during the smaller tier — both timed
  * dedupBatch walls pay identical batch-side work.
  *
  * Writes are small (the sf0.1 documents table is <1 MB parquet; the
  * renamed 5M-doc corpus lands ~1 GB; the r12 durability point adds the
  * saved index, a few GB of signature-sized frames at 5M docs) — per
  * bench discipline this runs mid-session without denting the write
  * budget. The working index frames are localCheckpoints (executor
  * memory); the largest tier additionally measures
  * [[Dedup.NearDupIndex.save]]/`load` and reload-verdict parity.
  *
  * Env: SPARK_GRAFT_NEARDUP_REPLICAS (default 1000 — the sf0.1 table is
  * 5,000 docs, so 1000 replicas = 5M docs, with the paired lower point
  * at replicas/10 = 500k; smoke with 4), SPARK_GRAFT_WORK_DIR.
  */
object NearDupScale {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.get("SPARK_GRAFT_WORK_DIR").getOrElse(
      java.nio.file.Files.createTempDirectory("graft_neardup").toString)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", s"$base/spark-local")
    graft.GraftSession.defaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    spark.range(1000).select(sum(col("id"))).collect()

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try {
        f
        results(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[neardupscale] $name FAILED: ${e.getMessage}")
          results(name) = -1.0
      }
    }

    val replicas = sys.env.getOrElse("SPARK_GRAFT_NEARDUP_REPLICAS", "1000").toInt
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")

    // replica 0 keeps the original text; replica k > 0 renames every
    // token with a `_k` suffix — zero shared shingles across replicas
    def corpusAt(m: Int, path: String): Unit =
      docs.select(explode(sequence(lit(0L), lit(m - 1L))).as("__k"),
          col("doc_id"), col("text"), col("lang"))
        .select((col("doc_id") + col("__k") * 100000000L).as("doc_id"),
          when(col("__k") === 0, col("text")).otherwise(
            concat_ws(" ", transform(split(col("text"), " "),
              w => concat(w, lit("_"), col("__k"))))).as("text"),
          col("lang"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(path)

    // batch of fixed SHAPE (same size/doc lengths at every tier):
    // near-dups of replica-0 docs (one appended token) + novel docs
    // (batch-renamed tokens); ids/tokens vary per call site
    def mkBatch(idBase: Long, tailTok: String, novelTok: String): DataFrame = {
      val b = docs.orderBy(col("doc_id")).limit(10000)
      val nd = b.select((col("doc_id") + idBase).as("doc_id"),
        concat(col("text"), lit(s" $tailTok")).as("text"))
      val novel = b.select((col("doc_id") + idBase + 10000000000L).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(w, lit(s"_$novelTok")))).as("text"))
      nd.union(novel).cache()
    }
    Seq(math.max(1, replicas / 10), replicas).map(m => (s"${m}x", m))
      .zipWithIndex.foreach { case ((tag, m), ti) =>
        // fresh batch + warm batch PER TIER (tier-specific ids and
        // tokens → distinct plans): the warm batch pays first-call
        // codegen (~+12 s otherwise carried by the first tier), and a
        // fresh timed batch means the memo cannot serve this tier with
        // batch-side frames derived during the previous tier
        val batch = mkBatch(900000000000L + ti * 40000000000L,
          s"zzbatchtail$ti", s"zb$ti")
        val warmBatch = mkBatch(920000000000L + ti * 40000000000L,
          s"zzwarmtail$ti", s"zw$ti")
        results(s"batch_rows_${tag}_value") = batch.count().toDouble
        val path = s"$base/docs_$tag"
        timed(s"corpus_write_$tag") { corpusAt(m, path) }
        val corpus = spark.read.parquet(path)
        results(s"corpus_rows_${tag}_value") = corpus.count().toDouble
        var idx: Dedup.NearDupIndex = null
        timed(s"index_build_$tag") {
          idx = Dedup.NearDupIndex.build(corpus, "text", "doc_id",
            estimatedJaccard = true)
        }
        if (idx != null) {
          results(s"sig_rows_${tag}_value") = idx.signatures.get.count().toDouble
          results(s"band_rows_${tag}_value") = idx.bands.count().toDouble
          results(s"fp_rows_${tag}_value") = idx.fingerprints.count().toDouble
          var surv: DataFrame = null
          timed(s"dedup_batch_warm_$tag") {
            idx.dedupBatch(warmBatch, "text", threshold = 0.7).count()
          }
          timed(s"dedup_batch_$tag") {
            surv = idx.dedupBatch(batch, "text", threshold = 0.7)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            results(s"survivors_${tag}_value") = surv.count().toDouble
          }
          // r14: a second fresh-batch rep — single-shot walls at the 5M
          // tier swing ±2× with GC/device phase (r14 session: 11.3 s
          // timed vs 4.7 s warm on identical plans); min-of-2 across
          // dedup_batch/_b2 is the comparable number
          val batch2 = mkBatch(910000000000L + ti * 40000000000L,
            s"zzb2tail$ti", s"zx$ti")
          timed(s"dedup_batch_b2_$tag") {
            idx.dedupBatch(batch2, "text", threshold = 0.7).count()
          }
          batch2.unpersist(blocking = false)
          // the streaming-crawl loop's other half: fold the survivors in
          timed(s"append_survivors_$tag") {
            idx = idx.appended(surv, "text")
            results(s"sig_rows_after_append_${tag}_value") =
              idx.signatures.get.count().toDouble
          }
          surv.unpersist(blocking = false)
          // r14 corpus-term attribution (r13 verdict task 2 prerequisite):
          // dedupBatch's residual corpus cost is its three corpus-side
          // streams — band keys, fingerprints, signatures — each probed
          // once by a broadcast build side. Time each stream STANDALONE at
          // realistic build sizes (a 20k-doc batch ≈ 320k band keys, 20k
          // fps, ~30k candidate ids), plus a raw one-column scan baseline
          // per frame, so the per-batch growth decomposes by frame.
          val pbBands = idx.bands.select(col("bkey"))
            .limit(320000).distinct().localCheckpoint(true)
          timed(s"probe_scan_bands_$tag") {
            idx.bands.join(broadcast(pbBands), Seq("bkey"),
              "left_semi").count()
          }
          val pbFps = idx.fingerprints.limit(20000).localCheckpoint(true)
          timed(s"probe_scan_fps_$tag") {
            idx.fingerprints.join(broadcast(pbFps), Seq("__fp"),
              "left_semi").count()
          }
          val pbIds = idx.signatures.get.select(col(idx.idCol))
            .limit(30000).localCheckpoint(true)
          timed(s"probe_scan_sigs_$tag") {
            idx.signatures.get.join(broadcast(pbIds), Seq(idx.idCol),
              "left_semi").count()
          }
          timed(s"scan_bands_raw_$tag") {
            idx.bands.agg(count(col("bkey"))).collect()
          }
          timed(s"scan_sigs_raw_$tag") {
            idx.signatures.get.agg(count(col("__sigs"))).collect()
          }
          // durability point (r12, largest tier only — bounds the write
          // cost): save the grown index, reload it, and classify a fresh
          // same-shape batch through BOTH handles — the reloaded verdicts
          // must match the in-memory ones exactly, at a measured
          // save/load wall and on-disk size
          if (m == replicas) {
            val ipath = s"$base/ndidx_$tag"
            timed(s"index_save_$tag") { idx = idx.save(ipath) }
            results(s"index_save_gb_${tag}_value") =
              graft.FsUtil.sizeBytes(java.nio.file.Paths.get(ipath)) / 1e9
            var re: Dedup.NearDupIndex = null
            timed(s"index_load_$tag") {
              re = Dedup.NearDupIndex.load(spark, ipath)
            }
            if (re != null) {
              val pb = mkBatch(940000000000L + ti * 40000000000L,
                s"zzreloadtail$ti", s"zr$ti")
              timed(s"dedup_batch_reloaded_$tag") {
                results(s"survivors_reloaded_${tag}_value") =
                  re.dedupBatch(pb, "text", threshold = 0.7).count().toDouble
              }
              // parity: the in-memory handle on the same fresh batch
              results(s"survivors_mem_${tag}_value") =
                idx.dedupBatch(pb, "text", threshold = 0.7).count().toDouble
              pb.unpersist(blocking = false)
            }
            // incremental checkpoint (r13): one more batch through the
            // loop, then save again — the save must be a DELTA (∝ batch
            // survivors, not corpus: the full save above rewrites the
            // whole multi-GB index; this one writes the appended slices
            // only), and a reload of the chained layout must classify a
            // fresh batch identically to the in-memory handle
            val db = mkBatch(960000000000L + ti * 40000000000L,
              s"zzdeltatail$ti", s"zd$ti")
            var dsurv: DataFrame = null
            timed(s"dedup_batch_delta_$tag") {
              dsurv = idx.dedupBatch(db, "text", threshold = 0.7)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              results(s"survivors_delta_${tag}_value") = dsurv.count().toDouble
            }
            timed(s"append_delta_$tag") { idx = idx.appended(dsurv, "text") }
            dsurv.unpersist(blocking = false)
            timed(s"index_save_delta_$tag") { idx = idx.save(ipath) }
            val fs = new org.apache.hadoop.fs.Path(ipath).getFileSystem(
              spark.sparkContext.hadoopConfiguration)
            val chain = graft.operators.ManifestLayout.committedChain(fs, ipath)
            results(s"delta_chain_len_${tag}_value") = chain.length.toDouble
            // chain dirs are plain local paths here (versionDir output)
            results(s"index_save_delta_gb_${tag}_value") =
              graft.FsUtil.sizeBytes(java.nio.file.Paths.get(chain.last)) / 1e9
            var re2: Dedup.NearDupIndex = null
            timed(s"index_load_chain_$tag") {
              re2 = Dedup.NearDupIndex.load(spark, ipath)
            }
            if (re2 != null) {
              val pb2 = mkBatch(980000000000L + ti * 40000000000L,
                s"zzchaintail$ti", s"zc$ti")
              results(s"survivors_chain_reloaded_${tag}_value") =
                re2.dedupBatch(pb2, "text", threshold = 0.7).count().toDouble
              results(s"survivors_chain_mem_${tag}_value") =
                idx.dedupBatch(pb2, "text", threshold = 0.7).count().toDouble
              pb2.unpersist(blocking = false)
            }
            db.unpersist(blocking = false)
            // r14 fold measurement (r13 verdict task 3): drive the delta
            // chain to the fold cadence with small appends — the
            // every-maxDeltaChain-th save rewrites the base and is the
            // amortized checkpoint ceiling at crawl cadence. Per-delta
            // walls land as fold_delta_save_N; the fold itself as
            // fold_save (+ size), with chain-reload verdict parity after.
            var foldWall = -1.0
            var nsaves = 0
            while (foldWall < 0 && nsaves < Dedup.maxDeltaChain + 2) {
              // keep the PERSISTED frame's own handle: unpersisting the
              // limit plan is a no-op and leaked one cached batch per
              // fold-loop iteration (r14 ADVICE)
              val tbSrc = mkBatch(990000000000L + nsaves * 1000000L,
                s"zzfoldtail$nsaves", s"zf$nsaves")
              val tb = tbSrc.limit(200)
              idx = idx.appended(tb, "text")
              val t0 = System.nanoTime()
              idx = idx.save(ipath)
              val w = (System.nanoTime() - t0) / 1e9
              nsaves += 1
              val ch = graft.operators.ManifestLayout.committedChain(fs, ipath)
              if (ch.length == 1) {
                foldWall = w
                results(s"fold_save_${tag}_value") = w
                results(s"fold_gb_${tag}_value") = graft.FsUtil.sizeBytes(
                  java.nio.file.Paths.get(ch.last)) / 1e9
              } else results(s"fold_delta_save_${nsaves}_${tag}_value") = w
              tbSrc.unpersist(blocking = false)
            }
            results(s"fold_reached_${tag}_value") = if (foldWall >= 0) 1.0 else 0.0
            if (foldWall >= 0) {
              var re3: Dedup.NearDupIndex = null
              timed(s"index_load_after_fold_$tag") {
                re3 = Dedup.NearDupIndex.load(spark, ipath)
              }
              if (re3 != null) {
                val pb3 = mkBatch(995000000000L, "zzafterfoldtail", "za")
                results(s"survivors_fold_reloaded_${tag}_value") =
                  re3.dedupBatch(pb3, "text", threshold = 0.7).count().toDouble
                results(s"survivors_fold_mem_${tag}_value") =
                  idx.dedupBatch(pb3, "text", threshold = 0.7).count().toDouble
                pb3.unpersist(blocking = false)
              }
            }
          }
        }
        batch.unpersist(blocking = false)
        warmBatch.unpersist(blocking = false)
    }

    val qs = results.map { case (k2, v) => "\"" + k2 + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"neardup_scale","replicas":$replicas,"queries":$qs}""")
    if (sys.env.get("SPARK_GRAFT_WORK_DIR").isEmpty)
      graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
