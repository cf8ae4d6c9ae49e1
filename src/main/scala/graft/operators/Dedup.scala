package graft.operators

import graft.functions.vec_cos
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for LLM-training-data pipelines, in increasing
  * fuzziness: exact (content hash), MinHash+LSH (near-dup candidates at
  * scale), n-gram Jaccard (exact verification), SimHash (bit-signature), and
  * embedding-cosine near-dup.
  *
  * Scale design (the part that must survive 100 TB):
  *   - exact dedup = hash + groupBy → one shuffle keyed on a 128-bit hash,
  *     uniformly distributed, no skew;
  *   - MinHash reduces each document to k longs *before* any join, so the
  *     wide text column never shuffles;
  *   - LSH banding turns near-dup search from O(n²) cross join into an
  *     equi-join on band keys (shuffle-hash join; bucket sizes are bounded
  *     because identical band keys imply high similarity);
  *   - Jaccard verification runs only on LSH candidates, not all pairs;
  *   - embedding near-dup uses sign-LSH bucketing the same way.
  */
object Dedup {

  /** Cross-engine 60-bit hash (first 15 hex chars of md5 → long). Chosen
    * over xxhash/murmur because the DuckDB oracle can reproduce it exactly.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact dedup: keep the lowest `idCol` per distinct `textCol`. */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keepers = df.groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__h")
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** MinHash signatures: `numHashes` permutations over word `k`-shingles.
    * Output: (idCol, seed, minhash), `numHashes` rows per document.
    *
    * Two cost levers vs. the textbook formulation:
    *   - the permutation family is double hashing `h1 + seed·h2` over the
    *     two 32-bit halves of ONE md5 per shingle — a proper universal
    *     family at 1/numHashes the hashing cost;
    *   - all `numHashes` mins are computed in ONE aggregation pass (one
    *     `min` column per seed), then unpivoted — no seed cross-join, so
    *     the shingle set is scanned and shuffled once. At 100 TB the
    *     shuffle is keyed on the doc id with map-side partial mins: each
    *     mapper emits at most one `numHashes`-wide row per doc.
    */
  def minhashSignatures(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, numHashes: Int = 8): DataFrame = {
    val sh = TextAnalysis.shingles(df, textCol, k, idCol)
      .select(col(idCol), md5(col("s")).as("__md5"))
      .select(col(idCol),
        conv(substring(col("__md5"), 1, 8), 16, 10).cast("long").as("__h1"),
        conv(substring(col("__md5"), 9, 8), 16, 10).cast("long").as("__h2"))
    val aggs = (0 until numHashes).map { seed =>
      min(col("__h1") + lit(seed.toLong) * col("__h2")).as(s"__m$seed")
    }
    val stackExpr = (0 until numHashes)
      .map(seed => s"${seed}L, __m$seed").mkString(", ")
    sh.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        expr(s"stack($numHashes, $stackExpr) AS (seed, minhash)"))
  }

  /** LSH banding over [[minhashSignatures]] output: hash each band of
    * `rowsPerBand` signature values to a key; docs sharing any (band, key)
    * are near-dup candidates.
    */
  def lshCandidatePairs(
      signatures: DataFrame, idCol: String, rowsPerBand: Int = 2): DataFrame = {
    val bands = signatures
      .withColumn("band", expr(s"seed div $rowsPerBand"))
      .groupBy(col(idCol), col("band"))
      .agg(md5(concat_ws(",",
        expr("transform(array_sort(collect_list(struct(seed, minhash))), x -> cast(x.minhash as string))")))
        .as("bkey"))
    val a = bands.select(col(idCol).as("id1"), col("band"), col("bkey"))
    val b = bands.select(col(idCol).as("id2"), col("band").as("band2"),
      col("bkey").as("bkey2"))
    a.join(b, col("band") === col("band2") && col("bkey") === col("bkey2") &&
        col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
  }

  /** Exact word-k-shingle Jaccard similarity for given candidate pairs
    * (columns id1, id2). Output: (id1, id2, jaccard).
    *
    * The intersection join is anchored on the candidate PAIRS, not on the
    * shingle value: pair rows pick up id1's shingles (join keyed on id1),
    * then match id2's shingles on the composite (id2, shingle) key. Every
    * join key includes a document id, so a corpus-hot shingle ("click here
    * to", boilerplate headers) never becomes a skewed shuffle key and never
    * fans out across non-candidate doc pairs — the work is
    * |pairs| × |shingles per doc|, linear in the candidate set.
    */
  def jaccardVerify(
      df: DataFrame, textCol: String, idCol: String,
      candidates: DataFrame, k: Int = 3): DataFrame = {
    val sh = TextAnalysis.shingles(df, textCol, k, idCol).distinct()
    val cnt = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val a = sh.select(col(idCol).as("id1"), col("s"))
    val b = sh.select(col(idCol).as("__bid"), col("s").as("s2"))
    val cand = candidates.select(col("id1"), col("id2")).distinct()
    val inter = cand.join(a, Seq("id1"))
      .join(b, col("id2") === col("__bid") && col("s") === col("s2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("c"))
    inter
      .join(cnt.select(col(idCol).as("id1"), col("n").as("n1")), "id1")
      .join(cnt.select(col(idCol).as("id2"), col("n").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        (col("c").cast("double") / (col("n1") + col("n2") - col("c"))).as("jaccard"))
  }

  /** Near-dup detection end-to-end: MinHash → LSH candidates → Jaccard ≥
    * `threshold`.
    */
  def nearDuplicatePairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val sigs = minhashSignatures(df, textCol, idCol, k, numHashes)
    val cands = lshCandidatePairs(sigs, idCol, rowsPerBand)
    jaccardVerify(df, textCol, idCol, cands, k).filter(col("jaccard") >= threshold)
  }

  /** Remove near-duplicates: for every pair above `threshold` keep the
    * lower-id document (the standard keep-first policy; pair-wise, not
    * transitive closure — A~B and B~C with A≁C keeps A and C, dropping only
    * B, which matches common dedup-pipeline practice and avoids an
    * iterative connected-components pass).
    *
    * Scale shape: the drop set (distinct id2 values) is usually small — two
    * longs per dropped doc — but on crawl-scale corpora near-dup rates of
    * 30–50% are normal and an unconditional broadcast of ~n/3 ids would OOM
    * the driver. The anti-join is therefore left unhinted: AQE broadcasts
    * the drop set when its runtime size is under the broadcast threshold and
    * falls back to a shuffle join keyed on the id when it isn't (one
    * id-keyed, skew-free shuffle of the corpus — the unavoidable cost of a
    * genuinely large drop set).
    */
  def dropNearDuplicates(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val losers = nearDuplicatePairs(df, textCol, idCol, k, numHashes,
        rowsPerBand, threshold)
      .select(col("id2").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** SimHash: `bits`-bit signature (≤ 32) as a '0'/'1' string, from md5 bits
    * of whitespace tokens, majority-weighted by occurrence.
    *
    * The token hash is materialized ONCE as a 32-bit word
    * (`conv(substring(md5, 1, 8))`); each bit-counter then reads its bit via
    * shift+mask of that word — one md5 + one conv per token instead of one
    * substring+conv per (token, bit).
    */
  def simhash(df: DataFrame, textCol: String, idCol: String, bits: Int = 32): DataFrame = {
    val grouped = simhashCounters(df, textCol, idCol, bits)
    val bitsStr = concat(
      (0 until bits).map(j => when(col(s"b$j") > 0, "1").otherwise("0")): _*)
    grouped.select(col(idCol), bitsStr.as("simhash"))
  }

  /** SimHash as a numeric word (bit j of the string signature = bit
    * `bits-1-j` of the long) — the form Hamming distance is computed on
    * (`bit_count(a ^ b)`), and what [[simhashNearDupPairs]] bands over.
    */
  def simhashWord(df: DataFrame, textCol: String, idCol: String,
      bits: Int = 32): DataFrame = {
    val grouped = simhashCounters(df, textCol, idCol, bits)
    val word = (0 until bits)
      .map(j => when(col(s"b$j") > 0, lit(1L << (bits - 1 - j))).otherwise(lit(0L)))
      .reduce(_ + _)
    grouped.select(col(idCol), word.as("simhash"))
  }

  /** Shared signature pass: one signed counter per bit position, majority
    * vote pending. The token hash is materialized ONCE as a 32-bit word
    * (`conv(substring(md5, 1, 8))`); each bit-counter then reads its bit via
    * shift+mask of that word — one md5 + one conv per token instead of one
    * substring+conv per (token, bit).
    */
  private def simhashCounters(df: DataFrame, textCol: String, idCol: String,
      bits: Int): DataFrame = {
    require(bits <= 32, "simhash uses the first 8 hex chars of md5")
    val toks = df
      .select(col(idCol), explode(TextAnalysis.words(col(textCol))).as("__tok"))
      .select(col(idCol),
        conv(substring(md5(col("__tok")), 1, 8), 16, 10).cast("long").as("__w"))
    val aggs = (0 until bits).map { j =>
      // bit j of the big-endian hex word: hex digit j/4, bit 3 - j%4 within
      // it = word bit 31 - j
      val bit = shiftright(col("__w"), 31 - j).bitwiseAND(lit(1L))
      sum(bit * 2 - lit(1)).as(s"b$j")
    }
    toks.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** All pairs within Hamming distance `maxHamming` of their SimHash words,
    * found by banding, not all-pairs: the word is cut into `bands` equal
    * slices and a pair is a candidate iff it collides on at least one slice.
    * By pigeonhole, `h` differing bits can spoil at most `h` bands, so with
    * `maxHamming <= bands - 1` every qualifying pair shares an intact band —
    * the banding is lossless (recall 1.0), exactly like MinHash-LSH banding
    * but over signature bits instead of hash rows.
    *
    * Scale shape: signatures are one long per doc (the text never shuffles
    * past the signature pass); candidates come from an equi-join on
    * `(band, slice-value)`; the Hamming verify is one `bit_count(xor)` per
    * candidate. Output: `id1 < id2`, `hamming`.
    */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 2, bands: Int = 4, bits: Int = 32): DataFrame = {
    require(bands > 0 && bits % bands == 0, "bands must divide bits")
    require(maxHamming < bands,
      s"banding is lossless only for maxHamming <= bands-1 (got $maxHamming/$bands)")
    val width = bits / bands
    val mask = (1L << width) - 1
    // the self-join below does NOT share exchanges across its aliased
    // branches (ReusedExchange never fires there — same finding as
    // semanticDedup), so checkpoint the signature pass or the full
    // tokenize+md5+bit-counter aggregation runs twice
    val sig = simhashWord(df, textCol, idCol, bits).localCheckpoint()
    val banded = sig.select(col(idCol), col("simhash"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * width).bitwiseAND(lit(mask)).as("bkey"))
        }: _*)).as("bk"))
      .select(col(idCol), col("simhash"), col("bk.band"), col("bk.bkey"))
    val left = banded.select(col("band"), col("bkey"),
      col(idCol).as("id1"), col("simhash").as("__s1"))
    val right = banded.select(col("band").as("__band2"), col("bkey").as("__bkey2"),
      col(idCol).as("id2"), col("simhash").as("__s2"))
    left.join(right,
        col("band") === col("__band2") && col("bkey") === col("__bkey2") &&
          col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("__s1").bitwiseXOR(col("__s2"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-dup pairs via sign-LSH bucketing: bucket on the
    * sign pattern of `planes` leading dimensions (a degenerate but shuffle-
    * cheap random-hyperplane LSH — planes are axis-aligned so the oracle can
    * reproduce them), verify cosine within buckets.
    *
    * For scoped exact search (small n) pass `bucketed = false` to compare
    * all pairs.
    */
  def embeddingNearDupPairs(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, planes: Int = 8,
      bucketed: Boolean = true): DataFrame = {
    val keyed =
      if (bucketed) {
        val signBits = (0 until planes).map(i =>
          when(col(vecCol).getItem(i) >= 0, lit("1")).otherwise(lit("0")))
        df.select(col(idCol), col(vecCol), concat(signBits: _*).as("__bucket"))
      } else df.select(col(idCol), col(vecCol), lit("all").as("__bucket"))
    val a = keyed.select(col("__bucket"), col(idCol).as("id1"), col(vecCol).as("__v1"))
    val b = keyed.select(col("__bucket").as("__bucket2"), col(idCol).as("id2"),
      col(vecCol).as("__v2"))
    a.join(b, col("__bucket") === col("__bucket2") && col("id1") < col("id2"))
      .select(col("id1"), col("id2"), vec_cos(col("__v1"), col("__v2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic dedup over an embedding column: assign every
    * row to its nearest centroid (KMeans centroids from an IVF build, or
    * any coarse quantizer), compare pairs WITHIN a cluster by cosine, and
    * drop all but the lowest-id member of each near-identical pair
    * (cosine ≥ threshold).
    *
    * Scale shape: the only join is an equi-join on cluster id, so the
    * pairwise work is Σ (cluster size)² — bounded by the quantizer's
    * granularity, never corpus² — and the fused [[graft.functions
    * .nearest_centroid]] assignment is one narrow codegen pass. This is
    * the embedding-space complement of [[dropNearDuplicates]] (MinHash on
    * text) and [[embeddingNearDupPairs]] (sign-LSH buckets): centroids
    * adapt to the data's actual density, so buckets stay balanced on real
    * (non-uniform) embedding distributions where fixed sign-planes skew.
    */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Float]], threshold: Double = 0.95): DataFrame = {
    // materialize the assignment once: the self-join's two branches do NOT
    // share exchanges (verified — ReusedExchange never fires across the
    // aliased sides), so without this the O(k·dims) kernel and the source
    // scan would run once per side (same localCheckpoint pattern as
    // [[connectedComponents]]; blocks are reclaimed by the context cleaner)
    val keyed = df.select(col(idCol), col(vecCol))
      .withColumn("__c",
        graft.functions.nearest_centroid(col(vecCol), centroids))
      .localCheckpoint(true)
    val a = keyed.select(col("__c"), col(idCol).as("id1"), col(vecCol).as("__v1"))
    val b = keyed.select(col("__c").as("__c2"), col(idCol).as("id2"),
      col(vecCol).as("__v2"))
    val losers = a.join(b, col("__c") === col("__c2") && col("id1") < col("id2"))
      .filter(vec_cos(col("__v1"), col("__v2")) >= threshold)
      .select(col("id2").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Incremental dedup: drop `batch` docs that exactly- or near-duplicate
    * any `corpus` doc — the "dedup the incoming crawl against existing
    * data" primitive. Ids must be globally unique across the two frames.
    * Batch-internal duplicates are dropped too (keep-lowest-id, matching
    * [[dropNearDuplicates]]); the corpus is never modified.
    *
    * Exact duplicates are caught by a dedicated md5 pass, not just the
    * MinHash path: docs shorter than `k` words have no shingles and would
    * sail through the banded join even when byte-identical (titles and
    * one-liners are common in crawl batches).
    *
    * Scale shape: identical to [[nearDuplicatePairs]] over the union —
    * signatures are per-doc (no cross-frame work until the banded
    * equi-join), so the corpus side can be a pre-computed signature store
    * in a real pipeline; classification of pair orientation is two
    * semi-joins against the corpus id set, and the exact pass is one
    * hash-groupBy + semi-join on uniform md5 keys.
    */
  def dropDuplicatesAgainst(
      batch: DataFrame, corpus: DataFrame, textCol: String, idCol: String,
      k: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val all = batch.select(col(idCol), col(textCol))
      .union(corpus.select(col(idCol), col(textCol)))
    val pairs = nearDuplicatePairs(all, textCol, idCol, k, numHashes,
      rowsPerBand, threshold)
    val corpus1 = corpus.select(col(idCol).as("id1"))
    val corpus2 = corpus.select(col(idCol).as("id2"))
    val losesToCorpus =
      pairs.join(corpus1, Seq("id1"), "left_semi").select(col("id2").as(idCol))
        .union(
          pairs.join(corpus2, Seq("id2"), "left_semi").select(col("id1").as(idCol)))
    val batchInternal = pairs
      .join(corpus1, Seq("id1"), "left_anti")
      .join(corpus2, Seq("id2"), "left_anti")
      .select(col("id2").as(idCol))
    val batchFp = batch.select(col(idCol), md5(col(textCol)).as("__fp"))
    val exactToCorpus = batchFp
      .join(corpus.select(md5(col(textCol)).as("__fp")).distinct(),
        Seq("__fp"), "left_semi")
      .select(col(idCol))
    val exactInternal = batchFp
      .join(batchFp.groupBy(col("__fp")).agg(min(col(idCol)).as("__keep")),
        "__fp")
      .filter(col(idCol) > col("__keep"))
      .select(col(idCol))
    val losers = losesToCorpus.union(batchInternal)
      .union(exactToCorpus).union(exactInternal).distinct()
    batch.join(losers, Seq(idCol), "left_anti")
  }

  /** Connected components over an undirected edge list — turns pair-wise
    * near-dup hits into transitive duplicate CLUSTERS (A~B, B~C ⇒ {A,B,C}),
    * the "keep one representative per cluster" dedup policy
    * [[dropNearDuplicates]] deliberately skips.
    *
    * Iterative min-label propagation: every node starts labelled with its
    * own id; each round every node takes the min of its own and its
    * neighbours' labels; fixpoint = each node labelled with the smallest id
    * reachable from it (= the cluster id). Rounds needed = graph diameter —
    * for near-dup clusters typically 2–4. Each round is one shuffle join +
    * one hash aggregation, and `localCheckpoint` truncates the growing plan
    * lineage so round N doesn't re-execute rounds 1..N−1. At 100 TB-scale
    * graphs with long chains, switch to the large-star/small-star
    * alternation (Kiveris et al., "Connected Components in MapReduce"),
    * which squares the label-spread per round; plain propagation is the
    * right trade for the shallow clusters dedup produces.
    *
    * Returns one row per node that appears in `edges`: (`node`, `cluster`).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .union(edges.select(col(dstCol).as("__a"), col(srcCol).as("__b")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("__a").as("node"))
      .distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val viaNeighbour = sym.join(labels, col("__b") === col("node"))
        .select(col("__a").as("node"), col("lbl"))
      val next = labels.union(viaNeighbour)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("lbl", "__old"), "node")
        .filter(col("lbl") =!= col("__old")).count()
      labels = next
      it += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels.withColumnRenamed("lbl", "cluster")
  }

  /** Leakage-safe train/val/test split: assign every document to a split by
    * the hash of its near-dup-cluster representative, so two near-duplicate
    * documents can never land in different splits (the classic eval-set
    * contamination bug when splitting by per-document hash). `pairs` is a
    * near-dup edge list (e.g. [[nearDuplicatePairs]] output); singleton
    * documents are their own representative. The cluster pass touches only
    * ids (the text column never shuffles), and the final assignment is the
    * same narrow deterministic-hash filter as
    * [[graft.sources.Ingest.hashSplit]] — rows gain a `rep` (representative
    * id) and `split` column.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String, fractions: Seq[(String, Double)],
      seed: Long = 42L): DataFrame = {
    // __-prefix the cluster table's columns before joining: the input frame
    // may legitimately carry its own `node`/`cluster` columns
    val cc = connectedComponents(pairs, srcCol, dstCol)
      .select(col("node").as("__ccn"), col("cluster").as("__ccc"))
    val withRep = df.join(cc, df(idCol) === col("__ccn"), "left")
      .withColumn("rep", coalesce(col("__ccc"), df(idCol)))
      .drop("__ccn", "__ccc")
    graft.sources.Ingest.hashSplit(withRep, "rep", fractions, seed)
  }

  /** Transitive near-dedup with a keep-K policy: group documents into
    * near-dup clusters (MinHash→LSH→Jaccard pairs → connected components)
    * and keep the `maxCopies` lowest-id members of each cluster. maxCopies=1
    * is canonical one-representative dedup over the TRANSITIVE closure
    * (A~B~C drops both B and C even when A≁C directly — compare
    * [[dropNearDuplicates]], which applies the pair-wise policy); higher
    * values are the soft-dedup knob (cap, don't eliminate, duplicates).
    *
    * The rank window partitions by cluster id — cluster sizes are bounded by
    * the dup structure itself (and the component pass touches only ids), so
    * no partition outgrows a task even when the corpus does.
    */
  def capNearDuplicates(df: DataFrame, textCol: String, idCol: String,
      maxCopies: Int = 1, k: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    require(maxCopies > 0)
    val pairs = nearDuplicatePairs(df, textCol, idCol, k, numHashes,
      rowsPerBand, threshold)
    val cc = connectedComponents(pairs, "id1", "id2")
      .select(col("node").as("__ccn"), col("cluster").as("__ccc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__cluster")).orderBy(col(idCol))
    df.join(cc, df(idCol) === col("__ccn"), "left")
      .withColumn("__cluster", coalesce(col("__ccc"), df(idCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxCopies)
      .drop("__ccn", "__ccc", "__cluster", "__rn")
  }
}
