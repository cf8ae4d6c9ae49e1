package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for LLM-training-data pipelines: tokenization
  * stats, quality scoring, heuristic language ID, fingerprinting and word
  * n-gram (shingle) extraction.
  *
  * All operators are pure column expressions / narrow transformations — no
  * shuffles, codegen-friendly, and therefore scale linearly with input bytes
  * at 100 TB (the scan dominates; nothing here widens the plan).
  */
object TextAnalysis {

  /** Whitespace-tokenized words of the trimmed text. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish subword-unit count: maximal letter runs, digit runs, and
    * single other-symbols — the pre-tokenization granularity a byte-pair
    * tokenizer starts from, and a far better length proxy for LLM token
    * budgeting than whitespace words (code, CJK, URLs).
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[\\p{L}]+|[\\p{N}]+|[^\\s\\p{L}\\p{N}]")).cast("long")

  /** English-ish stopword occurrences (used by quality scoring). */
  def stopwordCount(text: Column): Column =
    regexp_count(text, lit("\\b(the|a|and|of|to|in|is)\\b")).cast("long")

  /** Characters excluding whitespace. */
  def alphaChars(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("long")

  /** Stopword-to-token ratio — a cheap fluency proxy. */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / greatest(tokenCount(text), lit(1L))

  /** Mean word length — flags boilerplate/code-ish text. */
  def meanWordLength(text: Column): Column =
    alphaChars(text).cast("double") / greatest(tokenCount(text), lit(1L))

  /** Normalized-text fingerprint: lowercase, collapse whitespace, md5. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Marker-word language ID over a small fixed dictionary. Deterministic
    * priority: zh (CJK presence), then en/de/es/fr by marker count, 'und'
    * when nothing matches.
    */
  def langId(text: Column): Column = {
    val en = regexp_count(text, lit("\\b(the|and|of)\\b"))
    val de = regexp_count(text, lit("\\b(der|die|und)\\b"))
    val es = regexp_count(text, lit("\\b(el|los|que)\\b"))
    val fr = regexp_count(text, lit("\\b(le|les|et)\\b"))
    val zh = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))
    when(zh > 0, "zh")
      .when(en >= de && en >= es && en >= fr && en > 0, "en")
      .when(de >= es && de >= fr && de > 0, "de")
      .when(es >= fr && es > 0, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Explode `textCol` of `df` into word k-shingles.
    *
    * Output: the `idCols` plus a `s` column, one row per shingle occurrence
    * (multiset — callers needing set semantics apply `.distinct()`).
    * Documents shorter than k words produce no rows.
    */
  def shingles(df: DataFrame, textCol: String, k: Int, idCols: String*): DataFrame = {
    val expand =
      (0 until k).map(j => s"w[i + $j]").mkString("concat_ws(' ', ", ", ", ")")
    df.select(idCols.map(col) :+ words(col(textCol)).as("w"): _*)
      .filter(size(col("w")) >= k)
      .select(idCols.map(col) :+
        explode(expr(s"transform(sequence(0, size(w) - $k), i -> $expand)")).as("s"): _*)
  }

  /** Per-document repetition: the share of the single most frequent token
    * (Gopher-style "most common word fraction" quality rule).
    */
  def topTokenShare(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), explode(words(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg((max(col("__c")).cast("double") / sum(col("__c"))).as("top_share"))

  /** Per-document token-distribution Shannon entropy (nats): −Σ p ln p over
    * the doc's token frequencies — low entropy flags repetitive/boilerplate
    * text, high entropy flags noise. One explode + two hash aggs, keyed by
    * doc id (uniform) — scales linearly.
    */
  def tokenEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame =
    // H = ln N − (Σ c·ln c)/N: same entropy as the −Σ p ln p form but
    // computable in the SAME per-doc aggregation as the token counts — no
    // per-doc window (which would add an exchange + sort) anywhere
    df.select(col(idCol), explode(words(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg((log(sum(col("__c")).cast("double")) -
        sum(col("__c").cast("double") * log(col("__c").cast("double"))) /
          sum(col("__c")).cast("double")).as("entropy"))

  /** Share of word k-gram OCCURRENCES that are repeats of an earlier k-gram
    * in the same doc (Gopher's "duplicate n-gram fraction" repetition
    * rule): 1 − distinct/total. Docs shorter than k words emit NO row
    * (they have no k-grams to judge); left-join and coalesce to 0 if every
    * doc needs a score.
    */
  def dupNgramFraction(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    // Fully NARROW: the k-gram array, its distinct count and the fraction
    // are all computed inside the row (array HOFs), so the operator adds
    // ZERO exchanges — the previous explode + two hash aggregations
    // shuffled every (doc, shingle) pair twice to compute a per-doc
    // scalar. Per-row memory is O(doc tokens × k) — the same envelope as
    // holding the text itself (array_distinct hashes, not O(n²)).
    val expand =
      (0 until k).map(j => s"__w[i + $j]").mkString("concat_ws(' ', ", ", ", ")")
    df.select(col(idCol), words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= k)
      .select(col(idCol),
        expr(s"transform(sequence(0, size(__w) - $k), i -> $expand)").as("__s"))
      .select(col(idCol),
        (lit(1.0) -
          size(array_distinct(col("__s"))).cast("double") / size(col("__s")))
          .as("dup_frac"))
  }

  /** Redact personally-identifiable substrings, replacing each match with a
    * typed placeholder: emails → `<EMAIL>`, IPv4 literals → `<IP>`,
    * international-ish phone numbers → `<PHONE>`. Email first so its
    * user/host digits can't be mistaken for phone fragments; IP before
    * phone so dotted quads aren't half-eaten by the phone pattern.
    *
    * Patterns are RE2-compatible (no lookaround) so the exact same regexes
    * run in Spark (java.util.regex) and the DuckDB oracle. Pure narrow
    * column expression — scan-dominated at 100 TB.
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, emailRe, "<EMAIL>")
    val i = regexp_replace(e, ipv4Re, "<IP>")
    regexp_replace(i, phoneRe, "<PHONE>")
  }

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phoneRe = "\\+\\d[\\d\\- ]{7,}\\d"

  /** Per-doc counts of each PII kind, matching what [[redactPii]] actually
    * replaces: each count runs on the text AFTER the earlier passes, so a
    * dotted quad inside an email (consumed by `<EMAIL>`) is not also
    * counted as an IP, and email/IP digits are never counted as phones.
    */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    val afterEmail = regexp_replace(text, emailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Re, "<IP>")
    Seq(
      "n_emails" -> regexp_count(text, lit(emailRe)).cast("long"),
      "n_ips" -> regexp_count(afterEmail, lit(ipv4Re)).cast("long"),
      "n_phones" -> regexp_count(afterIp, lit(phoneRe)).cast("long"))
  }

  /** Benchmark decontamination: for each doc in `df`, the share of its
    * DISTINCT word k-grams that also occur anywhere in `evalSet` — the
    * standard "n-gram overlap vs held-out eval set" test-set-leakage check.
    *
    * Output: idCol, `n_grams` (distinct k-grams in the doc), `n_overlap`
    * (of those, how many appear in the eval set), `share` = overlap/n_grams
    * rounded to 6. Docs shorter than k words emit nothing.
    *
    * Scale shape: the eval set is small by definition (a benchmark), so its
    * distinct-gram side broadcasts; the corpus side is one explode + one
    * per-doc distinct + one aggregation — no corpus-vs-corpus join.
    */
  def contaminationShare(df: DataFrame, evalSet: DataFrame, textCol: String,
      idCol: String, k: Int = 5): DataFrame = {
    val docGrams = shingles(df, textCol, k, idCol).distinct()
    val evalGrams = shingles(evalSet, textCol, k, idCol)
      .select(col("s")).distinct().withColumn("__hit", lit(1))
    docGrams.join(broadcast(evalGrams), Seq("s"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_overlap"))
      .withColumn("share",
        round(col("n_overlap").cast("double") / col("n_grams"), 6) + 0.0)
  }

  /** Corpus vocabulary with Zipf diagnostics: one row per distinct token
    * with its total frequency, frequency rank (ties broken by term), and
    * cumulative share of all token occurrences up to that rank — the
    * "does the corpus look Zipfian / what covers 90% of tokens" profile.
    *
    * The rank window is over the VOCABULARY (tiny next to the corpus —
    * explode + hash-agg reduce first), so the single-partition window is
    * bounded by distinct-term count, not corpus size.
    */
  def vocabulary(df: DataFrame, textCol: String): DataFrame = {
    val freq = df.select(explode(words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("freq"), col("term"))
    val total = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    freq
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_share",
        round(sum(col("freq")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .cast("double") / sum(col("freq")).over(total), 6) + 0.0)
  }

  /** Split each document into fixed-size token windows with overlap — the
    * "chunk long documents to the model's context length" preprocessing
    * step. Chunks start every `chunkTokens - overlap` tokens; the last
    * chunk may be short but always extends past the previous chunk's
    * overlap (a start is generated only while `start + overlap < n`, so no
    * chunk is fully contained in its predecessor — a contained tail would
    * inject pure duplicate text into the corpus). Empty docs emit nothing.
    *
    * Output: idCol, `chunk_id` (0-based, in-doc), `n_tokens`, `chunk`
    * (the re-joined window text). One generator projection, no shuffle —
    * output bytes ≈ input × (1 + overlap/chunkTokens), scan-dominated.
    */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens)
    val step = chunkTokens - overlap
    df.select(col(idCol), words(col(textCol)).as("w"))
      .filter(size(col("w")) > 0 && col("w")(0) =!= "")
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, greatest(size(w) - 1 - $overlap, 0), $step), i -> slice(w, i + 1, $chunkTokens))")))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        size(col("col")).cast("long").as("n_tokens"),
        array_join(col("col"), " ").as("chunk"))
  }

  /** Greedy in-order sequence packing: lay documents end-to-end (ordered by
    * `idCol` within each `partCol` group) and assign each doc to the bin
    * its first token lands in at `budget` tokens per bin — the standard
    * approximation of "pack sequences into fixed-length training batches".
    *
    * Output: partCol, idCol, tokenCol, `bin`. The running total is a
    * window per `partCol`; at scale the partition column (shard / source /
    * language) bounds each window's data, keeping every sort distributed.
    */
  def packByBudget(df: DataFrame, tokenCol: String, idCol: String,
      partCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(partCol), col(idCol), col(tokenCol))
      .withColumn("__cum", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum div ${budget}L"))
      .drop("__cum")
  }

  /** TF-IDF top-`topK` terms per document: tf(d,t) · ln(N / df(t)), the
    * classic unsmoothed weighting (every term present in some doc has
    * df ≥ 1, so the log is defined).
    *
    * Shape at scale: explode → one hash agg per (doc, term) → one hash agg
    * per term (the vocabulary — tiny next to the corpus, AQE broadcasts it
    * back onto the tf table) → per-doc top-k window (partition cardinality
    * = number of documents, so parallelism is abundant). `N` is passed in
    * (count it once per corpus) rather than recomputed per call.
    *
    * Scores are rounded to 6 decimals BEFORE ranking and tie-broken by
    * term, so the selected rows are engine-reproducible even where two
    * terms tie exactly (common: integer tf × a shared vocabulary).
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
      totalDocs: Long, topK: Int = 3): DataFrame = {
    require(topK > 0 && totalDocs > 0)
    val toks = df.select(col(idCol),
        explode(words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(docFreq, "term")
      .withColumn("tfidf",
        round(col("tf") * log(lit(totalDocs.toDouble) / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(desc("tfidf"), col("term"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK)
      .select(col(idCol), col("term"), col("tfidf"))
  }

  /** Cross-document boilerplate score: for each doc, the share of its
    * DISTINCT word k-grams that also occur in at least `minDocs` OTHER
    * documents (C4/RefinedWeb-style template and navigation-chrome
    * detection — within-doc repetition is [[dupNgramFraction]]'s job).
    *
    * Scale shape: distinct (doc, shingle) pairs → one hash agg for the
    * shingle document-frequency table → equi-join back (shuffle-hash on the
    * shingle key; frequencies are uniform because the key is text, not an
    * id) → one per-doc agg. No window, no cross join; the text column is
    * gone after the shingle pass. Docs shorter than k words emit no row.
    */
  def crossDocBoilerplate(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, minDocs: Int = 5): DataFrame = {
    // Per-doc set semantics come from array_distinct INSIDE the row, so
    // the (doc, shingle) pairs explode already-deduplicated — the previous
    // post-explode .distinct() shuffled every pair through an extra
    // corpus-wide exchange just to drop within-doc repeats. The
    // document-frequency side stays a groupBy + equi-join (not a window
    // over the shingle key): partial aggregation collapses hot shingles
    // map-side and AQE splits skewed join partitions, whereas a window
    // partitioned by shingle would pin a million-doc boilerplate shingle
    // to one task with no mitigation.
    val expand =
      (0 until k).map(j => s"__w[i + $j]").mkString("concat_ws(' ', ", ", ", ")")
    val docShingles = df
      .select(col(idCol), words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= k)
      .select(col(idCol), explode(array_distinct(
        expr(s"transform(sequence(0, size(__w) - $k), i -> $expand)"))).as("s"))
    val dfs = docShingles.groupBy(col("s"))
      .agg(count(lit(1)).as("__df"))
    docShingles.join(dfs, "s")
      // "minDocs OTHER docs" — this doc is one of __df, hence > minDocs
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") > minDocs, 1L).otherwise(0L)).as("n_boiler"),
        (sum(when(col("__df") > minDocs, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("boiler_frac"))
  }

  /** Token-balanced sharding: order docs by (`tokenCol` desc, `idCol`) and
    * deal them round-robin into `nShards` shards — the classic LPT-style
    * approximation that keeps per-shard token totals within one max-doc of
    * each other, for writing training shards of near-equal cost.
    *
    * The global rank is computed scale-safely: `repartitionByRange` on the
    * sort key spreads the sort over all partitions, local `row_number` per
    * partition, then per-partition counts (a tiny broadcast) convert local
    * to global ranks — no single-task global window anywhere.
    */
  def balancedShards(df: DataFrame, tokenCol: String, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0)
    // localCheckpoint pins ONE range-partition assignment: the window branch
    // and the offset branch below both consume `parted`, and range bounds
    // are derived by sampling — two independent materializations could
    // disagree on partition ids, silently corrupting the global ranks
    // (same invariant as Percentiles.globalRanks' persist).
    val parted = df
      .repartitionByRange(col(tokenCol).desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val byChunk = org.apache.spark.sql.expressions.Window.partitionBy(col("__pid"))
      .orderBy(col(tokenCol).desc, col(idCol))
    val localRanked = parted.withColumn("__lrn",
      row_number().over(byChunk).cast("long") - 1L)
    val byAll = org.apache.spark.sql.expressions.Window.orderBy(col("__pid"))
    val offsets = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .select(col("__pid"),
        (sum(col("__c")).over(byAll) - col("__c")).as("__off"))
    localRanked.join(broadcast(offsets), "__pid")
      .withColumn("shard", ((col("__off") + col("__lrn")) % nShards).cast("int"))
      .drop("__pid", "__lrn", "__off")
  }

  /** Curation filter funnel: survivor counts after each stage of an ORDERED
    * rule chain, per group — the "how many docs does each gate cost me"
    * dashboard behind every quality-filter pipeline. `stages` are
    * (name, predicate) pairs applied cumulatively (a doc survives stage i
    * iff it passes stages 1..i); output per group is `total` plus one
    * `after_<name>` count per stage. Everything folds into ONE hash
    * aggregation over the input — the rules are evaluated row-side and
    * summed map-side, so the funnel costs one scan regardless of how many
    * stages it reports.
    */
  def filterFunnel(df: DataFrame, groupCol: String,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty)
    val cumulative = stages.scanLeft(lit(true)) {
      case (acc, (_, pred)) => acc && pred
    }.tail
    val aggs = count(lit(1)).as("total") +:
      stages.zip(cumulative).map { case ((name, _), pass) =>
        sum(pass.cast("long")).as(s"after_$name")
      }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Token-budget selection: per group, keep documents in (quality desc, id)
    * order while the running token total stays within `budget` — "assemble
    * the best `budget` tokens per source", the corpus-assembly step behind
    * quality-pruned training sets. A doc is kept iff the cumulative token
    * count INCLUDING it is ≤ budget (first doc larger than the whole budget
    * → group contributes nothing).
    *
    * The running total is a distributed prefix sum, not a per-group window
    * sort: range-partition on (group, quality desc, id) spreads each group
    * over many tasks in selection order, a window keyed on (partition,
    * group) computes local prefix sums, and a broadcast per-(partition,
    * group) offset table lifts them to global ones — the same
    * rank-arithmetic shape as [[balancedShards]] / `Percentiles`, so no
    * single task ever sorts a whole group. The checkpoint pins one range
    * assignment for both the window and the offset branch.
    */
  def tokenBudgetSelect(df: DataFrame, groupCol: String, qualityCol: String,
      tokenCol: String, idCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val parted = df
      .repartitionByRange(col(groupCol), col(qualityCol).desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // ROWS frame, not the default RANGE one: RANGE includes ORDER-BY peers,
    // so a duplicated (quality, id) row would double-count tokens for BOTH
    // copies; ids are expected unique, but the frame must not amplify a
    // violation
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col(groupCol))
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val withLocal = parted.withColumn("__lsum",
      sum(col(tokenCol)).over(local))
    val prior = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("__pid"), col(groupCol))
      .agg(sum(col(tokenCol)).as("__c"))
      .select(col("__pid"), col(groupCol),
        coalesce(sum(col("__c")).over(prior), lit(0L)).as("__off"))
    withLocal.join(broadcast(offsets), Seq("__pid", groupCol))
      .filter(col("__lsum") + col("__off") <= budget)
      .drop("__pid", "__lsum", "__off")
  }
}
