package graft.queries

import graft.Tables
import graft.operators.{Dedup, TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** Text-analysis and deduplication operator queries over the `documents`
  * table — the LLM-training-data-pipeline surface. Implementations live in
  * [[graft.operators.Dedup]] / [[graft.operators.TextAnalysis]]; these query
  * forms pin the semantics against the DuckDB oracle. Cross-engine hashing
  * uses md5 prefixes parsed as integers (identical in Spark and DuckDB), so
  * even MinHash/SimHash signatures are exactly verifiable.
  */
object TextQueries {

  /** DuckDB-side equivalent of [[TA.shingles]] (1-based array indexing). */
  private def sqlShingles(k: Int, where: String = ""): String = {
    val expand = (0 until k).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    raw"""SELECT doc_id, $expand AS s FROM (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents $where) t_w,
    UNNEST(generate_series(1, len(w) - ${k - 1})) AS t_i(i)"""
  }

  /** DuckDB k-token gram expansion for a window starting at 1-based `i`
    * over `w` (the regexp_split token array) — the SQL twin of the Spark
    * side's `concat_ws(" ", slice(w, i+1, k))` in [[Dedup.windowGrams]].
    */
  private def sqlGram(k: Int): String =
    (0 until k).map(j => s"w[i + $j]").mkString(" || ' ' || ")

  val all: Seq[QueryDef] = Seq(

    // ---- exact deduplication: corpus stats ----
    QueryDef(
      "q30_dedup_stats",
      (s, d) => {
        Tables.documents(s, d).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupes"))
      },
      Some("""SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique,
        count(*) - count(DISTINCT md5(text)) AS n_dupes FROM documents""")),

    // ---- exact deduplication: keep-first groups ----
    QueryDef(
      "q31_dedup_groups",
      (s, d) => {
        Tables.documents(s, d)
          .groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .orderBy(col("h"))
      },
      Some("""SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n
        FROM documents GROUP BY h HAVING count(*) > 1 ORDER BY h""")),

    // ---- token counting ----
    QueryDef(
      "q32_token_stats",
      (s, d) => {
        Tables.documents(s, d).select(
            col("doc_id"),
            TA.tokenCount(col("text")).as("n_tokens"),
            TA.subwordCount(col("text")).as("n_subwords"),
            length(col("text")).cast("long").as("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        CAST(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]')) AS BIGINT) AS n_subwords,
        CAST(length(text) AS BIGINT) AS n_chars
        FROM documents ORDER BY doc_id""")),

    // ---- quality scoring: stopword ratio + mean word length ----
    QueryDef(
      "q33_quality_scores",
      (s, d) => {
        Tables.documents(s, d).select(
            col("doc_id"),
            TA.tokenCount(col("text")).as("n_tokens"),
            TA.stopwordCount(col("text")).as("stop_n"),
            round(TA.stopwordRatio(col("text")), 4).as("stop_ratio"),
            round(TA.meanWordLength(col("text")), 4).as("avg_word_len"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""SELECT doc_id, n_tokens, stop_n,
        round(CAST(stop_n AS DOUBLE) / greatest(n_tokens, 1), 4) AS stop_ratio,
        round(CAST(alpha_chars AS DOUBLE) / greatest(n_tokens, 1), 4) AS avg_word_len
        FROM (SELECT doc_id,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
          CAST(len(regexp_extract_all(text, '\b(the|a|and|of|to|in|is)\b')) AS BIGINT) AS stop_n,
          CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS alpha_chars
          FROM documents) t ORDER BY doc_id""")),

    // ---- heuristic language ID via marker-word counts ----
    QueryDef(
      "q34_lang_id",
      (s, d) => {
        Tables.documents(s, d).select(TA.langId(col("text")).as("lang_pred"))
          .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
          .orderBy(col("lang_pred"))
      },
      Some(raw"""SELECT lang_pred, count(*) AS n FROM (
        SELECT CASE
          WHEN zh > 0 THEN 'zh'
          WHEN en >= de AND en >= es AND en >= fr AND en > 0 THEN 'en'
          WHEN de >= es AND de >= fr AND de > 0 THEN 'de'
          WHEN es >= fr AND es > 0 THEN 'es'
          WHEN fr > 0 THEN 'fr'
          ELSE 'und' END AS lang_pred
        FROM (SELECT
          len(regexp_extract_all(text, '\b(the|and|of)\b')) AS en,
          len(regexp_extract_all(text, '\b(der|die|und)\b')) AS de,
          len(regexp_extract_all(text, '\b(el|los|que)\b')) AS es,
          len(regexp_extract_all(text, '\b(le|les|et)\b')) AS fr,
          len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS zh
          FROM documents) t0) t1
        GROUP BY lang_pred ORDER BY lang_pred""")),

    // ---- document fingerprinting (normalize + hash) ----
    QueryDef(
      "q35_fingerprints",
      (s, d) => {
        Tables.documents(s, d).select(
            col("doc_id"), TA.fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""SELECT doc_id,
        md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        FROM documents ORDER BY doc_id""")),

    // ---- n-gram profile: top-20 word bigrams ----
    QueryDef(
      "q36_top_bigrams",
      (s, d) => {
        TA.shingles(Tables.documents(s, d), "text", 2, "doc_id")
          .groupBy(col("s").as("bg")).agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("bg"))
          .limit(20)
      },
      Some(raw"""SELECT s AS bg, count(*) AS n FROM (${sqlShingles(2)}) sh
        GROUP BY bg ORDER BY n DESC, bg LIMIT 20""")),

    // ---- MinHash signatures: 8 permutations over word 3-shingles ----
    QueryDef(
      "q37_minhash_sigs",
      (s, d) => {
        Dedup.minhashSignatures(Tables.documents(s, d), "text", "doc_id")
          .orderBy(col("doc_id"), col("seed"))
      },
      Some(raw"""WITH sh AS (${sqlShingles(3)}),
        hs AS (SELECT doc_id, seed,
          ('0x' || substr(md5(s), 1, 8))::BIGINT +
            seed * ('0x' || substr(md5(s), 9, 8))::BIGINT AS h
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) sd)
        SELECT doc_id, seed, min(h) AS minhash FROM hs
        GROUP BY doc_id, seed ORDER BY doc_id, seed""")),

    // ---- LSH banding: candidate near-dup pairs (4 bands × 2 rows) ----
    QueryDef(
      "q38_lsh_candidates",
      (s, d) => {
        val sigs = Dedup.minhashSignatures(Tables.documents(s, d), "text", "doc_id")
        Dedup.lshCandidatePairs(sigs, "doc_id")
          .orderBy(col("id1"), col("id2"))
      },
      Some(raw"""WITH sh AS (${sqlShingles(3)}),
        hs AS (SELECT doc_id, seed,
          ('0x' || substr(md5(s), 1, 8))::BIGINT +
            seed * ('0x' || substr(md5(s), 9, 8))::BIGINT AS h
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) sd),
        sig AS (SELECT doc_id, seed, min(h) AS minhash FROM hs GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band,
          ('0x' || substr(md5(CAST(min(seed) // 2 AS VARCHAR) || ',' || string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)), 1, 15))::BIGINT AS bkey
          FROM sig GROUP BY doc_id, band)
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        ORDER BY id1, id2""")),

    // ---- exact n-gram Jaccard verification on a bounded scope ----
    QueryDef(
      "q39_jaccard_pairs",
      (s, d) => {
        val sh = TA.shingles(
          Tables.documents(s, d).filter(col("doc_id") < 150), "text", 3, "doc_id")
          .distinct()
        val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val a = sh.select(col("doc_id").as("i"), col("s"))
        val b = sh.select(col("doc_id").as("j"), col("s").as("s2"))
        val inter = a.join(b, col("s") === col("s2") && col("i") < col("j"))
          .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
        val jac = col("c").cast("double") / (col("ni") + col("nj") - col("c"))
        inter
          .join(cnt.select(col("doc_id").as("i"), col("n").as("ni")), "i")
          .join(cnt.select(col("doc_id").as("j"), col("n").as("nj")), "j")
          .filter(jac >= 0.2)
          .select(col("i"), col("j"), round(jac, 4).as("jaccard"))
          .orderBy(col("i"), col("j"))
      },
      Some(raw"""WITH sh AS (SELECT DISTINCT doc_id, s FROM (
          ${sqlShingles(3, "WHERE doc_id < 150")}) t_sh),
        cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY i, j)
        SELECT i, j, round(CAST(c AS DOUBLE) / (ci.n + cj.n - c), 4) AS jaccard
        FROM inter JOIN cnt ci ON i = ci.doc_id JOIN cnt cj ON j = cj.doc_id
        WHERE CAST(c AS DOUBLE) / (ci.n + cj.n - c) >= 0.2 ORDER BY i, j""")),

    // ---- SimHash: 32-bit signature from token md5 bits ----
    QueryDef(
      "q40_simhash",
      (s, d) => {
        Dedup.simhash(Tables.documents(s, d), "text", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some {
        val bitExprs = (0 until 32).map { j =>
          s"sum(((('0x' || substr(md5(tok), ${1 + j / 4}, 1))::INT >> ${3 - j % 4}) & 1) * 2 - 1) AS b$j"
        }.mkString(", ")
        val caseExprs = (0 until 32)
          .map(j => s"CASE WHEN b$j > 0 THEN '1' ELSE '0' END").mkString(", ")
        raw"""SELECT doc_id, concat($caseExprs) AS simhash FROM (
          SELECT doc_id, $bitExprs FROM (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
            FROM documents) t GROUP BY doc_id) g ORDER BY doc_id"""
      }),

    // ---- deterministic systematic sampling ----
    QueryDef(
      "q41_sample_by_mod",
      (s, d) => {
        Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(17)) === 3)
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n FROM documents
        WHERE doc_id % 17 = 3 GROUP BY lang ORDER BY lang""")),

    // ---- end-to-end near-dedup: surviving corpus after dropping the
    //      higher-id member of every verified near-dup pair ----
    QueryDef(
      "q56_near_dedup",
      (s, d) => {
        Dedup.dropNearDuplicates(Tables.documents(s, d), "text", "doc_id",
            threshold = 0.5)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH sh AS (${sqlShingles(3)}),
        hs AS (SELECT doc_id, seed,
          ('0x' || substr(md5(s), 1, 8))::BIGINT +
            seed * ('0x' || substr(md5(s), 9, 8))::BIGINT AS h
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) sd),
        sig AS (SELECT doc_id, seed, min(h) AS minhash FROM hs GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band,
          ('0x' || substr(md5(CAST(min(seed) // 2 AS VARCHAR) || ',' || string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)), 1, 15))::BIGINT AS bkey
          FROM sig GROUP BY doc_id, band),
        cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        shd AS (SELECT DISTINCT doc_id, s FROM sh),
        cnt AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
        inter AS (SELECT c.id1, c.id2, count(*) AS c
          FROM cand c JOIN shd a ON a.doc_id = c.id1
          JOIN shd b ON b.doc_id = c.id2 AND a.s = b.s
          GROUP BY c.id1, c.id2),
        losers AS (SELECT DISTINCT i.id2
          FROM inter i JOIN cnt n1 ON n1.doc_id = i.id1
          JOIN cnt n2 ON n2.doc_id = i.id2
          WHERE CAST(i.c AS DOUBLE) / (n1.n + n2.n - i.c) >= 0.5)
        SELECT doc_id, lang FROM documents
        WHERE doc_id NOT IN (SELECT id2 FROM losers)
        ORDER BY doc_id""")),

    // ---- multimodal plumbing: opaque binary payloads with typed metadata
    //      (payload = utf-8 bytes of text here; a real pipeline carries
    //      image/audio bytes through the same schema — see
    //      operators.Multimodal for the decode/feature-extract side) ----
    QueryDef(
      "q47_media_meta",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            element_at(array(lit("image"), lit("audio"), lit("video")),
              (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
            col("text").cast("binary").as("payload"))
          .groupBy(col("modality"))
          .agg(count(lit(1)).as("n"),
            sum(length(col("payload"))).as("total_bytes"),
            max(length(col("payload"))).as("max_bytes"))
          .orderBy(col("modality"))
      },
      Some("""SELECT modality, count(*) AS n,
        CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        max(octet_length(encode(text))) AS max_bytes
        FROM (SELECT doc_id, ['image','audio','video'][(doc_id % 3) + 1] AS modality, text
          FROM documents) t
        GROUP BY modality ORDER BY modality""")),

    // ---- TF-IDF: top-3 characteristic terms per document (scores rounded
    //      BEFORE ranking, term tiebreak → engine-reproducible top-k) ----
    QueryDef(
      "q60_tfidf_top_terms",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TA.tfidfTopTerms(docs, "text", "doc_id", totalDocs = docs.count())
          .orderBy(col("doc_id"), col("term"))
      },
      Some(raw"""WITH toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
          WHERE term <> '' GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        scored AS (SELECT doc_id, term,
          round(tf * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / df), 6)
            AS tfidf
          FROM tf JOIN dfreq USING (term)),
        ranked AS (SELECT doc_id, term, tfidf,
          row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
          FROM scored)
        SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 3
        ORDER BY doc_id, term""")),

    // ---- transitive duplicate clusters: near-dup pairs → connected
    //      components (min-label propagation, Dedup.connectedComponents;
    //      oracle computes min reachable id via a recursive CTE) ----
    QueryDef(
      "q62_dup_clusters",
      (s, d) => {
        val pairs = Dedup.nearDuplicatePairs(Tables.documents(s, d),
          "text", "doc_id", threshold = 0.5)
        Dedup.connectedComponents(pairs, "id1", "id2")
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("size"), max(col("node")).as("max_doc"))
          .orderBy(col("cluster"))
      },
      Some(raw"""WITH RECURSIVE sh AS (${sqlShingles(3)}),
        hs AS (SELECT doc_id, seed,
          ('0x' || substr(md5(s), 1, 8))::BIGINT +
            seed * ('0x' || substr(md5(s), 9, 8))::BIGINT AS h
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) sd),
        sig AS (SELECT doc_id, seed, min(h) AS minhash FROM hs GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band,
          ('0x' || substr(md5(CAST(min(seed) // 2 AS VARCHAR) || ',' || string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)), 1, 15))::BIGINT AS bkey
          FROM sig GROUP BY doc_id, band),
        cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        shd AS (SELECT DISTINCT doc_id, s FROM sh),
        cnt AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
        inter AS (SELECT c.id1, c.id2, count(*) AS c
          FROM cand c JOIN shd a ON a.doc_id = c.id1
          JOIN shd b ON b.doc_id = c.id2 AND a.s = b.s
          GROUP BY c.id1, c.id2),
        pairs AS (SELECT i.id1, i.id2
          FROM inter i JOIN cnt n1 ON n1.doc_id = i.id1
          JOIN cnt n2 ON n2.doc_id = i.id2
          WHERE CAST(i.c AS DOUBLE) / (n1.n + n2.n - i.c) >= 0.5),
        edges AS (SELECT id1 AS a, id2 AS b FROM pairs
          UNION ALL SELECT id2, id1 FROM pairs),
        reach(node, lbl) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node),
        cc AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node)
        SELECT cluster, count(*) AS size, max(node) AS max_doc FROM cc
        GROUP BY cluster ORDER BY cluster""")),

    // ---- Gopher-style quality gate: three rules (length, repetition,
    //      mean word length), population counted per flag combination;
    //      all comparisons are on exact int-ratio doubles, so the flags
    //      are engine-reproducible ----
    QueryDef(
      "q63_quality_filter",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.join(TA.topTokenShare(docs, "text", "doc_id"), "doc_id")
          .select(
            (TA.tokenCount(col("text")) >= 30).as("len_ok"),
            (col("top_share") <= 0.10).as("rep_ok"),
            (TA.meanWordLength(col("text")) <= 4.5).as("mwl_ok"))
          .groupBy(col("len_ok"), col("rep_ok"), col("mwl_ok"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("len_ok"), col("rep_ok"), col("mwl_ok"))
      },
      Some(raw"""WITH toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents),
        tf AS (SELECT doc_id, t, count(*) AS c FROM toks
          WHERE t <> '' GROUP BY doc_id, t),
        rep AS (SELECT doc_id,
          CAST(max(c) AS DOUBLE) / sum(c) AS top_share FROM tf GROUP BY doc_id),
        m AS (SELECT d.doc_id,
          len(regexp_split_to_array(trim(d.text), '\s+')) AS n_words,
          len(regexp_replace(d.text, '\s', '', 'g')) AS n_chars,
          r.top_share
          FROM documents d JOIN rep r ON d.doc_id = r.doc_id)
        SELECT n_words >= 30 AS len_ok, top_share <= 0.10 AS rep_ok,
          CAST(n_chars AS DOUBLE) / n_words <= 4.5 AS mwl_ok,
          count(*) AS n
        FROM m GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // ---- BM25 keyword search (operators.KeywordSearch): lexical
    //      complement to the vector path; postings restricted to query
    //      terms right after the explode ----
    QueryDef(
      "q69_bm25_search",
      (s, d) => {
        graft.operators.KeywordSearch.bm25TopK(Tables.documents(s, d),
          "text", "doc_id", Seq("spark", "join", "vector"), 20)
      },
      Some(raw"""WITH lens AS (SELECT doc_id,
          len(regexp_split_to_array(trim(text), '\s+')) AS dl
          FROM documents),
        stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
        toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM toks
          WHERE t IN ('spark', 'join', 'vector') GROUP BY doc_id, t),
        dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        scored AS (SELECT f.doc_id,
            ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
              (f.tf * (1.2 + 1)) /
              (f.tf + 1.2 * ((1.0 - 0.75) + 0.75 * l.dl / s.avgdl)) AS part
          FROM tf f JOIN dfreq d ON f.t = d.t
          JOIN lens l ON f.doc_id = l.doc_id CROSS JOIN stats s)
        SELECT doc_id, round(sum(part), 4) + 0 AS score FROM scored
        GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""")),

    // ---- bigram language-model quality score: per-doc mean log
    //      P(w2 | w1) under an add-one-smoothed bigram model trained on
    //      the corpus itself (self-perplexity, the classic LM-based
    //      quality filter shape) ----
    QueryDef(
      "q70_lm_score",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bg = TA.shingles(docs, "text", 2, "doc_id")
        val bgCounts = bg.groupBy(col("s")).agg(count(lit(1)).as("c2"))
        val uni = docs.select(explode(TA.words(col("text"))).as("w"))
          .filter(col("w") =!= "")
        val uniCounts = uni.groupBy(col("w")).agg(count(lit(1)).as("c1"))
        val vocab = uniCounts.agg(count(lit(1)).as("v"))
        // model tables are vocab-bounded here but data-dependent in
        // general — left unhinted so AQE picks broadcast vs shuffle
        val perDoc = bg
          .withColumn("w1", split(col("s"), " ").getItem(0))
          .join(bgCounts, "s")
          .join(uniCounts, col("w1") === col("w"))
          .crossJoin(broadcast(vocab))
          .withColumn("lp",
            log((col("c2") + lit(1.0)) / (col("c1") + col("v"))))
          .groupBy(col("doc_id"))
          .agg((round(sum(col("lp")) / count(lit(1)), 6) + 0.0)
            .as("mean_logp"))
        perDoc.filter(col("doc_id") < 200).orderBy(col("doc_id"))
      },
      Some(raw"""WITH sh AS (${sqlShingles(2)}),
        bg AS (SELECT s, count(*) AS c2 FROM sh GROUP BY s),
        uni AS (SELECT t AS w, count(*) AS c1 FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents) u WHERE t <> '' GROUP BY t),
        v AS (SELECT count(*) AS v FROM uni),
        perdoc AS (SELECT d.doc_id,
            ln((b.c2 + 1.0) / (u.c1 + v.v)) AS lp
          FROM sh d JOIN bg b ON d.s = b.s
          JOIN uni u ON string_split(d.s, ' ')[1] = u.w CROSS JOIN v)
        SELECT doc_id, round(sum(lp) / count(*), 6) + 0 AS mean_logp
        FROM perdoc WHERE doc_id < 200
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- incremental dedup: odd-id docs are the incoming batch, even-id
    //      docs the existing corpus; batch docs near-dup to the corpus
    //      (or to a lower-id batch doc) are dropped, corpus untouched
    //      (Dedup.dropDuplicatesAgainst) ----
    QueryDef(
      "q71_dedup_against",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.dropDuplicatesAgainst(
            docs.filter(pmod(col("doc_id"), lit(2)) === 1),
            docs.filter(pmod(col("doc_id"), lit(2)) === 0),
            "text", "doc_id", threshold = 0.5)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH sh AS (${sqlShingles(3)}),
        hs AS (SELECT doc_id, seed,
          ('0x' || substr(md5(s), 1, 8))::BIGINT +
            seed * ('0x' || substr(md5(s), 9, 8))::BIGINT AS h
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) sd),
        sig AS (SELECT doc_id, seed, min(h) AS minhash FROM hs GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band,
          ('0x' || substr(md5(CAST(min(seed) // 2 AS VARCHAR) || ',' || string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)), 1, 15))::BIGINT AS bkey
          FROM sig GROUP BY doc_id, band),
        cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        shd AS (SELECT DISTINCT doc_id, s FROM sh),
        cnt AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
        inter AS (SELECT c.id1, c.id2, count(*) AS c
          FROM cand c JOIN shd a ON a.doc_id = c.id1
          JOIN shd b ON b.doc_id = c.id2 AND a.s = b.s
          GROUP BY c.id1, c.id2),
        pairs AS (SELECT i.id1, i.id2
          FROM inter i JOIN cnt n1 ON n1.doc_id = i.id1
          JOIN cnt n2 ON n2.doc_id = i.id2
          WHERE CAST(i.c AS DOUBLE) / (n1.n + n2.n - i.c) >= 0.5),
        fp AS (SELECT doc_id, md5(text) AS f FROM documents),
        losers AS (
          SELECT id2 AS id FROM pairs WHERE id1 % 2 = 0 AND id2 % 2 = 1
          UNION SELECT id1 FROM pairs WHERE id2 % 2 = 0 AND id1 % 2 = 1
          UNION SELECT id2 FROM pairs WHERE id1 % 2 = 1 AND id2 % 2 = 1
          UNION SELECT b.doc_id FROM fp b WHERE b.doc_id % 2 = 1
            AND b.f IN (SELECT f FROM fp WHERE doc_id % 2 = 0)
          UNION SELECT b.doc_id FROM fp b JOIN fp a
            ON a.f = b.f AND a.doc_id < b.doc_id AND a.doc_id % 2 = 1
            WHERE b.doc_id % 2 = 1)
        SELECT doc_id, lang FROM documents
        WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT id FROM losers)
        ORDER BY doc_id""")),

    // ---- hybrid retrieval: BM25 top-50 ∪ dot-product top-50 fused by
    //      reciprocal rank (KeywordSearch.reciprocalRankFusion) ----
    QueryDef(
      "q72_hybrid_rrf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        val qv = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).toArray
        // rank windows run over k-bounded lists (≤50 rows) — single task
        // by construction, not a scale concern
        val bm = graft.operators.KeywordSearch.bm25TopK(docs, "text",
            "doc_id", Seq("spark", "join", "vector"), 50)
          .withColumn("r", row_number().over(
            Window.orderBy(desc("score"), col("doc_id"))))
        val vv = emb
          .select(col("vec_id").as("doc_id"),
            graft.functions.vec_dot(col("embedding"), typedLit(qv)).as("vs"))
          .orderBy(desc("vs"), col("doc_id")).limit(50)
          .withColumn("r", row_number().over(
            Window.orderBy(desc("vs"), col("doc_id"))))
        graft.operators.KeywordSearch.reciprocalRankFusion(
            Seq(bm, vv), "doc_id", "r")
          .orderBy(desc("rrf"), col("doc_id")).limit(20)
      },
      Some(raw"""WITH lens AS (SELECT doc_id,
          len(regexp_split_to_array(trim(text), '\s+')) AS dl
          FROM documents),
        stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
        toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM toks
          WHERE t IN ('spark', 'join', 'vector') GROUP BY doc_id, t),
        dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        bmscore AS (SELECT f.doc_id, round(sum(
            ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
              (f.tf * (1.2 + 1)) /
              (f.tf + 1.2 * ((1.0 - 0.75) + 0.75 * l.dl / s.avgdl))), 4) + 0
            AS score
          FROM tf f JOIN dfreq d ON f.t = d.t
          JOIN lens l ON f.doc_id = l.doc_id CROSS JOIN stats s
          GROUP BY f.doc_id),
        bm AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
            AS r
          FROM (SELECT * FROM bmscore ORDER BY score DESC, doc_id LIMIT 50) x),
        qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        vscore AS (SELECT e.vec_id AS doc_id,
            list_sum(list_transform(list_zip(e.embedding, q.qv),
              x -> CAST(x[1] AS DOUBLE) * x[2])) AS vs
          FROM embeddings e CROSS JOIN qv q),
        vv AS (SELECT doc_id, row_number() OVER (ORDER BY vs DESC, doc_id)
            AS r
          FROM (SELECT * FROM vscore ORDER BY vs DESC, doc_id LIMIT 50) x)
        SELECT COALESCE(bm.doc_id, vv.doc_id) AS doc_id,
          round(COALESCE(1.0 / (60.0 + bm.r), 0.0) +
            COALESCE(1.0 / (60.0 + vv.r), 0.0), 6) + 0 AS rrf
        FROM bm FULL OUTER JOIN vv ON bm.doc_id = vv.doc_id
        ORDER BY rrf DESC, doc_id LIMIT 20""")),

    // ---- benchmark decontamination: docs 0–19 are the "eval set"; for
    //      every other doc, share of its distinct 5-grams that leak from
    //      the eval set (TA.contaminationShare) ----
    QueryDef(
      "q73_decontam",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TA.contaminationShare(
            docs.filter(col("doc_id") >= 20),
            docs.filter(col("doc_id") < 20),
            "text", "doc_id", k = 5)
          .filter(col("n_overlap") > 0)
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH sh AS (${sqlShingles(5)}),
        dg AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id >= 20),
        eg AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20),
        j AS (SELECT d.doc_id, count(*) AS n_grams, count(e.s) AS n_overlap
          FROM dg d LEFT JOIN eg e ON d.s = e.s GROUP BY d.doc_id)
        SELECT doc_id, n_grams, n_overlap,
          round(CAST(n_overlap AS DOUBLE) / n_grams, 6) + 0 AS share
        FROM j WHERE n_overlap > 0 ORDER BY doc_id""")),

    // ---- PII redaction: emails / IPv4 / phone → typed placeholders.
    //      The synthetic docs carry no PII, so both engines append a
    //      deterministic contact blurb (email always, IP on even ids,
    //      phone always) and verify redacted text + per-kind counts ----
    QueryDef(
      "q74_redact",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val id = col("doc_id")
        val synth = concat(col("text"),
          lit(" user"), id.cast("string"),
          lit("@ex"), pmod(id, lit(5)).cast("string"), lit(".org"),
          when(pmod(id, lit(2)) === 0,
            concat(lit(" 10.0."), pmod(id, lit(250)).cast("string"), lit(".7")))
            .otherwise(lit("")),
          lit(" +1-555-010"), pmod(id, lit(10)).cast("string"))
        val counts = TA.piiCounts(synth).map { case (n, c) => c.as(n) }
        docs.select(
            id +: md5(TA.redactPii(synth)).as("red_md5") +: counts: _*)
          .orderBy(id)
      },
      Some(raw"""WITH synth AS (SELECT doc_id,
          text || ' user' || CAST(doc_id AS VARCHAR) ||
            '@ex' || CAST(doc_id % 5 AS VARCHAR) || '.org' ||
            CASE WHEN doc_id % 2 = 0
              THEN ' 10.0.' || CAST(doc_id % 250 AS VARCHAR) || '.7'
              ELSE '' END ||
            ' +1-555-010' || CAST(doc_id % 10 AS VARCHAR) AS t
          FROM documents),
        red AS (SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
            '\+\d[\d\- ]{7,}\d', '<PHONE>', 'g') AS r,
          CAST(len(regexp_extract_all(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
            AS n_emails,
          CAST(len(regexp_extract_all(
            regexp_replace(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
          CAST(len(regexp_extract_all(
            regexp_replace(regexp_replace(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
            '\+\d[\d\- ]{7,}\d')) AS BIGINT) AS n_phones
          FROM synth)
        SELECT doc_id, md5(r) AS red_md5, n_emails, n_ips, n_phones
        FROM red ORDER BY doc_id""")),

    // ---- corpus vocabulary + Zipf profile: top-40 terms by frequency
    //      with rank and cumulative token-occurrence share ----
    QueryDef(
      "q75_vocab",
      (s, d) => {
        TA.vocabulary(Tables.documents(s, d), "text")
          .select(col("term"), col("freq"),
            col("rank").cast("long").as("rank"), col("cum_share"))
          .filter(col("rank") <= 40)
          .orderBy(col("rank"))
      },
      Some(raw"""WITH toks AS (SELECT
          unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          FROM documents),
        freq AS (SELECT term, count(*) AS freq FROM toks
          WHERE term <> '' GROUP BY term),
        ranked AS (SELECT term, freq,
          row_number() OVER (ORDER BY freq DESC, term) AS rank,
          round(CAST(sum(freq) OVER (ORDER BY freq DESC, term
              ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
            (SELECT sum(freq) FROM freq), 6) + 0 AS cum_share
          FROM freq)
        SELECT term, freq, rank, cum_share FROM ranked
        WHERE rank <= 40 ORDER BY rank""")),

    // ---- context-length chunking: 50-token windows, 10-token overlap
    //      (TA.chunkDocs); verified chunk-by-chunk via md5 ----
    QueryDef(
      "q76_chunks",
      (s, d) => {
        TA.chunkDocs(Tables.documents(s, d), "text", "doc_id",
            chunkTokens = 50, overlap = 10)
          .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
            md5(col("chunk")).as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some(raw"""WITH d AS (SELECT doc_id,
          regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        st AS (SELECT doc_id, w,
          unnest(generate_series(1, greatest(len(w) - 10, 1), 40)) AS s
          FROM d WHERE len(w) > 0 AND w[1] <> ''),
        ch AS (SELECT doc_id, (s - 1) // 40 AS chunk_id, w[s : s + 49] AS c
          FROM st)
        SELECT doc_id, chunk_id, CAST(len(c) AS BIGINT) AS n_tokens,
          md5(array_to_string(c, ' ')) AS chunk_md5
        FROM ch ORDER BY doc_id, chunk_id""")),

    // ---- sequence packing: docs laid end-to-end per language (ordered by
    //      id), each assigned to the 1000-token bin its first token lands
    //      in (TA.packByBudget); aggregated per bin ----
    QueryDef(
      "q77_packing",
      (s, d) => {
        val toks = Tables.documents(s, d).select(col("lang"), col("doc_id"),
          TA.tokenCount(col("text")).as("n_tokens"))
        TA.packByBudget(toks, "n_tokens", "doc_id", "lang", budget = 1000L)
          .groupBy(col("lang"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
          .orderBy(col("lang"), col("bin"))
      },
      Some(raw"""WITH t AS (SELECT lang, doc_id,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
            AS n_tokens
          FROM documents),
        p AS (SELECT lang, doc_id, n_tokens,
          CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 1000
            AS BIGINT) AS bin
          FROM t)
        SELECT lang, bin, count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        FROM p GROUP BY lang, bin ORDER BY lang, bin""")),

    // ---- training-mixture sampling: per-source keep rates over a
    //      cross-engine 52-bit md5 uniform key (Ingest.mixtureSample) ----
    QueryDef(
      "q78_mixture",
      (s, d) => {
        graft.sources.Ingest.mixtureSample(Tables.documents(s, d),
            "doc_id", "source",
            Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25), default = 0.1)
          .groupBy(col("source")).agg(count(lit(1)).as("n"))
          .orderBy(col("source"))
      },
      Some(raw"""WITH u AS (SELECT source,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT
            / 4503599627370496.0 AS u
          FROM documents)
        SELECT source, count(*) AS n FROM u
        WHERE u < CASE source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.5
          WHEN 'src2' THEN 0.25 ELSE 0.1 END
        GROUP BY source ORDER BY source""")),

    // ---- deterministic train/val/test split: hash-range assignment,
    //      stable under appends/repartitioning (Ingest.hashSplit) ----
    QueryDef(
      "q79_split",
      (s, d) => {
        graft.sources.Ingest.hashSplit(Tables.documents(s, d), "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .groupBy(col("lang"), col("split")).agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("split"))
      },
      Some(raw"""WITH u AS (SELECT lang,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT
            / 4503599627370496.0 AS u
          FROM documents)
        SELECT lang, CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.8 + 0.1 THEN 'val' ELSE 'test' END AS split,
          count(*) AS n
        FROM u GROUP BY lang, split ORDER BY lang, split""")),

    // ---- deterministic shuffle order: the first 20 docs of the seeded
    //      epoch permutation (Ingest.uniformKey ordering — the same key
    //      deterministicShuffle range-partitions by) ----
    QueryDef(
      "q83_shuffle_head",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.select(col("doc_id"), col("lang"),
            (round(graft.sources.Ingest.uniformKey(col("doc_id"), 42L), 6) + 0.0)
              .as("skey"))
          .orderBy(col("skey"), col("doc_id")).limit(20)
      },
      Some(raw"""SELECT doc_id, lang,
          round(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT
            / 4503599627370496.0, 6) + 0 AS skey
        FROM documents ORDER BY skey, doc_id LIMIT 20""")),

    // ---- token-distribution entropy per doc (low = repetitive text) ----
    QueryDef(
      "q80_token_entropy",
      (s, d) => {
        TA.tokenEntropy(Tables.documents(s, d), "text", "doc_id")
          .select(col("doc_id"), (round(col("entropy"), 6) + 0.0).as("entropy"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents),
        c AS (SELECT doc_id, t, count(*) AS c FROM toks
          WHERE t <> '' GROUP BY doc_id, t)
        SELECT doc_id, round(ln(CAST(sum(c) AS DOUBLE)) -
            sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) /
            CAST(sum(c) AS DOUBLE), 6) + 0 AS entropy
        FROM c GROUP BY doc_id ORDER BY doc_id""")),

    // ---- per-source data-quality report: the curation dashboard — doc
    //      counts, token volume, mean entropy / dup-3-gram / stopword
    //      signals per source (order-free decimal sums per q18 pattern) ----
    QueryDef(
      "q84_source_quality",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val base = docs.select(col("doc_id"), col("source"),
          TA.tokenCount(col("text")).as("nt"),
          round(TA.stopwordRatio(col("text")), 6).cast("decimal(18,6)").as("sr"))
        val ent = TA.tokenEntropy(docs, "text", "doc_id")
          .select(col("doc_id"),
            round(col("entropy"), 6).cast("decimal(18,6)").as("ent"))
        val dup = TA.dupNgramFraction(docs, "text", "doc_id", 3)
          .select(col("doc_id"),
            round(col("dup_frac"), 6).cast("decimal(18,6)").as("dupf"))
        base.join(ent, Seq("doc_id"), "left").join(dup, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("nt")).as("total_tokens"),
            (round(sum(col("ent")).cast("double") / count(lit(1)), 6) + 0.0)
              .as("avg_entropy"),
            (round(sum(coalesce(col("dupf"), lit(0))).cast("double") /
              count(lit(1)), 6) + 0.0).as("avg_dup3"),
            (round(sum(col("sr")).cast("double") / count(lit(1)), 6) + 0.0)
              .as("avg_stop_ratio"))
          .orderBy(col("source"))
      },
      Some(raw"""WITH toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents),
        tc AS (SELECT doc_id, t, count(*) AS c FROM toks
          WHERE t <> '' GROUP BY doc_id, t),
        ent AS (SELECT doc_id,
          CAST(round(ln(CAST(sum(c) AS DOUBLE)) -
            sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) /
            CAST(sum(c) AS DOUBLE), 6) AS DECIMAL(18,6)) AS ent
          FROM tc GROUP BY doc_id),
        sh AS (${sqlShingles(3)}),
        dup AS (SELECT doc_id, CAST(round(1.0 -
            CAST(count(DISTINCT s) AS DOUBLE) / count(*), 6) AS DECIMAL(18,6))
            AS dupf
          FROM sh GROUP BY doc_id),
        base AS (SELECT doc_id, source,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt,
          CAST(round(CAST(len(regexp_extract_all(text,
              '\b(the|a|and|of|to|in|is)\b')) AS DOUBLE) /
            greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 6)
            AS DECIMAL(18,6)) AS sr
          FROM documents)
        SELECT b.source, count(*) AS n_docs,
          CAST(sum(b.nt) AS BIGINT) AS total_tokens,
          round(CAST(sum(e.ent) AS DOUBLE) / count(*), 6) + 0 AS avg_entropy,
          round(CAST(sum(COALESCE(d.dupf, 0)) AS DOUBLE) / count(*), 6) + 0
            AS avg_dup3,
          round(CAST(sum(b.sr) AS DOUBLE) / count(*), 6) + 0 AS avg_stop_ratio
        FROM base b LEFT JOIN ent e ON b.doc_id = e.doc_id
        LEFT JOIN dup d ON b.doc_id = d.doc_id
        GROUP BY b.source ORDER BY b.source""")),

    // ---- Gopher duplicate-3-gram fraction per doc ----
    QueryDef(
      "q81_dup_ngrams",
      (s, d) => {
        TA.dupNgramFraction(Tables.documents(s, d), "text", "doc_id", 3)
          .select(col("doc_id"), (round(col("dup_frac"), 6) + 0.0).as("dup_frac"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH sh AS (${sqlShingles(3)})
        SELECT doc_id, round(1.0 -
            CAST(count(DISTINCT s) AS DOUBLE) / count(*), 6) + 0 AS dup_frac
        FROM sh GROUP BY doc_id ORDER BY doc_id""")),

    // ---- cross-document boilerplate: share of each doc's distinct
    //      3-grams that recur in > 5 other docs (template/chrome detection;
    //      within-doc repetition is q81's job) ----
    QueryDef(
      "q86_boilerplate",
      (s, d) => {
        TA.crossDocBoilerplate(Tables.documents(s, d), "text", "doc_id",
            k = 3, minDocs = 5)
          .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
            (round(col("boiler_frac"), 6) + 0.0).as("bfrac"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH sh AS (SELECT DISTINCT doc_id, s FROM (${sqlShingles(3)}) t),
        dfs AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
        SELECT sh.doc_id, count(*) AS n_shingles,
          CAST(sum(CASE WHEN dfs.df > 5 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_boiler,
          round(CAST(sum(CASE WHEN dfs.df > 5 THEN 1 ELSE 0 END) AS DOUBLE) /
            count(*), 6) + 0 AS bfrac
        FROM sh JOIN dfs USING (s)
        GROUP BY sh.doc_id ORDER BY sh.doc_id""")),

    // ---- SimHash near-dup PAIRS via lossless band join (Hamming <= 2
    //      over 4 bands: pigeonhole guarantees every qualifying pair shares
    //      an intact band — bucketed, not all-pairs). The oracle verifies
    //      all pairs directly; the Spark plan never materializes them ----
    QueryDef(
      "q87_simhash_pairs",
      (s, d) => {
        Dedup.simhashNearDupPairs(Tables.documents(s, d), "text", "doc_id",
            maxHamming = 2, bands = 4)
          .orderBy(col("id1"), col("id2"))
      },
      Some(raw"""WITH toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents),
        h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS w
          FROM toks),
        bits AS (SELECT doc_id, j,
          sum(CASE WHEN (w >> (31 - j)) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
          FROM h, UNNEST(generate_series(0, 31)) AS t_j(j)
          GROUP BY doc_id, j),
        sig AS (SELECT doc_id, CAST(sum(CASE WHEN sgn > 0
            THEN CAST(1 AS BIGINT) << (31 - j) ELSE 0 END) AS BIGINT) AS sh
          FROM bits GROUP BY doc_id)
        SELECT a.doc_id AS id1, b.doc_id AS id2,
          CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 2
        ORDER BY id1, id2""")),

    // ---- token-balanced sharding: docs dealt round-robin in (tokens
    //      desc, id) order into 8 shards — near-equal per-shard training
    //      cost. Global rank via range partitioning, no single-task sort ----
    QueryDef(
      "q88_balanced_shards",
      (s, d) => {
        val withTok = Tables.documents(s, d)
          .select(col("doc_id"), TA.tokenCount(col("text")).as("nt"))
        TA.balancedShards(withTok, "nt", "doc_id", 8)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).as("total_tokens"))
          .orderBy(col("shard"))
      },
      Some(raw"""WITH t AS (SELECT doc_id,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
          FROM documents),
        r AS (SELECT doc_id, nt,
          row_number() OVER (ORDER BY nt DESC, doc_id) - 1 AS rn FROM t)
        SELECT CAST(rn % 8 AS INTEGER) AS shard, count(*) AS n_docs,
          CAST(sum(nt) AS BIGINT) AS total_tokens
        FROM r GROUP BY shard ORDER BY shard""")),

    // ---- leakage-safe split: near-dup clusters are assigned to
    //      train/val/test ATOMICALLY (split keyed on the cluster
    //      representative's hash, not the doc's), so no eval-set
    //      contamination by near-duplicates. n_groups counts assignment
    //      units per split (Dedup.leakageSafeSplit) ----
    QueryDef(
      "q90_leakage_split",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.nearDuplicatePairs(docs, "text", "doc_id",
          threshold = 0.5)
        Dedup.leakageSafeSplit(docs, "doc_id", pairs, "id1", "id2",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("rep")).as("n_groups"))
          .orderBy(col("split"))
      },
      Some(raw"""WITH RECURSIVE sh AS (${sqlShingles(3)}),
        hs AS (SELECT doc_id, seed,
          ('0x' || substr(md5(s), 1, 8))::BIGINT +
            seed * ('0x' || substr(md5(s), 9, 8))::BIGINT AS h
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) sd),
        sig AS (SELECT doc_id, seed, min(h) AS minhash FROM hs GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band,
          ('0x' || substr(md5(CAST(min(seed) // 2 AS VARCHAR) || ',' || string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)), 1, 15))::BIGINT AS bkey
          FROM sig GROUP BY doc_id, band),
        cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        shd AS (SELECT DISTINCT doc_id, s FROM sh),
        cnt AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
        inter AS (SELECT c.id1, c.id2, count(*) AS c
          FROM cand c JOIN shd a ON a.doc_id = c.id1
          JOIN shd b ON b.doc_id = c.id2 AND a.s = b.s
          GROUP BY c.id1, c.id2),
        pairs AS (SELECT i.id1, i.id2
          FROM inter i JOIN cnt n1 ON n1.doc_id = i.id1
          JOIN cnt n2 ON n2.doc_id = i.id2
          WHERE CAST(i.c AS DOUBLE) / (n1.n + n2.n - i.c) >= 0.5),
        edges AS (SELECT id1 AS a, id2 AS b FROM pairs
          UNION ALL SELECT id2, id1 FROM pairs),
        reach(node, lbl) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node),
        cc AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node),
        rep AS (SELECT d.doc_id, coalesce(cc.cluster, d.doc_id) AS rep
          FROM documents d LEFT JOIN cc ON d.doc_id = cc.node),
        u AS (SELECT rep,
          ('0x' || substr(md5(CAST(rep AS VARCHAR) || ':42'), 1, 13))::BIGINT
            / 4503599627370496.0 AS u
          FROM rep)
        SELECT CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.8 + 0.1 THEN 'val' ELSE 'test' END AS split,
          count(*) AS n_docs, count(DISTINCT rep) AS n_groups
        FROM u GROUP BY split ORDER BY split""")),

    // ---- per-source quality-filter funnel: survivor counts after each
    //      cumulative gate (length → repetition → mean-word-length), one
    //      hash-agg pass (TextAnalysis.filterFunnel; gates = q63's rules) ----
    QueryDef(
      "q91_filter_funnel",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val flagged = docs
          .join(TA.topTokenShare(docs, "text", "doc_id"), "doc_id")
        TA.filterFunnel(flagged, "source", Seq(
            "len" -> (TA.tokenCount(col("text")) >= 30),
            "rep" -> (col("top_share") <= 0.10),
            "mwl" -> (TA.meanWordLength(col("text")) <= 4.5)))
          .orderBy(col("source"))
      },
      Some(raw"""WITH toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents),
        tf AS (SELECT doc_id, t, count(*) AS c FROM toks
          WHERE t <> '' GROUP BY doc_id, t),
        repn AS (SELECT doc_id,
          CAST(max(c) AS DOUBLE) / sum(c) AS top_share FROM tf GROUP BY doc_id),
        m AS (SELECT d.source,
          len(regexp_split_to_array(trim(d.text), '\s+')) AS n_words,
          len(regexp_replace(d.text, '\s', '', 'g')) AS n_chars,
          r.top_share
          FROM documents d JOIN repn r ON d.doc_id = r.doc_id)
        SELECT source, count(*) AS total,
          CAST(sum(CASE WHEN n_words >= 30 THEN 1 ELSE 0 END) AS BIGINT)
            AS after_len,
          CAST(sum(CASE WHEN n_words >= 30 AND top_share <= 0.10
            THEN 1 ELSE 0 END) AS BIGINT) AS after_rep,
          CAST(sum(CASE WHEN n_words >= 30 AND top_share <= 0.10
            AND CAST(n_chars AS DOUBLE) / n_words <= 4.5
            THEN 1 ELSE 0 END) AS BIGINT) AS after_mwl
        FROM m GROUP BY source ORDER BY source""")),

    // ---- transitive near-dedup, keep-1-per-cluster: the canonical
    //      representative corpus (Dedup.capNearDuplicates; contrast q56's
    //      pair-wise drop policy — A~B~C here keeps only A) ----
    QueryDef(
      "q92_cluster_cap",
      (s, d) => {
        Dedup.capNearDuplicates(Tables.documents(s, d), "text", "doc_id",
            maxCopies = 1, threshold = 0.5)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"))
          .orderBy(col("source"))
      },
      Some(raw"""WITH RECURSIVE sh AS (${sqlShingles(3)}),
        hs AS (SELECT doc_id, seed,
          ('0x' || substr(md5(s), 1, 8))::BIGINT +
            seed * ('0x' || substr(md5(s), 9, 8))::BIGINT AS h
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) sd),
        sig AS (SELECT doc_id, seed, min(h) AS minhash FROM hs GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band,
          ('0x' || substr(md5(CAST(min(seed) // 2 AS VARCHAR) || ',' || string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)), 1, 15))::BIGINT AS bkey
          FROM sig GROUP BY doc_id, band),
        cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        shd AS (SELECT DISTINCT doc_id, s FROM sh),
        cnt AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
        inter AS (SELECT c.id1, c.id2, count(*) AS c
          FROM cand c JOIN shd a ON a.doc_id = c.id1
          JOIN shd b ON b.doc_id = c.id2 AND a.s = b.s
          GROUP BY c.id1, c.id2),
        pairs AS (SELECT i.id1, i.id2
          FROM inter i JOIN cnt n1 ON n1.doc_id = i.id1
          JOIN cnt n2 ON n2.doc_id = i.id2
          WHERE CAST(i.c AS DOUBLE) / (n1.n + n2.n - i.c) >= 0.5),
        edges AS (SELECT id1 AS a, id2 AS b FROM pairs
          UNION ALL SELECT id2, id1 FROM pairs),
        reach(node, lbl) AS (
          SELECT DISTINCT a, a FROM edges
          UNION
          SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node),
        cc AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node),
        ranked AS (SELECT d.doc_id, d.source,
          row_number() OVER (PARTITION BY coalesce(cc.cluster, d.doc_id)
            ORDER BY d.doc_id) AS rn
          FROM documents d LEFT JOIN cc ON d.doc_id = cc.node)
        SELECT source, count(*) AS n_kept FROM ranked WHERE rn <= 1
        GROUP BY source ORDER BY source""")),

    // ---- temperature-scaled mixture (alpha=0.5, half-size budget):
    //      dominant sources down-sampled toward rare ones' share
    //      (Ingest.temperatureMixture; rates rounded to 9 decimals so the
    //      oracle recomputes them bitwise) ----
    QueryDef(
      "q96_temperature_mix",
      (s, d) => {
        graft.sources.Ingest.temperatureMixture(Tables.documents(s, d),
            "doc_id", "source", alpha = 0.5, targetFraction = 0.5)
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
          .orderBy(col("source"))
      },
      Some(raw"""WITH c AS (SELECT source, count(*) AS n FROM documents
          GROUP BY source),
        tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total,
          sum(pow(n, 0.5)) AS psum FROM c),
        r AS (SELECT source,
          least(1.0, round(0.5 * total * (pow(n, 0.5) / psum) / n, 9)) AS rate
          FROM c, tot),
        kept AS (SELECT d.source FROM documents d JOIN r USING (source)
          WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT
            / 4503599627370496.0 < rate)
        SELECT source, count(*) AS n_kept FROM kept
        GROUP BY source ORDER BY source""")),

    // ---- token-budget quality selection: best-entropy docs per source
    //      until a 300-token budget (TextAnalysis.tokenBudgetSelect —
    //      distributed prefix sum, no per-group sort task) ----
    QueryDef(
      "q97_token_budget",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val scored = docs.join(TA.tokenEntropy(docs, "text", "doc_id"), "doc_id")
          .select(col("doc_id"), col("source"),
            (round(col("entropy"), 6) + 0.0).as("q"),
            TA.tokenCount(col("text")).as("nt"))
        TA.tokenBudgetSelect(scored, "source", "q", "nt", "doc_id", 300L)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), sum(col("nt")).as("tokens_kept"))
          .orderBy(col("source"))
      },
      Some(raw"""WITH toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents),
        tf AS (SELECT doc_id, t, count(*) AS c FROM toks
          WHERE t <> '' GROUP BY doc_id, t),
        ent AS (SELECT doc_id, round(ln(CAST(sum(c) AS DOUBLE)) -
            sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) /
            CAST(sum(c) AS DOUBLE), 6) + 0 AS q
          FROM tf GROUP BY doc_id),
        base AS (SELECT d.doc_id, d.source, e.q,
          CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS BIGINT) AS nt
          FROM documents d JOIN ent e USING (doc_id)),
        cum AS (SELECT source, nt, sum(nt) OVER (PARTITION BY source
            ORDER BY q DESC, doc_id ROWS UNBOUNDED PRECEDING) AS csum
          FROM base)
        SELECT source, count(*) AS n_kept, CAST(sum(nt) AS BIGINT) AS tokens_kept
        FROM cum WHERE csum <= 300 GROUP BY source ORDER BY source""")),

    // ---- contrastive negative sampling (Ingest.contrastiveNegatives):
    //      2 hash-drawn negatives per doc over the dense rank space ----
    QueryDef(
      "q101_negatives",
      (s, d) => {
        graft.sources.Ingest.contrastiveNegatives(
            Tables.documents(s, d), "doc_id", m = 2)
          .orderBy(col("doc_id"), col("j"))
      },
      Some(raw"""WITH n AS (SELECT count(*) AS n FROM documents),
        rk AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rank
          FROM documents),
        g AS (SELECT rk.doc_id, rk.rank AS self, j,
          ('0x' || substr(md5(CAST(rk.doc_id AS VARCHAR) || ':' ||
            CAST(j AS VARCHAR) || ':42'), 1, 13))::BIGINT % n.n AS r
          FROM rk CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS j) t
          CROSS JOIN n),
        adj AS (SELECT g.doc_id, g.j,
          CASE WHEN g.r = g.self THEN (g.r + 1) % n.n ELSE g.r END AS r
          FROM g CROSS JOIN n)
        SELECT a.doc_id, a.j, rk2.doc_id AS neg_doc_id
        FROM adj a JOIN rk rk2 ON a.r = rk2.rank
        ORDER BY a.doc_id, a.j""")),

    // ---- cross-scale sampling-consistency verdict (reference
    //      gbr.py:731-740, reports/sampling_analysis.json): do the stats of
    //      deterministic half/quarter variants agree with the full corpus
    //      within tolerance? (Profile.consistencyVerdict) ----
    QueryDef(
      "q102_scale_consistency",
      (s, d) => {
        val docs = Tables.documents(s, d).withColumn("len", length(col("text")))
        val u = graft.sources.Ingest.uniformKey(col("doc_id"), 42L)
        graft.operators.Profile.consistencyVerdict(
          Seq("full" -> docs,
            "half" -> docs.filter(u < 0.5),
            "quarter" -> docs.filter(u < 0.25)),
          Seq("n_chars", "len"), tolerance = 0.05)
      },
      Some(raw"""WITH src AS (SELECT n_chars, length(text) AS len,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT
            / 4503599627370496.0 AS u
          FROM documents),
        v AS (SELECT 'full' AS variant, 1.1 AS cut UNION ALL
          SELECT 'half', 0.5 UNION ALL SELECT 'quarter', 0.25),
        agg AS (SELECT v.variant,
          sum(CAST(n_chars AS DECIMAL(28,6))) AS s_nc,
          sum(CAST(n_chars AS DECIMAL(18,3)) * CAST(n_chars AS DECIMAL(18,3))) AS s2_nc,
          count(n_chars) AS n_nc,
          sum(CAST(len AS DECIMAL(28,6))) AS s_len,
          sum(CAST(len AS DECIMAL(18,3)) * CAST(len AS DECIMAL(18,3))) AS s2_len,
          count(len) AS n_len,
          count(*) AS t
          FROM src JOIN v ON src.u < v.cut
          GROUP BY v.variant),
        m AS (
          SELECT variant, 'n_chars' AS "column", 'mean' AS metric,
            CAST(s_nc AS DOUBLE) / n_nc AS value FROM agg
          UNION ALL SELECT variant, 'n_chars', 'stddev',
            sqrt(greatest(CAST(s2_nc AS DOUBLE) / n_nc -
              (CAST(s_nc AS DOUBLE) / n_nc) * (CAST(s_nc AS DOUBLE) / n_nc), 0))
            FROM agg
          UNION ALL SELECT variant, 'n_chars', 'null_frac',
            CAST(t - n_nc AS DOUBLE) / t FROM agg
          UNION ALL SELECT variant, 'len', 'mean',
            CAST(s_len AS DOUBLE) / n_len FROM agg
          UNION ALL SELECT variant, 'len', 'stddev',
            sqrt(greatest(CAST(s2_len AS DOUBLE) / n_len -
              (CAST(s_len AS DOUBLE) / n_len) * (CAST(s_len AS DOUBLE) / n_len), 0))
            FROM agg
          UNION ALL SELECT variant, 'len', 'null_frac',
            CAST(t - n_len AS DOUBLE) / t FROM agg)
        SELECT a.variant, a."column", a.metric,
          round(a.value, 6) + 0 AS value, round(b.value, 6) + 0 AS base,
          round(abs(a.value - b.value) / greatest(abs(b.value), 1e-12), 6) + 0
            AS rel_diff,
          (round(abs(a.value - b.value) / greatest(abs(b.value), 1e-12), 6) + 0)
            <= 0.05 AS within_tol
        FROM m a JOIN m b ON b.variant = 'full' AND a."column" = b."column"
          AND a.metric = b.metric
        WHERE a.variant <> 'full'
        ORDER BY a.variant, a."column", a.metric""")),

    // ---- cross-document repeated-substring profile (suffix dedup à la
    //      Lee et al. 2022): per-doc count + span-union coverage of 5-token
    //      windows that appear in >= 2 distinct docs (Dedup.substringDupStats) ----
    QueryDef(
      "q105_substring_dups",
      (s, d) => {
        Dedup.substringDupStats(Tables.documents(s, d), "text", "doc_id", k = 5)
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH w AS (SELECT doc_id,
          regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        t AS (SELECT doc_id, len(w) AS n_tokens,
          greatest(len(w) - 4, 0) AS n_windows FROM w),
        g AS (SELECT doc_id, i - 1 AS pos,
          ('0x' || substr(md5(${sqlGram(5)}), 1, 15))::BIGINT AS gh
          FROM w, UNNEST(generate_series(1, len(w) - 4)) AS t_i(i)
          WHERE len(w) >= 5),
        dup AS (SELECT gh FROM g GROUP BY gh
          HAVING count(DISTINCT doc_id) >= 2),
        d AS (SELECT g.doc_id, g.pos,
          lead(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS nxt
          FROM g JOIN dup USING (gh)),
        c AS (SELECT doc_id, count(*) AS n_dup_windows,
          sum(CASE WHEN nxt IS NULL THEN 5 ELSE least(nxt - pos, 5) END)
            AS covered_tokens
          FROM d GROUP BY doc_id)
        SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
          CAST(t.n_windows AS BIGINT) AS n_windows,
          CAST(coalesce(c.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
          CAST(coalesce(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
          round(coalesce(c.covered_tokens, 0) / t.n_tokens, 4) AS dup_fraction
        FROM t LEFT JOIN c USING (doc_id) ORDER BY t.doc_id""")),

    // ---- repeated-substring scrub: delete duplicated windows outside the
    //      keeper doc, rebuild surviving text (Dedup.scrubRepeatedSubstrings;
    //      md5 of the rebuilt text keeps the compare row small) ----
    QueryDef(
      "q106_substring_scrub",
      (s, d) => {
        Dedup.scrubRepeatedSubstrings(Tables.documents(s, d), "text", "doc_id",
            k = 5)
          .select(col("doc_id"), md5(col("scrubbed")).as("scrub_md5"),
            col("kept_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH w AS (SELECT doc_id,
          regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        g AS (SELECT doc_id, i - 1 AS pos,
          ('0x' || substr(md5(${sqlGram(5)}), 1, 15))::BIGINT AS gh
          FROM w, UNNEST(generate_series(1, len(w) - 4)) AS t_i(i)
          WHERE len(w) >= 5),
        dup AS (SELECT gh, min(doc_id) AS keeper FROM g GROUP BY gh
          HAVING count(DISTINCT doc_id) >= 2),
        rem AS (SELECT DISTINCT g.doc_id, p AS pos
          FROM g JOIN dup USING (gh),
            UNNEST(generate_series(g.pos, g.pos + 4)) AS t_p(p)
          WHERE g.doc_id <> dup.keeper),
        tok AS (SELECT doc_id, i - 1 AS pos, w[i] AS tok
          FROM w, UNNEST(generate_series(1, len(w))) AS t_i(i)),
        kept AS (SELECT t.doc_id,
          string_agg(t.tok, ' ' ORDER BY t.pos) AS scrubbed,
          count(*) AS kept_tokens
          FROM tok t LEFT JOIN rem r
            ON t.doc_id = r.doc_id AND t.pos = r.pos
          WHERE r.doc_id IS NULL GROUP BY t.doc_id)
        SELECT d.doc_id, coalesce(md5(kept.scrubbed), md5('')) AS scrub_md5,
          CAST(coalesce(kept.kept_tokens, 0) AS BIGINT) AS kept_tokens
        FROM documents d LEFT JOIN kept USING (doc_id) ORDER BY d.doc_id""")),

    // ---- weighted sample without replacement (Ingest.weightedSample):
    //      Efraimidis–Spirakis A-ES keys, inclusion ∝ n_chars, top-50 via
    //      TakeOrderedAndProject ----
    QueryDef(
      "q107_weighted_sample",
      (s, d) => {
        graft.sources.Ingest.weightedSample(
            Tables.documents(s, d), "doc_id", "n_chars", n = 50)
          .select(col("doc_id"), col("n_chars").as("weight"),
            (round(col("sample_key"), 6) + lit(0.0)).as("sample_key"))
      },
      Some(raw"""SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
        round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT + 1)
          / 4503599627370496.0) / n_chars, 6) + 0 AS sample_key
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        ORDER BY ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT + 1)
          / 4503599627370496.0) / n_chars DESC, doc_id LIMIT 50""")),

    // ---- fractional-epoch repetition mixture (Ingest.epochRepeat):
    //      2.5 epochs of src0, 0.25 of src2, 1 of everything else ----
    QueryDef(
      "q108_epoch_repeat",
      (s, d) => {
        graft.sources.Ingest.epochRepeat(Tables.documents(s, d),
            "doc_id", "source",
            Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25), default = 1.0)
          .groupBy(col("source")).agg(count(lit(1)).as("n_rows"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("source"))
      },
      Some(raw"""WITH e AS (SELECT doc_id, source,
          CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
            WHEN 'src2' THEN 0.25 ELSE 1.0 END AS ep,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13))::BIGINT
            / 4503599627370496.0 AS u
          FROM documents),
        c AS (SELECT doc_id, source,
          CAST(floor(ep) + CASE WHEN u < ep - floor(ep) THEN 1 ELSE 0 END
            AS INT) AS copies FROM e)
        SELECT source, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs
        FROM c, UNNEST(generate_series(1, copies)) AS t(epoch)
        GROUP BY source ORDER BY source""")),

    // ---- signature-estimated near-dup pairs: LSH candidates scored by
    //      MinHash agreement instead of exact shingle Jaccard — the
    //      verify mode that needs NO shingle store
    //      (Dedup.estimatedNearDuplicatePairs). The signature family is
    //      the estimation-grade per-seed affine transform mod 2^31-1
    //      (the exact path's h1 + seed*h2 family correlates seeds and
    //      cannot estimate — see estSignaturesFromShingles); all
    //      arithmetic is md5-derived and deterministic, so DuckDB
    //      replays agreement-count / 32 exactly ----
    QueryDef(
      "q114_est_jaccard_pairs",
      (s, d) => {
        Dedup.estimatedNearDuplicatePairs(Tables.documents(s, d),
            "text", "doc_id", threshold = 0.5)
          .select(col("id1"), col("id2"),
            round(col("jaccard"), 4).as("est_jaccard"))
          .orderBy(col("id1"), col("id2"))
      },
      Some(raw"""WITH sh AS (${sqlShingles(3)}),
        sig AS (SELECT doc_id, seed, min((
            (('0x' || substr(md5('mh-a-' || CAST(seed AS VARCHAR)), 1, 8))::BIGINT
              % 2147483646 + 1)
            * (('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647)
            + ('0x' || substr(md5('mh-b-' || CAST(seed AS VARCHAR)), 1, 8))::BIGINT
              % 2147483647
          ) % 2147483647) AS minhash
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS seed) sd
          GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band,
          ('0x' || substr(md5(CAST(min(seed) // 2 AS VARCHAR) || ',' || string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)), 1, 15))::BIGINT AS bkey
          FROM sig GROUP BY doc_id, band),
        cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
        SELECT c.id1, c.id2,
          round(sum(CASE WHEN a.minhash = b.minhash THEN 1 ELSE 0 END)
            / 32.0, 4) AS est_jaccard
        FROM cand c
        JOIN sig a ON a.doc_id = c.id1
        JOIN sig b ON b.doc_id = c.id2 AND b.seed = a.seed
        GROUP BY c.id1, c.id2
        HAVING sum(CASE WHEN a.minhash = b.minhash THEN 1 ELSE 0 END) / 32.0
          >= 0.5
        ORDER BY id1, id2""")),

    // ---- incremental dedup in signature-estimated mode: same protocol as
    //      q71 (odd ids = batch, even ids = corpus) but the verify stage is
    //      MinHash agreement against the signature-sized index
    //      (Dedup.dropDuplicatesAgainst(estimatedJaccard = true)) ----
    QueryDef(
      "q115_est_dedup_against",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.dropDuplicatesAgainst(
            docs.filter(pmod(col("doc_id"), lit(2)) === 1),
            docs.filter(pmod(col("doc_id"), lit(2)) === 0),
            "text", "doc_id", threshold = 0.5, estimatedJaccard = true)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""WITH sh AS (${sqlShingles(3)}),
        sig AS (SELECT doc_id, seed, min((
            (('0x' || substr(md5('mh-a-' || CAST(seed AS VARCHAR)), 1, 8))::BIGINT
              % 2147483646 + 1)
            * (('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647)
            + ('0x' || substr(md5('mh-b-' || CAST(seed AS VARCHAR)), 1, 8))::BIGINT
              % 2147483647
          ) % 2147483647) AS minhash
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS seed) sd
          GROUP BY doc_id, seed),
        bands AS (SELECT doc_id, seed // 2 AS band,
          ('0x' || substr(md5(CAST(min(seed) // 2 AS VARCHAR) || ',' || string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)), 1, 15))::BIGINT AS bkey
          FROM sig GROUP BY doc_id, band),
        cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        pairs AS (SELECT c.id1, c.id2
          FROM cand c
          JOIN sig a ON a.doc_id = c.id1
          JOIN sig b ON b.doc_id = c.id2 AND b.seed = a.seed
          GROUP BY c.id1, c.id2
          HAVING sum(CASE WHEN a.minhash = b.minhash THEN 1 ELSE 0 END) / 32.0
            >= 0.5),
        fp AS (SELECT doc_id, md5(text) AS f FROM documents),
        losers AS (
          SELECT id2 AS id FROM pairs WHERE id1 % 2 = 0 AND id2 % 2 = 1
          UNION SELECT id1 FROM pairs WHERE id2 % 2 = 0 AND id1 % 2 = 1
          UNION SELECT id2 FROM pairs WHERE id1 % 2 = 1 AND id2 % 2 = 1
          UNION SELECT b.doc_id FROM fp b WHERE b.doc_id % 2 = 1
            AND b.f IN (SELECT f FROM fp WHERE doc_id % 2 = 0)
          UNION SELECT b.doc_id FROM fp b JOIN fp a
            ON a.f = b.f AND a.doc_id < b.doc_id AND a.doc_id % 2 = 1
            WHERE b.doc_id % 2 = 1)
        SELECT doc_id, lang FROM documents
        WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT id FROM losers)
        ORDER BY doc_id"""))
  )
}
