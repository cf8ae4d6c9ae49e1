package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles extra whitespace") {
    val df = Seq("  the quick   brown fox  ").toDF("text")
    assert(df.select(TextAnalysis.tokenCount($"text")).head().getLong(0) == 4L)
  }

  test("subwordCount splits on letter/digit/symbol boundaries") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("hello world", 2L),          // two letter runs
      ("abc123def", 3L),            // letters, digits, letters
      ("a-b.c", 5L),                // 3 letters + 2 symbols
      ("  spaced   out  ", 2L),     // whitespace never counts
      ("", 0L)
    )
    rows.foreach { case (txt, expected) =>
      val got = spark.range(1)
        .select(graft.operators.TextAnalysis.subwordCount(lit(txt)))
        .head().getLong(0)
      assert(got == expected, s"'$txt' -> $got, expected $expected")
    }
  }

  test("crossDocBoilerplate flags shingles shared beyond minDocs") {
    // 7 docs share the template prefix "term of service applies"; each has
    // a unique tail so it also has non-boilerplate shingles
    val docs = (0L until 7L).map(i => (i, s"term of service applies uniq$i tail$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.crossDocBoilerplate(docs, "text", "doc_id",
        k = 3, minDocs = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 4 distinct shingles per 6-word doc; the shared ones ("term of
    // service", "of service applies") occur in 7 > 5 docs
    (0L until 7L).foreach { i =>
      val (n, b, f) = out(i)
      assert(n == 4L && b == 2L && math.abs(f - 0.5) < 1e-12,
        s"doc $i: ($n, $b, $f)")
    }
    // raising minDocs above the corpus size clears every flag
    val none = TextAnalysis.crossDocBoilerplate(docs, "text", "doc_id",
        k = 3, minDocs = 7)
      .agg(sum("n_boiler")).head().getLong(0)
    assert(none == 0L)
  }

  test("balancedShards: partition of the corpus with bounded token spread") {
    val docs = (0L until 103L).map(i => (i, ((i * 37) % 50 + 1).toInt))
      .toDF("doc_id", "nt")
    val out = TextAnalysis.balancedShards(docs, "nt", "doc_id", 8)
    val rows = out.select($"doc_id", $"nt", $"shard")
      .as[(Long, Int, Int)].collect()
    // every doc exactly once, shards in range
    assert(rows.length == 103 && rows.map(_._1).distinct.length == 103)
    assert(rows.forall(r => r._3 >= 0 && r._3 < 8))
    // round-robin: shard sizes differ by at most 1
    val sizes = rows.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(sizes.size == 8 && sizes.max - sizes.min <= 1)
    // LPT-style balance: token spread bounded by the largest single doc
    val totals = rows.groupBy(_._3).view.mapValues(_.map(_._2.toLong).sum).values
    assert(totals.max - totals.min <= rows.map(_._2).max,
      s"spread ${totals.max - totals.min}")
    // deterministic: assignment is a pure function of (nt desc, doc_id) rank
    val again = TextAnalysis.balancedShards(docs, "nt", "doc_id", 8)
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    assert(rows.forall(r => again(r._1) == r._3))
  }

  test("langId picks marker language deterministically") {
    val df = Seq(
      ("the cat and the dog of the house", "en"),
      ("der hund und die katze und der vogel", "de"),
      ("el gato que duerme y los perros", "es"),
      ("le chat et les chiens et le chien", "fr"),
      ("你好世界", "zh"),
      ("xyzzy plugh quux", "und")
    ).toDF("text", "expected")
    val got = df.select(TextAnalysis.langId($"text").as("got"), $"expected").collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(1)} got ${r.getString(0)}"))
  }

  test("fingerprint is whitespace/case invariant") {
    val df = Seq(("Hello   World", "hello world"), ("  a b  ", "A B")).toDF("x", "y")
    val rows = df.select(TextAnalysis.fingerprint($"x"),
      TextAnalysis.fingerprint($"y")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("quality metrics: stopword ratio and mean word length") {
    val df = Seq("the cat is on the mat").toDF("text")
    val r = df.select(TextAnalysis.stopwordRatio($"text"),
      TextAnalysis.meanWordLength($"text")).head()
    assert(math.abs(r.getDouble(0) - 3.0 / 6.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 16.0 / 6.0) < 1e-12)
  }

  test("shingles produce n-k+1 shingles per doc") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val sh = TextAnalysis.shingles(df, "text", 3, "doc_id")
      .select("s").as[String].collect().toSeq
    assert(sh == Seq("a b c", "b c d", "c d e"))
  }

  test("tfidf ranks corpus-rare terms above ubiquitous ones") {
    val df = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "cherry dates common")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, "text", "doc_id", totalDocs = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // 'common' has df=3 → idf=ln(1)=0 → never a top term above rare ones
    val byDoc = top.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L).contains("apple"))
    assert(!byDoc(1L).contains("common") || byDoc(1L).size == 3)
    // doc 1: tf(apple)=2, df(apple)=1 → 2·ln(3) ≈ 2.197225
    val apple = top.find(t => t._1 == 1L && t._2 == "apple").get._3
    assert(math.abs(apple - 2 * math.log(3.0)) < 1e-5)
  }

  test("tfidf top-k is capped and tie-broken by term") {
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, "text", "doc_id",
        totalDocs = 1, topK = 3)
      .orderBy("term").collect().map(_.getString(1)).toSeq
    // all six terms tie (tf=1, df=1) → the 3 lexicographically smallest win
    assert(top == Seq("a", "b", "c"))
  }

  test("redactPii replaces emails, IPs and phones with typed placeholders") {
    val got = spark.range(1)
      .select(TextAnalysis.redactPii(lit(
        "mail bob.smith+x@corp.example.co from 192.168.0.1 call +44 20 7946 0958 done")))
      .head().getString(0)
    assert(got == "mail <EMAIL> from <IP> call <PHONE> done")
    // no false positives on clean text; version strings aren't IPs (3 parts)
    val clean = spark.range(1)
      .select(TextAnalysis.redactPii(lit("release v1.2.3 of the tool")))
      .head().getString(0)
    assert(clean == "release v1.2.3 of the tool")
  }

  test("piiCounts counts each kind once, phone not double-counted from email digits") {
    val df = Seq("a@b.io and 10.0.0.7 and +1-555-0100 and c@d.org").toDF("text")
    val counts = TextAnalysis.piiCounts($"text").map { case (n, c) => c.as(n) }
    val r = df.select(counts: _*).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getLong(2) == 1L)
  }

  test("contaminationShare finds leaked 5-grams, misses fresh docs") {
    val eval = Seq((0L, "one two three four five six")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "zzz one two three four five yyy"),     // contains eval 5-gram
      (11L, "entirely different words with no overlap at all"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.contaminationShare(corpus, eval, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(10L) == 1L && got(11L) == 0L)
  }

  test("chunkDocs windows with overlap; no contained tail; empty doc drops") {
    val df = Seq((1L, "a b c d e f g"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkDocs(df, "text", "doc_id", chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // doc 1: starts 0,3 — a start at 6 would yield "g", fully contained in
    // "d e f g", so it must not be generated; doc 3: one short chunk
    assert(rows.toSeq == Seq(
      (1L, 0L, "a b c d"), (1L, 1L, "d e f g"), (3L, 0L, "x y")))
    // an 8th token makes the tail chunk legitimate again
    val more = TextAnalysis.chunkDocs(
        Seq((9L, "a b c d e f g h")).toDF("doc_id", "text"),
        "text", "doc_id", chunkTokens = 4, overlap = 1)
      .orderBy("chunk_id").collect().map(_.getString(3))
    assert(more.toSeq == Seq("a b c d", "d e f g", "g h"))
  }

  test("piiCounts: IP inside an email is consumed by <EMAIL>, not counted") {
    val df = Seq("x@1.2.3.4.net and 10.0.0.7").toDF("text")
    val counts = TextAnalysis.piiCounts($"text").map { case (n, c) => c.as(n) }
    val r = df.select(counts: _*).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 0L)
  }

  test("packByBudget assigns docs to bins by running token offset per group") {
    val df = Seq(
      ("en", 1L, 400L), ("en", 2L, 500L), ("en", 3L, 300L), ("en", 4L, 900L),
      ("de", 1L, 1200L), ("de", 2L, 100L))
      .toDF("lang", "doc_id", "n_tokens")
    val got = TextAnalysis.packByBudget(df, "n_tokens", "doc_id", "lang", 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // en offsets: 0, 400, 900, 1200 → bins 0,0,0,1; de offsets: 0, 1200 → 0,1
    assert(got == Map(("en", 1L) -> 0L, ("en", 2L) -> 0L, ("en", 3L) -> 0L,
      ("en", 4L) -> 1L, ("de", 1L) -> 0L, ("de", 2L) -> 1L))
  }

  test("tokenEntropy: uniform two-token doc = ln 2; constant doc = 0") {
    val df = Seq((1L, "a a b b"), (2L, "x x x x")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - math.log(2.0)) < 1e-12)
    assert(math.abs(got(2L)) < 1e-12)
  }

  test("dupNgramFraction scores planted repetition, zero for unique text") {
    val df = Seq(
      (1L, "a b c a b c a b c"),  // 7 3-grams, 3 distinct → 4/7 dup
      (2L, "one two three four five"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramFraction(df, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 4.0 / 7.0) < 1e-12)
    assert(got(2L) == 0.0)
  }

  test("chunkDocs properties: zero-overlap chunks reconstruct the doc; overlap prefixes match") {
    val texts = Seq.tabulate(20)(i =>
      (i.toLong, Seq.tabulate(3 + i * 7 % 90)(j => s"w${i}_$j").mkString(" ")))
    val df = texts.toDF("doc_id", "text")
    // overlap 0: concatenation of chunks == original token stream
    val rebuilt = TextAnalysis.chunkDocs(df, "text", "doc_id", 16, 0)
      .orderBy("doc_id", "chunk_id")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getString(3)).mkString(" ") }
    texts.foreach { case (id, t) => assert(rebuilt(id) == t, s"doc $id") }
    // overlap 5: each chunk's first 5 tokens = previous chunk's last 5
    val withOv = TextAnalysis.chunkDocs(df, "text", "doc_id", 16, 5)
      .orderBy("doc_id", "chunk_id").collect()
      .groupBy(_.getLong(0)).values
    withOv.foreach { rows =>
      rows.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) =>
          val prev = a.getString(3).split(" ")
          val cur = b.getString(3).split(" ")
          // a chunk with a successor is always full (16 tokens), so its
          // last 5 tokens are exactly slice(11, 16)
          assert(cur.take(5).sameElements(prev.slice(11, 16)),
            s"overlap mismatch: ${prev.mkString(",")} -> ${cur.mkString(",")}")
        case _ => ()
      }
    }
  }

  test("packByBudget properties: bins non-decreasing, full bins stay under budget + one doc") {
    val docs = Seq.tabulate(200)(i =>
      ("g" + (i % 3), i.toLong, 50L + (i * 37 % 400)))
    val df = docs.toDF("grp", "doc_id", "n_tokens")
    val rows = TextAnalysis.packByBudget(df, "n_tokens", "doc_id", "grp", 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).values.foreach { grp =>
      val ordered = grp.sortBy(_._2)
      // bins never decrease along doc order
      assert(ordered.sliding(2).forall {
        case Array(a, b) => b._4 >= a._4
        case _ => true
      })
      // each bin's token total < budget + its largest doc (greedy bound)
      ordered.groupBy(_._4).values.foreach { bin =>
        val tot = bin.map(_._3).sum
        assert(tot < 1000L + bin.map(_._3).max, s"bin overflow: $tot")
      }
    }
  }

  test("vocabulary ranks by frequency and accumulates share to 1.0") {
    val df = Seq("b b b a a c").toDF("text")
    val rows = TextAnalysis.vocabulary(df, "text")
      .orderBy("rank").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("b", "a", "c"))
    assert(rows.map(_.getLong(1)).toSeq == Seq(3L, 2L, 1L))
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-9)
  }

  test("filterFunnel counts cumulative survivors per group") {
    import org.apache.spark.sql.functions._
    // srcA: lens 5,3,1; srcB: lens 4,2
    val df = Seq(("srcA", 5), ("srcA", 3), ("srcA", 1), ("srcB", 4), ("srcB", 2))
      .toDF("source", "len")
    val rows = TextAnalysis.filterFunnel(df, "source", Seq(
        "ge2" -> (col("len") >= 2),     // drops len 1
        "ge4" -> (col("len") >= 4)))    // drops len 2,3
      .orderBy("source").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("srcA", 3L, 2L, 1L), ("srcB", 2L, 2L, 1L)))
  }

  test("filterFunnel stages are cumulative, not independent") {
    import org.apache.spark.sql.functions._
    // the row passes stage 2's predicate but failed stage 1 → must NOT be
    // counted as surviving stage 2
    val df = Seq(("g", 1)).toDF("g", "v")
    val r = TextAnalysis.filterFunnel(df, "g", Seq(
        "a" -> (col("v") > 5), "b" -> (col("v") > 0))).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (1L, 0L, 0L))
  }

  test("tokenBudgetSelect keeps best-quality docs until the budget binds") {
    import org.apache.spark.sql.functions._
    // srcA in quality order: (id 1, q 9, 40 tok), (id 2, q 8, 40), (id 3,
    // q 7, 40) → budget 100 keeps ids 1,2 (80 tokens; adding 3 → 120 > 100).
    // srcB's single 200-token doc exceeds the budget alone → nothing kept.
    val df = Seq(
      ("srcA", 1L, 9.0, 40L), ("srcA", 2L, 8.0, 40L), ("srcA", 3L, 7.0, 40L),
      ("srcB", 4L, 5.0, 200L))
      .toDF("src", "doc_id", "q", "nt")
    val kept = TextAnalysis.tokenBudgetSelect(df, "src", "q", "nt", "doc_id", 100L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("tokenBudgetSelect matches a window cumulative sum on random data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val df = (0 until 2000).map(i =>
      (s"s${i % 5}", i.toLong, rnd.nextInt(100).toDouble, (rnd.nextInt(20) + 1).toLong))
      .toDF("src", "doc_id", "q", "nt")
    val got = TextAnalysis.tokenBudgetSelect(df, "src", "q", "nt", "doc_id", 500L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val w = Window.partitionBy(col("src")).orderBy(col("q").desc, col("doc_id"))
    val expect = df.withColumn("csum", sum(col("nt")).over(w))
      .filter(col("csum") <= 500L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == expect && got.nonEmpty)
  }
}
