package graft.operators

import graft.functions.vec_norm
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Statistical profiling pipeline — surface C of the reference
  * (`scripts/generate_benchmark_reports.py`): per-table null profile,
  * numeric moments, categorical top-k frequency tables with percentages,
  * text-length stats, histograms, and embedding analytics (norm stats,
  * per-dimension moments), rendered to markdown/JSON-able case classes.
  *
  * Execution shape: one narrow multi-aggregate pass per stat family (the
  * reference issues 13 separate DuckDB queries per dataset,
  * `gbr.py:119-219`; we fuse the per-column loops into single passes), tiny
  * collected results, driver-side rendering. The embedding column is never
  * read by non-embedding stats (column pruning — it is ~90% of the bytes at
  * 10M rows, SURVEY §4).
  */
object Profile {

  final case class NumericStats(column: String, count: Long, nulls: Long,
      mean: Double, min: Double, max: Double, stddev: Double)

  final case class CategoricalStats(column: String,
      top: Seq[(String, Long, Double)], distinct: Long)

  final case class TextStats(column: String, count: Long, avgLen: Double,
      minLen: Long, maxLen: Long)

  final case class HistogramResult(column: String, lo: Double, hi: Double,
      counts: Seq[Long])

  final case class EmbeddingStats(count: Long, dims: Int, normMean: Double,
      normStd: Double)

  final case class TableProfile(rows: Long, nulls: Map[String, Long],
      numeric: Seq[NumericStats], categorical: Seq[CategoricalStats],
      text: Seq[TextStats])

  /** Per-column null counts in ONE pass (the reference loops per column,
    * `gbr.py:231-239`).
    */
  def nullProfile(df: DataFrame): Map[String, Long] = {
    val row = df.select(df.columns.toIndexedSeq.map(c =>
      sum(col(c).isNull.cast("long")).as(c)): _*).head()
    df.columns.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  /** count/nulls/avg/min/max/stddev for each numeric column, one pass total
    * (reference: one query per column, `gbr.py:168-177`).
    */
  def numericStats(df: DataFrame, cols: Seq[String]): Seq[NumericStats] = {
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__cnt"),
      sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
      avg(col(c)).as(s"${c}__avg"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max"),
      stddev_samp(col(c)).as(s"${c}__sd"))
    }
    val row = df.select(aggs: _*).head()
    cols.map { c =>
      def g(suffix: String): Double = {
        val v = row.getAs[Any](s"${c}__$suffix")
        if (v == null) Double.NaN else v.toString.toDouble
      }
      NumericStats(c, row.getAs[Long](s"${c}__cnt"), row.getAs[Long](s"${c}__nulls"),
        g("avg"), g("min"), g("max"), g("sd"))
    }
  }

  /** Top-k frequency table with percentage-of-total (reference
    * `gbr.py:145-153`). The percentage uses a precomputed total rather than
    * the reference's per-query scalar subquery (SURVEY §4).
    *
    * Standalone form — runs a count and a distinct pass of its own. Inside
    * [[profile]] the total is computed once per table and all per-column
    * distincts fuse into one pass; prefer that entry point when profiling
    * more than one column.
    */
  def categoricalStats(df: DataFrame, column: String, topK: Int = 10): CategoricalStats = {
    val distinct = df.filter(col(column).isNotNull)
      .agg(countDistinct(col(column))).head().getLong(0)
    CategoricalStats(column, categoricalTopK(df, column, topK, df.count()), distinct)
  }

  /** The top-k half of [[categoricalStats]] against a precomputed row total:
    * partial-agg + TakeOrdered, one pass over the (pruned) column.
    */
  private def categoricalTopK(df: DataFrame, column: String, topK: Int,
      total: Long): Seq[(String, Long, Double)] =
    df.filter(col(column).isNotNull)
      .groupBy(col(column)).agg(count(lit(1)).as("cnt"))
      .withColumn("pct", round(col("cnt") * 100.0 / lit(total), 2))
      .orderBy(desc("cnt"), col(column))
      .limit(topK)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

  /** Length stats for text columns, one pass (reference `gbr.py:197-205`). */
  def textStats(df: DataFrame, cols: Seq[String]): Seq[TextStats] = {
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__cnt"),
      avg(length(col(c))).as(s"${c}__avg"),
      min(length(col(c))).cast("long").as(s"${c}__min"),
      max(length(col(c))).cast("long").as(s"${c}__max"))
    }
    val row = df.filter(cols.map(col(_).isNotNull).reduce(_ || _)).select(aggs: _*).head()
    cols.map { c =>
      TextStats(c, row.getAs[Long](s"${c}__cnt"),
        Option(row.getAs[Any](s"${c}__avg")).map(_.toString.toDouble).getOrElse(Double.NaN),
        row.getAs[Long](s"${c}__min"), row.getAs[Long](s"${c}__max"))
    }
  }

  /** Fixed-range histogram: bin counts over [lo, hi) in `bins` equal
    * buckets; values outside clamp to the edge bins (matplotlib-hist
    * equivalent of `gbr.py:287-354`).
    */
  def histogram(df: DataFrame, column: String, lo: Double, hi: Double,
      bins: Int): HistogramResult = {
    val width = (hi - lo) / bins
    val bucket = least(greatest(
      floor((col(column) - lo) / width).cast("int"), lit(0)), lit(bins - 1))
    val counts = df.filter(col(column).isNotNull)
      .groupBy(bucket.as("b")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    HistogramResult(column, lo, hi, (0 until bins).map(counts.getOrElse(_, 0L)))
  }

  /** Norm statistics of an embedding column (reference `gbr.py:271-273`). */
  def embeddingStats(df: DataFrame, vecCol: String): EmbeddingStats = {
    val row = df.select(vec_norm(col(vecCol)).as("nm"), size(col(vecCol)).as("d"))
      .agg(count(lit(1)), avg(col("nm")), stddev_samp(col("nm")), max(col("d")))
      .head()
    EmbeddingStats(row.getLong(0), row.getInt(3), row.getDouble(1), row.getDouble(2))
  }

  /** [[embeddingStats]] against a storage layout that precomputes the
    * per-row L2 norm as a scalar stats column
    * ([[graft.ProductWorkload.writeIndexed]] writes `emb_norm`): count and
    * norm mean/std aggregate over the 8-byte column, and only a single-row
    * dimension probe touches the vector payload. The vector column is ~90%
    * of the table's bytes at the reference's 10M×2688 scale (~100 GB vs
    * ~80 MB for the norms), so a profiler that scans the payload for stats
    * the writer already derived pays three orders of magnitude too much IO —
    * and on this VM's throttled device that scan was exactly the
    * weather-sensitive part of the `profile_pipeline` bench entry. Values
    * match the full-scan path by construction: the layout stores
    * [[graft.functions.vec_norm]] of the same vector this path would have
    * evaluated inline (parity spec-pinned in ProfileSpec, including a
    * poisoned-norm case proving the payload is NOT read). Falls back to the
    * full scan when `normCol` is absent from the schema. Assumes fixed-dim
    * vectors (true of any embedding index; the generic variable-dim dual
    * stays available as the full-scan overload).
    */
  def embeddingStats(df: DataFrame, vecCol: String,
      normCol: Option[String]): EmbeddingStats =
    normCol.filter(df.columns.contains) match {
      case Some(nc) =>
        val row = df.agg(count(lit(1)).as("n"), avg(col(nc)).as("m"),
          stddev_samp(col(nc)).as("s")).head()
        val dims = df.select(size(col(vecCol)).as("d"))
          .filter(col(vecCol).isNotNull).limit(1)
          .take(1).headOption.map(_.getInt(0)).getOrElse(0)
        EmbeddingStats(row.getLong(0), dims,
          if (row.isNullAt(1)) Double.NaN else row.getDouble(1),
          if (row.isNullAt(2)) Double.NaN else row.getDouble(2))
      case None => embeddingStats(df, vecCol)
    }

  /** Per-dimension mean/std via posexplode + groupBy — shuffles only
    * (dim, partial-moment) pairs, never whole vectors; cardinality = dims,
    * so the shuffle is O(partitions × dims) regardless of row count.
    */
  def perDimensionMoments(df: DataFrame, vecCol: String): DataFrame = {
    df.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(avg(col("v").cast("double")).as("mean"),
        stddev_samp(col("v").cast("double")).as("std"))
      .orderBy(col("dim"))
  }

  /** Full table profile: route columns by type, fuse passes.
    *
    * Pass structure (what a 100 TB table actually pays):
    *   1. ONE multi-aggregate scan computing the row total, every column's
    *      null count, all numeric moments and all string length stats —
    *      the length stats double as the categorical/text routing signal;
    *   2. ONE pass fusing `countDistinct` for every categorical column
    *      (Catalyst plans multi-distinct via Expand — rows × #catCols
    *      through the partial agg, but over a scan pruned to just those
    *      columns — versus one full scan per column before);
    *   3. one partial-agg + TakeOrdered top-k per categorical column (these
    *      don't fuse: each needs its own grouping key space).
    * The row total is computed once and shared by every percentage.
    */
  def profile(df: DataFrame, topK: Int = 10): TableProfile = {
    val numericCols = df.schema.fields.collect {
      case StructField(n, _: NumericType, _, _) => n }.toSeq
    val stringCols = df.schema.fields.collect {
      case StructField(n, StringType, _, _) => n }.toSeq
    // pass 1: total + nulls + numeric moments + string length stats, fused
    val aggs = Seq(count(lit(1)).as("__rows")) ++
      df.columns.toSeq.map(c => sum(col(c).isNull.cast("long")).as(s"${c}__nulls")) ++
      numericCols.flatMap { c => Seq(
        count(col(c)).as(s"${c}__cnt"),
        avg(col(c)).as(s"${c}__avg"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        stddev_samp(col(c)).as(s"${c}__sd"))
      } ++
      stringCols.flatMap { c => Seq(
        count(col(c)).as(s"${c}__scnt"),
        avg(length(col(c))).as(s"${c}__lavg"),
        min(length(col(c))).cast("long").as(s"${c}__lmin"),
        max(length(col(c))).cast("long").as(s"${c}__lmax"))
      }
    val row = df.select(aggs: _*).head()
    def d(name: String): Double = {
      val v = row.getAs[Any](name)
      if (v == null) Double.NaN else v.toString.toDouble
    }
    val total = row.getAs[Long]("__rows")
    val nulls = df.columns.map(c => c -> row.getAs[Long](s"${c}__nulls")).toMap
    val numeric = numericCols.map { c =>
      NumericStats(c, row.getAs[Long](s"${c}__cnt"), nulls(c),
        d(s"${c}__avg"), d(s"${c}__min"), d(s"${c}__max"), d(s"${c}__sd"))
    }
    // short strings profile as categoricals, long ones as text — routed by
    // the avg lengths already computed in pass 1
    val (catCols, textCols) = stringCols.partition(c =>
      Option(row.getAs[Any](s"${c}__lavg")).forall(_.toString.toDouble <= 32))
    val text = textCols.map { c =>
      TextStats(c, row.getAs[Long](s"${c}__scnt"), d(s"${c}__lavg"),
        if (row.isNullAt(row.fieldIndex(s"${c}__lmin"))) 0L
        else row.getAs[Long](s"${c}__lmin"),
        if (row.isNullAt(row.fieldIndex(s"${c}__lmax"))) 0L
        else row.getAs[Long](s"${c}__lmax"))
    }
    // pass 2 (r17): every categorical column's distinct count AND top-k in
    // ONE job over ONE scan. The r16 shape ran a multi-distinct Expand job
    // (pass 2) plus one partial-agg + TakeOrdered job PER categorical
    // column (pass 3) — N+1 jobs and N+1 scans of the (cached) projection.
    // Here the columns melt into (colIdx, value) cells — the same
    // rows × #catCols flow the Expand already paid — one hash aggregation
    // produces the exact global count per distinct cell, and a bounded
    // mapPartitions pass over THOSE aggregated rows (cardinality = distinct
    // values, never input rows) emits each task's per-column top-k
    // candidates plus a per-column distinct-count partial. The driver
    // merges: the global top-k is a subset of the union of per-task top-ks
    // because each (col, value) row already carries its exact global count,
    // and the partials sum to the exact distinct count. No single-task
    // sort of a high-cardinality column (an id-like categorical keeps its
    // ranking distributed), driver traffic ≤ tasks × #cols × (topK + 1)
    // rows. Ordering matches categoricalTopK exactly: count desc, value
    // asc under Spark's UTF8 binary collation (UTF8String.compareTo, NOT
    // java.lang.String order — they diverge past the BMP).
    val categorical =
      if (catCols.isEmpty) Seq.empty[CategoricalStats]
      else {
        import org.apache.spark.unsafe.types.UTF8String
        val spark = df.sparkSession
        import spark.implicits._
        val cells = df
          .select(explode(array(catCols.zipWithIndex.map { case (c, i) =>
            struct(lit(i).as("i"), col(c).as("v")) }: _*)).as("c"))
          .select(col("c.i").as("__i"), col("c.v").as("__v"))
          .filter(col("__v").isNotNull)
          .groupBy(col("__i"), col("__v"))
          .agg(count(lit(1)).as("__n"))
        // candidate is BETTER than the kept worst when count is higher, or
        // equal-count and binary-lower value
        def better(a: (Long, String), b: (Long, String)): Boolean =
          a._1 > b._1 || (a._1 == b._1 &&
            UTF8String.fromString(a._2).compareTo(UTF8String.fromString(b._2)) < 0)
        val k = topK
        val merged = cells.toDF("_1", "_2", "_3")
          .as[(Int, String, Long)].mapPartitions { it =>
          // max-heap keyed "worst first" so head is the eviction candidate
          val worstFirst = new Ordering[(Long, String)] {
            def compare(a: (Long, String), b: (Long, String)): Int = {
              val c = java.lang.Long.compare(b._1, a._1)
              if (c != 0) c
              else UTF8String.fromString(a._2)
                .compareTo(UTF8String.fromString(b._2))
            }
          }
          val heaps = scala.collection.mutable.Map
            .empty[Int, scala.collection.mutable.PriorityQueue[(Long, String)]]
          val dist = scala.collection.mutable.Map.empty[Int, Long]
          it.foreach { case (i, v, n) =>
            dist.update(i, dist.getOrElse(i, 0L) + 1L)
            // k <= 0 keeps the top list empty (the pre-r17 limit(topK)
            // semantics); without the guard the else branch reads h.head
            // off an empty heap
            if (k > 0) {
              val h = heaps.getOrElseUpdate(i,
                scala.collection.mutable.PriorityQueue.empty(worstFirst))
              if (h.size < k) h.enqueue((n, v))
              else if (better((n, v), h.head)) { h.dequeue(); h.enqueue((n, v)) }
            }
          }
          heaps.iterator.flatMap { case (i, h) =>
            h.iterator.map { case (n, v) => (i, v, n) }
          } ++ dist.iterator.map { case (i, d0) => (i, null: String, d0) }
        }.collect()
        val distByCol = merged.iterator.filter(_._2 == null)
          .toSeq.groupBy(_._1).map { case (i, rs) => i -> rs.map(_._3).sum }
        val candsByCol = merged.iterator.filter(_._2 != null)
          .toSeq.groupBy(_._1)
        // percentage identical to the Spark round(x, 2) the per-column
        // TakeOrdered computed: BigDecimal.valueOf + HALF_UP
        def pct(n: Long): Double =
          if (total == 0) Double.NaN
          else java.math.BigDecimal.valueOf(n * 100.0 / total)
            .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
        catCols.zipWithIndex.map { case (c, i) =>
          val top = candsByCol.getOrElse(i, Seq.empty)
            .map { case (_, v, n) => (n, v) }
            .sortWith(better).take(k)
            .map { case (n, v) => (v, n, pct(n)) }
          CategoricalStats(c, top, distByCol.getOrElse(i, 0L))
        }
      }
    TableProfile(rows = total, nulls = nulls, numeric = numeric,
      categorical = categorical, text = text)
  }

  /** JSON stats sink (the reference's `sampling_analysis.json` shape,
    * `reports/sampling_analysis.json:1-246`) — driver-side serialization of
    * the collected profile; tiny, so no JSON library needed.
    */
  def renderJson(name: String, p: TableProfile): String = {
    def esc(s: String) =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    def num(d: Double) = if (d.isNaN || d.isInfinite) "null" else d.toString
    val nulls = p.nulls.toSeq.sortBy(_._1)
      .map { case (c, n) => s""""${esc(c)}": $n""" }.mkString(", ")
    val numeric = p.numeric.map { s0 =>
      s"""{"column": "${esc(s0.column)}", "count": ${s0.count}, "nulls": ${s0.nulls}, "mean": ${num(s0.mean)}, "min": ${num(s0.min)}, "max": ${num(s0.max)}, "stddev": ${num(s0.stddev)}}"""
    }.mkString(", ")
    val categorical = p.categorical.map { c =>
      val top = c.top.map { case (v, n, pc) =>
        s"""{"value": "${esc(v)}", "count": $n, "pct": ${num(pc)}}""" }.mkString(", ")
      s"""{"column": "${esc(c.column)}", "distinct": ${c.distinct}, "top": [$top]}"""
    }.mkString(", ")
    val text = p.text.map { t =>
      s"""{"column": "${esc(t.column)}", "count": ${t.count}, "avg_len": ${num(t.avgLen)}, "min_len": ${t.minLen}, "max_len": ${t.maxLen}}"""
    }.mkString(", ")
    s"""{"dataset": "${esc(name)}", "rows": ${p.rows}, "nulls": {$nulls}, "numeric": [$numeric], "categorical": [$categorical], "text": [$text]}"""
  }

  /** Cross-dataset summary (the reference's `generate_summary_report`,
    * `gbr.py:747-814`): one comparison row per dataset from already-collected
    * profiles — pure driver-side reuse, no new jobs.
    */
  def renderSummaryMarkdown(profiles: Seq[(String, TableProfile)]): String = {
    val sb = new StringBuilder
    sb.append("# Summary report\n\n| dataset | rows |")
    val numCols = profiles.headOption.map(_._2.numeric.map(_.column)).getOrElse(Seq.empty)
    numCols.foreach(c => sb.append(s" avg($c) |"))
    sb.append("\n|---|---|").append(numCols.map(_ => "---|").mkString).append("\n")
    profiles.foreach { case (name, p) =>
      sb.append(s"| $name | ${p.rows} |")
      numCols.foreach { c =>
        val m = p.numeric.find(_.column == c).map(_.mean).getOrElse(Double.NaN)
        sb.append(f" $m%.4f |")
      }
      sb.append("\n")
    }
    sb.append("\n## Consistency across scales\n\n")
    numCols.foreach { c =>
      val means = profiles.flatMap { case (_, p) => p.numeric.find(_.column == c).map(_.mean) }
        .filterNot(_.isNaN)
      if (means.nonEmpty) {
        val spread = means.max - means.min
        sb.append(f"- $c: mean spread across datasets = $spread%.4f\n")
      }
    }
    sb.toString
  }

  /** File metadata probe (reference `gbr.py:61-63`): dataset size on disk in
    * MB via the Hadoop FileSystem API (works for local paths and object
    * stores alike).
    */
  def fileSizeMb(df: DataFrame, path: String): Double = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.getContentSummary(p).getLength / (1024.0 * 1024.0)
  }

  /** Markdown rendering (the reference's report sink,
    * `gbr.py:555-745`) — driver-side string templating, not an operator.
    */
  def renderMarkdown(name: String, p: TableProfile): String = {
    val sb = new StringBuilder
    sb.append(s"# Dataset profile: $name\n\n")
    sb.append(s"- rows: ${p.rows}\n\n## Null profile\n\n")
    p.nulls.toSeq.sortBy(_._1).foreach { case (c, n) =>
      sb.append(f"- $c: $n nulls (${if (p.rows == 0) 0.0 else n * 100.0 / p.rows}%.2f%%)\n") }
    sb.append("\n## Numeric columns\n\n| column | count | nulls | mean | min | max | stddev |\n|---|---|---|---|---|---|---|\n")
    p.numeric.foreach(s0 => sb.append(
      f"| ${s0.column} | ${s0.count} | ${s0.nulls} | ${s0.mean}%.4f | ${s0.min}%.4f | ${s0.max}%.4f | ${s0.stddev}%.4f |\n"))
    sb.append("\n## Categorical columns\n\n")
    p.categorical.foreach { c =>
      sb.append(s"### ${c.column} (${c.distinct} distinct)\n\n")
      c.top.foreach { case (v, n, pc) => sb.append(s"- $v: $n ($pc%)\n") }
      sb.append("\n")
    }
    sb.append("## Text columns\n\n| column | count | avg_len | min_len | max_len |\n|---|---|---|---|---|\n")
    p.text.foreach(t => sb.append(
      f"| ${t.column} | ${t.count} | ${t.avgLen}%.1f | ${t.minLen} | ${t.maxLen} |\n"))
    sb.toString
  }

  /** Population stability index between two samples of `valueCol` — the
    * standard drift monitor between a reference snapshot and today's data
    * (or two segments): PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b) over a fixed
    * equi-width binning of [lo, hi] (out-of-range values clamp into the edge
    * bins; nulls are excluded). Rule of thumb: < 0.1 stable, 0.1–0.25
    * moderate shift, > 0.25 drifted. Bins are Laplace-smoothed (+0.5) so an
    * empty bin on one side contributes a finite term instead of ±∞.
    *
    * Each input reduces to ≤ `bins` count rows in one hash aggregation —
    * two scans total, everything after is constant-size. Output: one row
    * (psi, n_a, n_b).
    */
  def psi(a: DataFrame, b: DataFrame, valueCol: String,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 1 && hi > lo)
    def hist(df: DataFrame, name: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(least(greatest(floor((col(valueCol).cast("double") - lit(lo)) /
            lit(hi - lo) * bins), lit(0)), lit(bins - 1)).cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(name))
    // every bin participates, present in the data or not: the smoothing
    // denominator assumes `bins` cells, so a bin empty on BOTH sides still
    // owes its (smoothed) term — dropping it would understate PSI whenever
    // the sample sizes differ. Also guarantees the documented one-row
    // output even for empty inputs.
    val allBins = a.sparkSession.range(0, bins).select(col("id").as("bin"))
    val j = allBins
      .join(hist(a, "na"), Seq("bin"), "left")
      .join(hist(b, "nb"), Seq("bin"), "left")
      .select(coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    // totals via an unbounded window over the ≤`bins`-row histogram frame:
    // one single-partition pass over constant-size data, so each INPUT is
    // scanned exactly once per evaluation (a separate totals aggregate
    // would re-run the whole histogram plan — doubling per-micro-batch
    // source reads in EventPipeline.driftMonitor)
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val smooth = bins * 0.5
    j.select(col("na"), col("nb"),
        sum(col("na")).over(w).as("ta"), sum(col("nb")).over(w).as("tb"))
      .select(col("ta"), col("tb"),
        ((col("na") + 0.5) / (col("ta") + lit(smooth))).as("pa"),
        ((col("nb") + 0.5) / (col("tb") + lit(smooth))).as("pb"))
      .groupBy(col("ta"), col("tb"))
      .agg((round(sum((col("pa") - col("pb")) * log(col("pa") / col("pb"))), 6)
        + 0.0).as("psi"))
      .select(col("psi"), col("ta").as("n_a"), col("tb").as("n_b"))
  }

  /** Schema-evolution audit between two snapshots of a table: columns
    * added, removed, or retyped (by name; nullability changes count as a
    * retype). Pure driver-side metadata — no job runs. Pairs with [[psi]]:
    * psi watches the values drift, schemaDiff watches the shape drift.
    */
  def schemaDiff(before: DataFrame, after: DataFrame): Seq[(String, String)] = {
    val b = before.schema.map(f => f.name -> f).toMap
    val a = after.schema.map(f => f.name -> f).toMap
    val added = (a.keySet -- b.keySet).toSeq.sorted.map(n =>
      n -> s"added ${a(n).dataType.simpleString}")
    val removed = (b.keySet -- a.keySet).toSeq.sorted.map(n =>
      n -> s"removed ${b(n).dataType.simpleString}")
    val retyped = (a.keySet & b.keySet).toSeq.sorted.flatMap { n =>
      if (a(n).dataType != b(n).dataType)
        Some(n -> s"retyped ${b(n).dataType.simpleString} -> ${a(n).dataType.simpleString}")
      else if (a(n).nullable != b(n).nullable)
        Some(n -> s"nullability ${b(n).nullable} -> ${a(n).nullable}")
      else None
    }
    added ++ removed ++ retyped
  }

  /** Referential-integrity audit over a set of FK edges — the constraint
    * check a lakehouse has no engine to enforce: per edge, child row count,
    * orphan count (child FK with no parent), distinct FK values, and
    * distinct parent keys. Each edge is one left join against the DISTINCT
    * non-null parent keys (broadcast when small, shuffled on the key
    * otherwise — both sides key-uniform) folded into a single aggregation
    * row; the edges union into one report. Null FKs count as orphans (an
    * unresolvable reference is broken whether missing or dangling); null
    * parent keys are not joinable and are excluded from `n_parent`. The
    * distinct-keys frame is localCheckpointed so its shuffle runs once, not
    * once per consumer — and, unlike a persist, the blocks release
    * themselves via the context cleaner when the audit frame is dropped
    * instead of pinning every parent table's key set in the cache for the
    * rest of the session.
    */
  def fkAudit(edges: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(edges.nonEmpty)
    // Each edge aggregates the child by fk FIRST (one exchange whose
    // map-side combine collapses repeated keys), so the parent join and
    // the final roll-up run over distinct fks, not child rows:
    //   n_child    = Σ per-fk counts (null fk group included)
    //   orphans    = Σ counts of fk groups with no parent match (a null
    //                fk never equi-matches, same as the row-level join)
    //   distinct_fk = count of non-null fk groups
    // Equivalent to the previous row-level left join + countDistinct
    // (which planned a two-round aggregate and shuffled every child row
    // through the join), and the per-edge eager localCheckpoint of the
    // parent key set is gone — the edges now plan into one lazy union
    // instead of 6 blocking driver-sequenced materializations.
    edges.map { case (name, child, fk, parent, pk) =>
      val parents = parent.select(col(pk).as("__pk"))
        .filter(col("__pk").isNotNull).distinct()
      child.select(col(fk)).groupBy(col(fk)).agg(count(lit(1)).as("__cnt"))
        .join(parents, col(fk) === col("__pk"), "left")
        .agg(coalesce(sum(col("__cnt")), lit(0L)).as("n_child"),
          coalesce(sum(when(col("__pk").isNull, col("__cnt"))), lit(0L))
            .as("orphans"),
          count(col(fk)).as("distinct_fk"))
        .crossJoin(broadcast(parents.agg(count(lit(1)).as("n_parent"))))
        .select(lit(name).as("edge"), col("n_child"), col("orphans"),
          col("distinct_fk"), col("n_parent"))
    }.reduce(_ unionByName _)
  }

  /** Cross-scale sampling-consistency validator (reference
    * `scripts/generate_benchmark_reports.py:731-740`,
    * `reports/sampling_analysis.json`): the reference's only cross-variant
    * correctness notion is "statistics agree across the 10k→10M size
    * variants within tolerance". This is that check as an operator with a
    * machine-readable verdict: for each non-baseline variant and each
    * numeric column, compare mean / stddev / null-fraction to the baseline
    * (the first frame) and flag whether the relative deviation is within
    * `tolerance`.
    *
    * One single-row aggregation per variant (decimal sums — exact and
    * order-independent, so the verdict is deterministic on any cluster
    * layout), unpivoted to (column, metric) rows and joined to the
    * baseline's; everything after the per-variant scan is constant-size.
    * Output: (variant, column, metric, value, base, rel_diff, within_tol),
    * ordered.
    */
  def consistencyVerdict(frames: Seq[(String, DataFrame)], cols: Seq[String],
      tolerance: Double): DataFrame = {
    require(frames.size >= 2 && cols.nonEmpty && tolerance >= 0)
    def statsLong(vname: String, df: DataFrame): DataFrame = {
      val aggs = cols.flatMap { c =>
        Seq(
          sum(col(c).cast("decimal(28,6)")).as(s"__s_$c"),
          sum(col(c).cast("decimal(18,3)") * col(c).cast("decimal(18,3)"))
            .as(s"__s2_$c"),
          count(col(c)).as(s"__n_$c"))
      } :+ count(lit(1)).as("__t")
      val metrics = cols.flatMap { c =>
        val n = col(s"__n_$c").cast("double")
        val m = col(s"__s_$c").cast("double") / n
        val sd = sqrt(greatest(
          col(s"__s2_$c").cast("double") / n - m * m, lit(0.0)))
        val nf = (col("__t") - col(s"__n_$c")).cast("double") / col("__t")
        Seq(
          struct(lit(c).as("column"), lit("mean").as("metric"), m.as("value")),
          struct(lit(c).as("column"), lit("stddev").as("metric"), sd.as("value")),
          struct(lit(c).as("column"), lit("null_frac").as("metric"), nf.as("value")))
      }
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(metrics: _*)).as("st"))
        .select(lit(vname).as("variant"), col("st.column").as("column"),
          col("st.metric").as("metric"), col("st.value").as("value"))
    }
    val base = statsLong(frames.head._1, frames.head._2)
      .select(col("column"), col("metric"), col("value").as("__base"))
    frames.tail.map { case (n, df) => statsLong(n, df) }
      .reduce(_ unionByName _)
      .join(base, Seq("column", "metric"))
      .select(col("variant"), col("column"), col("metric"),
        (round(col("value"), 6) + 0.0).as("value"),
        (round(col("__base"), 6) + 0.0).as("base"),
        (round(abs(col("value") - col("__base")) /
          greatest(abs(col("__base")), lit(1e-12)), 6) + 0.0).as("rel_diff"))
      .withColumn("within_tol", col("rel_diff") <= tolerance)
      .orderBy(col("variant"), col("column"), col("metric"))
  }
}
