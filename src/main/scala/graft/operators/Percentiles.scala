package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.jdk.CollectionConverters._

/** Exact grouped percentiles via distributed order statistics — the scale
  * path for exact quantiles over few, huge groups.
  *
  * Spark's built-in `percentile`/`median` aggregate buffers every (value →
  * count) per group in an in-memory map inside ObjectHashAggregate: memory
  * ∝ distinct values per group, no whole-stage codegen, and a near-unique
  * column at 100 TB OOMs the reducers. A plain
  * `row_number().over(Window.partitionBy(group))` fixes memory but routes
  * each ENTIRE group through one task's sort — with 6 `l_returnflag`-style
  * groups that is table/6 bytes through a single spillable sort, a
  * wall-clock scale-killer. This formulation keeps every task's share
  * bounded by the range partitioning instead:
  *
  *   1. range-partition the (group, value) projection on BOTH columns —
  *      each group spans many partitions, each partition holds a contiguous
  *      value range of (at most) one group boundary;
  *   2. per-partition local ranks via a window keyed on
  *      (partition id, group) — parallelism = number of range partitions,
  *      never number of groups;
  *   3. global rank = local rank + a broadcast per-(partition, group)
  *      cumulative offset (the tiny `partitions × groups` count table);
  *   4. each row decides locally whether it is one of the ≤ 2 support
  *      points of a requested percentile and contributes its interpolated
  *      share; an ordinary partial+final hash aggregation sums them.
  *
  * The projection is persisted (MEMORY_AND_DISK) while ranks are computed:
  * range bounds are derived by sampling seeded on the RDD id, so two
  * independent materializations could disagree on partition ids — the
  * cache pins one consistent assignment for the offset join. The final
  * result is one row per group by construction, so it is materialized
  * before returning and the cache released deterministically.
  *
  * Semantics match `percentile(v, p)` exactly: linear interpolation at
  * rank position (n−1)·p, nulls excluded. Null group keys are supported
  * (the group is carried as a one-field struct, whose equality treats a
  * null field as a plain value).
  */
object Percentiles {

  /** Internal scale path: global ranks per (group, value) row.
    *
    * Returns `(ranked, cached)` where `ranked` has columns
    * `__gk` (one-field struct of the group), `__v`, `__pid`, `__rn`
    * (0-based global rank within group, double), `__n` (group size) and
    * `cached` is the persisted projection the caller must unpersist after
    * consuming `ranked`.
    */
  private[graft] def globalRanks(df: DataFrame, groupCol: String,
      valueCol: String, numPartitions: Int): (DataFrame, DataFrame) = {
    val (localRanked, parted, cnts) = rankParts(df, groupCol, valueCol,
      numPartitions)
    (joinOffsets(localRanked, distributedOffsets(cnts)), parted)
  }

  /** Shared first half of the rank pipeline: the cached range-partitioned
    * projection, its per-chunk local ranks, and the per-(partition, group)
    * count table the offsets derive from.
    */
  private def rankParts(df: DataFrame, groupCol: String, valueCol: String,
      numPartitions: Int): (DataFrame, DataFrame, DataFrame) = {
    val nParts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df
      .select(struct(col(groupCol)).as("__gk"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .repartitionByRange(nParts, col("__gk"), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    val byChunk = Window.partitionBy(col("__pid"), col("__gk"))
    val localRanked = parted.withColumn("__lrn",
      row_number().over(byChunk.orderBy(col("__v"))).cast("long") - 1)

    val cnts = parted.groupBy(col("__pid"), col("__gk"))
      .agg(count(lit(1)).as("__c"))
    (localRanked, parted, cnts)
  }

  /** Offsets as a lazy window over the count table — self-consistent under
    * recomputation (the offsets subplan re-derives from the same in-plan
    * data even if the cache is gone and the range exchange resamples), so
    * it is the only safe shape for rank frames that OUTLIVE the pinned
    * cache (the lazy return path, and [[globalRanks]]' callers).
    */
  private def distributedOffsets(cnts: DataFrame): DataFrame = {
    val byGroup = Window.partitionBy(col("__gk"))
    cnts.select(col("__pid"), col("__gk"),
      (sum(col("__c")).over(byGroup.orderBy(col("__pid"))) - col("__c"))
        .as("__off"),
      sum(col("__c")).over(byGroup).as("__n"))
  }

  private def joinOffsets(localRanked: DataFrame,
      offsets: DataFrame): DataFrame =
    localRanked.join(broadcast(offsets), Seq("__pid", "__gk"))
      .withColumn("__rn", (col("__off") + col("__lrn")).cast("double"))

  /** Driver-side offsets: the count table is `partitions × groups` rows and
    * ends up broadcast into the rank join either way, so collecting it and
    * computing the cumulative offsets (plus the group count) on the driver
    * costs no extra pass — the previous shape ran a window over the count
    * table inside the broadcast subplan AND a separate
    * approx_count_distinct scan of the cache just to decide result
    * materialization. ONLY valid while the cache stays pinned (the frozen
    * pid assignment): eager consumption inside [[grouped]], never the lazy
    * return path. Returns None past [[maxDriverOffsetRows]] rows — the
    * caller falls back to [[distributedOffsets]].
    */
  private def driverOffsets(spark: org.apache.spark.sql.SparkSession,
      cnts: DataFrame): Option[(DataFrame, Long)] = {
    val probe = cnts.limit(maxDriverOffsetRows + 1).collect()
    if (probe.length > maxDriverOffsetRows) return None
    val gkType = cnts.schema("__gk").dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__gk", gkType,
        nullable = false),
      org.apache.spark.sql.types.StructField("__off",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__n",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows = probe.groupBy(_.get(1)).iterator.flatMap { case (_, g) =>
      val ordered = g.sortBy(_.getInt(0))
      val total = ordered.iterator.map(_.getLong(2)).sum
      var off = 0L
      ordered.iterator.map { r =>
        val o = off
        off += r.getLong(2)
        Row(r.getInt(0), r.get(1), o, total)
      }
    }.toSeq
    Some((spark.createDataFrame(rows.asJava, schema),
      probe.iterator.map(_.get(1)).toSet.size.toLong))
  }

  /** Bound on the per-(partition, group) count rows computed driver-side in
    * [[driverOffsets]] — above it the offsets stay distributed. The table
    * is broadcast into the rank join regardless, so this bound is the same
    * order as what the broadcast already implies.
    */
  private val maxDriverOffsetRows: Int = 1 << 20

  /** One output row per group: the requested percentiles of `valueCol` as
    * columns named per `names` (defaults p0, p1, …). `numPartitions` sizes
    * the range partitioning (0 → `spark.sql.shuffle.partitions`).
    */
  def grouped(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], names: Seq[String] = Seq.empty,
      numPartitions: Int = 0, maxCollectGroups: Long = 100000L): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val outNames =
      if (names.nonEmpty) { require(names.length == ps.length); names }
      else ps.indices.map(i => s"p$i")

    val (localRanked, cached, cnts) = rankParts(df, groupCol, valueCol,
      numPartitions)
    val aggs = ps.zip(outNames).map { case (p, name) =>
      val pos = (col("__n") - 1).cast("double") * lit(p)
      val lo = floor(pos)
      val hi = ceil(pos)
      val frac = pos - lo
      sum(
        when(lo === hi && col("__rn") === lo, col("__v"))
          .when(col("__rn") === lo, col("__v") * (lit(1.0) - frac))
          .when(col("__rn") === hi, col("__v") * frac)
          .otherwise(lit(0.0))).as(name)
    }
    def result(offsets: DataFrame): DataFrame =
      joinOffsets(localRanked, offsets).groupBy(col("__gk"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col(s"__gk.$groupCol").as(groupCol) +: outNames.map(col): _*)
    // The driver-side offsets probe doubles as the group-count check (one
    // count-table collect instead of a window subplan plus a separate
    // approx_count_distinct pass over the cache).
    //
    // Intended regime: few, huge groups → one row per group is tiny, so
    // materialize the result and release the cache deterministically. A
    // high-cardinality groupCol would make that collect a driver OOM —
    // return the lazy cache-backed frame instead, built on the
    // DISTRIBUTED offsets (self-consistent if the cache is released and
    // the range exchange resamples; driver-frozen offsets would go stale).
    driverOffsets(df.sparkSession, cnts) match {
      case Some((offsets, nGroups)) if nGroups <= maxCollectGroups =>
        val r = result(offsets)
        val rows = r.collect()
        val schema = r.schema
        cached.unpersist(blocking = false)
        df.sparkSession.createDataFrame(rows.toSeq.asJava, schema)
      case _ =>
        result(distributedOffsets(cnts))
    }
  }

  /** Winsorization: clamp `valueCol` into its per-group [pLo, pHi]
    * percentile band — the robust-statistics answer to heavy-tailed columns
    * (a price column whose max is 2,600× its mean distorts every plain
    * moment; see the reference's own price tails). Bounds come from
    * [[grouped]] (range-partitioned exact order statistics, so the same
    * scale guarantees apply) and are rounded to `boundScale` decimals so
    * the clamped values stay exact in fixed-point across engines; the
    * bounds table is one tiny row per group, broadcast back onto the scan —
    * the second pass is a narrow map, no extra shuffle. Adds
    * `<valueCol>_w` (clamped value), keeps all input columns.
    */
  def winsorized(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95, boundScale: Int = 2): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi)
    val bounds = grouped(df, groupCol, valueCol, Seq(pLo, pHi),
        Seq("__lo", "__hi"))
      .select(col(groupCol).as("__wg"), round(col("__lo"), boundScale).as("__lo"),
        round(col("__hi"), boundScale).as("__hi"))
    // null-SAFE join: grouped() treats a null group key as its own group, so
    // the clamp must too (a plain equi-join would silently drop those rows).
    // Null values stay null — greatest/least skip nulls, which would
    // otherwise fabricate the p-lo bound for a missing measurement.
    df.join(broadcast(bounds), df(groupCol) <=> bounds("__wg"), "left")
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__wg", "__lo", "__hi")
  }

  /** Equi-DEPTH histogram: `nBuckets` buckets holding ≈ equal row counts,
    * with data-derived boundaries at the 1/n … (n−1)/n quantiles — the
    * DB-statistics standard for skewed columns, where the equi-width
    * histogram (reference `gbr.py` plots) wastes most bins on empty tail
    * ranges. Boundaries come from the range-partitioned exact quantiles
    * ([[grouped]]), then bucket assignment is a narrow when-chain over
    * broadcast literals — second pass is map-only. Values equal to a
    * boundary land in the lower bucket; nulls are excluded. Output:
    * (bucket, n, min_v, max_v).
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 1)
    val nonNull = df.filter(col(valueCol).isNotNull)
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val boundsRows = grouped(nonNull.withColumn("__g", lit(1)), "__g",
      valueCol, ps).collect()
    require(boundsRows.nonEmpty,
      s"equiDepthHistogram: no non-null values in '$valueCol'")
    // boundaries round to fixed-point before bucketing (the winsorized
    // convention): quantile interpolation can differ by 1 ulp across
    // engines, and an unrounded boundary would flip every tied row's bucket
    val bs = (1 until nBuckets).map(i =>
      BigDecimal(boundsRows.head.getDouble(i))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val first = when(col(valueCol) <= lit(bs.head), lit(0))
    val bucket = bs.tail.zipWithIndex.foldLeft(first) {
      case (acc, (b, i)) => acc.when(col(valueCol) <= lit(b), lit(i + 1))
    }.otherwise(lit(nBuckets - 1))
    nonNull.groupBy(bucket.cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("min_v"), max(col(valueCol)).as("max_v"))
  }
}
