package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, SparkSession}

/** Relational operator inventory over the TPC-H-ish star schema: scans with
  * pushdown, conjunctive filters, every join shape (broadcast-hash dim joins,
  * shuffled fact joins, semi/anti/outer), hash aggregation, window functions,
  * top-k (`TakeOrderedAndProject`), set ops, scalar string/math/date
  * functions, histograms and moment statistics.
  *
  * These back the profiling surface of the reference
  * (`scripts/generate_benchmark_reports.py:119-219` — count/avg/min/max/
  * stddev, grouped top-10 frequency with percentage, histogram binning) and
  * the correctness gate's star-schema suite.
  */
object RelationalQueries {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def pct(c: Column): Column = c.cast(DecimalType(3, 2))
  /** Order-independent exact sum of a 2-decimal double column. */
  private def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  val all: Seq[QueryDef] = Seq(

    // ---- aggregation core (reference gbr.py:119-219 stat shapes) ----
    QueryDef(
      "q01_pricing_summary",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val discPrice = dec2(col("l_extendedprice")) * (lit(1) - pct(col("l_discount")))
        val charge = discPrice * (lit(1) + pct(col("l_tax")))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(discPrice).cast("double").as("sum_disc_price"),
            sum(charge).cast("double").as("sum_charge"),
            (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            (sum(pct(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
        sum(l_quantity) / count(*) AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*) AS avg_disc,
        count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- scan + filter pushdown + top-k without global sort ----
    QueryDef(
      "q02_filtered_topk",
      (s, d) => {
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_quantity") > 30)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
          .limit(50)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 30
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 50""")),

    // ---- fact-to-fact join + grouped revenue + top-k ----
    QueryDef(
      "q03_top_revenue_orders",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val revenue = dec2(col("l_extendedprice")) * (lit(1) - pct(col("l_discount")))
        o.filter(col("o_orderstatus") === "O")
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .select(col("o_orderkey"), col("o_orderdate").cast("string").as("o_date"),
            col("revenue"))
          .orderBy(desc("revenue"), col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_date,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // ---- broadcast-hash star join over dims ----
    QueryDef(
      "q04_region_rollup",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_cust,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ---- left-semi join (EXISTS) ----
    QueryDef(
      "q05_exists_orders",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- left-anti join (NOT EXISTS) ----
    QueryDef(
      "q06_anti_join_customers",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val n = Tables.nation(s, d)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY n_name ORDER BY n_name""")),

    // ---- left outer join preserving zero-count rows ----
    QueryDef(
      "q07_outer_order_counts",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    // ---- window: ranking within partition ----
    QueryDef(
      "q08_window_top2",
      (s, d) => {
        val o = Tables.orders(s, d)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t WHERE rn <= 2 ORDER BY o_custkey, rn""")),

    // ---- window: running total (frame spec) ----
    QueryDef(
      "q09_running_total",
      (s, d) => {
        val o = Tables.orders(s, d)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(col("o_custkey"), col("o_orderkey"),
            sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---- set operations ----
    QueryDef(
      "q10_union_custkeys",
      (s, d) => {
        val c = Tables.customer(s, d)
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .union(c.filter(col("c_acctbal") > 9000).select("c_custkey"))
          .distinct()
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        ORDER BY c_custkey""")),

    QueryDef(
      "q11_intersect_custkeys",
      (s, d) => {
        val c = Tables.customer(s, d)
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .intersect(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        ORDER BY c_custkey""")),

    QueryDef(
      "q12_except_custkeys",
      (s, d) => {
        val c = Tables.customer(s, d)
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .except(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        ORDER BY c_custkey""")),

    // ---- distinct aggregation ----
    QueryDef(
      "q13_distinct_parts",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- scalar string functions ----
    QueryDef(
      "q14_string_funcs",
      (s, d) => {
        Tables.part(s, d).select(
            col("p_partkey"),
            upper(substring(col("p_name"), 1, 8)).as("pfx"),
            length(col("p_name")).cast("long").as("name_len"),
            concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
            lower(col("p_type")).as("type_lower"),
            regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_us"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, upper(substr(p_name, 1, 8)) AS pfx,
        CAST(length(p_name) AS BIGINT) AS name_len,
        concat(p_brand, '#', p_type) AS brand_type,
        lower(p_type) AS type_lower,
        replace(p_name, ' ', '_') AS name_us
        FROM part ORDER BY p_partkey""")),

    // ---- scalar math functions (transcendentals under rounded aggregates) ----
    QueryDef(
      "q15_math_funcs",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(avg(log(lit(1) + col("l_quantity"))), 6).as("avg_ln_qty"),
            round(avg(log10(col("l_extendedprice"))), 6).as("avg_log10_price"),
            round(avg(sqrt(col("l_quantity"))), 6).as("avg_sqrt_qty"),
            round(avg(exp(col("l_discount"))), 6).as("avg_exp_disc"),
            sum(floor(col("l_extendedprice")).cast("long")).as("sum_floor_price"),
            sum(ceil(col("l_quantity")).cast("long")).as("sum_ceil_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        round(avg(ln(1 + l_quantity)), 6) AS avg_ln_qty,
        round(avg(log10(l_extendedprice)), 6) AS avg_log10_price,
        round(avg(sqrt(l_quantity)), 6) AS avg_sqrt_qty,
        round(avg(exp(l_discount)), 6) AS avg_exp_disc,
        CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_floor_price,
        CAST(sum(CAST(ceil(l_quantity) AS BIGINT)) AS BIGINT) AS sum_ceil_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- date functions ----
    QueryDef(
      "q16_orders_by_month",
      (s, d) => {
        Tables.orders(s, d)
          .groupBy(year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("y"), col("m"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        CAST(month(o_orderdate) AS BIGINT) AS m, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY y, m ORDER BY y, m""")),

    // ---- histogram binning (gbr.py:287-354 hist shapes) ----
    QueryDef(
      "q17_price_histogram",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(floor(col("l_extendedprice") / 10000).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
        count(*) AS n FROM lineitem GROUP BY bucket ORDER BY bucket""")),

    // ---- moment statistics via exact decimal sums: stddev + Pearson corr
    // (gbr.py:168-187 numeric profile, gbr.py:372-373 correlation matrix) ----
    QueryDef(
      "q18_moment_stats",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val sums = li.agg(
          count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("sx"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sy"),
          sum(dec2(col("l_quantity")) * dec2(col("l_quantity"))).cast("double").as("sxx"),
          sum(dec2(col("l_extendedprice")) * dec2(col("l_extendedprice"))).cast("double").as("syy"),
          sum(dec2(col("l_quantity")) * dec2(col("l_extendedprice"))).cast("double").as("sxy"))
        sums.select(
          col("n"),
          round((col("sx") / col("n")), 6).as("mean_qty"),
          round((col("sy") / col("n")), 6).as("mean_price"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6).as("sd_qty"),
          round(sqrt((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)), 6).as("sd_price"),
          (round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6) + 0.0).as("corr_qty_price"))
      },
      Some("""WITH s AS (SELECT count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem)
        SELECT n, round(sx / n, 6) AS mean_qty, round(sy / n, 6) AS mean_price,
          round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS sd_qty,
          round(sqrt((syy - sy * sy / n) / (n - 1)), 6) AS sd_price,
          round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) + 0 AS corr_qty_price
        FROM s""")),

    // ---- exact median / percentiles (gbr.py:590 median) ----
    QueryDef(
      "q19_percentiles",
      (s, d) => {
        // range-partitioned exact percentiles (operators.Percentiles):
        // O(1) task memory AND multi-task parallelism per group vs the
        // builtin's per-group value map — same interpolation semantics
        graft.operators.Percentiles.grouped(
            Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
            Seq(0.5, 0.25, 0.75), Seq("med_raw", "p25_raw", "p75_raw"))
          .select(col("l_returnflag"),
            round(col("med_raw"), 4).as("med_price"),
            round(col("p25_raw"), 4).as("p25_price"),
            round(col("p75_raw"), 4).as("p75_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        round(median(l_extendedprice), 4) AS med_price,
        round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- winsorized robust moments: clamp the heavy price tail into the
    //      per-group [p05, p95] band (operators.Percentiles.winsorized),
    //      then decimal-exact mean + clamp count per q18's convention ----
    QueryDef(
      "q93_winsorized",
      (s, d) => {
        val w = graft.operators.Percentiles.winsorized(
          Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
          0.05, 0.95)
        w.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            (round(sum(dec2(col("l_extendedprice_w"))).cast("double") /
              count(lit(1)), 6) + 0.0).as("mean_w"),
            sum((col("l_extendedprice") =!= col("l_extendedprice_w"))
              .cast("long")).as("n_clamped"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH b AS (SELECT l_returnflag,
          round(quantile_cont(l_extendedprice, 0.05), 2) AS lo,
          round(quantile_cont(l_extendedprice, 0.95), 2) AS hi
          FROM lineitem GROUP BY l_returnflag),
        w AS (SELECT l.l_returnflag,
          least(greatest(l_extendedprice, lo), hi) AS wv,
          l_extendedprice <> least(greatest(l_extendedprice, lo), hi) AS clamped
          FROM lineitem l JOIN b USING (l_returnflag))
        SELECT l_returnflag, count(*) AS n,
          round(CAST(sum(CAST(wv AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) + 0
            AS mean_w,
          CAST(sum(CASE WHEN clamped THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
        FROM w GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Z-order (Morton) clustering key: coarse 2-D cell histogram over
    //      (quantity, price) — the layout lever that lets parquet row-group
    //      stats prune on EITHER predicate column (sources.Layout) ----
    QueryDef(
      "q94_zorder",
      (s, d) => {
        val z = graft.sources.Layout.zOrdered(
          Tables.lineitem(s, d), "l_quantity", "l_extendedprice", bits = 8)
        z.groupBy(shiftright(col("zval"), 10).as("cell"))
          .agg(count(lit(1)).as("n"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"))
          .orderBy(col("cell"))
      },
      Some {
        val terms = (0 until 8).map(b =>
          s"(((u >> $b) & 1) << ${2 * b}) + (((v >> $b) & 1) << ${2 * b + 1})")
          .mkString(" + ")
        raw"""WITH mm AS (SELECT min(l_quantity) AS alo, max(l_quantity) AS ahi,
            min(l_extendedprice) AS blo, max(l_extendedprice) AS bhi
            FROM lineitem),
          uv AS (SELECT l_quantity AS q, l_extendedprice AS p,
            CAST(least(greatest(floor((l_quantity - alo) / (ahi - alo) * 256), 0),
              255) AS BIGINT) AS u,
            CAST(least(greatest(floor((l_extendedprice - blo) / (bhi - blo) * 256),
              0), 255) AS BIGINT) AS v
            FROM lineitem, mm),
          z AS (SELECT q, p, $terms AS zval FROM uv)
          SELECT zval >> 10 AS cell, count(*) AS n,
            min(q) AS min_qty, max(q) AS max_qty,
            min(p) AS min_price, max(p) AS max_price
          FROM z GROUP BY cell ORDER BY cell"""
      }),

    // ---- heap-based top-k per group (functions.GroupTopK): bounded-buffer
    //      UDAF with map-side combine — no per-group sort, no Sort operator
    //      in the plan; contrast the window formulation of q08 ----
    QueryDef(
      "q95_group_topk",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("rid",
            col("l_orderkey") * 100 + col("l_linenumber").cast("long"))
        graft.functions.GroupTopK.perGroup(
            li, "l_returnflag", "l_extendedprice", "rid", k = 3)
          .orderBy(col("l_returnflag"), col("rank"))
      },
      Some("""WITH t AS (SELECT l_returnflag,
          l_extendedprice, l_orderkey * 100 + l_linenumber AS rid
          FROM lineitem),
        r AS (SELECT l_returnflag, l_extendedprice, rid,
          row_number() OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice DESC, rid) AS rank
          FROM t)
        SELECT l_returnflag, rank, l_extendedprice, rid FROM r WHERE rank <= 3
        ORDER BY l_returnflag, rank""")),

    // ---- equi-depth histogram (Percentiles.equiDepthHistogram): 8 buckets
    //      of ~equal count with quantile boundaries — the skew-robust
    //      complement to q17's equi-width bins ----
    QueryDef(
      "q99_equidepth",
      (s, d) => {
        graft.operators.Percentiles.equiDepthHistogram(
            Tables.lineitem(s, d), "l_extendedprice", nBuckets = 8)
          .orderBy(col("bucket"))
      },
      Some(raw"""WITH v AS (SELECT l_extendedprice AS x FROM lineitem
          WHERE l_extendedprice IS NOT NULL),
        b AS (SELECT list_transform(quantile_cont(x, [0.125, 0.25, 0.375, 0.5,
          0.625, 0.75, 0.875]), y -> round(y, 4)) AS bs FROM v),
        t AS (SELECT x,
          CAST(len(list_filter(bs, y -> y < x)) AS INTEGER) AS bucket
          FROM v, b)
        SELECT bucket, count(*) AS n, min(x) AS min_v, max(x) AS max_v
        FROM t GROUP BY bucket ORDER BY bucket""")),

    // ---- referential-integrity audit (Profile.fkAudit): orphan + coverage
    //      counts for every FK edge of the star schema in one report ----
    QueryDef(
      "q100_fk_audit",
      (s, d) => {
        val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
        val c = Tables.customer(s, d); val n = Tables.nation(s, d)
        val r = Tables.region(s, d); val su = Tables.supplier(s, d)
        val p = Tables.part(s, d)
        graft.operators.Profile.fkAudit(Seq(
            ("customer.nation", c, "c_nationkey", n, "n_nationkey"),
            ("lineitem.orders", li, "l_orderkey", o, "o_orderkey"),
            ("lineitem.part", li, "l_partkey", p, "p_partkey"),
            ("lineitem.supplier", li, "l_suppkey", su, "s_suppkey"),
            ("nation.region", n, "n_regionkey", r, "r_regionkey"),
            ("orders.customer", o, "o_custkey", c, "c_custkey")))
          .orderBy(col("edge"))
      },
      Some {
        def edge(name: String, child: String, fk: String, parent: String,
            pk: String): String =
          s"""SELECT '$name' AS edge, count(*) AS n_child,
            CAST(sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS orphans,
            count(DISTINCT c.$fk) AS distinct_fk,
            (SELECT count(DISTINCT $pk) FROM $parent) AS n_parent
          FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
            ON c.$fk = p.$pk"""
        Seq(
          edge("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
          edge("lineitem.orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          edge("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
          edge("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          edge("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
          edge("orders.customer", "orders", "o_custkey", "customer", "c_custkey"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
      }),

    // ---- 5-way star join ----
    QueryDef(
      "q20_star_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        val revenue = dec2(col("l_extendedprice")) * (lit(1) - pct(col("l_discount")))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(revenue).cast("double").as("revenue"))
          .orderBy(col("r_name"), col("o_orderpriority"))
      },
      Some("""SELECT r_name, o_orderpriority, count(*) AS n,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, o_orderpriority ORDER BY r_name, o_orderpriority""")),

    QueryDef(
      "q21_brand_suppliers",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"), count(lit(1)).as("n"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, count(DISTINCT l_suppkey) AS n_supp, count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand""")),

    // ---- Pearson correlation (reference gbr.py:372-373 corr matrix) ----
    QueryDef(
      "q42_correlation",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.groupBy(col("l_returnflag"))
          .agg(
            (round(corr(col("l_quantity"), col("l_extendedprice")), 4) + 0.0).as("corr_qty_price"),
            (round(corr(col("l_discount"), col("l_tax")), 4) + 0.0).as("corr_disc_tax"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        round(corr(l_quantity, l_extendedprice), 4) + 0 AS corr_qty_price,
        round(corr(l_discount, l_tax), 4) + 0 AS corr_disc_tax,
        count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- ROLLUP hierarchy totals (region → nation → grand total) ----
    QueryDef(
      "q43_rollup",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"),
            dsum(col("c_acctbal")).as("sum_bal"))
          .select(
            coalesce(col("r_name"), lit("ALL")).as("region"),
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            col("n_cust"), col("sum_bal"))
          .orderBy(col("region"), col("nation"))
      },
      Some("""SELECT coalesce(r_name, 'ALL') AS region,
        coalesce(n_name, 'ALL') AS nation,
        count(*) AS n_cust,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region, nation""")),

    // ---- pivot (wide reshape; planned as a single hash aggregation with
    //      one conditional agg column per pivot value) ----
    QueryDef(
      "q49_pivot",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("O", "F"))
          .agg(sum(col("l_quantity")))
          .select(col("l_returnflag"),
            coalesce(col("O"), lit(0.0)).as("qty_o"),
            coalesce(col("F"), lit(0.0)).as("qty_f"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0) AS qty_o,
        coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0) AS qty_f
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- RANGE window frame (value-based: all orders within 1000.00 of
    //      the current total price count as peers-or-below) ----
    QueryDef(
      "q52_range_frame",
      (s, d) => {
        val o = Tables.orders(s, d)
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"))
          .rangeBetween(-1000L, 0L)
        o.select(col("o_orderkey"), col("o_orderstatus"),
            count(lit(1)).over(w).as("near_below"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
        count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS near_below
        FROM orders ORDER BY o_orderkey""")),

    // ---- ranking family: ntile + percent_rank + dense_rank ----
    QueryDef(
      "q53_rank_family",
      (s, d) => {
        val c = Tables.customer(s, d)
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        c.select(col("c_custkey"), col("c_mktsegment"),
            ntile(4).over(w).as("quartile"),
            (round(percent_rank().over(w), 6) + 0.0).as("pr"),
            dense_rank().over(w).as("dr"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment,
        ntile(4) OVER w AS quartile,
        round(percent_rank() OVER w, 6) + 0 AS pr,
        dense_rank() OVER w AS dr
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey""")),

    // ---- CUBE: all grouping-set combinations of two dimensions ----
    QueryDef(
      "q57_cube",
      (s, d) => {
        Tables.orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("total"))
          .orderBy(col("status"), col("priority"))
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        coalesce(o_orderpriority, 'ALL') AS priority,
        count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ---- ordered group concatenation (deterministic via sort_array) ----
    QueryDef(
      "q54_group_concat",
      (s, d) => {
        Tables.nation(s, d)
          .groupBy(col("n_regionkey"))
          .agg(concat_ws(",", sort_array(collect_list(col("n_name"))))
            .as("nations"))
          .orderBy(col("n_regionkey"))
      },
      Some("""SELECT n_regionkey,
        string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")),

    // ---- FILTER-clause conditional aggregation (one pass, no self-join) ----
    QueryDef(
      "q55_conditional_agg",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
            dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
              .otherwise(lit(0.0))).as("finished_total"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
        count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END
          AS DECIMAL(18,2))) AS DOUBLE) AS finished_total
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Bloom-pruned semi join: native BloomFilterAggregate /
    //      BloomFilterMightContain expressions keep non-matching lineitem
    //      rows out of the shuffle; result is EXACTLY the plain semi join
    //      (operators.BloomPrune) ----
    QueryDef(
      "q61_bloom_semi_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val bigOrders = Tables.orders(s, d)
          .filter(col("o_totalprice") > 450000)
        graft.operators.BloomPrune.semiJoin(li, bigOrders,
            "l_orderkey", "o_orderkey", expectedItems = 1000000L)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
        GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
