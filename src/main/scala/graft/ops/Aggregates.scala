package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** §3.D — aggregations (ENGINE surface; Presto/Hive GROUP BY family the
  * reference passes through, incl. TD's signature `approx_distinct`).
  *
  * All shapes are plain `groupBy.agg` → HashAggregateExec with automatic
  * partial (map-side) aggregation — the shuffle moves one row per
  * (partition, group), not per input row, which is what makes these viable
  * at 100 TB. Money math follows the §8.4 determinism rules (Tables.scala).
  */
object Aggregates {

  /** TPC-H Q1 pricing summary — the flagship (`SparkEntry.entry`). */
  def flagship(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        mSum(col("l_quantity")).as("sum_qty"),
        mSum(col("l_extendedprice")).as("sum_base_price"),
        round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))), 4)
          .cast("double").as("sum_disc_price"),
        mAvg(col("l_quantity")).as("avg_qty"),
        mAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val flagshipOracle =
    """SELECT l_returnflag, l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))),4) AS DOUBLE) AS sum_disc_price,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity), 4) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice), 4) AS avg_price,
      COUNT(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""

  // NOTE: declared before `all` — object vals initialize in order.
  // shared between the Spark side (unique view name) and the oracle
  // (DuckDB's bare `orders` view) — same TEXT, parameterized table
  def filterAggSql(tbl: String = "orders"): String =
    s"""SELECT o_orderpriority,
      COUNT(*) AS n,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        FILTER (WHERE o_totalprice > 300000), 4) AS DOUBLE) AS big_total
      FROM $tbl GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  def groupingSetsSql(tbl: String = "lineitem"): String =
    s"""SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_qty
      FROM $tbl
      GROUP BY GROUPING SETS ((l_returnflag),(l_returnflag,l_linestatus),())
      ORDER BY rf, ls"""

  val all: Seq[Q] = Seq(

    Q("d1_agg_groupby", (s, d) => flagship(s, d), Some(flagshipOracle)),

    Q("d2_agg_distinct",
      (s, d) => t(s, d, "orders").groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Multiple distinct aggregates in one pass (Expand + two-stage agg).
    Q("d3_agg_multidistinct",
      (s, d) => t(s, d, "orders").groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          mSum(col("o_totalprice")).as("total"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
        COUNT(DISTINCT o_orderpriority) AS n_prio,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),4) AS DOUBLE) AS total,
        COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ROLLUP — subtotal rows labelled via COALESCE (engine-portable, avoids
    // NULL-ordering divergence; flags are single chars so 'ALL' is safe).
    Q("d4_agg_rollup",
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(mSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls"),
      Some("""SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls""")),

    Q("d5_agg_cube",
      (s, d) => t(s, d, "customer")
        .cube("c_mktsegment", "c_nationkey")
        .agg(round(sum(dec(col("c_acctbal"))), 4).cast("double").as("bal"),
          count(lit(1)).as("n"))
        .select(coalesce(col("c_mktsegment"), lit("ALL")).as("seg"),
          coalesce(col("c_nationkey"), lit(-1)).as("nk"),
          col("bal"), col("n"))
        .orderBy("seg", "nk"),
      Some("""SELECT COALESCE(c_mktsegment,'ALL') AS seg, COALESCE(c_nationkey,-1) AS nk,
        CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))),4) AS DOUBLE) AS bal, COUNT(*) AS n
        FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey) ORDER BY seg, nk""")),

    // Explicit GROUPING SETS — same SQL text runs in both engines.
    Q("d6_agg_grouping_sets",
      (s, d) => Views.unique(s, "lineitem" -> t(s, d, "lineitem")) { v =>
        s.sql(Aggregates.groupingSetsSql(v("lineitem")))
      },
      Some(Aggregates.groupingSetsSql())),

    // approx_distinct — TD's signature HLL agg. Graded in the EXACT
    // regime (the d19/d21/d24/k12 device, upgrading SURVEY §3.D d7's
    // original scalatest-only `n` tag): the sketched domain is
    // o_custkey % 512 — ≤ 512 distinct values at ANY SF, far below the
    // lgK=14 Datasketches HLL's coupon capacity, so the sketch never
    // promotes to dense registers, its estimate IS the exact coupon
    // count, and the row hash-checks against COUNT(DISTINCT). The
    // ESTIMATING regime (full o_custkey domain through HLL++
    // approx_count_distinct, the d7 surface a user actually calls) stays
    // scalatest-bounded ±5% vs exact in LlmOpsSpec — estimates are
    // implementation-specific, so a cross-engine hash can never gate it.
    Q("d7_agg_approx_distinct",
      // DataFrame API (no temp view): the query builder must not mutate
      // shared session state — two concurrent d7 evaluations on one
      // session (e.g. different SFs) would race on a fixed view name.
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(expr(
          "CAST(hll_sketch_estimate(hll_sketch_agg(o_custkey % 512, 14)) AS BIGINT)")
          .as("approx_cust"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
          CAST(COUNT(DISTINCT o_custkey % 512) AS BIGINT) AS approx_cust
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Exact percentile (interpolating, = DuckDB quantile_cont; SURVEY §8.5).
    Q("d8_agg_percentile",
      (s, d) => t(s, d, "part").groupBy("p_brand")
        .agg(round(expr("percentile(p_size, 0.5)"), 4).as("median_size"),
          round(expr("percentile(p_size, 0.9)"), 4).as("p90_size"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, ROUND(quantile_cont(p_size, 0.5), 4) AS median_size,
        ROUND(quantile_cont(p_size, 0.9), 4) AS p90_size
        FROM part GROUP BY p_brand ORDER BY p_brand""")),

    // HAVING: post-aggregation filter on the emitted (deterministic) value.
    Q("d9_agg_having",
      (s, d) => t(s, d, "orders").groupBy("o_custkey")
        .agg(mSum(col("o_totalprice")).as("total"))
        .where(col("total") > 3000000d)
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),4) AS DOUBLE) AS total
        FROM orders GROUP BY o_custkey
        HAVING CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))),4) AS DOUBLE) > 3000000
        ORDER BY o_custkey""")),

    // Statistical aggregates (sample variants ≡ DuckDB's).
    Q("d10_agg_stats",
      (s, d) => t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, ROUND(stddev_samp(l_quantity),4) AS sd_qty,
        ROUND(var_samp(l_quantity),4) AS var_qty,
        ROUND(corr(l_quantity,l_extendedprice),4) AS corr_qp,
        ROUND(covar_samp(l_quantity,l_extendedprice),4) AS cov_qp
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // TD_FIRST / TD_LAST (TD's argmin/argmax-by-time UDAFs) ≡ Spark
    // min_by/max_by. Keyed on a composite (time, id) scalar so ties on the
    // timestamp stay deterministic in both engines (DuckDB 1.0 arg_min
    // rejects struct keys).
    Q("d12_agg_first_last",
      (s, d) => t(s, d, "orders").groupBy("o_custkey")
        .agg(
          expr("min_by(o_orderstatus, unix_millis(cast(o_orderdate as timestamp))*1000000 + o_orderkey)")
            .as("first_status"),
          expr("max_by(o_orderstatus, unix_millis(cast(o_orderdate as timestamp))*1000000 + o_orderkey)")
            .as("last_status"),
          expr("max_by(o_totalprice, unix_millis(cast(o_orderdate as timestamp))*1000000 + o_orderkey)")
            .as("last_price"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
        arg_min(o_orderstatus, CAST(epoch_ms(o_orderdate) AS BIGINT)*1000000 + o_orderkey) AS first_status,
        arg_max(o_orderstatus, CAST(epoch_ms(o_orderdate) AS BIGINT)*1000000 + o_orderkey) AS last_status,
        arg_max(o_totalprice, CAST(epoch_ms(o_orderdate) AS BIGINT)*1000000 + o_orderkey) AS last_price
        FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // FILTER-clause (conditional) aggregation — same ANSI text both engines.
    Q("d13_agg_filter",
      (s, d) => Views.unique(s, "orders" -> t(s, d, "orders")) { v =>
        s.sql(Aggregates.filterAggSql(v("orders")))
      },
      Some(Aggregates.filterAggSql())),

    // array_agg → deterministic sorted list, emitted as a joined string.
    Q("d11_agg_collect",
      (s, d) => t(s, d, "customer").where(col("c_custkey") < 20)
        .groupBy("c_mktsegment")
        .agg(concat_ws(",", sort_array(collect_list(col("c_name")))).as("names"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, string_agg(c_name, ',' ORDER BY c_name) AS names
        FROM customer WHERE c_custkey < 20
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Weighted (frequency) exact percentile — `percentile(col, p, freq)`'s
    // third argument, the surface weighted-survey/row-multiplicity
    // percentiles need without physically expanding rows: Spark treats
    // each value as repeated `freq` times and interpolates on the
    // expanded multiset. The oracle proves that semantic by DOING the
    // expansion (unnest(range(freq))) and running plain quantile_cont —
    // equality means the weighted form is exactly the expanded form,
    // which is why at 100 TB you ship (value, weight) pairs and never the
    // multiplied rows.
    Q("d23_percentile_weighted",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5, l_linenumber)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.9, l_linenumber)"), 4).as("p90"))
        .orderBy("l_returnflag"),
      Some("""WITH x AS (SELECT l_returnflag, l_quantity
          FROM (SELECT l_returnflag, l_quantity, l_linenumber FROM lineitem),
            unnest(range(l_linenumber)))
        SELECT l_returnflag,
          ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
          ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90
        FROM x GROUP BY l_returnflag ORDER BY l_returnflag""")))
}
