package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** §3.B — projections / filters / predicates: the ENGINE surface a
  * pandas-td user reaches through SQL passthrough (`pandas_td/td.py ::
  * read_td_query`). All predicates are plain Catalyst comparisons →
  * PushedFilters into the parquet scan; b4's IN-subquery exercises
  * RewritePredicateSubquery → left-semi join (decorrelation that Presto did
  * server-side for the reference).
  */
object Filters {

  val all: Seq[Q] = Seq(

    // Derived arithmetic projection; exact decimal per-row math
    // (price*(1-disc) has ≤4 decimal digits by construction).
    Q("b1_project_arith",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))), 4)
            .cast("double").as("revenue"),
          round(dec(col("l_extendedprice")) * dec(col("l_tax")), 4)
            .cast("double").as("tax_amt"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "tax_amt"),
      Some("""SELECT l_orderkey, l_linenumber,
        CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
        CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_tax AS DECIMAL(18,4)), 4) AS DOUBLE) AS tax_amt
        FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, tax_amt""")),

    // Compound predicate (Q6 shape): AND / BETWEEN / IN / NOT — all pushed.
    Q("b2_filter_compound",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") >= tsLit("1997-01-01")
          && col("l_shipdate") < tsLit("1998-01-01")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24
          && col("l_returnflag").isin("A", "R")
          && !(col("l_linestatus") === "O"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        AND l_returnflag IN ('A','R') AND NOT (l_linestatus = 'O')
        ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""")),

    // LIKE prefix/infix + trivial anchored regex (dialect-safe subset).
    Q("b3_filter_like_regex",
      (s, d) => t(s, d, "part")
        .where((col("p_type").like("PROMO%") || col("p_name").like("%bolt%"))
          && col("p_brand").rlike("^Brand#1[0-9]$"))
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand, p_type FROM part
        WHERE (p_type LIKE 'PROMO%' OR p_name LIKE '%bolt%')
        AND regexp_matches(p_brand, '^Brand#1[0-9]$')
        ORDER BY p_partkey""")),

    // Correlated scalar subquery → Catalyst decorrelates to a left outer
    // join (what Presto did server-side for the reference's passthrough).
    Q("b5_scalar_subquery",
      (s, d) => Views.unique(s, "orders" -> t(s, d, "orders"),
          "customer" -> t(s, d, "customer")) { v =>
        s.sql(s"""SELECT o_orderkey,
          (SELECT c_name FROM ${v("customer")} WHERE c_custkey = o_custkey) AS cust_name
          FROM ${v("orders")} ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey,
        (SELECT c_name FROM customer WHERE c_custkey = o_custkey) AS cust_name
        FROM orders ORDER BY o_orderkey""")),

    // IN (subquery): Catalyst RewritePredicateSubquery → left-semi join; at
    // scale the semi side stays small → broadcast-able.
    Q("b4_filter_in_subquery",
      (s, d) => Views.unique(s, "orders" -> t(s, d, "orders"),
          "lineitem" -> t(s, d, "lineitem")) { v =>
        s.sql(s"""SELECT l_orderkey, l_linenumber, l_quantity FROM ${v("lineitem")}
          WHERE l_orderkey IN (SELECT o_orderkey FROM ${v("orders")} WHERE o_totalprice > 450000)
          ORDER BY l_orderkey, l_linenumber, l_quantity""")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
        ORDER BY l_orderkey, l_linenumber, l_quantity""")))
}
