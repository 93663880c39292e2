package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-16 batch 4 — p15-p20 complete the TPC-H shape census: with
  * these, every one of the 22 TPC-H queries has its plan shape graded
  * over the fixtures (Q1 = the flagship/d1, Q3 = c15, Q5/Q7/Q8/Q9/Q10/
  * Q13/Q14/Q15/Q16/Q17/Q18/Q19/Q21/Q22 = p1-p14). The three partsupp
  * queries (Q2/Q11/Q20) run over a DERIVED partsupp: the distinct
  * (l_partkey, l_suppkey) relation TPC-H itself ties to lineitem, with
  * supplycost/availqty as DETERMINISTIC integer functions of the keys —
  * exact in both engines, so the derived table is part of the graded
  * computation, not a fixture assumption. Column substitutions noted
  * per key as in p1-p14.
  */
object Round16d {

  /** Derived partsupp shared by p15/p16/p17 — both engines compute it
    * from lineitem with pure integer arithmetic. */
  private val psSql =
    """SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         ROUND(0.01 * CAST((l_partkey * 7 + l_suppkey * 13) % 10000
           AS DOUBLE), 2) AS ps_supplycost,
         CAST((l_partkey * 11 + l_suppkey * 3) % 500 + 100 AS BIGINT)
           AS ps_availqty
       FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) x"""

  private def psDf(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"),
        round(lit(0.01) * ((col("l_partkey") * 7 + col("l_suppkey") * 13)
          % 10000).cast("double"), 2).as("ps_supplycost"),
        ((col("l_partkey") * 11 + col("l_suppkey") * 3) % 500 + 100)
          .cast("long").as("ps_availqty"))

  def all: Seq[Q] = Seq(

    // p15 — TPC-H Q2 (minimum-cost supplier): the MULTI-TABLE correlated
    // scalar subquery — the inner MIN ranges over partsupp⋈supplier⋈
    // nation⋈region and correlates on the OUTER part's key. Decorrelated:
    // one region-filtered min-cost-per-part aggregate joined back on
    // (p_partkey, ps_supplycost) — the per-part argmin shape. Dims
    // broadcast; the only fact-sized relations are the derived partsupp
    // and its aggregate, sharing the ps_partkey exchange.
    Q("p15_tpch_q2",
      (s, d) => {
        val ps = psDf(s, d)
        val nat = t(s, d, "nation")
          .join(broadcast(t(s, d, "region")
            .where(col("r_name") === "ASIA").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        val sup = t(s, d, "supplier")
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val regional = ps.join(sup, col("ps_suppkey") === col("s_suppkey"))
        val minCost = regional.groupBy(col("ps_partkey").as("mp"))
          .agg(min(col("ps_supplycost")).as("mc"))
        val pt = t(s, d, "part")
          .where(col("p_size") <= 15 && col("p_type") === "STANDARD")
          .select("p_partkey", "p_name")
        regional
          .join(broadcast(pt), col("ps_partkey") === col("p_partkey"))
          .join(minCost, col("ps_partkey") === col("mp") &&
            col("ps_supplycost") === col("mc"))
          .select(round(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"),
            col("n_name"), col("p_partkey"), col("p_name"),
            col("ps_supplycost"))
          .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"),
            asc("p_partkey"))
          .limit(100)
      },
      Some(s"""WITH partsupp AS ($psSql)
        SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
          p_partkey, p_name, ps_supplycost
        FROM part, partsupp, supplier, nation, region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size <= 15 AND p_type = 'STANDARD'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND ps_supplycost = (SELECT MIN(ps_supplycost)
            FROM partsupp ps2, supplier s2, nation n2, region r2
            WHERE ps2.ps_partkey = p_partkey
              AND s2.s_suppkey = ps2.ps_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100""")),

    // p16 — TPC-H Q11 (important stock): HAVING compared against a
    // SCALAR FRACTION of the global aggregate over the same filtered
    // relation — the "share of total" reduction. The nation-filtered
    // partsupp aggregates ONCE per part; the global total is the same
    // subtree re-aggregated to one broadcast row (plan reuses the
    // exchange). value = ps_supplycost · ps_availqty, exact decimal.
    Q("p16_tpch_q11",
      (s, d) => {
        val nat = t(s, d, "nation")
          .where(col("n_nationkey") >= 12 && col("n_nationkey") <= 17)
          .select("n_nationkey")
        val sup = t(s, d, "supplier")
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        val vals = psDf(s, d).join(sup, col("ps_suppkey") === col("s_suppkey"))
          .select(col("ps_partkey"),
            (dec(col("ps_supplycost")) * col("ps_availqty")).as("v"))
        val perPart = vals.groupBy("ps_partkey")
          .agg(round(sum(col("v")), 2).cast("double").as("value"))
        val total = vals.agg((round(sum(col("v")), 2).cast("double")
          * 0.001).as("cut"))
        perPart.crossJoin(broadcast(total))
          .where(col("value") > col("cut"))
          .select("ps_partkey", "value")
          .orderBy(desc("value"), asc("ps_partkey"))
      },
      Some(s"""WITH partsupp AS ($psSql),
          vals AS (SELECT ps_partkey,
              CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty AS v
            FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
            WHERE n_nationkey BETWEEN 12 AND 17)
        SELECT ps_partkey,
          CAST(ROUND(SUM(v), 2) AS DOUBLE) AS value
        FROM vals GROUP BY ps_partkey
        HAVING CAST(ROUND(SUM(v), 2) AS DOUBLE) >
          (SELECT CAST(ROUND(SUM(v), 2) AS DOUBLE) * 0.001 FROM vals)
        ORDER BY value DESC, ps_partkey""")),

    // p17 — TPC-H Q20 (potential part promotion): the NESTED-IN chain —
    // suppliers IN (partsupp rows whose part is IN a name-filtered set
    // AND whose availqty exceeds a CORRELATED half-year-demand scalar).
    // Three nesting levels, each decorrelating to its own join: the
    // part filter to a broadcast semi, the demand scalar to a grouped
    // aggregate on (partkey, suppkey) — the same keys the outer relation
    // carries, so the probe is co-partitioned — and the supplier IN to
    // one final semi join.
    Q("p17_tpch_q20",
      (s, d) => {
        val pt = t(s, d, "part").where(col("p_name").startsWith("red"))
          .select(col("p_partkey"))
        val demand = t(s, d, "lineitem")
          .where(col("l_shipdate") >= tsLit("1997-01-01") &&
            col("l_shipdate") < tsLit("1998-01-01"))
          .groupBy(col("l_partkey").as("dp"), col("l_suppkey").as("ds"))
          .agg((sum(dec(col("l_quantity"))).cast("double") * 0.5)
            .as("half_demand"))
        val qualified = psDf(s, d)
          .join(broadcast(pt), col("ps_partkey") === col("p_partkey"), "left_semi")
          .join(demand, col("ps_partkey") === col("dp") &&
            col("ps_suppkey") === col("ds"))
          .where(col("ps_availqty").cast("double") > col("half_demand"))
          .select(col("ps_suppkey")).distinct()
        t(s, d, "supplier")
          .join(qualified, col("s_suppkey") === col("ps_suppkey"),
            "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH partsupp AS ($psSql)
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (SELECT ps_suppkey FROM partsupp
          WHERE ps_partkey IN (SELECT p_partkey FROM part
              WHERE p_name LIKE 'red%')
            AND CAST(ps_availqty AS DOUBLE) >
              (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                  AS DOUBLE) * 0.5
               FROM lineitem
               WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                 AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
        ORDER BY s_suppkey""")),

    // p18 — TPC-H Q6 (forecast revenue change): the pure scan-aggregate
    // — three pushable range predicates, one exact-decimal product sum,
    // ONE row out. The simplest TPC-H query and the purest pushdown
    // test: every predicate must reach PushedFilters and the plan is a
    // single whole-stage-codegen scan→partial-agg→1-row exchange.
    Q("p18_tpch_q6",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") >= tsLit("1997-01-01") &&
          col("l_shipdate") < tsLit("1998-01-01") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))),
          2).cast("double").as("revenue")),
      Some("""SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
            * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24""")),

    // p19 — TPC-H Q4 (order priority checking): EXISTS against the fact
    // table grouped on the outer — decorrelates to ONE semi join on
    // o_orderkey, then a 5-group count. Substitution: the late-delivery
    // predicate (commit/receipt dates, absent) becomes l_returnflag='R',
    // as in p10.
    Q("p19_tpch_q4",
      (s, d) => {
        val ord = t(s, d, "orders")
          .where(col("o_orderdate") >= tsLit("1997-01-01") &&
            col("o_orderdate") < tsLit("1997-04-01"))
          .select("o_orderkey", "o_orderpriority")
        val li = t(s, d, "lineitem").where(col("l_returnflag") === "R")
          .select("l_orderkey")
        ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // p20 — TPC-H Q12 (shipping modes / priority): the two-way
    // CONDITIONAL COUNT over a join — high-priority vs other order
    // counts per group, both sums riding one aggregation pass.
    // Substitution: l_shipmode (absent) becomes l_linestatus as the
    // grouping attribute; the date-window predicate pushes to the
    // lineitem scan.
    Q("p20_tpch_q12",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .where(col("l_shipdate") >= tsLit("1997-01-01") &&
            col("l_shipdate") < tsLit("1998-01-01"))
          .select("l_orderkey", "l_linestatus")
        li.join(t(s, d, "orders").select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // j80 — feature HASHING (the hashing trick): text → fixed-D sparse
    // count vector via bucket = hash(term) mod D — the input prep for
    // fasttext/VW-class linear models and the j49 classifier's scalable
    // sibling (no vocabulary table AT ALL: the feature space is fixed
    // at D buckets, so the op is map-side pure and needs no broadcast,
    // no join, no second corpus pass — the property that makes it THE
    // featurizer at 100 TB). Signed variant (sign from another md5
    // nibble) cancels collision bias, as in Weinberger et al. Output is
    // the sparse (doc, bucket, count, signed_sum) long form — exact
    // integers, trivially hash-gradeable.
    Q("j80_feature_hashing",
      (s, d) => {
        val D = 64
        t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          // md5-derived bucket/sign (the j15 split device): identical
          // arithmetic in both engines, which xxhash64 is not
          .select(col("doc_id"),
            (expr("cast(conv(substring(md5(term), 1, 8), 16, 10) AS BIGINT)")
              % D).as("bucket"),
            (expr("cast(conv(substring(md5(term), 9, 1), 16, 10) AS BIGINT)")
              % 2 * 2 - 1).as("sign"))
          .groupBy("doc_id", "bucket")
          .agg(count(lit(1)).as("cnt"), sum(col("sign")).as("signed_sum"))
          .where(col("doc_id") < 50)
          .orderBy("doc_id", "bucket")
      },
      Some("""WITH tok AS (SELECT doc_id,
              unnest(string_split(text, ' ')) AS term
            FROM documents WHERE doc_id < 50),
          h AS (SELECT doc_id,
              CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 64
                AS bucket,
              CAST('0x' || substr(md5(term), 9, 1) AS BIGINT) % 2 * 2 - 1
                AS sign
            FROM tok)
        SELECT doc_id, bucket, COUNT(*) AS cnt,
          CAST(SUM(sign) AS BIGINT) AS signed_sum
        FROM h GROUP BY doc_id, bucket ORDER BY doc_id, bucket""")),

    // j81 — Zipf rank-frequency slope: the corpus-health diagnostic
    // (natural text sits near slope −1 on log-log rank-frequency;
    // template/boilerplate corpora flatten, spam steepens — a cheap
    // one-number drift check next to j36's chi-square). The top-100
    // terms come via TakeOrdered (never a global sort of the vocab —
    // the rank window runs on the 100-row relation AFTER the limit),
    // then d16's closed-form least squares over (ln rank, ln freq).
    // Ranks are row_number with the (cnt DESC, term ASC) tie-break, so
    // the fit input is deterministic; the 100-term double sums sit far
    // inside round-6.
    Q("j81_zipf_slope",
      (s, d) => {
        val top = t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("term")).limit(100)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(desc("cnt"), asc("term"))
        top.withColumn("rank", row_number().over(w))
          .select(log(col("rank").cast("double")).as("x"),
            log(col("cnt").cast("double")).as("y"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("n"),
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              / (col("n") * col("sxx") - col("sx") * col("sx")), 6)
              .as("slope"),
            round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy"))
              / (col("n") * col("sxx") - col("sx") * col("sx")))
              * col("sx")) / col("n"), 6).as("intercept"))
      },
      Some("""WITH vocab AS (SELECT term, COUNT(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS term
                  FROM documents) t
            GROUP BY term ORDER BY cnt DESC, term LIMIT 100),
          ranked AS (SELECT ln(CAST(row_number() OVER
                (ORDER BY cnt DESC, term) AS DOUBLE)) AS x,
              ln(CAST(cnt AS DOUBLE)) AS y
            FROM vocab),
          m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
              SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM ranked)
        SELECT n, ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
            AS slope,
          ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
            / n, 6) AS intercept
        FROM m""")),

    // k25 — inline VALUES relation: the literal lookup-table idiom (ad
    // hoc enum decode, priority weights, a manual mapping pasted into
    // the query — every analyst does this daily). The VALUES relation
    // is a LocalRelation: it exists only in the plan, broadcasts by
    // construction, and the join against it is a broadcast hash join
    // with zero scan cost. Both engines share the syntax verbatim.
    Q("k25_values_inline",
      (s, d) => Views.unique(s, "k25_ord" -> t(s, d, "orders")) { v =>
        s.sql(s"""SELECT w.tier, COUNT(*) AS n,
            CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))
              * w.weight), 2) AS DOUBLE) AS weighted_price
          FROM ${v("k25_ord")}
          JOIN (VALUES ('1-URGENT', 'hot', 3), ('2-HIGH', 'hot', 2),
              ('3-MEDIUM', 'warm', 1), ('4-NOT SPECIFIED', 'cold', 1),
              ('5-LOW', 'cold', 1)) AS w(prio, tier, weight)
            ON o_orderpriority = w.prio
          GROUP BY w.tier ORDER BY w.tier""")
      },
      Some("""SELECT w.tier, COUNT(*) AS n,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))
            * w.weight), 2) AS DOUBLE) AS weighted_price
        FROM orders
        JOIN (VALUES ('1-URGENT', 'hot', 3), ('2-HIGH', 'hot', 2),
            ('3-MEDIUM', 'warm', 1), ('4-NOT SPECIFIED', 'cold', 1),
            ('5-LOW', 'cold', 1)) AS w(prio, tier, weight)
          ON o_orderpriority = w.prio
        GROUP BY w.tier ORDER BY w.tier"""))
  )
}
