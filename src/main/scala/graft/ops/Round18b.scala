package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Round-18 batch 2.
  *
  * p24/p25 close out the TPC-H suite: with these two, all 22 queries run
  * as graded registry keys (Q1 was previously represented only by its
  * flagship subset d1 — no charge term, no avg_disc; Q3's SHAPE was
  * pinned by c15_join_multiway but the verbatim top-10 query was not
  * graded). The reference ships arbitrary analytic SQL to hosted
  * Presto/Hive (`pandas_td/td.py :: read_td_query` — SURVEY §0-caveated
  * anchor), so whole-query parity is the p-tier's contract.
  *
  * j102/j103 extend the eval layer of the LLM-pipeline surface (EXT per
  * SURVEY §1): labeled-data quality work needs agreement statistics
  * between annotators/judges (Cohen 1960's kappa — chance-corrected
  * agreement) and calibration audits of the quality classifier the
  * pipeline gates on (reliability bins + expected calibration error,
  * Naeini et al. 2015 / Guo et al. 2017's diagnostic). Both collapse the
  * corpus in ONE map-side-combined scan — bounded outputs (1 row / ≤10
  * bins), no joins on the corpus, which is what makes them runnable as
  * routine audits at 100 TB.
  */
object Round18b {

  /** Rate columns (discount, tax ∈ [0,1), 2 decimal digits in TPC-H) cast
    * narrow — DECIMAL(6,4) — so the THREE-factor charge product stays
    * exact: (1±rate) is (7,4), their product (15,8), × price (18,4) needs
    * p=34 s=12 — inside Spark's 38 cap with no precision-loss rescale.
    * Casting rates at (18,4) instead would push the product past p=38 and
    * Spark would round the intermediate at scale 6 — up to 5e-7/row of
    * drift that a 4-decimal graded SUM can see at sf0.1 row counts. */
  private def rate(c: org.apache.spark.sql.Column) = c.cast(DecimalType(6, 4))

  def all: Seq[Q] = Seq(

    // p24 — TPC-H Q1 (pricing summary), the verbatim battery: d1/the
    // flagship grade the 6-column subset; this adds the shipdate cut,
    // sum_charge (the 3-factor decimal product — see `rate`) and
    // avg_disc. Plan: pushed shipdate filter → one 2-phase HashAggregate
    // over 6 groups — the map-side combine collapses 100 TB to
    // partitions×6 rows before the only exchange.
    Q("p24_tpch_q1",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") <= tsLit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          mSum(col("l_quantity")).as("sum_qty"),
          mSum(col("l_extendedprice")).as("sum_base_price"),
          revenueAgg("sum_disc_price"),
          round(sum(dec(col("l_extendedprice")) *
            ((lit(1) - rate(col("l_discount"))) *
              (lit(1) + rate(col("l_tax"))))), 4)
            .cast("double").as("sum_charge"),
          mAvg(col("l_quantity")).as("avg_qty"),
          mAvg(col("l_extendedprice")).as("avg_price"),
          mAvg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
          CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))),4) AS DOUBLE)
            AS sum_qty,
          CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))),4) AS DOUBLE)
            AS sum_base_price,
          CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
            (1 - CAST(l_discount AS DECIMAL(18,4)))),4) AS DOUBLE)
            AS sum_disc_price,
          CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
            ((1 - CAST(l_discount AS DECIMAL(6,4))) *
             (1 + CAST(l_tax AS DECIMAL(6,4))))),4) AS DOUBLE)
            AS sum_charge,
          ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
            / COUNT(l_quantity), 4) AS avg_qty,
          ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
            / COUNT(l_extendedprice), 4) AS avg_price,
          ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
            / COUNT(l_discount), 6) AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // p25 — TPC-H Q3 (shipping priority), verbatim top-10 (date cut
    // mid-fixture-range; the fixture's orders table carries
    // o_orderpriority in the o_shippriority role). Both date bounds and
    // the segment predicate push to their scans. Customer is NOT
    // hard-broadcast: a 1/5-segment of customers is ~30M rows at 100 TB —
    // AQE decides (it broadcasts at bench SF). Top-10 is
    // TakeOrderedAndProject — never a global sort. Tiebreak (revenue
    // DESC, o_orderdate, l_orderkey) makes the LIMIT deterministic.
    Q("p25_tpch_q3",
      (s, d) => {
        val cust = t(s, d, "customer")
          .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val ord = t(s, d, "orders")
          .where(col("o_orderdate") < tsLit("1997-03-15"))
          .select("o_orderkey", "o_custkey", "o_orderdate",
            "o_orderpriority")
        val li = t(s, d, "lineitem")
          .where(col("l_shipdate") > tsLit("1997-03-15"))
          .select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(revenueAgg())
          .select(col("l_orderkey"), col("revenue"),
            dateStr(col("o_orderdate")).as("o_orderdate"),
            col("o_orderpriority"))
          .orderBy(desc("revenue"), asc("o_orderdate"), asc("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, $revenueAggSql AS revenue,
          strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""")),

    // j102 — inter-judge agreement (Cohen's kappa): labeled / LLM-judged
    // training data is only as good as its labels, and the standard
    // audit is chance-corrected agreement between two raters. Raters
    // here are two deterministic heuristics over the same doc (a length
    // judge and a type-token-ratio judge; thresholds populate all four
    // confusion cells at the current fixtures, though the (0,0) cell
    // holds only 1-2 docs — a fixture regen may empty it, which changes
    // the statistic but breaks nothing: see the nullif guard). ONE map-only
    // scan → global 2×2 confusion counts via partial aggregation → kappa
    // arithmetic on a single row. po/pe/kappa are IEEE ops on exact
    // integer-derived doubles — cross-engine-deterministic, rounded 6 at
    // emission only.
    Q("j102_judge_agreement",
      (s, d) => t(s, d, "documents")
        .select(split(col("text"), " ").as("toks"))
        .select(
          (size(col("toks")) >= 60).cast("int").as("a"),
          ((size(array_distinct(col("toks"))).cast("double") /
            size(col("toks"))) >= 0.40).cast("int").as("b"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("a") * col("b")).cast("long").as("n11"),
          sum(col("a") * (lit(1) - col("b"))).cast("long").as("n10"),
          sum((lit(1) - col("a")) * col("b")).cast("long").as("n01"),
          sum((lit(1) - col("a")) * (lit(1) - col("b"))).cast("long")
            .as("n00"))
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          ((col("n11") + col("n00")).cast("double") / col("n")).as("po_u"),
          ((((col("n11") + col("n10")).cast("double") / col("n")) *
            ((col("n11") + col("n01")).cast("double") / col("n"))) +
            (((col("n01") + col("n00")).cast("double") / col("n")) *
              ((col("n10") + col("n00")).cast("double") / col("n"))))
            .as("pe_u"))
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          round(col("po_u"), 6).as("po"), round(col("pe_u"), 6).as("pe"),
          // nullif guards the degenerate corpus (both judges constant →
          // pe_u = 1): Spark's 0/0 is NaN but DuckDB's is NULL — without
          // the guard the two engines disagree exactly when the statistic
          // is undefined. NULL on both sides is the honest answer.
          round((col("po_u") - col("pe_u")) /
            nullif(lit(1.0) - col("pe_u"), lit(0.0)), 6).as("kappa")),
      Some("""WITH j AS (
          SELECT CASE WHEN len(toks) >= 60 THEN 1 ELSE 0 END AS a,
            CASE WHEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
              >= 0.40 THEN 1 ELSE 0 END AS b
          FROM (SELECT string_split(text, ' ') AS toks FROM documents)),
        c AS (SELECT COUNT(*) AS n,
            CAST(SUM(a * b) AS BIGINT) AS n11,
            CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
            CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
            CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
          FROM j),
        u AS (SELECT n, n11, n10, n01, n00,
            CAST(n11 + n00 AS DOUBLE) / n AS po_u,
            (CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
              + (CAST(n01 + n00 AS DOUBLE) / n)
                * (CAST(n10 + n00 AS DOUBLE) / n) AS pe_u
          FROM c)
        SELECT n, n11, n10, n01, n00, ROUND(po_u, 6) AS po,
          ROUND(pe_u, 6) AS pe,
          ROUND((po_u - pe_u) / nullif(1.0 - pe_u, 0.0), 6) AS kappa
        FROM u""")),

    // j103 — classifier calibration audit (reliability bins + ECE) of
    // j49's quality logistic — the SAME score pipeline (Round9.j49Scored,
    // one definition), against the stopword-fraction reference gate. A
    // gating score that reads 0.7 should be right ~70% of the time;
    // miscalibration silently shifts the kept-corpus mix, so this audit
    // runs beside every trained filter. ONE corpus scan → ≤10-row bin
    // relation (decile of the rounded score, top bin closed); per-bin
    // confidence/accuracy are exact-decimal means; ECE is the
    // bin-mass-weighted |gap| via a window total over the bounded bin
    // relation (no second scan, no scalar join).
    Q("j103_calibration_bins",
      (s, d) => {
        val bins = Round9.j49Scored(s, d)
          .select(
            least(floor(col("score") * 10), lit(9)).cast("int").as("bin"),
            col("score"), (col("swf") >= 0.03).cast("int").as("label"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_b"),
            sum(col("label")).cast("long").as("n_pos"),
            (sum(col("score").cast(DecimalType(18, 6))).cast("double") /
              count(lit(1))).as("conf_u"))
          .select(col("bin"), col("n_b"), col("n_pos"), col("conf_u"),
            (col("n_pos").cast("double") / col("n_b")).as("acc_u"))
        val w = Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        bins.select(col("bin"), col("n_b"), col("n_pos"),
            round(col("conf_u"), 6).as("confidence"),
            round(col("acc_u"), 6).as("accuracy"),
            round((sum(col("n_b").cast("double") *
              abs(col("acc_u") - col("conf_u"))).over(w) /
              sum(col("n_b").cast("double")).over(w)), 6).as("ece"))
          .orderBy("bin")
      },
      Some("""WITH f AS (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents),
        ft AS (SELECT doc_id,
            CAST(len(toks) AS DOUBLE) AS n,
            CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
              AS DOUBLE) AS chars,
            CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a' OR t = 'of'
              OR t = 'and' OR t = 'in')) AS DOUBLE) AS sw,
            CAST(len(list_distinct(toks)) AS DOUBLE) AS types
          FROM f),
        z AS (SELECT doc_id, sw / n AS swf,
            -5.0 + 0.9 * ln(1.0 + n) + 0.35 * (chars / n)
              - 2.2 * (sw / n) + 1.1 * (types / n) AS z
          FROM ft),
        scored AS (SELECT CAST(least(floor(
              ROUND(1.0 / (1.0 + exp(-z)), 6) * 10), 9) AS INTEGER) AS bin,
            ROUND(1.0 / (1.0 + exp(-z)), 6) AS score,
            CASE WHEN swf >= 0.03 THEN 1 ELSE 0 END AS label
          FROM z),
        bins AS (SELECT bin, COUNT(*) AS n_b,
            CAST(SUM(label) AS BIGINT) AS n_pos,
            CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
              AS conf_u
          FROM scored GROUP BY bin),
        b2 AS (SELECT bin, n_b, n_pos, conf_u,
            CAST(n_pos AS DOUBLE) / n_b AS acc_u FROM bins)
        SELECT bin, n_b, n_pos, ROUND(conf_u, 6) AS confidence,
          ROUND(acc_u, 6) AS accuracy,
          ROUND(SUM(CAST(n_b AS DOUBLE) * abs(acc_u - conf_u)) OVER ()
            / SUM(CAST(n_b AS DOUBLE)) OVER (), 6) AS ece
        FROM b2 ORDER BY bin""")),

    // j104 — exact ROC-AUC of the j49 quality classifier against the
    // same reference gate j103 calibrates on: j103 answers "is the
    // confidence honest", this answers "does the score RANK keepers
    // above rejects" (the Mann-Whitney/rank form, ties at average rank
    // — the standard threshold-free selection metric for gating
    // filters). Scale shape: the corpus collapses in ONE scan to the
    // per-score histogram (pos/neg counts per distinct 6-dp score —
    // ≤ 10^6 rows BY CONSTRUCTION, regardless of corpus size), and the
    // rank arithmetic runs as a cumulative window over that bounded
    // relation; the corpus itself is never sorted or ranked. Integer
    // core: Σ pos_s·(2·cumneg_<s + neg_s) / (2·P·N) — the /2 of
    // average-rank ties is cleared by doubling, so everything before
    // the final division is exact integer arithmetic (DECIMAL(38,0)
    // sums: past-2^63-safe where long would wrap at ~10^12-doc pair
    // counts).
    Q("j104_roc_auc",
      (s, d) => {
        val hist = Round9.j49Scored(s, d)
          .select(col("score"), (col("swf") >= 0.03).cast("int").as("l"))
          .groupBy("score")
          .agg(sum(col("l")).cast("long").as("pos"),
            sum(lit(1) - col("l")).cast("long").as("neg"))
        val below = Window.orderBy("score")
          .rowsBetween(Window.unboundedPreceding, -1)
        hist
          .select(col("pos"), col("neg"),
            coalesce(sum(col("neg")).over(below), lit(0L)).as("cumneg"))
          .agg(
            sum(col("pos")).cast("long").as("n_pos"),
            sum(col("neg")).cast("long").as("n_neg"),
            sum((col("pos") * (lit(2) * col("cumneg") + col("neg")))
              .cast(DecimalType(38, 0))).as("num"))
          .select(col("n_pos"), col("n_neg"),
            // single-class corpus (n_pos or n_neg = 0): AUC is undefined
            // — NULL, matching the oracle's NULLIF, instead of an ANSI
            // divide-by-zero (degenerate-data harness finding)
            round(col("num").cast("double") /
              nullif(lit(2.0) * col("n_pos") * col("n_neg"), lit(0.0)), 6)
              .as("auc"),
            round(col("num").cast("double") /
              nullif(col("n_pos").cast("double") * col("n_neg"), lit(0.0))
              - 1.0, 6).as("gini"))
      },
      Some("""WITH f AS (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents),
        ft AS (SELECT doc_id,
            CAST(len(toks) AS DOUBLE) AS n,
            CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
              AS DOUBLE) AS chars,
            CAST(len(list_filter(toks, t -> t = 'the' OR t = 'a' OR t = 'of'
              OR t = 'and' OR t = 'in')) AS DOUBLE) AS sw,
            CAST(len(list_distinct(toks)) AS DOUBLE) AS types
          FROM f),
        z AS (SELECT doc_id, sw / n AS swf,
            -5.0 + 0.9 * ln(1.0 + n) + 0.35 * (chars / n)
              - 2.2 * (sw / n) + 1.1 * (types / n) AS z
          FROM ft),
        scored AS (SELECT ROUND(1.0 / (1.0 + exp(-z)), 6) AS score,
            CASE WHEN swf >= 0.03 THEN 1 ELSE 0 END AS l FROM z),
        hist AS (SELECT score, CAST(SUM(l) AS BIGINT) AS pos,
            CAST(SUM(1 - l) AS BIGINT) AS neg
          FROM scored GROUP BY score),
        cum AS (SELECT pos, neg,
            COALESCE(SUM(neg) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cumneg
          FROM hist),
        tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
            CAST(SUM(neg) AS BIGINT) AS n_neg,
            SUM(pos * (2 * cumneg + neg)) AS num
          FROM cum)
        SELECT n_pos, n_neg,
          ROUND(CAST(num AS DOUBLE) / NULLIF(2.0 * n_pos * n_neg, 0), 6)
            AS auc,
          ROUND(CAST(num AS DOUBLE)
            / NULLIF(CAST(n_pos AS DOUBLE) * n_neg, 0) - 1.0, 6) AS gini
        FROM tot""")),

    // h49 — the TIME data type (Spark 4.1's new type, feature-flagged
    // behind spark.sql.timeType.enabled — set per-invocation, idempotent
    // under Verify's concurrent dual-SF regime since both writers set the
    // same value). Time-of-day analytics (peak-hour profiles, AM/PM
    // splits) otherwise ride error-prone epoch-mod arithmetic; here the
    // whole leg is typed: construct (make_time from the event timestamp's
    // wall-clock fields, whole seconds — TIME(6) string forms differ
    // cross-engine on fractions, so fractions never cross the boundary),
    // compare (< TIME '12:00:00'), order (min/max over TIME), extract
    // (hour/minute/second back out as ints). All codegen scalar ops +
    // one 2-phase agg over |event_type| groups — scan-speed at 100 TB.
    Q("h49_time_type",
      (s, d) => {
        s.conf.set("spark.sql.timeType.enabled", "true")
        events(s, d)
          .select(col("event_type"),
            expr("make_time(hour(ts_t), minute(ts_t), second(ts_t))")
              .as("tod"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("tod") < expr("TIME '12:00:00'"), 1L)
              .otherwise(0L)).as("n_am"),
            min(col("tod")).as("mn"), max(col("tod")).as("mx"))
          .select(col("event_type"), col("n_events"), col("n_am"),
            expr("hour(mn)").as("eh"), expr("minute(mn)").as("em"),
            expr("second(mn)").as("es"),
            expr("hour(mx)").as("lh"), expr("minute(mx)").as("lm"),
            expr("second(mx)").as("ls"))
          .orderBy("event_type")
      },
      Some("""WITH tod AS (SELECT event_type,
            make_time(CAST(extract(hour FROM ts) AS BIGINT),
              CAST(extract(minute FROM ts) AS BIGINT),
              CAST(extract(second FROM ts) AS DOUBLE)) AS t
          FROM events)
        SELECT event_type, COUNT(*) AS n_events,
          CAST(COUNT(*) FILTER (WHERE t < TIME '12:00:00') AS BIGINT)
            AS n_am,
          CAST(extract(hour FROM min(t)) AS INTEGER) AS eh,
          CAST(extract(minute FROM min(t)) AS INTEGER) AS em,
          CAST(extract(second FROM min(t)) AS INTEGER) AS es,
          CAST(extract(hour FROM max(t)) AS INTEGER) AS lh,
          CAST(extract(minute FROM max(t)) AS INTEGER) AS lm,
          CAST(extract(second FROM max(t)) AS INTEGER) AS ls
        FROM tod GROUP BY event_type ORDER BY event_type"""))
  )
}
