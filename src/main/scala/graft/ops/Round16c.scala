package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-16 batch 3 — the remaining TPC-H composite shapes expressible
  * over the fixture schema (no partsupp, no commit/receipt date pair, no
  * comment/phone columns — each key notes its substitution and keeps the
  * ORIGINAL query's plan-shape challenge intact). As with p1-p7 these
  * grade the OPTIMIZER's composition (reference surface:
  * `pandas_td/td.py :: read_td_query` arbitrary analytic SQL — SURVEY
  * §0-caveated anchor): correlated scalar aggregates must decorrelate to
  * one join, EXISTS/NOT-EXISTS pairs to semi/anti joins over a shared
  * exchange, self-referenced aggregates to a reused subplan — never a
  * per-row rescan.
  *
  * All money/quantity aggregates ride the Tables.dec decimal device so
  * every graded sum is reduction-order-free (hash-stable at any
  * partition count); double division/multiplication appears only AFTER
  * exact aggregation, where IEEE 754 makes it engine-identical.
  */
object Round16c {

  private val decSumDbl = (c: String) =>
    s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"

  /** j73's excision core, reusable by ScaleSoak under a different bench
    * split: cut every train-doc position covered by a benchmark-matching
    * 4-gram and report per-doc (n_tokens, removed_tokens, clean_md5).
    * `docs` needs (doc_id, toks); `isBench` partitions it. */
  private[graft] def exciseStats(
      docs: org.apache.spark.sql.DataFrame,
      isBench: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val bench = docs.where(isBench)
      .select(explode(expr(
        s"""array_distinct(transform(${Ngrams.starts("toks", 4)},
           i -> xxhash64(${Ngrams.gramAt("toks", 4)})))"""))
        .as("g")).distinct()
    val train = docs.where(!isBench)
    val hitStarts = train.select(col("doc_id"), explode(expr(
        s"""transform(${Ngrams.starts("toks", 4)},
           i -> struct(i AS p,
             xxhash64(${Ngrams.gramAt("toks", 4)}) AS g))"""))
        .as("s"))
      .select(col("doc_id"), col("s.p").as("p"), col("s.g").as("g"))
      .join(broadcast(bench), "g")
    val covered = hitStarts
      .select(col("doc_id"), explode(expr("sequence(p, p + 3)")).as("cp"))
      .distinct()
    // kept = positions with NO covering span: a clean anti join (a
    // filtered left join would mis-handle positions matching several
    // covered rows)
    val keptClean = train
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("i0", "tok")))
      .withColumn("p", col("i0") + 1)
      .join(covered.select(col("doc_id").as("cd"), col("cp")),
        col("doc_id") === col("cd") && col("p") === col("cp"), "left_anti")
    val agg = keptClean.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ", expr(
          "transform(sort_array(collect_list(struct(p, tok))), x -> x.tok)")))
          .as("clean_md5"))
    train.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("removed_tokens"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
  }

  def all: Seq[Q] = Seq(

    // p8 — TPC-H Q17 (small-quantity-order revenue): the CORRELATED
    // SCALAR AGGREGATE shape — each lineitem compares against
    // 0.2·avg(l_quantity) of ITS OWN part. Substitution: the
    // p_container predicate becomes p_size (fixture has no container).
    // The at-scale story: the subquery must decorrelate to ONE grouped
    // aggregate joined back, and the part filter must reduce lineitem
    // BEFORE that aggregate — the per-part average over a brand-filtered
    // join equals the average over all of lineitem for those parts
    // (the correlation key is p_partkey), so both the avg input and the
    // probe side shrink to ~0.3% of the fact table before any shuffle.
    // A naive engine rescans lineitem per outer row; this is one
    // broadcast of ~20 part keys + one small groupBy + one join.
    // Threshold arithmetic: exact decimal sum → double ÷ count × 0.2 —
    // identical IEEE ops in both engines, so the strict < is stable.
    Q("p8_tpch_q17",
      (s, d) => {
        val pt = t(s, d, "part")
          .where(col("p_brand") === "Brand#13" && col("p_size") <= 10)
          .select("p_partkey")
        val li = t(s, d, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .select("l_partkey", "l_quantity", "l_extendedprice")
        val avgq = li.groupBy(col("l_partkey").as("ap"))
          .agg((sum(dec(col("l_quantity"))).cast("double") /
            count(lit(1)) * 0.2).as("qlim"))
        li.join(avgq, col("l_partkey") === col("ap"))
          .where(col("l_quantity") < col("qlim"))
          .agg(round(sum(dec(col("l_extendedprice"))).cast("double") / 7.0, 2)
            .as("avg_yearly"))
      },
      Some(s"""WITH pt AS (SELECT p_partkey FROM part
            WHERE p_brand = 'Brand#13' AND p_size <= 10),
          li AS (SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN pt ON l_partkey = p_partkey),
          aq AS (SELECT l_partkey AS ap,
              ${decSumDbl("l_quantity")} / COUNT(*) * 0.2 AS qlim
            FROM li GROUP BY l_partkey)
        SELECT ROUND(${decSumDbl("l_extendedprice")} / 7.0, 2) AS avg_yearly
        FROM li JOIN aq ON l_partkey = ap WHERE l_quantity < qlim""")),

    // p9 — TPC-H Q22 (global sales opportunity): customers above the
    // GLOBAL average positive balance (scalar subquery → 1-row
    // broadcast, never a per-row re-aggregation) who have NO orders
    // (NOT EXISTS → left anti join on the shuffled custkey).
    // Substitutions: the phone-country-code set becomes a c_nationkey
    // set, and "no orders" (every fixture customer has orders) becomes
    // "dormant — no orders since 2001-01-01", which keeps the anti join
    // AND pushes a date filter to the orders scan first. At 100 TB the
    // anti join is the only fact-sized exchange; the threshold is one
    // broadcast row reused across all partitions.
    Q("p9_tpch_q22",
      (s, d) => {
        val cs = t(s, d, "customer")
          .where(col("c_nationkey").isin(1, 4, 9, 13, 20))
          .select("c_custkey", "c_nationkey", "c_acctbal")
        val thr = cs.where(col("c_acctbal") > 0.0)
          .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
            .as("thr"))
        cs.join(t(s, d, "orders")
            .where(col("o_orderdate") >= tsLit("2001-01-01"))
            .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .crossJoin(broadcast(thr))
          .where(col("c_acctbal") > col("thr"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            round(sum(dec(col("c_acctbal"))), 2).cast("double")
              .as("totacctbal"))
          .orderBy("c_nationkey")
      },
      Some(s"""WITH cs AS (SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer WHERE c_nationkey IN (1, 4, 9, 13, 20)),
          thr AS (SELECT ${decSumDbl("c_acctbal")} / COUNT(*) AS thr
            FROM cs WHERE c_acctbal > 0)
        SELECT c_nationkey, COUNT(*) AS numcust,
          CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
            AS totacctbal
        FROM cs, thr
        WHERE c_acctbal > thr
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // p10 — TPC-H Q21 (suppliers who kept orders waiting): the
    // EXISTS + NOT-EXISTS pair over the SAME fact table, correlated on
    // the outer row's orderkey AND inequality on its suppkey.
    // Substitution: "late" (l_receiptdate > l_commitdate, columns the
    // fixture lacks) becomes l_returnflag = 'R' — the double-correlation
    // shape is untouched: a supplier counts only when ANOTHER supplier
    // shares the order (semi) and NO OTHER supplier also flagged it
    // (anti). Both probes decorrelate to joins keyed on l_orderkey, so
    // the plan is three hash joins over one key — the exchange is
    // reusable — plus a broadcastable supplier dim; a naive engine runs
    // two correlated rescans per outer row. Top-100 via
    // TakeOrderedAndProject (pinned in Round16cSpec).
    Q("p10_tpch_q21",
      (s, d) => {
        val l1 = t(s, d, "lineitem").where(col("l_returnflag") === "R")
          .select("l_orderkey", "l_suppkey")
        val ordF = t(s, d, "orders").where(col("o_orderstatus") === "F")
          .select("o_orderkey")
        val l2 = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
        val l3 = t(s, d, "lineitem").where(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
        l1.join(ordF, col("l_orderkey") === col("o_orderkey"))
          .join(l2, col("l_orderkey") === col("o2") &&
            col("l_suppkey") =!= col("s2"), "left_semi")
          .join(l3, col("l_orderkey") === col("o3") &&
            col("l_suppkey") =!= col("s3"), "left_anti")
          .join(t(s, d, "supplier").select("s_suppkey", "s_name"),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), asc("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
          JOIN orders ON l1.l_orderkey = o_orderkey
          JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""")),

    // p11 — TPC-H Q16 (parts/supplier relationship): COUNT(DISTINCT)
    // grouped by three part attributes, suppliers excluded by a NOT-IN
    // subquery. Substitutions: partsupp (absent) is the distinct
    // (l_partkey, l_suppkey) projection of lineitem — the same relation
    // TPC-H derives it from — and the "complaints" comment regex becomes
    // s_acctbal < 0. Shape: the NOT IN must become an anti join against
    // a broadcastable bad-supplier set (NOT a per-row scan), the
    // distinct-pair reduction runs BEFORE the part join so the join
    // carries pairs not lineitems, and countDistinct rides the same
    // (brand,type,size)-keyed exchange via partial aggregation.
    Q("p11_tpch_q16",
      (s, d) => {
        val ps = t(s, d, "lineitem")
          .select("l_partkey", "l_suppkey").distinct()
        val bad = t(s, d, "supplier").where(col("s_acctbal") < 0.0)
          .select(col("s_suppkey").as("bad_supp"))
        val pt = t(s, d, "part")
          .where(col("p_brand") =!= "Brand#13" &&
            !col("p_type").like("MEDIUM%") &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        ps.join(pt, col("l_partkey") === col("p_partkey"))
          .join(broadcast(bad), col("l_suppkey") === col("bad_supp"),
            "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
            asc("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
          COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
          JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'MEDIUM%'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // p12 — TPC-H Q15 (top supplier): a revenue view referenced TWICE —
    // once as the relation, once inside the scalar max — the
    // self-referenced-aggregate shape. The quarter-bounded revenue
    // groupBy runs ONCE (the two references share the subplan; at scale
    // you'd localCheckpoint a genuinely expensive view, here Spark's
    // ReuseExchange covers it), its 1-row max broadcasts, and the
    // equality filter runs on the already-aggregated ~|suppliers| rows.
    // Revenue is the exact-decimal device, so the max-equality compares
    // bit-identical doubles in both engines.
    Q("p12_tpch_q15",
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .where(col("l_shipdate") >= tsLit("1997-04-01") &&
            col("l_shipdate") < tsLit("1997-07-01"))
          .groupBy(col("l_suppkey"))
          .agg(round(sum(dec(col("l_extendedprice")) *
            (lit(1) - dec(col("l_discount")))), 4).cast("double")
            .as("total_revenue"))
        val mx = rev.agg(max(col("total_revenue")).as("mx"))
        rev.crossJoin(broadcast(mx))
          .where(col("total_revenue") === col("mx"))
          .join(t(s, d, "supplier").select("s_suppkey", "s_name"),
            col("l_suppkey") === col("s_suppkey"))
          .select("s_suppkey", "s_name", "total_revenue")
          .orderBy("s_suppkey")
      },
      Some("""WITH rev AS (SELECT l_suppkey,
            CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
              (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE)
              AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-04-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey""")),

    // p13 — TPC-H Q13 (customer distribution): the ZERO-PRESERVING
    // two-level aggregation — customers with no qualifying orders must
    // appear in the c_count=0 bucket, so the join is LEFT OUTER and the
    // first count counts the JOIN-SIDE key (null-skipping), never
    // COUNT(*). Substitution: the comment NOT-LIKE filter becomes
    // "finished urgent orders" (priority 1-URGENT AND status F) —
    // selective enough that the c_count=0 bucket is non-empty at every
    // SF, which is the property this key exists to grade (Round16cSpec
    // pins it). Scale shape: first groupBy shuffles
    // on c_custkey (same key as the join — one exchange serves both),
    // second groupBy input is |customers| rows collapsing to ~tens of
    // distinct counts map-side.
    Q("p13_tpch_q13",
      (s, d) => {
        val ord = t(s, d, "orders")
          .where(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderstatus") === "F")
          .select("o_custkey")
        t(s, d, "customer").select("c_custkey")
          .join(ord, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_custkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_custkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
          GROUP BY c_custkey) cc
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // p14 — TPC-H Q9 (product type profit): profit per lineitem rolled
    // up by the SUPPLIER'S nation and order year — the shape where the
    // grouping keys come from three different tables and none of them is
    // the join key. Substitution: ps_supplycost (partsupp absent)
    // becomes p_retailprice — profit = extprice·(1−disc) −
    // retailprice·qty, all-decimal so the sum stays order-free.
    // Scale shape: the p_name filter prunes part BEFORE its join
    // (selective, broadcastable), nation broadcasts unconditionally,
    // and the only fact-sized exchanges are lineitem⋈orders on
    // orderkey and the final (n_name, year) groupBy, which partial
    // aggregation collapses map-side to ~25·|years| groups.
    Q("p14_tpch_q9",
      (s, d) => {
        val pt = t(s, d, "part").where(col("p_name").contains("red"))
          .select("p_partkey", "p_retailprice")
        val nat = t(s, d, "nation").select("n_nationkey", "n_name")
        t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount")
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"),
            year(col("o_orderdate")).cast("int").as("o_year"))
          .agg(round(sum(dec(col("l_extendedprice")) *
              (lit(1) - dec(col("l_discount"))) -
              dec(col("p_retailprice")) * dec(col("l_quantity"))), 4)
            .cast("double").as("sum_profit"))
          .orderBy(asc("n_name"), desc("o_year"))
      },
      Some("""SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
          CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
            (1 - CAST(l_discount AS DECIMAL(18,4))) -
            CAST(p_retailprice AS DECIMAL(18,4)) *
            CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE)
            AS sum_profit
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year ORDER BY n_name, o_year DESC""")),

    // d35 — LISTAGG ... WITHIN GROUP (ORDER BY …): the ordered
    // string-concatenation aggregate (ANSI 2016; Spark 4.0+ native
    // ListAgg, DuckDB string_agg with ORDER BY). The WITHIN-GROUP order
    // makes the result deterministic — an unordered listagg is
    // partition-order-dependent and could never hash-match. Scale shape:
    // a single grouped aggregate; the per-group payload is the concern
    // at 100 TB (a hot group concatenates its whole membership — same
    // discipline as d11 collect: bound the group or don't ship the op).
    Q("d35_listagg",
      (s, d) => Views.unique(s, "d35_sup" -> t(s, d, "supplier")) { v =>
        s.sql(s"""SELECT s_nationkey,
            listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS names,
            COUNT(*) AS n
          FROM ${v("d35_sup")}
          GROUP BY s_nationkey ORDER BY s_nationkey""")
      },
      Some("""SELECT s_nationkey,
          string_agg(s_name, ',' ORDER BY s_name) AS names,
          COUNT(*) AS n
        FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // b8 — quantified LIKE (LIKE ALL / LIKE ANY): Spark's multi-pattern
    // predicate surface. Planning property: both quantifiers fold to a
    // conjunction/disjunction of ordinary LIKEs (LikeAll/LikeAny
    // expressions), so they stay codegen'd row-level predicates that
    // push to the scan — never a join against a pattern table. The
    // oracle spells the expansion explicitly (DuckDB lacks the sugar),
    // so the key grades the desugaring itself.
    Q("b8_like_quantified",
      (s, d) => Views.unique(s, "b8_part" -> t(s, d, "part")) { v =>
        s.sql(s"""SELECT p_partkey, p_name, p_type
          FROM ${v("b8_part")}
          WHERE p_name LIKE ALL ('%e%', '%d%')
            AND p_type LIKE ANY ('ECONOMY%', 'PROMO%')
          ORDER BY p_partkey""")
      },
      Some("""SELECT p_partkey, p_name, p_type FROM part
        WHERE p_name LIKE '%e%' AND p_name LIKE '%d%'
          AND (p_type LIKE 'ECONOMY%' OR p_type LIKE 'PROMO%')
        ORDER BY p_partkey""")),

    // j67 — Gopher-style top n-gram MASS fraction: the repetition signal
    // j29 does not cover — not "what fraction of grams are duplicated"
    // but "how much of the document the single heaviest n-gram covers"
    // (Rae et al.'s top-n-gram character fraction, the filter that
    // catches pages dominated by one repeated phrase). Mass = max over
    // grams of count·length(gram); fraction = mass / length(text).
    // The max-of-integer-mass formulation needs NO tie-break (ties have
    // equal mass by definition) — that's what makes it hash-gradeable
    // where "the most common gram" is not (count ties across different
    // gram lengths would be ambiguous). Shape: one explode → one
    // (doc, n, gram) count → one (doc, n) max, all partial-aggregated;
    // the gram shuffle is the standard corpus-sized exchange every
    // n-gram op here pays. 2- and 3-grams ride one explode (struct'd)
    // and one gram exchange; the per-n maxes fold as conditional
    // aggregates in a single doc-keyed pass (Round16cSpec pins the
    // single-Generate shape).
    Q("j67_top_ngram_mass",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("text"),
            split(col("text"), " ").as("toks"))
        // short-doc guard lives INSIDE Ngrams.starts0 (the r16 ADVICE bug
        // was an unguarded DESCENDING sequence here; the guard is now
        // structural, not call-site discipline)
        val grams = docs.select(col("doc_id"), explode(expr(
          s"""concat(
               transform(${Ngrams.starts0("toks", 2)}, i -> struct(2 AS n,
                 concat_ws(' ', toks[i], toks[i+1]) AS gram)),
               transform(${Ngrams.starts0("toks", 3)}, i -> struct(3 AS n,
                 concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS gram)))"""))
          .as("g"))
          .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
        // both n-masses fold in ONE conditional aggregation — splitting
        // by n and self-joining would re-explode the corpus per n
        val mass = grams.groupBy("doc_id", "n", "gram")
          .agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(
            max(when(col("n") === 2, col("c") * length(col("gram"))))
              .as("m2"),
            max(when(col("n") === 3, col("c") * length(col("gram"))))
              .as("m3"))
        docs.select(col("doc_id"), length(col("text")).as("chars"))
          .join(mass, Seq("doc_id"), "left")
          .select(col("doc_id"),
            round(coalesce(col("m2").cast("double") / col("chars"), lit(0.0)),
              6).as("top2_frac"),
            round(coalesce(col("m3").cast("double") / col("chars"), lit(0.0)),
              6).as("top3_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, text,
            string_split(text, ' ') AS tk FROM documents),
          g AS (
            SELECT doc_id, 2 AS n, tk[i] || ' ' || tk[i+1] AS gram
            FROM toks, unnest(range(1, len(tk))) t(i)
            UNION ALL
            SELECT doc_id, 3, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
            FROM toks, unnest(range(1, len(tk) - 1)) t(i)),
          mass AS (SELECT doc_id, n, MAX(c * length(gram)) AS m
            FROM (SELECT doc_id, n, gram, COUNT(*) AS c FROM g
                  GROUP BY doc_id, n, gram) cg
            GROUP BY doc_id, n)
        SELECT d.doc_id,
          ROUND(COALESCE(CAST(m2.m AS DOUBLE) / length(d.text), 0.0), 6)
            AS top2_frac,
          ROUND(COALESCE(CAST(m3.m AS DOUBLE) / length(d.text), 0.0), 6)
            AS top3_frac
        FROM documents d
          LEFT JOIN mass m2 ON d.doc_id = m2.doc_id AND m2.n = 2
          LEFT JOIN mass m3 ON d.doc_id = m3.doc_id AND m3.n = 3
        ORDER BY d.doc_id""")),

    // a40 — landing-zone ingest with recursiveFileLookup +
    // pathGlobFilter: the raw-dump read pattern — data arrives as
    // arbitrarily nested date directories with sidecar files (manifests,
    // notes, checksums) interleaved, and the reader must take every
    // *.parquet at any depth and NOTHING else, without a partition
    // scheme. Unlike a14's partitioned layout the directory names carry
    // no columns; unlike a22's manifest the selection is structural.
    // The glob is applied at file-listing time — a 100 TB landing zone
    // lists once, the decoys never reach an executor.
    Q("a40_glob_ingest",
      (s, d) => {
        val out = Scratch.unique("a40")
        val ord = t(s, d, "orders")
        ord.where(col("o_orderkey") % 2 === 0).write.mode("overwrite")
          .parquet(s"$out/2021/01/batch_a")
        ord.where(col("o_orderkey") % 2 === 1).write.mode("overwrite")
          .parquet(s"$out/2021/02/deep/batch_b")
        // sidecar decoys the glob must skip (and one the reader must
        // not even consider: a non-matching extension at the top level)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$out/2021/01/notes.json"),
          """{"note":"sidecar"}""".getBytes("UTF-8"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$out/manifest.csv"),
          "file,rows\n".getBytes("UTF-8"))
        s.read
          .option("recursiveFileLookup", "true")
          .option("pathGlobFilter", "*.parquet")
          .parquet(out)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            round(col("o_totalprice"), 2).as("o_totalprice"),
            dateStr(col("o_orderdate")).as("o_orderdate"),
            col("o_orderpriority"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
          ROUND(o_totalprice, 2) AS o_totalprice,
          strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
          o_orderpriority
        FROM orders ORDER BY o_orderkey""")),

    // j68 — CCNet-style perplexity BUCKETING: the step after LM scoring
    // (j61/j66 produce the score; CCNet splits each language's corpus
    // into head/middle/tail at the 1/3 and 2/3 perplexity quantiles and
    // trains preferentially on the head). Composition: the j61 unigram
    // NLL over every doc → per-LANGUAGE tercile thresholds → bucket
    // label per doc. The thresholds relation is |languages| rows — it
    // broadcasts back over the scored corpus, so bucketing adds no
    // corpus-sized exchange beyond the scoring itself. Exact percentile
    // keeps the key hash-gradeable (both engines linear-interpolate on
    // identical round-6 doubles); at 100 TB you'd swap in
    // approx_percentile for the threshold pass (the d8→d18 trade,
    // same 2-line change), buckets unchanged except at the margin.
    Q("j68_perplexity_buckets",
      (s, d) => {
        val tok = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val vocab = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
        val total = tok.agg(count(lit(1)).cast("double").as("total"))
        val scored = tok.join(vocab, "term")
          .crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(round(avg(-log(col("cnt") / col("total"))), 6).as("nll"))
          .join(t(s, d, "documents").select("doc_id", "lang"), Seq("doc_id"))
        // round-6 thresholds: the two engines' linear interpolation can
        // differ in the last ulp exactly when a tercile lands ON a data
        // point (scores are themselves round-6, so rounding restores
        // bit-equality without moving any boundary materially)
        val thr = scored.groupBy(col("lang").as("tl"))
          .agg(round(expr("percentile(nll, 1.0/3)"), 6).as("t1"),
            round(expr("percentile(nll, 2.0/3)"), 6).as("t2"))
        scored.join(broadcast(thr), col("lang") === col("tl"))
          .select(col("doc_id"), col("lang"), col("nll"),
            when(col("nll") <= col("t1"), "head")
              .when(col("nll") <= col("t2"), "middle")
              .otherwise("tail").as("bucket"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
              unnest(string_split(text, ' ')) AS term FROM documents),
          vocab AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
          tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM tok),
          scored AS (SELECT t.doc_id,
              ROUND(AVG(-ln(v.cnt / (SELECT total FROM tot))), 6) AS nll
            FROM tok t JOIN vocab v ON t.term = v.term GROUP BY t.doc_id),
          sl AS (SELECT s.doc_id, d.lang, s.nll
            FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
          thr AS (SELECT lang AS tl,
              ROUND(quantile_cont(nll, 1.0/3), 6) AS t1,
              ROUND(quantile_cont(nll, 2.0/3), 6) AS t2
            FROM sl GROUP BY lang)
        SELECT doc_id, lang, nll,
          CASE WHEN nll <= t1 THEN 'head'
               WHEN nll <= t2 THEN 'middle'
               ELSE 'tail' END AS bucket
        FROM sl JOIN thr ON lang = tl
        ORDER BY doc_id""")),

    // j70 — dedup IMPACT report: the cluster-size histogram + token-
    // savings table every dedup paper and every production dedup run
    // publishes (how many clusters of each size, how many docs/tokens
    // does canonical-only retention remove). Composition over the SAME
    // pair core + hybrid connected components j14/j23/j44 ride —
    // singleton docs (no near-dup edge) join in as size-1 clusters via
    // a left join + coalesce(cluster, doc_id). Everything after the
    // clustering is two tiny groupBys (clusters, then sizes); the oracle
    // recomputes the transitive closure with a RECURSIVE CTE so even the
    // histogram is hash-checked end to end.
    Q("j70_dedup_report",
      (s, d) => {
        val toks = t(s, d, "documents").select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
        val cl = CC.cluster(s,
          LlmOps.nearDupPairsForTest(s, d, Knobs.pairMaxDf(s))
            .select("d1", "d2"))
        val assigned = toks
          .join(cl.withColumnRenamed("doc_id", "cd"),
            col("doc_id") === col("cd"), "left")
          .select(col("doc_id"), col("ntok"),
            coalesce(col("cluster"), col("doc_id")).as("cluster"))
        val perCluster = assigned.groupBy("cluster")
          .agg(count(lit(1)).as("sz"), sum(col("ntok")).as("tok"),
            min(struct(col("doc_id"), col("ntok"))).as("canon"))
        perCluster.groupBy(col("sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("sz") - 1).as("removed_docs"),
            sum(col("tok") - col("canon.ntok")).as("removed_tokens"))
          .orderBy("cluster_size")
      },
      Some("""WITH RECURSIVE tk AS (SELECT doc_id, string_split(text,' ') AS toks
            FROM documents WHERE len(string_split(text,' ')) >= 3),
          sh AS (SELECT DISTINCT doc_id,
              toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2] AS sh
            FROM tk, unnest(range(1, len(toks)-1)) i(i)),
          n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
          e AS (SELECT d1, d2 FROM p
            JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
            WHERE CAST(inter AS DOUBLE)
              / CAST(n1.n + n2.n - inter AS DOUBLE) >= 0.5),
          und AS (SELECT d1 AS a, d2 AS b FROM e UNION ALL SELECT d2, d1 FROM e),
          reach(a, b) AS (SELECT a, b FROM und
            UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
          cl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
            FROM reach GROUP BY a),
          toks2 AS (SELECT d.doc_id,
              CAST(len(string_split(d.text,' ')) AS BIGINT) AS ntok,
              COALESCE(cl.cluster, d.doc_id) AS cluster
            FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
          pc AS (SELECT cluster, COUNT(*) AS sz, SUM(ntok) AS tok,
              arg_min(ntok, doc_id) AS canon_tok
            FROM toks2 GROUP BY cluster)
        SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
          CAST(SUM(sz - 1) AS BIGINT) AS removed_docs,
          CAST(SUM(tok - canon_tok) AS BIGINT) AS removed_tokens
        FROM pc GROUP BY sz ORDER BY cluster_size""")),

    // j71 — embedding DISPERSION per label: the semantic-diversity
    // diagnostic (is a source's embedding cloud tight — redundant — or
    // spread?) computed WITHOUT any pairwise work: mean pairwise squared
    // distance = 2·(E‖x‖² − ‖E x‖²), so one pass for Σ‖x‖² plus the j7
    // per-dim centroid gives what the naive O(n²) join computes. At
    // 100 TB this is the difference between a scan-shaped statistic and
    // an impossible self-join. Variance term assembled from per-dim
    // sums; round-6 absorbs summation-order float noise (the j7 device).
    Q("j71_embed_dispersion",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val perdim = e
          .select(col("label"), posexplode(col("embedding"))
            .as(Seq("dim", "v")))
          .groupBy("label", "dim")
          .agg(sum(col("v").cast("double")).as("sd"), count(lit(1)).as("n"))
        val msq = perdim.groupBy(col("label").as("ml"))
          .agg(sum(col("sd") * col("sd") / (col("n") * col("n")))
            .as("msq"), max(col("n")).as("n"))
        val ssq = e.select(col("label"), expr(
            """aggregate(embedding, cast(0 as double),
               (a, x) -> a + cast(x as double) * cast(x as double))""")
            .as("nsq"))
          .groupBy("label").agg(sum(col("nsq")).as("ssq"))
        ssq.join(msq, col("label") === col("ml"))
          .select(col("label"), col("n").as("n_vectors"),
            round(col("ssq") / col("n") - col("msq"), 6).as("dispersion"))
          .orderBy("label")
      },
      Some("""WITH e AS (SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
              CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim
            FROM embeddings),
          pd AS (SELECT label, dim, SUM(v) AS sd, COUNT(*) AS n
            FROM e GROUP BY label, dim),
          m AS (SELECT label, SUM(sd * sd / (n * n)) AS msq, MAX(n) AS n
            FROM pd GROUP BY label),
          s AS (SELECT label, SUM(v * v) AS ssq FROM e GROUP BY label)
        SELECT s.label, m.n AS n_vectors,
          ROUND(s.ssq / m.n - m.msq, 6) AS dispersion
        FROM s JOIN m ON s.label = m.label
        ORDER BY s.label""")),

    // b9 — LATERAL correlated derived table (SQL:1999 LATERAL; Spark 4
    // and DuckDB share the surface): the subquery in FROM references the
    // outer row — the procedural "for each order, run this query" shape.
    // The optimizer must DECORRELATE it to one grouped aggregate joined
    // on the correlation key (Round16cSpec pins no-nested-loop): the
    // lineitem side aggregates ONCE by l_orderkey, never per outer row.
    // CROSS JOIN LATERAL semantics drop orders whose subquery returns
    // no rows — graded behavior, both engines agree.
    Q("b9_lateral_subquery",
      (s, d) => Views.unique(s,
        "b9_orders" -> t(s, d, "orders"),
        "b9_lineitem" -> t(s, d, "lineitem")) { v =>
        s.sql(s"""SELECT o_orderkey, lt.mx, lt.n
          FROM ${v("b9_orders")},
            LATERAL (SELECT MAX(l_quantity) AS mx, COUNT(*) AS n
              FROM ${v("b9_lineitem")}
              WHERE l_orderkey = o_orderkey) lt
          WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
          ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, lt.mx, lt.n
        FROM orders,
          LATERAL (SELECT MAX(l_quantity) AS mx, COUNT(*) AS n
            FROM lineitem WHERE l_orderkey = o_orderkey) lt
        WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        ORDER BY o_orderkey""")),

    // k23 — DISTRIBUTE BY / SORT BY: the Hive-dialect physical-layout
    // clauses pandas-td's TD-Hive tier exposes (partition-local sort
    // without a global order — the write-side clustering primitive).
    // The inner block plans as Exchange hashpartitioning(c_nationkey) +
    // partition-LOCAL Sort (Round16cSpec pins both); the outer ORDER BY
    // exists only to make the result hash-gradeable and layers a range
    // exchange on top. At scale DISTRIBUTE+SORT BY is what feeds
    // sorted-run writers (a20's layout) without paying a global sort.
    Q("k23_distribute_sort_by",
      (s, d) => Views.unique(s, "k23_cust" -> t(s, d, "customer")) { v =>
        s.sql(s"""SELECT c_nationkey, c_custkey,
            ROUND(c_acctbal, 2) AS c_acctbal
          FROM (SELECT * FROM ${v("k23_cust")}
            DISTRIBUTE BY c_nationkey SORT BY c_nationkey, c_custkey) x
          ORDER BY c_nationkey, c_custkey""")
      },
      Some("""SELECT c_nationkey, c_custkey, ROUND(c_acctbal, 2) AS c_acctbal
        FROM customer ORDER BY c_nationkey, c_custkey""")),

    // j72 — vocabulary truncation + OOV rate: the tokenizer-prep
    // diagnostic (cap the vocab at K terms by corpus frequency, measure
    // what fraction of each document falls out-of-vocabulary — the
    // number that decides whether K is big enough before training a
    // tokenizer). Deterministic vocab: top-K by (count DESC, term ASC) —
    // the tie-break is part of the spec, otherwise the vocab boundary is
    // partition-order-dependent and nothing downstream reproduces.
    // Shape: one Zipf-collapsed (term, count) aggregation, a K-row
    // TakeOrdered vocab that BROADCASTS back over the token stream, one
    // per-doc regroup — the vocab is orders smaller than the corpus at
    // any scale, same discipline as j50's word→token-count map.
    Q("j72_vocab_oov",
      (s, d) => {
        val k = 40
        val tok = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val vocab = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("term")).limit(k)
          .select(col("term").as("vt"))
        tok.join(broadcast(vocab), col("term") === col("vt"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"),
            sum(when(col("vt").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("doc_id"), col("n_tok"), col("n_oov"),
            round(col("n_oov").cast("double") / col("n_tok"), 6)
              .as("oov_rate"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
              unnest(string_split(text, ' ')) AS term FROM documents),
          vocab AS (SELECT term FROM
            (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term
             ORDER BY cnt DESC, term LIMIT 40) v)
        SELECT t.doc_id, COUNT(*) AS n_tok,
          CAST(SUM(CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_oov,
          ROUND(CAST(SUM(CASE WHEN vocab.term IS NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*), 6) AS oov_rate
        FROM tok t LEFT JOIN vocab ON t.term = vocab.term
        GROUP BY t.doc_id ORDER BY t.doc_id""")),

    // h43 — str_to_map + sentences: the two Hive string functions the
    // TD-Hive tier (k13/k14) text most commonly carries that h1-h7
    // don't cover. str_to_map parses 'k1:v1,k2:v2' config/props strings
    // into a MAP (the props-column idiom before VARIANT existed);
    // graded FLATTENED to a key-sorted joined string since map order is
    // collection order and declared output never carries array/struct
    // cells (SURVEY §8.4 / the k9 device). Per-row codegen'd string ops
    // — scan shaped.
    Q("h43_str_to_map",
      (s, d) => Views.unique(s, "h43_docs" -> t(s, d, "documents")) { v =>
        s.sql(s"""SELECT doc_id,
            array_join(transform(sort_array(map_entries(str_to_map(
              concat('lang:', lang, ',src:', source, ',n:',
                cast(n_chars AS STRING)), ',', ':'))),
              e -> concat(e.key, '=', e.value)), ';') AS props,
            element_at(str_to_map(
              concat('lang:', lang, ',src:', source), ',', ':'),
              'lang') AS lang_back
          FROM ${v("h43_docs")} ORDER BY doc_id""")
      },
      Some("""SELECT doc_id,
          'lang=' || lang || ';n=' || CAST(n_chars AS VARCHAR)
            || ';src=' || source AS props,
          lang AS lang_back
        FROM documents ORDER BY doc_id""")),

    // d36 — count_if + any_value in its DETERMINISTIC regime: count_if
    // is the predicate-count aggregate (sugar over sum(case), graded
    // against the explicit spelling); any_value is nondeterministic BY
    // CONTRACT, so the key grades it only where the group is
    // single-valued (min == max == any_value on a constant-per-group
    // column) — the same exact-regime discipline as d7/d21.
    Q("d36_count_if",
      (s, d) => Views.unique(s, "d36_ord" -> t(s, d, "orders")) { v =>
        s.sql(s"""SELECT o_orderpriority,
            count_if(o_orderstatus = 'F') AS n_f,
            count_if(o_totalprice > 100000) AS n_big,
            any_value(substring(o_orderpriority, 1, 1)) AS prio_digit
          FROM ${v("d36_ord")}
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_f,
          CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_big,
          substring(o_orderpriority, 1, 1) AS prio_digit
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // m13 — ISO-BMFF (MP4) NESTED box walk: the hierarchy leg of the
    // container family. m12 walks a flat variable-count entry table;
    // MP4 boxes NEST — the fixture is ftyp + a variable-length free box
    // (so moov's offset is genuinely data-dependent) + moov CONTAINING a
    // spec-layout 108-byte mvhd v0, and the decoder must (1) skip boxes
    // by their OWN length fields to find moov, then (2) descend into it
    // and parse mvhd's big-endian timescale/duration. Pure chained
    // offset arithmetic over hex slices — map-only codegen, no UDF,
    // content bytes never shuffle. dur_hex pins the raw duration SLICE
    // against the oracle's independent synthesis so a matched
    // encode/decode bug cannot cancel (the m2b discipline). The oracle
    // recomputes everything from the synthesis rule, never from bytes.
    Q("m13_decode_mp4",
      (s, d) => {
        val fixture = t(s, d, "documents").selectExpr("doc_id",
            "cast(doc_id % 7 AS INT) AS pad",
            "cast((doc_id % 50 + 1) * 600 + (doc_id % 7) * 60 AS BIGINT) AS dur",
            "CASE WHEN doc_id % 2 = 0 THEN '69736F6D' ELSE '6D703432' END AS brandhx")
          .selectExpr("doc_id",
            """concat(
                 '00000010', '66747970', brandhx, '00000200',
                 lpad(hex(8 + pad), 8, '0'), '66726565', repeat('00', pad),
                 '00000074', '6D6F6F76',
                 '0000006C', '6D766864',
                 '00000000', '00000000', '00000000',
                 lpad(hex(600), 8, '0'),
                 lpad(hex(dur), 8, '0'),
                 '00010000', '0100', repeat('00', 10),
                 '00010000', '00000000', '00000000',
                 '00000000', '00010000', '00000000',
                 '00000000', '00000000', '40000000',
                 repeat('00', 24), '00000000') AS hx""")
        fixture
          // walk: box 1 length → box 2 offset; skip non-moov boxes by
          // their own length; moov's first child here is mvhd
          .selectExpr("doc_id", "hx",
            "cast(conv(substr(hx, 1, 8), 16, 10) AS INT) * 2 + 1 AS p2")
          .selectExpr("doc_id", "hx", "p2",
            """cast(CASE WHEN substr(hx, p2 + 8, 8) = '6D6F6F76' THEN p2
                 ELSE p2 + cast(conv(substr(hx, p2, 8), 16, 10) AS INT) * 2
               END AS INT) AS pm""")
          .selectExpr("doc_id",
            "cast(unhex(substr(hx, 17, 8)) AS STRING) AS brand",
            "substr(hx, pm + 8, 8) AS moov_type_hex",
            "cast(conv(substr(hx, pm + 16 + 40, 8), 16, 10) AS BIGINT) AS timescale",
            "cast(conv(substr(hx, pm + 16 + 48, 8), 16, 10) AS BIGINT) AS duration",
            "substr(hx, pm + 16 + 48, 8) AS dur_hex")
          .selectExpr("doc_id", "brand", "timescale", "duration", "dur_hex",
            "round(cast(duration AS DOUBLE) / timescale, 3) AS dur_secs")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
          CAST(600 AS BIGINT) AS timescale,
          CAST((doc_id % 50 + 1) * 600 + (doc_id % 7) * 60 AS BIGINT)
            AS duration,
          upper(lpad(to_hex((doc_id % 50 + 1) * 600 + (doc_id % 7) * 60),
            8, '0')) AS dur_hex,
          ROUND(CAST((doc_id % 50 + 1) * 600 + (doc_id % 7) * 60 AS DOUBLE)
            / 600, 3) AS dur_secs
        FROM documents ORDER BY doc_id""")),

    // j73 — decontamination EXCISION: what you actually DO after j25/j65
    // flag contamination — cut the leaked spans out and keep the rest of
    // the document (drop-the-doc wastes the clean 95%; Lee et al. and
    // most production pipelines excise). Every train-doc position
    // covered by any benchmark-matching 4-gram ([p, p+3] span union,
    // j56's covered-position device pointed CROSS-corpus) is removed;
    // the cleaned text is graded as md5(reassembly) so no text column
    // rides the declared output. The bench gram set broadcasts (suite-
    // bounded, as j25); grams travel as xxhash64 longs. The per-doc
    // regroup that rebuilds text for hashing is the j56-documented
    // trade — at 100 TB emit (doc_id, spans) and excise at the consumer
    // (j56b's shape); the verdict columns here are the graded content.
    Q("j73_decontam_excise",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            split(col("text"), " ").as("toks"))
          .where(size(col("toks")) >= 4)
        exciseStats(docs, col("source") === "src0").orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, source, string_split(text,' ') AS toks
            FROM documents WHERE len(string_split(text,' ')) >= 4),
          b AS (SELECT DISTINCT
              toks[i.i]||' '||toks[i.i+1]||' '||toks[i.i+2]||' '||toks[i.i+3] AS g
            FROM tk, unnest(range(1, len(toks)-2)) i(i)
            WHERE source = 'src0'),
          tg AS (SELECT doc_id, i.i AS p,
              toks[i.i]||' '||toks[i.i+1]||' '||toks[i.i+2]||' '||toks[i.i+3] AS g
            FROM tk, unnest(range(1, len(toks)-2)) i(i)
            WHERE source <> 'src0'),
          hits AS (SELECT DISTINCT tg.doc_id, tg.p
            FROM tg JOIN b ON tg.g = b.g),
          cov AS (SELECT DISTINCT doc_id, p + j.j AS cp
            FROM hits, unnest(range(0, 4)) j(j)),
          tp AS (SELECT doc_id, i.i AS p, toks[i.i] AS tok
            FROM tk, unnest(range(1, len(toks)+1)) i(i)
            WHERE source <> 'src0'),
          kept AS (SELECT tp.doc_id, tp.p, tp.tok
            FROM tp LEFT JOIN cov
              ON tp.doc_id = cov.doc_id AND tp.p = cov.cp
            WHERE cov.cp IS NULL),
          agg AS (SELECT doc_id, COUNT(*) AS n_kept,
              md5(string_agg(tok, ' ' ORDER BY p)) AS clean_md5
            FROM kept GROUP BY doc_id),
          n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
            FROM tk WHERE source <> 'src0')
        SELECT n.doc_id, n.n_tokens,
          n.n_tokens - COALESCE(a.n_kept, 0) AS removed_tokens,
          COALESCE(a.clean_md5, md5('')) AS clean_md5
        FROM n LEFT JOIN agg a ON n.doc_id = a.doc_id
        ORDER BY n.doc_id""")),

    // j74 — quality-threshold SWEEP: the filter-tuning table (for each
    // candidate cutoff, how many docs/tokens survive) that decides where
    // to set a quality gate before committing a 100 TB filter run.
    // NOT a grid cross-join: the 9 thresholds fold as conditional sums
    // in ONE corpus pass (9 extra aggregate expressions, zero extra
    // rows) — the threshold grid is compile-time bounded, so sweeping it
    // costs the same scan the single-threshold filter would. Quality =
    // j9's composite (distinct-ratio/stopword blend), recomputed inline
    // so the key is self-contained.
    Q("j74_threshold_sweep",
      (s, d) => {
        val scored = t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"),
            round(
              (expr("size(array_distinct(toks))").cast("double") /
                size(col("toks"))) * 0.5 +
              (lit(1.0) -
                expr("size(filter(toks, x -> x = 'a' OR x = 'the'))")
                  .cast("double") / size(col("toks"))) * 0.5, 6)
              .as("q"))
        val sweeps = (1 to 9).map { i =>
          val thr = i / 10.0
          Seq(
            sum(when(col("q") >= thr, 1L).otherwise(0L))
              .as(s"docs_$i"),
            sum(when(col("q") >= thr, col("n_tok")).otherwise(0L))
              .as(s"toks_$i"))
        }
        val wide = scored.agg(sweeps.flatten.head, sweeps.flatten.tail: _*)
        // long-form output (threshold, n_docs, n_tokens): unpivot the
        // 1-row wide aggregate — 9 rows, driver-free
        wide.selectExpr(
          """inline(transform(sequence(1, 9), i -> struct(
               round(cast(i AS DOUBLE) / 10, 1) AS threshold,
               CASE i WHEN 1 THEN docs_1 WHEN 2 THEN docs_2
                 WHEN 3 THEN docs_3 WHEN 4 THEN docs_4 WHEN 5 THEN docs_5
                 WHEN 6 THEN docs_6 WHEN 7 THEN docs_7 WHEN 8 THEN docs_8
                 ELSE docs_9 END AS n_docs,
               CASE i WHEN 1 THEN toks_1 WHEN 2 THEN toks_2
                 WHEN 3 THEN toks_3 WHEN 4 THEN toks_4 WHEN 5 THEN toks_5
                 WHEN 6 THEN toks_6 WHEN 7 THEN toks_7 WHEN 8 THEN toks_8
                 ELSE toks_9 END AS n_tokens)))""")
          .orderBy("threshold")
      },
      Some("""WITH x AS (SELECT doc_id,
            CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
            ROUND((CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                / len(string_split(text,' '))) * 0.5
              + (1.0 - CAST(len(list_filter(string_split(text,' '),
                  t -> t = 'a' OR t = 'the')) AS DOUBLE)
                / len(string_split(text,' '))) * 0.5, 6) AS q
          FROM documents)
        SELECT ROUND(i.i / 10.0, 1) AS threshold,
          CAST(SUM(CASE WHEN q >= i.i / 10.0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_docs,
          CAST(SUM(CASE WHEN q >= i.i / 10.0 THEN n_tok ELSE 0 END)
            AS BIGINT) AS n_tokens
        FROM x, unnest(range(1, 10)) i(i)
        GROUP BY i.i ORDER BY threshold""")),

    // j75 — exact-N reproducible sample: "give me exactly 10,000 docs,
    // same ones every run, any cluster size" — the eval-set carve-out
    // j22b's rate-based hash threshold cannot promise (a rate yields
    // a binomial count). Order by md5(doc_id) and take N: the hash
    // order is a deterministic shuffle of the corpus, and the plan is
    // TakeOrderedAndProject (per-partition N-heaps, never a global
    // sort — the f2 property on the hash axis). Spec-pins the operator.
    Q("j75_sample_exact_n",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("h"))
        .orderBy("h")
        .limit(50)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM
          (SELECT doc_id, source FROM documents
           ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 50) x
        ORDER BY doc_id""")),

    // k24 — table-valued functions in FROM: range() as a generated
    // relation (the spine/sequence generator every gap-fill and
    // synthetic-dimension pattern starts from — a16's spine spelled as
    // a TVF) and inline() exploding a struct array into rows. range()
    // is a LEAF operator generating rows distributed across partitions
    // — no data read at all; joined against an aggregate it grades the
    // generator's values, not just its count.
    Q("k24_table_functions",
      (s, d) => Views.unique(s, "k24_ord" -> t(s, d, "orders")) { v =>
        s.sql(s"""SELECT r.id AS bucket_id,
            COALESCE(o.n, 0) AS n_orders
          FROM range(0, 5) r
          LEFT JOIN (SELECT o_orderkey % 5 AS b, COUNT(*) AS n
            FROM ${v("k24_ord")} GROUP BY o_orderkey % 5) o
            ON r.id = o.b
          ORDER BY bucket_id""")
      },
      Some("""SELECT r.i AS bucket_id, COALESCE(o.n, 0) AS n_orders
        FROM range(0, 5) r(i)
        LEFT JOIN (SELECT o_orderkey % 5 AS b, COUNT(*) AS n
          FROM orders GROUP BY o_orderkey % 5) o ON r.i = o.b
        ORDER BY bucket_id""")),

    // h44 — ANSI TIMESTAMPADD/TIMESTAMPDIFF: the unit-quantified
    // timestamp arithmetic surface (h2/h24 cover the td_*/function
    // spellings; this is the SQL-standard form with its unit-boundary
    // semantics — TIMESTAMPDIFF counts COMPLETE units, so 23:59:59 of
    // elapsed time is 0 days). Graded across four units incl. the
    // month edge (adding a month to Jan 31 clamps). Oracle spells
    // DuckDB's date_diff/date_add equivalents.
    Q("h44_timestamp_arith",
      (s, d) => Views.unique(s, "h44_ord" -> t(s, d, "orders")) { v =>
        s.sql(s"""SELECT o_orderkey,
            date_format(timestampadd(DAY, 30, o_orderdate),
              'yyyy-MM-dd') AS plus_30d,
            date_format(timestampadd(MONTH, 1, o_orderdate),
              'yyyy-MM-dd') AS plus_1m,
            timestampdiff(DAY, o_orderdate,
              TIMESTAMP '2001-01-01 00:00:00') AS days_to_2001,
            timestampdiff(HOUR, o_orderdate,
              TIMESTAMP '2001-01-01 00:00:00') AS hours_to_2001
          FROM ${v("h44_ord")}
          WHERE o_orderkey <= 200 ORDER BY o_orderkey""")
      },
      // oracle note: DuckDB 1.0.0's CSE erroneously unifies two
      // `col + <constant interval>` expressions over a scanned column
      // (both evaluate as the FIRST interval); the '+ INTERVAL 0 seconds'
      // wrapper makes the month-add structurally distinct. Verified:
      // literal-timestamp probes are unaffected, scans are.
      Some("""SELECT o_orderkey,
          strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
          strftime((o_orderdate + INTERVAL '0 seconds') + INTERVAL 1 MONTH,
            '%Y-%m-%d') AS plus_1m,
          CAST(trunc(date_diff('second', o_orderdate,
            TIMESTAMP '2001-01-01 00:00:00') / 86400.0) AS BIGINT)
            AS days_to_2001,
          CAST(trunc(date_diff('second', o_orderdate,
            TIMESTAMP '2001-01-01 00:00:00') / 3600.0) AS BIGINT)
            AS hours_to_2001
        FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""")),

    // b10 — IS [NOT] DISTINCT FROM: the null-safe comparison PREDICATE
    // (c19 grades the join form; this is the filter/projection form —
    // NULL IS DISTINCT FROM NULL is FALSE where NULL <> NULL is NULL,
    // the three-valued-logic trap every hand-written diff query hits).
    // A planted-null projection makes all four truth-table cells
    // non-empty.
    Q("b10_is_distinct_from",
      (s, d) => Views.unique(s, "b10_cust" -> t(s, d, "customer")
        .selectExpr("c_custkey",
          "CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS a",
          "CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS b")) {
        v =>
          s.sql(s"""SELECT c_custkey, a, b,
              a IS DISTINCT FROM b AS is_diff,
              a IS NOT DISTINCT FROM b AS is_same
            FROM ${v("b10_cust")}
            WHERE c_custkey <= 300 ORDER BY c_custkey""")
      },
      Some("""WITH x AS (SELECT c_custkey,
            CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS a,
            CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS b
          FROM customer WHERE c_custkey <= 300)
        SELECT c_custkey, a, b,
          a IS DISTINCT FROM b AS is_diff,
          a IS NOT DISTINCT FROM b AS is_same
        FROM x ORDER BY c_custkey""")),

    // m14 — SRT subtitle parsing: the caption/transcript sidecar every
    // video pipeline carries next to its media column — cue blocks
    // (index, "HH:MM:SS,mmm --> HH:MM:SS,mmm", text) parsed into typed
    // rows. The fixture RENDERS the timestamps through the wall-clock
    // formatter and the decoder re-derives milliseconds from the parsed
    // fields, so a matched render/parse bug cannot cancel against the
    // oracle's direct integer synthesis. split-on-blank-line + one
    // regexp per field, all per-row codegen — scan shaped; cues explode
    // AFTER parsing so only typed fields ride the generator.
    Q("m14_parse_srt",
      (s, d) => {
        val fmt = (c: String) =>
          s"""concat(lpad(cast($c div 3600000 AS STRING), 2, '0'), ':',
              lpad(cast(($c div 60000) % 60 AS STRING), 2, '0'), ':',
              lpad(cast(($c div 1000) % 60 AS STRING), 2, '0'), ',',
              lpad(cast($c % 1000 AS STRING), 3, '0'))"""
        t(s, d, "documents").selectExpr("doc_id",
            "cast(1 + doc_id % 3 AS INT) AS cues")
          .selectExpr("doc_id",
            s"""array_join(transform(${Ngrams.seqAsc("1", "cues")}, i -> concat(
                 cast(i AS STRING), '\n',
                 ${fmt("((doc_id % 60) * 1000 + (i-1) * 4000)")}, ' --> ',
                 ${fmt("((doc_id % 60) * 1000 + (i-1) * 4000 + 2000 + (doc_id * i) % 1500)")},
                 '\n', repeat('w ', cast(1 + i % 3 AS INT)), 'end')),
               '\n\n') AS srt""")
          .selectExpr("doc_id",
            "posexplode(split(srt, '\n\n')) AS (i0, block)")
          .selectExpr("doc_id",
            "cast(regexp_extract(block, '^([0-9]+)\n', 1) AS INT) AS idx",
            """cast(regexp_extract(block, '([0-9]{2}):[0-9]{2}:[0-9]{2},[0-9]{3} -->', 1) AS BIGINT) * 3600000
             + cast(regexp_extract(block, '[0-9]{2}:([0-9]{2}):[0-9]{2},[0-9]{3} -->', 1) AS BIGINT) * 60000
             + cast(regexp_extract(block, '[0-9]{2}:[0-9]{2}:([0-9]{2}),[0-9]{3} -->', 1) AS BIGINT) * 1000
             + cast(regexp_extract(block, '[0-9]{2}:[0-9]{2}:[0-9]{2},([0-9]{3}) -->', 1) AS BIGINT) AS start_ms""",
            """cast(regexp_extract(block, '--> ([0-9]{2}):', 1) AS BIGINT) * 3600000
             + cast(regexp_extract(block, '--> [0-9]{2}:([0-9]{2}):', 1) AS BIGINT) * 60000
             + cast(regexp_extract(block, '--> [0-9]{2}:[0-9]{2}:([0-9]{2}),', 1) AS BIGINT) * 1000
             + cast(regexp_extract(block, '--> [0-9]{2}:[0-9]{2}:[0-9]{2},([0-9]{3})', 1) AS BIGINT) AS end_ms""",
            "size(split(regexp_extract(block, '\n([^\n]*)$', 1), ' ')) - 1 AS n_words")
          .selectExpr("doc_id", "idx", "start_ms", "end_ms",
            "end_ms - start_ms AS dur_ms", "cast(n_words AS INT) AS n_words")
          .orderBy("doc_id", "idx")
      },
      Some("""SELECT doc_id, CAST(i.i AS INT) AS idx,
          (doc_id % 60) * 1000 + (i.i - 1) * 4000 AS start_ms,
          (doc_id % 60) * 1000 + (i.i - 1) * 4000 + 2000
            + (doc_id * i.i) % 1500 AS end_ms,
          2000 + (doc_id * i.i) % 1500 AS dur_ms,
          CAST(1 + i.i % 3 AS INT) AS n_words
        FROM documents, unnest(range(1, CAST(1 + doc_id % 3 AS INT) + 1)) i(i)
        ORDER BY doc_id, idx""")),

    // f5 — KEYSET pagination: the at-scale alternative f4 documents —
    // instead of OFFSET (which scans and discards every earlier row on
    // every page), the cursor is the last row's sort key and the page
    // is a tuple-comparison FILTER + top-k. The row-value comparison
    // (o_orderdate, o_orderkey) > (cursor...) is lexicographic — spelled
    // struct-vs-struct in Spark (same semantics as the SQL row
    // constructor DuckDB accepts). The filter pushes toward the scan and
    // the page is TakeOrderedAndProject: page N costs the same as page 1
    // at any depth, which OFFSET cannot promise at 100 TB.
    Q("f5_keyset_pagination",
      (s, d) => t(s, d, "orders")
        // NTZ→LTZ cast is the identity under the pinned UTC session and
        // makes the struct comparison type-exact against the cursor
        .where(struct(col("o_orderdate").cast("timestamp"),
            col("o_orderkey")) >
          struct(tsLit("1997-06-15"), lit(100L)))
        .select(col("o_orderkey"),
          dateStr(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
        .limit(20),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
            AS o_orderdate, o_orderpriority
        FROM orders
        WHERE (o_orderdate, o_orderkey) >
          (TIMESTAMP '1997-06-15 00:00:00', 100)
        ORDER BY o_orderdate, o_orderkey LIMIT 20""")),

    // j76 — split LEAKAGE audit: the measurement that justifies j44's
    // cluster-safe split — count near-dup pairs whose members land in
    // DIFFERENT splits under (a) the naive per-doc hash split (j15's
    // rule) and (b) the cluster-keyed split (j44's rule). Cluster-safe
    // must audit to ZERO cross-split pairs BY CONSTRUCTION (both members
    // share the cluster, the split key); the doc-hash row measures the
    // leakage the naive rule ships to eval. One pair-core pass feeds
    // both counts (pairs persist; the two split labels are projections
    // of one assignment relation); the oracle recomputes clusters via
    // the RECURSIVE CTE and both md5 bucketings, so the audit itself is
    // hash-checked.
    Q("j76_split_leakage_audit",
      (s, d) => {
        val pairs = LlmOps.jaccardPairs(LlmOps.shingles(s, d),
          LlmOps.shingleCounts(s, d), Knobs.pairMaxDf(s))
          .select("d1", "d2").persist()
        val labeled = CC.cluster(s, pairs)
        def splitOf(keyCol: String) = expr(
          s"""CASE WHEN ${Hashes.bucket(keyCol, 100)} < 80 THEN 'train'
             WHEN ${Hashes.bucket(keyCol, 100)} < 90 THEN 'val'
             ELSE 'test' END""")
        val assign = t(s, d, "documents").select(col("doc_id"))
          .join(labeled, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("cluster"))
          .select(col("doc_id"), splitOf("doc_id").as("sd"),
            splitOf("cluster").as("sc"))
        val joined = pairs
          .join(assign.select(col("doc_id").as("d1"),
            col("sd").as("sd1"), col("sc").as("sc1")), "d1")
          .join(assign.select(col("doc_id").as("d2"),
            col("sd").as("sd2"), col("sc").as("sc2")), "d2")
        joined.agg(
            sum(when(col("sd1") =!= col("sd2"), 1L).otherwise(0L))
              .as("cross_doc"),
            sum(when(col("sc1") =!= col("sc2"), 1L).otherwise(0L))
              .as("cross_cluster"),
            count(lit(1)).as("total"))
          .selectExpr(
            """stack(2,
                 'cluster_safe', cross_cluster, total,
                 'doc_hash', cross_doc, total)
               AS (method, cross_pairs, total_pairs)""")
          .orderBy("method")
      },
      Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, string_split(text,' ') AS toks
            FROM documents WHERE len(string_split(text,' ')) >= 3),
          sh AS (SELECT DISTINCT doc_id,
              toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2] AS sh
            FROM tk, unnest(range(1, len(toks)-1)) i(i)),
          n AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id),
          e AS (SELECT d1, d2 FROM p
            JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
            WHERE CAST(inter AS DOUBLE)
              / CAST(n1.n + n2.n - inter AS DOUBLE) >= 0.5),
          und AS (SELECT d1 AS a, d2 AS b FROM e UNION ALL SELECT d2, d1 FROM e),
          reach(a, b) AS (SELECT a, b FROM und
            UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
          lab AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
            FROM reach GROUP BY a),
          f AS (SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster
            FROM documents d LEFT JOIN lab l USING (doc_id)),
          g AS (SELECT doc_id,
              CASE WHEN ${Hashes.bucketSql("doc_id", 100)} < 80 THEN 'train'
                WHEN ${Hashes.bucketSql("doc_id", 100)} < 90 THEN 'val'
                ELSE 'test' END AS sd,
              CASE WHEN ${Hashes.bucketSql("cluster", 100)} < 80 THEN 'train'
                WHEN ${Hashes.bucketSql("cluster", 100)} < 90 THEN 'val'
                ELSE 'test' END AS sc
            FROM f),
          j AS (SELECT e.d1, e.d2, g1.sd AS sd1, g1.sc AS sc1,
              g2.sd AS sd2, g2.sc AS sc2
            FROM e JOIN g g1 ON e.d1 = g1.doc_id
              JOIN g g2 ON e.d2 = g2.doc_id),
          w AS (SELECT
              CAST(SUM(CASE WHEN sd1 <> sd2 THEN 1 ELSE 0 END) AS BIGINT)
                AS cross_doc,
              CAST(SUM(CASE WHEN sc1 <> sc2 THEN 1 ELSE 0 END) AS BIGINT)
                AS cross_cluster,
              COUNT(*) AS total FROM j)
        SELECT 'cluster_safe' AS method, cross_cluster AS cross_pairs,
          total AS total_pairs FROM w
        UNION ALL
        SELECT 'doc_hash', cross_doc, total FROM w
        ORDER BY method""")),

    // e16 — EWMA (pandas ewm(alpha=.5).mean(), adjusted form) engine-
    // side: the exponentially weighted rolling metric every monitoring /
    // feature pipeline wants and SQL windows don't provide natively
    // (the recursion s_t = αx_t + (1-α)s_{t-1} has no closed window
    // form). Device: a bounded 10-row frame collects the trailing
    // values IN FRAME ORDER and one aggregate() fold applies the
    // adjusted weights Σ(1-α)^k·x / Σ(1-α)^k. α = 0.5 makes every
    // weight an exact power of two — scaling a double by 2^-k never
    // rounds — and both engines fold the same list left-to-right, so
    // the statistic is bit-stable cross-engine (round-6 belt anyway).
    // The 10-row cap bounds both state and the (1-α)^k tail (2^-10 <
    // 1e-3 of the weight mass) — the same truncation pandas' ewm
    // effectively has at float precision, made explicit.
    Q("e16_ewma",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
          .rowsBetween(-9, 0)
        // NULL measures leave the series on BOTH sides (EventsGuardSpec:
        // collect_list skips nulls, DuckDB list() keeps them, and an
        // all-null frame's empty vals made the 2-power(0.5,-1)
        // normalizer an ANSI divide-by-zero)
        events(s, d).where(col("event_id") < 2000 &&
            col("value").isNotNull)
          .select(col("event_id"), col("user_id"), col("value"))
          .withColumn("vals", collect_list(col("value")).over(w))
          .selectExpr("event_id", "user_id",
            s"""round(
                 aggregate(${Ngrams.starts0("vals", 1)},
                   cast(0 AS DOUBLE),
                   (acc, i) -> acc + element_at(vals, i + 1)
                     * power(0.5, size(vals) - 1 - i),
                   acc -> acc / (2.0 - power(0.5, size(vals) - 1))),
                 6) AS ewma""")
          .orderBy("event_id")
      },
      Some("""WITH v AS (SELECT event_id, user_id, value,
            list(value) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vals
          FROM events WHERE event_id < 2000 AND value IS NOT NULL)
        SELECT event_id, user_id,
          ROUND(
            list_sum(list_transform(range(0, len(vals)),
              i -> vals[i + 1] * power(0.5, len(vals) - 1 - i)))
            / (2.0 - power(0.5, len(vals) - 1)), 6) AS ewma
        FROM v ORDER BY event_id""")),

    // j77 — winsorization: clamp a metric to its per-group [p05, p95]
    // band — the outlier-robust normalization feature pipelines apply
    // before training on heavy-tailed signals (j58 GATES outliers out;
    // winsorizing KEEPS the row at the boundary value, preserving
    // counts). Thresholds are one grouped exact-percentile pass — a
    // |groups|-row relation broadcast back (the j68 device); at 100 TB
    // swap approx_percentile in for the threshold pass, clamps
    // unchanged except at the margin. Round-6 thresholds restore
    // cross-engine bit-equality where interpolation lands on a point.
    Q("j77_winsorize",
      (s, d) => {
        val ev = events(s, d).where(col("event_id") < 3000)
          .select(col("event_id"), col("event_type"), col("value"))
        val thr = ev.groupBy(col("event_type").as("tt"))
          .agg(round(expr("percentile(value, 0.05)"), 6).as("lo"),
            round(expr("percentile(value, 0.95)"), 6).as("hi"))
        ev.join(broadcast(thr), col("event_type") === col("tt"))
          .select(col("event_id"), col("event_type"),
            round(col("value"), 6).as("value"),
            round(greatest(least(col("value"), col("hi")), col("lo")), 6)
              .as("winsorized"),
            (col("value") < col("lo") || col("value") > col("hi"))
              .as("clamped"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (SELECT event_id, event_type, value FROM events
            WHERE event_id < 3000),
          thr AS (SELECT event_type AS tt,
              ROUND(quantile_cont(value, 0.05), 6) AS lo,
              ROUND(quantile_cont(value, 0.95), 6) AS hi
            FROM ev GROUP BY event_type)
        SELECT event_id, event_type, ROUND(value, 6) AS value,
          ROUND(GREATEST(LEAST(value, hi), lo), 6) AS winsorized,
          (value < lo OR value > hi) AS clamped
        FROM ev JOIN thr ON event_type = tt
        ORDER BY event_id""")),

    // j78 — label-BALANCED exact-N sample: n-per-class eval-set
    // construction (j75 gives exactly N overall; class-imbalanced
    // corpora need exactly N PER LABEL, reproducibly). row_number over
    // (label, md5 order) ≤ N — deterministic, and the plan is the e7
    // top-k-per-group shape: one hash exchange on label, per-partition
    // sort bounded by the frame, no global sort. The md5 axis makes
    // membership independent of ingestion order — re-runs and
    // cluster-size changes return the same sample.
    Q("j78_balanced_sample",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("label")
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        t(s, d, "embeddings")
          .select(col("vec_id"), col("label"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 5)
          .select(col("label"), col("vec_id"),
            col("rn").cast("long").as("rn"))
          .orderBy("label", "rn")
      },
      Some("""SELECT label, vec_id, rn FROM
          (SELECT label, vec_id,
             CAST(row_number() OVER (PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT)
               AS rn
           FROM embeddings) x
        WHERE rn <= 5 ORDER BY label, rn""")),

    // a41 — corrupt-record ingestion semantics: real landing zones
    // carry malformed lines, and the reader's failure MODE is part of
    // the contract. PERMISSIVE mode (graded here) keeps every line —
    // corrupt ones surface with null fields and the raw text in the
    // _corrupt_record column, so bad data is QUARANTINED in-band, never
    // silently dropped (the count reconciles: good + bad = lines).
    // FAILFAST's throw is pinned in Round16cSpec. The fixture writes
    // one JSONL line per document DISTRIBUTED (df.write.text), with
    // every 97th line truncated mid-object; the oracle recomputes both
    // counts from the synthesis rule.
    Q("a41_corrupt_records",
      (s, d) => {
        val out = Scratch.unique("a41")
        t(s, d, "documents").select(
            when(col("doc_id") % 97 === 0,
              concat(lit("""{"doc_id": """), col("doc_id"),
                lit(""", "lang": """)))
            .otherwise(concat(lit("""{"doc_id": """), col("doc_id"),
              lit(""", "lang": """"), col("lang"), lit(""""}""")))
            .as("value"))
          .coalesce(2).write.mode("overwrite").text(out)
        val schema = "doc_id LONG, lang STRING, _corrupt_record STRING"
        s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(out)
          .groupBy(coalesce(col("lang"), lit("_corrupt")).as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("bucket")
      },
      Some("""SELECT CASE WHEN doc_id % 97 = 0 THEN '_corrupt' ELSE lang END
            AS bucket, COUNT(*) AS n
        FROM documents GROUP BY bucket ORDER BY bucket""")),

    // h46 — XPath extraction: the XML sibling of h5's JSON-path tier
    // (a28 reads whole XML FILES; these are the per-VALUE extractors
    // for an XML-typed string column — legacy feeds, SOAP payloads,
    // sitemap entries). xpath_string / xpath_int / xpath(...) count,
    // all per-row codegen'd — scan shaped. DuckDB has no XPath, so the
    // oracle recomputes every output from the synthesis rule (the m-key
    // discipline: build and parse can't share a bug).
    Q("h46_xpath",
      (s, d) => t(s, d, "documents")
        .selectExpr("doc_id",
          """concat('<doc><id>', cast(doc_id AS STRING), '</id><lang>',
             lang, '</lang><ws>',
             repeat('<w>t</w>', cast(1 + doc_id % 4 AS INT)),
             '</ws></doc>') AS xml""")
        .selectExpr("doc_id",
          "xpath_string(xml, '/doc/lang') AS lang",
          "xpath_long(xml, '/doc/id') AS id_back",
          "cast(size(xpath(xml, '/doc/ws/w/text()')) AS BIGINT) AS n_w")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, doc_id AS id_back,
          CAST(1 + doc_id % 4 AS BIGINT) AS n_w
        FROM documents ORDER BY doc_id""")),

    // j79 — the COMPOSED data recipe, round-16 edition: j35 chains the
    // classic cleaning stages; this chains the r16 additions the way a
    // FineWeb/CCNet-class pipeline actually orders them — (1) j9's
    // quality gate, (2) exact dedup on the lead-paragraph digest (the
    // CCNet order — dedup BEFORE scoring so duplicated mass can't skew
    // the quantile cut), (3) j68's perplexity cut (drop each language's
    // tail tercile; LM fit on the whole train corpus, thresholds on the
    // deduped survivors — the population entering the cut), (4) j73's
    // benchmark-span
    // EXCISION with a drop rule (excised docs losing >50% of their
    // tokens leave the corpus; the rest stay, trimmed). ONE lazy plan:
    // the per-doc predicates evaluate below the dedup shuffle, the
    // bench gram set broadcasts, and every train doc exits with a
    // stage ATTRIBUTION (the audit trail a production run must emit —
    // why did this doc leave?). Oracle recomposes all four stages from
    // their proven CTE pieces, so the composition itself hash-checks.
    Q("j79_data_recipe",
      (s, d) => {
        // the composed plan references the parsed corpus from EVERY stage
        // (quality gate, LM fit, dedup, attribution joins, excision) —
        // unpersisted, Catalyst happily plans one parquet scan + re-split
        // per reference (the r17 soak measured 44 scans / 0 reused
        // exchanges), which at 100 TB is 44 corpus reads. One persist at
        // the parse boundary makes every stage derive from a single scan;
        // the Verify/Bench harnesses release caches per query, so the
        // persist is charged to this query alone.
        val cache: DataFrame => DataFrame =
          if (Knobs.recipeStageCache(s))
            _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          else identity
        // the CORPUS persist is level-tunable separately from the narrow
        // flag tables: at 100 TB it is a full second copy of the dataset
        // (r17 verdict item 5) — see Knobs.recipeCorpusCacheLevel for the
        // soak-measured ladder (memory_and_disk | disk_only | none).
        val corpusCache: DataFrame => DataFrame =
          if (!Knobs.recipeStageCache(s)) identity
          else Knobs.recipeCorpusCacheLevel(s) match {
            case "memory_and_disk" =>
              _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            case "disk_only" =>
              _.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
            case _ => identity
          }
        val all = corpusCache(t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("lang"), col("text"),
            split(col("text"), " ").as("toks"))
          .where(size(col("toks")) >= 4))
        val train = all.where(col("source") =!= "src0")
        // stage 1: quality composite (j9's blend)
        val q = train.withColumn("q", round(
            (expr("size(array_distinct(toks))").cast("double") /
              size(col("toks"))) * 0.5 +
            (lit(1.0) -
              expr("size(filter(toks, x -> x = 'a' OR x = 'the'))")
                .cast("double") / size(col("toks"))) * 0.5, 6))
          .withColumn("pass_q", col("q") >= 0.63)
        // stage 2: unigram-NLL over the train corpus (j61), per-lang
        // 2/3-quantile threshold over stage-1 survivors (j68's device)
        // STAGE-OUTPUT BOUNDARIES (r17, soak-driven): the attribution
        // joins and every later stage reference earlier stages, and an
        // unpersisted chain re-derives each one per reference — the
        // pre-fix soak measured 44 parquet scans / 0 reused exchanges
        // and composed cost ≈ stage-family sum only because this SF is
        // shuffle-light. The production shape is ONE cached corpus +
        // NARROW (doc_id, flag) per-stage tables, each persisted at its
        // boundary so its explode/window/join pipeline runs exactly
        // once; toks re-join from the cached corpus where a later stage
        // needs them. Per-doc flag tables are O(docs), not O(corpus) —
        // cacheable at any SF.
        val qf = cache(q.select(col("doc_id"), col("pass_q")))
        val tok = train.select(col("doc_id"),
          explode(col("toks")).as("term"))
        val vocab = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
        val total = tok.agg(count(lit(1)).cast("double").as("total"))
        val nll = tok.join(vocab, "term").crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(round(avg(-log(col("cnt") / col("total"))), 6).as("nll"))
          .transform(cache)
        // stage 2: exact dedup among quality survivors — dedup runs
        // BEFORE LM scoring thresholds are applied (the CCNet order:
        // don't let duplicated mass skew the quantile cut). Digest =
        // lead paragraph (first 16 tokens): the "same opening
        // boilerplate" rule — full-content md5 finds nothing in a crawl
        // where dups differ by trailing chrome.
        val wDg = org.apache.spark.sql.expressions.Window
          .partitionBy("digest").orderBy("doc_id")
        val ded = train.join(qf, Seq("doc_id")).where(col("pass_q"))
          .select(col("doc_id"),
            md5(concat_ws(" ", expr("slice(toks, 1, 16)"))).as("digest"))
          .withColumn("rn", row_number().over(wDg))
          .select(col("doc_id"), col("rn")).transform(cache)
        // stage 3: per-lang perplexity cut over the dedup survivors
        val scored = ded.where(col("rn") === 1).join(nll, Seq("doc_id"))
          .join(train.select(col("doc_id"), col("lang")), Seq("doc_id"))
        val thr = scored.groupBy(col("lang").as("tl"))
          .agg(round(expr("percentile(nll, 2.0/3)"), 6).as("t2"))
        val pp = scored.join(broadcast(thr), col("lang") === col("tl"))
          .select(col("doc_id"), (col("nll") <= col("t2")).as("pass_p"))
          .transform(cache)
        // stage 4: excision over the perplexity survivors (bench = src0);
        // survivors re-join toks from the CACHED corpus, not through the
        // stage chain
        val survivors = train.select(col("doc_id"), col("source"),
            col("toks"))
          .join(pp.where(col("pass_p")).select("doc_id"), Seq("doc_id"))
        val exc = exciseStats(
          all.where(col("source") === "src0")
            .select(col("doc_id"), col("source"), col("toks"))
            .unionByName(survivors),
          col("source") === "src0")
        // attribution: first failing stage wins
        train.select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"))
          .join(qf, Seq("doc_id"))
          .join(ded, Seq("doc_id"), "left")
          .join(pp, Seq("doc_id"), "left")
          .join(exc.select(col("doc_id"),
            col("removed_tokens")), Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
            when(!col("pass_q"), "quality")
              .when(col("rn") > 1, "exact_dup")
              .when(!col("pass_p"), "perplexity")
              .when(col("removed_tokens") * 2 > col("n_tokens"),
                "excised_drop")
              .otherwise("kept").as("stage"))
          .orderBy("doc_id")
      },
      Some("""WITH all_d AS (SELECT doc_id, source, lang, text,
              string_split(text, ' ') AS toks
            FROM documents WHERE len(string_split(text, ' ')) >= 4),
          train AS (SELECT * FROM all_d WHERE source <> 'src0'),
          q AS (SELECT doc_id, lang, text, toks,
              CAST(len(toks) AS BIGINT) AS n_tokens,
              ROUND((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
                  * 0.5
                + (1.0 - CAST(len(list_filter(toks,
                    x -> x = 'a' OR x = 'the')) AS DOUBLE) / len(toks))
                  * 0.5, 6) >= 0.63 AS pass_q
            FROM train),
          tok AS (SELECT doc_id, unnest(toks) AS term FROM train),
          vocab AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
          tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM tok),
          nll AS (SELECT t.doc_id,
              ROUND(AVG(-ln(v.cnt / (SELECT total FROM tot))), 6) AS nll
            FROM tok t JOIN vocab v ON t.term = v.term GROUP BY t.doc_id),
          deduped AS (SELECT doc_id, lang, toks,
              row_number() OVER (
                PARTITION BY md5(array_to_string(
                  list_slice(toks, 1, 16), ' '))
                ORDER BY doc_id) AS rn
            FROM q WHERE pass_q),
          scored AS (SELECT d.doc_id, d.lang, d.toks, nll.nll
            FROM deduped d JOIN nll USING (doc_id) WHERE d.rn = 1),
          thr AS (SELECT lang AS tl,
              ROUND(quantile_cont(nll, 2.0/3), 6) AS t2
            FROM scored GROUP BY lang),
          staged AS (SELECT s.*, s.nll <= t.t2 AS pass_p
            FROM scored s JOIN thr t ON s.lang = t.tl),
          surv AS (SELECT doc_id, toks FROM staged WHERE pass_p),
          b AS (SELECT DISTINCT
              toks[i.i]||' '||toks[i.i+1]||' '||toks[i.i+2]||' '||toks[i.i+3]
                AS g
            FROM all_d, unnest(range(1, len(toks)-2)) i(i)
            WHERE source = 'src0'),
          tg AS (SELECT doc_id, i.i AS p,
              toks[i.i]||' '||toks[i.i+1]||' '||toks[i.i+2]||' '||toks[i.i+3]
                AS g
            FROM surv, unnest(range(1, len(toks)-2)) i(i)),
          hits AS (SELECT DISTINCT tg.doc_id, tg.p FROM tg
            JOIN b ON tg.g = b.g),
          cov AS (SELECT DISTINCT doc_id, p + j.j AS cp
            FROM hits, unnest(range(0, 4)) j(j)),
          removed AS (SELECT s.doc_id,
              CAST(len(s.toks) AS BIGINT)
                - (SELECT COUNT(*) FROM unnest(range(1, len(s.toks)+1)) i(i)
                   WHERE NOT EXISTS (SELECT 1 FROM cov
                     WHERE cov.doc_id = s.doc_id AND cov.cp = i.i))
                AS removed_tokens
            FROM surv s)
        SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
          COALESCE(r.removed_tokens, 0) AS removed_tokens,
          CASE WHEN NOT qq.pass_q THEN 'quality'
               WHEN dd.rn > 1 THEN 'exact_dup'
               WHEN NOT st.pass_p THEN 'perplexity'
               WHEN COALESCE(r.removed_tokens, 0) * 2
                 > CAST(len(t.toks) AS BIGINT) THEN 'excised_drop'
               ELSE 'kept' END AS stage
        FROM train t
          JOIN q qq ON t.doc_id = qq.doc_id
          LEFT JOIN deduped dd ON t.doc_id = dd.doc_id
          LEFT JOIN staged st ON t.doc_id = st.doc_id
          LEFT JOIN removed r ON t.doc_id = r.doc_id
        ORDER BY t.doc_id"""))
  )
}
