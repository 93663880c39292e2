package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-15 operators.
  *
  * k13 — TD-Hive dialect passthrough: the reference's SECOND engine type
  * (`create_engine('hive:db')`, `pandas_td/td.py` — SURVEY.md §0-caveated
  * anchor) hands HiveQL text to TD's hosted Hive. Spark SQL is
  * HiveQL-derived, so the graded text below is VERBATIM TD-Hive —
  * `LATERAL VIEW posexplode`, `get_json_object`, regex `split` — plus
  * TD's own Hive UDFs (`TD_TIME_RANGE`, `TD_TIME_FORMAT`,
  * `TD_DATE_TRUNC`), which resolve through [[graft.functions.Hive]]'s
  * statement scope: the same [[graft.functions.DialectScope]] machinery
  * as the Presto dialect, installing [[graft.functions.Td]]'s builders
  * for THIS text and handing back each name's prior resolution on exit.
  *
  * What the key deliberately pins alongside the happy path: `hive:` text
  * must NOT receive the Presto shims — `regex_split_n` counts
  * `split(s, '.')` fields, which is len+1 under Hive/Spark REGEX split
  * ('.' matches every char; Spark's split keeps trailing empties) and
  * would be 1-per-dot+1 under Presto's literal split. A dispatch bug that
  * routed hive text through the Presto scope flips that column and the
  * oracle hash catches it.
  *
  * Scale shape: map-side only — a pushdown-visible time-range filter on
  * the scan (TdTimeRange expands to plain comparisons), then a generate
  * (posexplode) over short arrays; no shuffle before the output sort.
  */
object Round15 {

  /** See [[Views.unique]] — per-invocation unique temp-view names for the
    * SQL-text keys (the r15 ADVICE race fix, shared repo-wide in r16). */
  private def withUniqueViews(s: org.apache.spark.sql.SparkSession,
      views: (String, org.apache.spark.sql.DataFrame)*)(
      body: Map[String, String] => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = Views.unique(s, views: _*)(body)

  /** j56's shared core: (tokenized docs, covered duplicate positions).
    * `tk` is (doc_id, toks); `covered` is the DISTINCT (doc_id, p) set of
    * 1-based token positions lying inside any non-canonical occurrence of
    * a repeated k-gram (canonical = min (doc_id, p) per gram). Only
    * 8-byte xxhash64 grams ride the explode and the window shuffle; the
    * covered explode is ×k on DUPLICATED mass only. Round16's j56b
    * derives its spans-only output from the same core, so the two keys
    * cannot drift. */
  private[ops] def substringCoverage(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val tk = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val grams = tk.where(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(${Ngrams.starts("toks", k)}, " +
          s"i -> xxhash64(${Ngrams.gramAt("toks", k)}))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("g"))
    val wg = Window.partitionBy("g")
    val occ = grams
      .withColumn("rn", row_number().over(wg.orderBy("doc_id", "p")))
      .withColumn("cnt", count(lit(1)).over(wg))
    val covered = occ.where(col("cnt") >= 2 && col("rn") > 1)
      .select(col("doc_id"),
        explode(expr(s"sequence(p, p + $k - 1)")).as("p"))
      .distinct()
    (tk, covered)
  }

  def all: Seq[Q] = Seq(

    Q("k13_hive_dialect",
      (s, d) => withUniqueViews(s, "k13_events" -> events(s, d)) { v =>
        graft.functions.Hive.sql(s, s"""
          SELECT e.event_id,
                 CAST(get_json_object(e.props, '$$.k') AS BIGINT) AS k,
                 CAST(t.pos AS BIGINT) AS pos,
                 t.tok,
                 td_time_format(e.ts_ms div 1000, 'yyyy-MM-dd HH', 'UTC') AS hour_fmt,
                 td_date_trunc('day', e.ts_ms div 1000) AS day_sec,
                 CAST(size(split(e.event_type, '.')) AS BIGINT) AS regex_split_n
          FROM ${v("k13_events")} e
          LATERAL VIEW posexplode(split(e.event_type, 'c')) t AS pos, tok
          WHERE td_time_range(e.ts_t, '2024-01-05', '2024-01-08')
          ORDER BY e.event_id, pos""")
      },
      Some("""SELECT e.event_id,
          CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS k,
          CAST(i.i - 1 AS BIGINT) AS pos,
          string_split(e.event_type, 'c')[i.i] AS tok,
          strftime(e.ts, '%Y-%m-%d %H') AS hour_fmt,
          CAST(epoch(date_trunc('day', e.ts)) AS BIGINT) AS day_sec,
          CAST(length(e.event_type) + 1 AS BIGINT) AS regex_split_n
        FROM events e,
             unnest(range(1, len(string_split(e.event_type, 'c')) + 1)) i(i)
        WHERE e.ts >= TIMESTAMP '2024-01-05' AND e.ts < TIMESTAMP '2024-01-08'
        ORDER BY event_id, pos""")),

    // j56 — EXACT SUBSTRING dedup (Lee et al. 2021, "Deduplicating
    // Training Data Makes Language Models Better"): remove every k-token
    // span that occurs elsewhere in the corpus, keeping the canonical
    // FIRST occurrence (min (doc_id, position) per k-gram) — the missing
    // granularity between whole-doc dedup (j1), paragraph dedup (j37)
    // and approximate near-dup (j2 family). k = 8 tokens.
    //
    // Shape: (1) every k-gram occurrence as (doc_id, pos, xxhash64) —
    // the hash computed INSIDE the array transform, so only 8-byte longs
    // ride the explode and the shuffle (the j2 device; 2^-64 collision
    // convention, oracle-hash-proven); (2) one window over the gram key
    // assigns row_number (canonical = rn 1) and occurrence count;
    // (3) non-canonical occurrences of repeated grams expand to their k
    // covered positions — explode factor k on DUPLICATED mass only, not
    // the corpus; (4) an anti-join drops covered tokens and a per-doc
    // regroup rebuilds the surviving text in order. Two shuffles total
    // (gram window, doc regroup) — both on keys a 1000-executor cluster
    // partitions cleanly; nothing is corpus-pairwise.
    //
    // Semantics note vs the paper: the paper dedups over one giant
    // concatenated token stream with a suffix array; the relational
    // form here is per-document spans with a global first-occurrence
    // keep rule — the same guarantee (no k-gram appears twice in the
    // kept corpus) without the suffix-array machinery, and each step is
    // a plain shuffle/window Catalyst already knows how to scale.
    Q("j56_substring_dedup",
      (s, d) => {
        val k = 8
        val (tk, covered) = substringCoverage(s, d, k)
        val toks = tk.select(col("doc_id"), posexplode(col("toks")))
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
            col("col").as("tok"))
        val kept = toks.join(covered, Seq("doc_id", "p"), "left_anti")
          .groupBy("doc_id")
          .agg(expr("array_join(transform(sort_array(collect_list(struct(p, tok))), " +
              "x -> x.tok), ' ')").as("kept_text"),
            count(lit(1)).as("kept_tokens"))
        tk.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
          .join(kept, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
              .as("dup_tokens"),
            coalesce(col("kept_text"), lit("")).as("kept_text"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents),
        g AS (SELECT doc_id, i.i AS p,
                array_to_string(list_slice(toks, i.i, i.i + 7), ' ') AS g
              FROM tk, unnest(range(1, len(toks) - 6)) i(i)
              WHERE len(toks) >= 8),
        o AS (SELECT doc_id, p,
                row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn,
                count(*) OVER (PARTITION BY g) AS cnt
              FROM g),
        cov AS (SELECT DISTINCT doc_id, p + j.j AS cp
              FROM o, unnest(range(0, 8)) j(j) WHERE cnt >= 2 AND rn > 1),
        tok AS (SELECT doc_id, i.i AS p, toks[i.i] AS tok
              FROM tk, unnest(range(1, len(toks) + 1)) i(i)),
        kept AS (SELECT t.doc_id,
                   array_to_string(list(t.tok ORDER BY t.p), ' ') AS kept_text,
                   count(*) AS kept_tokens
                 FROM tok t LEFT JOIN cov c
                   ON t.doc_id = c.doc_id AND t.p = c.cp
                 WHERE c.cp IS NULL GROUP BY t.doc_id)
        SELECT b.doc_id, CAST(len(b.toks) AS BIGINT) AS n_tokens,
          CAST(len(b.toks) - coalesce(k.kept_tokens, 0) AS BIGINT) AS dup_tokens,
          coalesce(k.kept_text, '') AS kept_text
        FROM tk b LEFT JOIN kept k ON b.doc_id = k.doc_id
        ORDER BY b.doc_id""")),

    // a34 — VARIANT-typed semi-structured access (Spark 4 native): the
    // props JSON parsed ONCE into a VARIANT value, then typed paths
    // extracted with variant_get / try_variant_get — the engine-native
    // successor to per-path get_json_object string re-parsing (a10/h5:
    // each path re-tokenizes the JSON; a VARIANT parses once into a
    // binary-encoded tree and each extraction is a tree walk). The round
    // trip through to_json(struct(...)) → parse_json exercises nested
    // objects, arrays with index paths, and a missing-path
    // try_variant_get (NULL, not an error). Map-only — every extraction
    // is codegen'd; the graded claim is that VARIANT extraction equals
    // the typed source columns it was built from.
    Q("a34_variant_props",
      (s, d) => {
        val ev = events(s, d).where(col("event_id") < 2000)
        ev.select(col("event_id"),
            // try_parse_json: malformed props → NULL variant, no abort
            expr("try_parse_json(props)").as("pv"),
            expr("""parse_json(to_json(named_struct(
              't', event_type, 'u', user_id,
              'vs', array(value, value * 2))))""").as("v"))
          .select(col("event_id"),
            // try_variant_get: a wrong-typed prop value is NULL, not an
            // INVALID_VARIANT_CAST abort (EventsGuardSpec)
            expr("try_variant_get(pv, '$.k', 'bigint')").as("k"),
            expr("variant_get(v, '$.t', 'string')").as("t"),
            expr("variant_get(v, '$.u', 'bigint')").as("u"),
            expr("variant_get(v, '$.vs[1]', 'double')").as("v1"),
            expr("try_variant_get(v, '$.nope', 'string')").as("miss"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
          TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          event_type AS t, user_id AS u, value * 2 AS v1,
          CAST(NULL AS VARCHAR) AS miss
        FROM events WHERE event_id < 2000 ORDER BY event_id""")),

    // j57 — FILTERED vector search: top-5 cosine neighbors of probe
    // vec 0 among vectors with label = 3 only — the production ANN shape
    // (metadata predicate + similarity) that pure-ANN indexes get wrong.
    // Strategy here is PRE-filter: push the label predicate to the scan,
    // exact-rank the survivors with the codegen'd CosineSimilarity, and
    // take the global top-5 via TakeOrderedAndProject (k rows per
    // partition, no full sort). POST-filtering an ANN shortlist instead
    // under-recalls whenever the predicate is selective (a shortlist of
    // 50 with an ~8%-selective label keeps ~4 expected survivors — fewer
    // than k); at 100 TB the choice flips only when the predicate is
    // near-vacuous, and then j3b/j53's bucketed shortlists compose in
    // front of the same exact re-rank. Scan-parallel, no shuffle before
    // the top-k.
    Q("j57_filtered_ann",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val probe = emb.where(col("vec_id") === 0)
          .select(col("embedding").as("e0"))
        emb.where(col("label") === 3 && col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(col("vec_id"), col("label"),
            round(graft.expressions.CosineSimilarity(s, col("embedding"), col("e0")), 6)
              .as("cos"))
          .orderBy(desc("cos"), asc("vec_id")).limit(5)
      },
      Some("""WITH e AS (SELECT vec_id, label, generate_subscripts(embedding,1) AS dd,
            CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        p AS (SELECT dd, v FROM e WHERE vec_id = 0),
        dots AS (SELECT e.vec_id, ANY_VALUE(e.label) AS label,
            SUM(e.v*p.v) AS dot, sqrt(SUM(e.v*e.v)) AS n1
          FROM e JOIN p USING (dd)
          WHERE e.vec_id != 0 AND e.label = 3 GROUP BY e.vec_id),
        pn AS (SELECT sqrt(SUM(v*v)) AS n0 FROM p)
        SELECT vec_id, label, ROUND(dot/(n1*(SELECT n0 FROM pn)),6) AS cos
        FROM dots ORDER BY cos DESC, vec_id LIMIT 5""")),

    // k14 — TD-Hive dialect, structural tier: the HiveQL idioms beyond
    // k13's scalar surface — DISTRIBUTE BY / SORT BY (parse + resolve;
    // the within-partition ordering is physical, so determinism comes
    // from the outer ORDER BY), named_struct with dot access,
    // str_to_map, map['key'] subscripting, and LATERAL VIEW OUTER
    // posexplode_outer (the null-preserving generate: singleton groups
    // keep their row with NULL pos/v — 184 of 238 groups at sf0.01, so
    // the OUTER path carries real mass). Verbatim text through
    // Hive.sql; one aggregation shuffle + the output sort.
    Q("k14_hive_dialect_struct",
      (s, d) => withUniqueViews(s, "k14_events" -> events(s, d)) { v =>
        graft.functions.Hive.sql(s, s"""
          SELECT q.user_id, q.et, q.n, q.meta.first_id AS first_id,
                 q.kv['a'] AS kv_a,
                 CAST(t.pos AS BIGINT) AS pos, t.v
          FROM (
            SELECT user_id, event_type AS et, COUNT(*) AS n,
                   named_struct('first_id', MIN(event_id)) AS meta,
                   str_to_map(CONCAT('a:', COUNT(*)), ',', ':') AS kv,
                   CASE WHEN COUNT(*) >= 2
                        THEN array(COUNT(*), MIN(event_id)) END AS arr
            FROM ${v("k14_events")}
            WHERE event_id < 300
            GROUP BY user_id, event_type
            DISTRIBUTE BY user_id SORT BY user_id, et
          ) q
          LATERAL VIEW OUTER posexplode_outer(q.arr) t AS pos, v
          ORDER BY q.user_id, q.et, pos""")
      },
      Some("""WITH g AS (SELECT user_id, event_type AS et,
              COUNT(*) AS n, MIN(event_id) AS mid
            FROM events WHERE event_id < 300 GROUP BY 1, 2),
        a AS (SELECT *, CASE WHEN n >= 2
                THEN [CAST(n AS BIGINT), mid] END AS arr FROM g)
        SELECT user_id, et, n, mid AS first_id, CAST(n AS VARCHAR) AS kv_a,
          CASE WHEN arr IS NULL THEN NULL ELSE i.i - 1 END AS pos,
          CASE WHEN arr IS NULL THEN NULL ELSE arr[i.i] END AS v
        FROM a, unnest(coalesce(list_transform(range(1, len(arr) + 1), x -> x),
                                [NULL])) i(i)
        ORDER BY user_id, et, pos NULLS FIRST""")),

    // h35 — ANSI error-safe arithmetic (the try_* family): Spark 4 runs
    // ANSI mode by DEFAULT, so divide-by-zero, numeric overflow, bad
    // casts and invalid array/map subscripts that silently produced
    // NULL/garbage under legacy mode now THROW — and the sanctioned
    // per-expression opt-out is try_divide / try_add / try_cast /
    // try_element_at, which yield NULL exactly where the strict form
    // errors. A 100 TB job dies hours in on ONE malformed row without
    // these; the oracle encodes the same null-on-error semantics with
    // explicit CASE guards. Map-only, fully codegen'd. (Measured trap:
    // try_element_at suppresses OUT-OF-BOUNDS but NOT index 0 —
    // INVALID_INDEX_OF_ZERO throws through the try_ form, so the graded
    // index is shifted to the 1-based domain.)
    Q("h35_try_arith",
      (s, d) => withUniqueViews(s, "h35_lineitem" -> t(s, d, "lineitem")) { v =>
        s.sql(s"""
          SELECT l_orderkey, l_linenumber,
            ROUND(try_divide(l_quantity, l_orderkey % 3), 6) AS td,
            try_add(9223372036854775807, l_orderkey % 2) AS ta,
            try_multiply(4611686018427387904, l_orderkey % 3) AS tm,
            try_cast(CASE WHEN l_orderkey % 2 = 0 THEN '12' ELSE 'x' END AS INT) AS tc,
            try_element_at(array(10, 20, 30), CAST(l_orderkey % 5 AS INT) + 1) AS te,
            try_element_at(map('a', 1), CASE WHEN l_orderkey % 2 = 0
                                             THEN 'a' ELSE 'b' END) AS tk
          FROM ${v("h35_lineitem")} WHERE l_orderkey < 200
          ORDER BY l_orderkey, l_linenumber, td""")
      },
      Some("""SELECT l_orderkey, l_linenumber,
          CASE WHEN l_orderkey % 3 = 0 THEN NULL
               ELSE ROUND(l_quantity / (l_orderkey % 3), 6) END AS td,
          CASE WHEN l_orderkey % 2 = 1 THEN NULL
               ELSE 9223372036854775807 END AS ta,
          CASE WHEN l_orderkey % 3 = 2 THEN NULL
               WHEN l_orderkey % 3 = 0 THEN 0
               ELSE 4611686018427387904 END AS tm,
          CASE WHEN l_orderkey % 2 = 0 THEN 12 END AS tc,
          CASE WHEN l_orderkey % 5 <= 2
               THEN ([10, 20, 30])[CAST(l_orderkey % 5 AS INT) + 1] END AS te,
          CASE WHEN l_orderkey % 2 = 0 THEN 1 END AS tk
        FROM lineitem WHERE l_orderkey < 200
        ORDER BY l_orderkey, l_linenumber, td""")),

    // g7 — RECURSIVE CTE (Spark 4 native WITH RECURSIVE): the iterative
    // relational surface Presto/Hive users reach for hierarchies and
    // transitive closure, previously only expressible here as a driver
    // loop (CC.cluster) or a recursive oracle (j14's DuckDB side).
    // Graded as an ancestor walk over the deterministic binary tree
    // parent(k) = k DIV 2: each customer expands to its root path, then
    // per-customer depth / path-sum / node-count aggregate. Each
    // recursion step is one self-referencing UNION ALL round — the same
    // per-round shuffle shape as the CC loop, but planned by the engine
    // (no driver iteration, no manual localCheckpoint) with the fixpoint
    // detected from an empty step result. Depth here is ⌊log2 500⌋ = 8
    // rounds; at 100 TB the row set per round is bounded by the live
    // frontier, exactly like the distributed CC fallback.
    Q("g7_recursive_cte",
      (s, d) => withUniqueViews(s, "g7_customer" -> t(s, d, "customer")) { v =>
        s.sql(s"""
          WITH RECURSIVE anc(ck, ak, depth) AS (
            SELECT c_custkey, c_custkey, 0 FROM ${v("g7_customer")} WHERE c_custkey < 500
            UNION ALL
            SELECT ck, ak DIV 2, depth + 1 FROM anc WHERE ak > 1
          )
          SELECT ck AS c_custkey, CAST(MAX(depth) AS BIGINT) AS depth,
                 CAST(SUM(ak) AS BIGINT) AS path_sum,
                 COUNT(*) AS n_nodes
          FROM anc GROUP BY ck ORDER BY c_custkey""")
      },
      Some("""WITH RECURSIVE anc(ck, ak, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 500
          UNION ALL
          SELECT ck, ak // 2, depth + 1 FROM anc WHERE ak > 1
        )
        SELECT ck AS c_custkey, CAST(MAX(depth) AS BIGINT) AS depth,
               CAST(SUM(ak) AS BIGINT) AS path_sum,
               COUNT(*) AS n_nodes
        FROM anc GROUP BY ck ORDER BY c_custkey""")),

    // c17 — correlated LATERAL subquery join (Spark 4 native LATERAL):
    // the per-row dependent subquery Presto/Hive users write for
    // "top-N related rows per outer row" without a window. Catalyst
    // DECORRELATES the ORDER BY … LIMIT 2 lateral into a join +
    // per-partition ranking — there is no per-outer-row re-execution in
    // the physical plan, so the shape scales exactly like e7's
    // row_number idiom while keeping the user's Presto-style text
    // verbatim. Customers with no orders are dropped (inner lateral);
    // the e7 window form stays the engine-native spelling — this key
    // pins that the LATERAL spelling resolves, decorrelates, and agrees.
    Q("c17_join_lateral",
      (s, d) => withUniqueViews(s,
          "c17_customer" -> t(s, d, "customer"),
          "c17_orders" -> t(s, d, "orders")) { v =>
        s.sql(s"""
          SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          FROM ${v("c17_customer")} c,
          LATERAL (SELECT o_orderkey, o_totalprice FROM ${v("c17_orders")} o
                   WHERE o.o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          WHERE c.c_custkey < 300
          ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
      },
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey < 300
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")),

    // d28 — ANSI LISTAGG (Spark 4 native, aliased string_agg): ordered
    // string aggregation with the WITHIN GROUP (ORDER BY …) clause — the
    // standard spelling of what d11 builds via sort_array + array_join.
    // The explicit order makes it deterministic and hash-checkable; the
    // aggregation is a plain two-phase hash agg (partial concat buffers
    // merge associatively under the final sort).
    Q("d28_listagg",
      (s, d) => withUniqueViews(s, "d28_customer" -> t(s, d, "customer")) { v =>
        s.sql(s"""
          SELECT c_mktsegment,
                 listagg(c_name, '|') WITHIN GROUP (ORDER BY c_name) AS names,
                 COUNT(*) AS n
          FROM ${v("d28_customer")} WHERE c_custkey < 100
          GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment,
          string_agg(c_name, '|' ORDER BY c_name) AS names,
          COUNT(*) AS n
        FROM customer WHERE c_custkey < 100
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // h36 — the Spark regexp introspection family + luhn_check:
    // regexp_count / regexp_instr / regexp_substr (positions and counts,
    // not just extraction — h1/b3 cover match/extract/replace) and the
    // checksum predicate. Map-only, codegen'd. Oracle devices:
    // regexp_count = len(regexp_extract_all); regexp_substr =
    // NULLIF(regexp_extract, '') (DuckDB returns '' on no-match where
    // Spark returns NULL); regexp_instr = instr(s, first_match) — sound
    // for CONTEXT-FREE patterns (no anchors/lookaround): if the matched
    // text occurred earlier as a substring, the regex engine would have
    // matched there instead, so the first literal occurrence IS the
    // match position; luhn_check is re-derived arithmetically
    // (digit-doubling checksum) over a deterministic 10-digit string.
    Q("h36_regexp_family",
      (s, d) => withUniqueViews(s, "h36_part" -> t(s, d, "part")) { v =>
        s.sql(s"""
          SELECT p_partkey,
                 CAST(regexp_count(p_name, '[aeiou]') AS BIGINT) AS vowels,
                 CAST(regexp_instr(p_name, 'e[a-z]') AS BIGINT) AS e_pos,
                 regexp_substr(p_name, '[a-z]{6,}') AS long_word,
                 luhn_check(lpad(CAST(p_partkey AS STRING), 10, '1')) AS luhn_ok
          FROM ${v("h36_part")} ORDER BY p_partkey""")
      },
      Some("""SELECT p_partkey,
          CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS vowels,
          CAST(CASE WHEN regexp_extract(p_name, 'e[a-z]') = '' THEN 0
               ELSE instr(p_name, regexp_extract(p_name, 'e[a-z]')) END AS BIGINT)
            AS e_pos,
          NULLIF(regexp_extract(p_name, '[a-z]{6,}'), '') AS long_word,
          list_sum(list_transform(range(1, 11), i ->
             CASE WHEN (10 - i) % 2 = 1 THEN
               CASE WHEN 2 * CAST(lpad(CAST(p_partkey AS VARCHAR), 10, '1')[i] AS INT) > 9
                    THEN 2 * CAST(lpad(CAST(p_partkey AS VARCHAR), 10, '1')[i] AS INT) - 9
                    ELSE 2 * CAST(lpad(CAST(p_partkey AS VARCHAR), 10, '1')[i] AS INT) END
             ELSE CAST(lpad(CAST(p_partkey AS VARCHAR), 10, '1')[i] AS INT) END))
            % 10 = 0 AS luhn_ok
        FROM part ORDER BY p_partkey""")),

    // m9 — the VIDEO leg of the container-decode story (m2b/m8 images,
    // m6 audio): a spec-layout RIFF/AVI container (avih MainAVIHeader:
    // µs/frame, total frames, stream count, width, height — all
    // little-endian) built per doc, then decoded by the same LE byte
    // arithmetic as m6. Derived columns re-express what a video pipeline
    // actually keys on: fps back-derived from µs/frame, duration from
    // frames × µs/frame. `head_hex` pins the ENCODING bytes cross-engine
    // (the oracle reconstructs the first 16 header bytes independently),
    // so a matched encode/decode endianness bug cannot cancel out.
    // Map-only codegen'd substring+conv — content bytes never shuffle.
    Q("m9_decode_avi",
      (s, d) => {
        def le(v: String, n: Int): String =
          (0 until n).map(k => s"lpad(hex(shiftright($v, ${8 * k}) & 255), 2, '0')")
            .mkString("concat(", ", ", ")")
        val fixture = t(s, d, "documents").selectExpr("doc_id", "text",
            "case cast(doc_id % 3 as int) when 0 then 24L when 1 then 25L else 30L end as fps0",
            "10L + doc_id % 240 as frames",
            "160L * (1 + doc_id % 8) as w", "120L * (1 + doc_id % 6) as h",
            "1L + doc_id % 2 as streams",
            "cast(length(text) as long) as dsize")
          .selectExpr("doc_id", "text", "frames", "w", "h", "streams", "dsize",
            "1000000L div fps0 as usec")
          .selectExpr("doc_id",
            ("unhex(concat('52494646', " + le("92L + dsize", 4) +
              ", '41564920', '4C495354', '44000000', '6864726C', '61766968', " +
              "'38000000', " + le("usec", 4) + ", '00000000', '00000000', " +
              "'10000000', " + le("frames", 4) + ", '00000000', " +
              le("streams", 4) + ", '00000000', " + le("w", 4) + ", " +
              le("h", 4) + ", '00000000000000000000000000000000', " +
              "'4C495354', " + le("4L + dsize", 4) + ", '6D6F7669'))") + " as header",
            "cast(text as binary) as body")
          .select(col("doc_id"), concat(col("header"), col("body")).as("payload"))
        def leInt(start: Int, len: Int) = expr(
          s"cast(conv(concat(" +
            (0 until len).reverse
              .map(k => s"hex(substring(payload, ${start + k}, 1))")
              .mkString(", ") +
            s"), 16, 10) as bigint)")
        val isAvi = hex(substring(col("payload"), 1, 4)) === "52494646" &&
          hex(substring(col("payload"), 9, 4)) === "41564920"
        fixture.select(col("doc_id"),
            when(isAvi, "avi").otherwise("unknown").as("fmt"),
            when(isAvi, leInt(65, 4)).as("width"),
            when(isAvi, leInt(69, 4)).as("height"),
            when(isAvi, leInt(33, 4)).as("usec_per_frame"),
            when(isAvi, leInt(49, 4)).as("total_frames"),
            when(isAvi, leInt(57, 4)).as("streams"),
            upper(hex(substring(col("payload"), 1, 16))).as("head_hex"),
            length(col("payload")).cast("long").as("n_bytes"))
          .withColumn("fps", expr("1000000L div usec_per_frame"))
          .withColumn("dur_ms", expr("total_frames * usec_per_frame div 1000"))
          .drop("usec_per_frame")
          .orderBy("doc_id")
      },
      Some("""WITH x AS (SELECT doc_id,
            CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 24 WHEN 1 THEN 25 ELSE 30 END AS fps0,
            10 + doc_id % 240 AS frames,
            160 * (1 + doc_id % 8) AS w, 120 * (1 + doc_id % 6) AS h,
            1 + doc_id % 2 AS streams,
            CAST(strlen(text) AS BIGINT) AS dsize
          FROM documents),
        y AS (SELECT *, 1000000 // fps0 AS usec FROM x)
        SELECT doc_id, 'avi' AS fmt,
          CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
          CAST(frames AS BIGINT) AS total_frames,
          CAST(streams AS BIGINT) AS streams,
          upper('52494646'
            || substr(lpad(to_hex(92 + dsize), 8, '0'), 7, 2)
            || substr(lpad(to_hex(92 + dsize), 8, '0'), 5, 2)
            || substr(lpad(to_hex(92 + dsize), 8, '0'), 3, 2)
            || substr(lpad(to_hex(92 + dsize), 8, '0'), 1, 2)
            || '41564920' || '4C495354') AS head_hex,
          CAST(100 + dsize AS BIGINT) AS n_bytes,
          CAST(1000000 // usec AS BIGINT) AS fps,
          CAST(frames * usec // 1000 AS BIGINT) AS dur_ms
        FROM y ORDER BY doc_id""")),

    // j58 — robust outlier gating (median/MAD): the numeric data-quality
    // gate next to j9's ratio heuristics — per-source document-length
    // outliers by ROBUST z-score 0.6745·(x − median)/MAD, the estimator
    // that survives the contamination it is hunting (mean/stddev z-scores
    // move with the outliers themselves; median/MAD have a 50% breakdown
    // point — Iglewicz & Hoaglin's modified z-score). Two grouped exact
    // percentiles (the d8 percentile↔quantile_cont device) + one
    // broadcastable per-source stats join; at 100 TB the percentiles are
    // per-GROUP aggregations over a shuffle on source, and the flagged
    // tail is the only output. NULLIF guards the zero-MAD degenerate
    // (constant-length source).
    Q("j58_outlier_mad",
      (s, d) => withUniqueViews(s, "j58_documents" -> t(s, d, "documents")) { v =>
        s.sql(s"""
          WITH st AS (SELECT source, percentile(n_chars, 0.5) AS med
                      FROM ${v("j58_documents")} GROUP BY source),
          ad AS (SELECT d.source, percentile(abs(d.n_chars - st.med), 0.5) AS mad
                 FROM ${v("j58_documents")} d JOIN st ON d.source = st.source
                 GROUP BY d.source),
          sc AS (SELECT doc_id, d.source, n_chars,
                   round(0.6745 * (n_chars - st.med) / nullif(ad.mad, 0.0), 6) AS rz
                 FROM ${v("j58_documents")} d JOIN st ON d.source = st.source
                                      JOIN ad ON d.source = ad.source)
          SELECT doc_id, source, n_chars, rz FROM sc WHERE abs(rz) > 2.0
          ORDER BY doc_id""")
      },
      Some("""WITH st AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
              FROM documents GROUP BY source),
        ad AS (SELECT d.source, quantile_cont(abs(d.n_chars - st.med), 0.5) AS mad
               FROM documents d JOIN st ON d.source = st.source
               GROUP BY d.source),
        sc AS (SELECT doc_id, d.source, n_chars,
                 round(0.6745 * (n_chars - st.med) / nullif(ad.mad, 0.0), 6) AS rz
               FROM documents d JOIN st ON d.source = st.source
                                JOIN ad ON d.source = ad.source)
        SELECT doc_id, source, n_chars, rz FROM sc WHERE abs(rz) > 2.0
        ORDER BY doc_id""")),

    // i24 — streaming semi-structured ingest via VARIANT (a34's parse
    // device on the micro-batch path): raw JSON lines stream in with no
    // declared wire schema, each batch parses once into VARIANT and
    // extracts typed paths, complete-mode aggregation maintains the
    // per-type rollup. Schema-on-read — the landing-zone shape.
    Q("i24_stream_variant",
      (s, d) => graft.streaming.Streams.i24(s, d),
      Some("""SELECT event_type, COUNT(*) AS n,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))),4) AS DOUBLE) AS sum_v
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // i25 — state-BOUNDED streaming dedup (dropDuplicatesWithinWatermark):
    // i5's dropDuplicates holds every key forever — the operator that
    // eventually OOMs an endless stream; the WithinWatermark form evicts
    // a key once the watermark passes it, trading eternal dedup for
    // bounded state (the right default where duplicates cluster near
    // their original: retries, at-least-once sources). Duplicates inside
    // the window collapse — same oracle as i5.
    Q("i25_stream_dedup_bounded",
      (s, d) => graft.streaming.Streams.i25(s, d),
      Some("SELECT event_id, user_id FROM events ORDER BY event_id")),

    // k15 — SQL-DEFINED functions (Spark 4 native CREATE FUNCTION …
    // RETURN): the declarative UDF tier next to k1's Scala UDF and the
    // Catalyst-expression keys — a scalar SQL UDF (pricing margin) and a
    // SQL TABLE function consumed through a correlated LATERAL. Both are
    // parse-time SUBSTITUTION into the plan (the body inlines; the
    // lateral UDTF decorrelates like c17), so unlike an opaque Scala UDF
    // they stay inside whole-stage codegen and push down — the first
    // UDF mechanism with zero scale tax, and the one a SQL-only user can
    // deploy without shipping a jar. Oracle inlines the same logic
    // (DuckDB macros exist but the graded claim is Spark's resolution).
    Q("k15_sql_udf",
      (s, d) => withUniqueViews(s, "k15_lineitem" -> t(s, d, "lineitem")) { v =>
        // §8.4 exact-decimal device INSIDE the UDF body: each product is
        // one DECIMAL(18,4) multiply rounded back to scale 4 (chaining
        // two raw decimal multiplies would overflow precision; raw
        // doubles round-trip differently across engines at the .xxx5
        // boundary — measured: 86684.105 vs 86684.1049)
        // Function names are per-invocation unique like the views (temp
        // functions are shared-session state too) and dropped after the
        // statement — SQL UDFs substitute at parse time, so the returned
        // plan no longer references them.
        val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
        val fMargin = s"k15_margin_$sfx"
        val fBuckets = s"k15_buckets_$sfx"
        s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fMargin(
            price DECIMAL(18,4), disc DECIMAL(18,4), tax DECIMAL(18,4))
          RETURNS DOUBLE
          RETURN CAST(ROUND(CAST(ROUND(price * (1 - disc), 4) AS DECIMAL(18,4))
                            * (1 + tax), 4) AS DOUBLE)""")
        s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION $fBuckets(n INT)
          RETURNS TABLE (b INT)
          RETURN SELECT explode(${Ngrams.seqAsc("1", "n")}) AS b""")
        try s.sql(s"""
          SELECT l.l_orderkey, l.l_linenumber,
                 $fMargin(CAST(l.l_extendedprice AS DECIMAL(18,4)),
                          CAST(l.l_discount AS DECIMAL(18,4)),
                          CAST(l.l_tax AS DECIMAL(18,4))) AS net,
                 CAST(t.b AS BIGINT) AS b
          FROM ${v("k15_lineitem")} l,
               LATERAL $fBuckets(CAST(l.l_linenumber AS INT)) t
          WHERE l.l_orderkey < 100
          ORDER BY l_orderkey, l_linenumber, net, b""")
        finally Seq(fMargin, fBuckets).foreach(f =>
          s.sql(s"DROP TEMPORARY FUNCTION IF EXISTS $f"))
      },
      Some("""SELECT l.l_orderkey, l.l_linenumber,
          CAST(ROUND(CAST(ROUND(CAST(l.l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,4))), 4) AS DECIMAL(18,4))
               * (1 + CAST(l.l_tax AS DECIMAL(18,4))), 4) AS DOUBLE) AS net,
          CAST(i.i AS BIGINT) AS b
        FROM lineitem l, unnest(range(1, l.l_linenumber + 1)) i(i)
        WHERE l.l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber, net, b""")),

    // i26 — stream-stream FULL OUTER interval join, completing the
    // stream-join mode matrix (i8 inner, i21 left outer): both unmatched
    // sides emit null-extended rows at watermark-timed eviction — events
    // with no follow-up click AND clicks with no preceding event in their
    // window (the attribution orphan a left join cannot surface).
    // Same state bounds as i21; output == the batch FULL JOIN.
    Q("i26_stream_full_outer_join",
      (s, d) => graft.streaming.Streams.i26(s, d),
      Some("""WITH e AS (SELECT event_id, user_id,
            CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_type FROM events),
        r AS (SELECT * FROM e WHERE event_type = 'click')
        SELECT l.event_id AS a_id, r.event_id AS b_id,
               COALESCE(l.user_id, r.user_id) AS user_id
        FROM e l FULL JOIN r ON l.user_id = r.user_id
          AND r.ts_ms >= l.ts_ms AND r.ts_ms <= l.ts_ms + 300000
          AND l.event_id != r.event_id
        ORDER BY a_id NULLS FIRST, b_id NULLS FIRST""")),

    // c18 — BINNED range join (the public range-join binning technique;
    // per-key SMJ twin = c12b, sweep exec = c12, all three hash-match one
    // oracle). c12b's plan is an equi-join on user with the time ranges
    // as a POST-JOIN filter: its cost is Σ_user n_u·m_u — quadratic in
    // any hot key, and at 100 TB one bot user melts the matching
    // partition. Binning splits time into interval-length buckets and
    // equi-joins on (user, bin), so a pair meets only if it shares a
    // bucket: per-group cost collapses from (all of a user's history)²
    // to (events of that user within ±6 h)², the explode factor is
    // bounded by ⌈len/W⌉+1 = 2 rows per side, and each pair is emitted
    // EXACTLY once — the join keeps only the bucket holding
    // max(a_start, b_start), so no distinct-dedup shuffle is needed.
    Q("c18_join_range_binned",
      (s, d) => {
        val W = 21600000L // bin width == interval length ⇒ ≤2 bins/row
        val l = events(s, d).select(col("event_id"), col("user_id"),
            col("ts_ms").as("l_s"), (col("ts_ms") + W).as("l_e"))
          .withColumn("bin", explode(expr(
            s"sequence(CAST(floor(l_s / ${W}D) AS BIGINT), " +
              s"CAST(floor((l_e - 1) / ${W}D) AS BIGINT))")))
        val r = events(s, d).select(col("event_id").as("b_event_id"),
            col("user_id").as("b_user"), col("ts_ms").as("r_s"),
            (col("ts_ms") + W).as("r_e"))
          .withColumn("b_bin", explode(expr(
            s"sequence(CAST(floor(r_s / ${W}D) AS BIGINT), " +
              s"CAST(floor((r_e - 1) / ${W}D) AS BIGINT))")))
        l.join(r, col("user_id") === col("b_user")
            && col("bin") === col("b_bin")
            && col("r_s") < col("l_e") && col("r_e") > col("l_s")
            && col("event_id") < col("b_event_id")
            // emit once: only in the bucket where the later interval starts
            && col("bin") === floor(greatest(col("l_s"), col("r_s")) / W)
              .cast("long"))
          .select(col("event_id").as("a_id"), col("b_event_id").as("b_id"))
          .orderBy("a_id", "b_id")
      },
      Some(Joins.intervalOracle)),

    // j60 — tf-WEIGHTED shingle Jaccard near-dup (weighted Jaccard:
    // Σ min(c_A,c_B) / Σ max(c_A,c_B) over 3-gram counts WITH
    // multiplicity). j2's set Jaccard treats a shingle seen 40× and once
    // as equal members, so templated/boilerplate-repetitive pairs score
    // identically to genuinely distinct-content pairs; the weighted form
    // is what repetition-aware dedup (and ICWS weighted-MinHash sketches
    // at sketch scale) actually estimate. Routed through the SAME capped
    // pair core as j2 (LlmOps.weightedPairSums — capped_collect_pairs
    // postings + heavy-key branch, Knobs.pairMaxDf): the r15 soak
    // measured the uncapped tf⋈tf alternative at 446.2M candidate pairs /
    // 205.6 s under 10× boilerplate skew vs ~1.5M for the capped shapes,
    // so the cap is what makes this measure real at 100 TB. Σmin folds in
    // the pair groupBy; Σmax = totA + totB − Σmin needs only the map-only
    // per-doc totals (size(toks)−2; no second corpus pass). The THRESHOLD
    // is applied to the UNROUNDED ratio — the oracle filters unrounded
    // and selects rounded, and a raw score in [0.4999995, 0.5) must fall
    // on the same side in both engines. Integer Σmin/totals make the
    // 6-decimal output score the h4 cross-engine-stable device.
    Q("j60_dedup_weighted",
      (s, d) => {
        val tf = LlmOps.docShingleTf(s, d)
        val tot = t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .where(size(col("toks")) >= 3)
          .select(col("doc_id"), (size(col("toks")) - 2).cast("long").as("tot"))
        LlmOps.weightedPairSums(tf, Knobs.pairMaxDf(s))
          .join(tot.select(col("doc_id").as("d1"), col("tot").as("t1")), "d1")
          .join(tot.select(col("doc_id").as("d2"), col("tot").as("t2")), "d2")
          .withColumn("wjac_raw", col("w_inter").cast("double")
            / (col("t1") + col("t2") - col("w_inter")).cast("double"))
          .where(col("wjac_raw") >= 0.5)
          .select(col("d1"), col("d2"), round(col("wjac_raw"), 6).as("wjac"))
          .orderBy("d1", "d2")
      },
      Some(j60Oracle)))

  /** Exact weighted-Jaccard oracle, shared by j60 (capped pair core) and
    * j60b (weighted prefix filter) — both are EXACT paths, so one SQL
    * grades both. */
  lazy val j60Oracle: String =
    """WITH tk AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents
            WHERE len(string_split(text,' ')) >= 3),
        sh AS (SELECT doc_id,
            toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2] AS sh
          FROM tk, unnest(range(1, len(toks)-1)) i(i)),
        tf AS (SELECT doc_id, sh, COUNT(*) AS c FROM sh GROUP BY doc_id, sh),
        tot AS (SELECT doc_id, len(toks) - 2 AS tot FROM tk),
        p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
            SUM(LEAST(a.c, b.c)) AS w_inter
          FROM tf a JOIN tf b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT d1, d2,
          ROUND(CAST(w_inter AS DOUBLE)
                / CAST(t1.tot + t2.tot - w_inter AS DOUBLE), 6) AS wjac
        FROM p JOIN tot t1 ON d1 = t1.doc_id JOIN tot t2 ON d2 = t2.doc_id
        WHERE CAST(w_inter AS DOUBLE)
              / CAST(t1.tot + t2.tot - w_inter AS DOUBLE) >= 0.5
        ORDER BY d1, d2"""
}
