package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-17 additions: the Spark-4 recursive-CTE surface, and two
  * training-data-pipeline ops the j-tier did not yet cover — the
  * temperature-smoothed source-mixture schedule every open LLM recipe
  * publishes, and a matryoshka (truncated-embedding) ranking-fidelity
  * audit for the ANN tier. Reference surface for the SQL key:
  * `pandas_td/td.py :: read_td_query` passes arbitrary engine SQL
  * through (SURVEY §0-caveated anchor); the j-keys are EXT per SURVEY
  * §1 (BASELINE.json north-star extensions).
  */
object Round17 {

  def all: Seq[Q] = Seq(

    // k26 — RECURSIVE CTE with a BASE-TABLE JOIN in the recursive term:
    // g7 grades the arithmetic-only recursion (each step transforms the
    // accumulated rows, touching no table); this key grades the other
    // half of the surface — every iteration equi-joins the live
    // frontier against a scanned relation, the shape of BOM explosion /
    // org-chart walks / iterative graph expansion, where the engine
    // must re-plan a distributed join per round (the work the j14/j76
    // CC device did driver-side). The recursion here is a binary
    // management tree DERIVED from customer keys (parent = ⌊k/2⌋ —
    // deterministic in both engines, no fixture assumption): anchor at
    // the root, each iteration equi-joins the frontier against the
    // customer table, depth ≤ 7 at the k ≤ 127 bound. The parent link
    // is spelled `child DIV 2 = parent` — an EQUI-join (hash/broadcast-
    // able), where the two-disjunct `child = 2p OR child = 2p+1` form
    // plans as a per-iteration nested loop. At scale each iteration is
    // one shuffle/broadcast join of the FRONTIER (not the accumulated
    // result) against the base relation, and the engine stops when the
    // frontier empties — the same bounded-iteration
    // contract as CC.run. Depth cast to BIGINT on both sides (an
    // uncast Spark literal-0 chain emits INT where DuckDB emits
    // INTEGER-widened-by-+1 types; BIGINT is the §8.4-safe spelling).
    Q("k26_recursive_cte",
      (s, d) => Views.unique(s, "k26_cust" -> t(s, d, "customer")) { v =>
        s.sql(s"""
          WITH RECURSIVE chain AS (
            SELECT c_custkey, CAST(0 AS BIGINT) AS depth,
                   CAST(c_custkey AS STRING) AS path
            FROM ${v("k26_cust")} WHERE c_custkey = 1
            UNION ALL
            SELECT c.c_custkey, ch.depth + CAST(1 AS BIGINT),
                   CONCAT(ch.path, '/', CAST(c.c_custkey AS STRING))
            FROM ${v("k26_cust")} c JOIN chain ch
              ON c.c_custkey DIV 2 = ch.c_custkey
            WHERE c.c_custkey <= 127)
          SELECT c_custkey, depth, path FROM chain
          ORDER BY c_custkey""")
      },
      Some("""WITH RECURSIVE chain AS (
          SELECT c_custkey, CAST(0 AS BIGINT) AS depth,
                 CAST(c_custkey AS VARCHAR) AS path
          FROM customer WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, ch.depth + CAST(1 AS BIGINT),
                 CONCAT(ch.path, '/', CAST(c.c_custkey AS VARCHAR))
          FROM customer c JOIN chain ch
            ON c.c_custkey // 2 = ch.c_custkey
          WHERE c.c_custkey <= 127)
        SELECT c_custkey, depth, path FROM chain
        ORDER BY c_custkey""")),

    // b11 — correlated LATERAL subquery join (Spark 4 / SQL:2016): the
    // top-N-per-row spelling analysts actually write (`FROM a, LATERAL
    // (SELECT … WHERE x = a.x ORDER BY … LIMIT k)`), complementing e7's
    // window spelling of the same semantics. Spark decorrelates the
    // limit-under-correlation via its DomainJoin rewrite — the graded
    // property is that an arbitrary correlated LIMIT subquery becomes a
    // set-based plan (no per-outer-row rescans of orders). Both ORDER
    // BY keys in the lateral body carry a deterministic tie-break.
    Q("b11_lateral_topk",
      (s, d) => Views.unique(s, "b11_cust" -> t(s, d, "customer"),
        "b11_ord" -> t(s, d, "orders")) { v =>
        s.sql(s"""
          SELECT c.c_custkey, o.o_orderkey,
                 CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,4)), 4)
                   AS DOUBLE) AS price
          FROM ${v("b11_cust")} c,
            LATERAL (SELECT o_orderkey, o_totalprice
                     FROM ${v("b11_ord")}
                     WHERE o_custkey = c.c_custkey
                     ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
          WHERE c.c_custkey <= 50
          ORDER BY c.c_custkey, price DESC, o_orderkey""")
      },
      Some("""SELECT c.c_custkey, o.o_orderkey,
          CAST(ROUND(CAST(o.o_totalprice AS DECIMAL(18,4)), 4)
            AS DOUBLE) AS price
        FROM customer c,
          LATERAL (SELECT o_orderkey, o_totalprice
                   FROM orders
                   WHERE o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
        WHERE c.c_custkey <= 50
        ORDER BY c.c_custkey, price DESC, o_orderkey""")),

    // m15 — EXIF/TIFF IFD walk with PER-ROW ENDIANNESS: the byte-order
    // leg of the container-decode family. m6-m13 all parse one fixed
    // byte order; TIFF headers declare theirs in-band ('II' little /
    // 'MM' big), and a real EXIF scanner must dispatch per FILE. The
    // fixture synthesizes a minimal TIFF (BOM, magic 42, IFD at 8,
    // three SHORT entries: ImageWidth 0x0100, ImageLength 0x0101,
    // Orientation 0x0112) alternating byte order by doc_id; the decoder
    // reads the BOM and swaps multi-byte fields accordingly — all
    // map-only codegen'd hex-string arithmetic over one payload column,
    // content never shuffles (the m-tier contract). head_hex pins the
    // encode bytes; the oracle recomputes everything from the synthesis
    // rule so a matched encode/decode bug cannot cancel.
    Q("m15_parse_exif",
      (s, d) => {
        // 16-bit / entry hex helpers, little vs big endian
        def be16(v: String) = s"lpad(hex($v), 4, '0')"
        def le16(v: String) =
          s"concat(substring(lpad(hex($v), 4, '0'), 3, 2)," +
            s" substring(lpad(hex($v), 4, '0'), 1, 2))"
        val fixture = t(s, d, "documents").selectExpr("doc_id",
            "doc_id % 2 = 0 AS le",
            "16L + doc_id % 512 AS w0", "16L + (doc_id * 3) % 512 AS h0",
            "1L + doc_id % 8 AS or0")
          .selectExpr("doc_id", "le",
            // header: BOM + magic 42 + IFD offset 8 (4 bytes), then
            // count=3 and three 12-byte SHORT entries (tag, type=3,
            // count=1, value in the leading 2 of 4 value bytes)
            s"""concat(
               CASE WHEN le THEN '49492A0008000000'
                    ELSE '4D4D002A00000008' END,
               CASE WHEN le THEN '0300' ELSE '0003' END,
               CASE WHEN le THEN concat('0001', '0300', '01000000',
                                        ${le16("w0")}, '0000')
                    ELSE concat('0100', '0003', '00000001',
                                ${be16("w0")}, '0000') END,
               CASE WHEN le THEN concat('0101', '0300', '01000000',
                                        ${le16("h0")}, '0000')
                    ELSE concat('0101', '0003', '00000001',
                                ${be16("h0")}, '0000') END,
               CASE WHEN le THEN concat('1201', '0300', '01000000',
                                        ${le16("or0")}, '0000')
                    ELSE concat('0112', '0003', '00000001',
                                ${be16("or0")}, '0000') END) AS hx""")
        // decode: endian from the BOM, then per-entry tag/value reads
        // with endian-conditional byte swaps (rd16 at 1-based hex pos)
        def rd16(pos: String) =
          s"""cast(conv(CASE WHEN bom = '4949'
               THEN concat(substring(hx, ($pos) + 2, 2),
                           substring(hx, $pos, 2))
               ELSE substring(hx, $pos, 4) END, 16, 10) AS BIGINT)"""
        fixture
          .withColumn("bom", expr("substring(hx, 1, 4)"))
          // entry i (0-based) starts at hex pos 21 + 24*i; value field
          // at +16 within the entry; tags identify the fields
          .selectExpr("doc_id",
            "CASE WHEN bom = '4949' THEN 'II' ELSE 'MM' END AS endian",
            s"""${rd16("21 + 24*0 + 16")} AS width""",
            s"""${rd16("21 + 24*1 + 16")} AS height""",
            s"""${rd16("21 + 24*2 + 16")} AS orientation""",
            "substring(hx, 1, 20) AS head_hex")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS endian,
          CAST(16 + doc_id % 512 AS BIGINT) AS width,
          CAST(16 + (doc_id * 3) % 512 AS BIGINT) AS height,
          CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
          CASE WHEN doc_id % 2 = 0 THEN '49492A00080000000300'
               ELSE '4D4D002A000000080003' END AS head_hex
        FROM documents ORDER BY doc_id""")),

    // j82 — temperature-smoothed source-mixture schedule: the sampling
    // recipe step every published pretraining mixture uses (multinomial
    // over sources with p_i ∝ n_i^τ, τ < 1 upweighting small/rare
    // sources — the device from the multilingual-BERT/XLM-R exponent
    // through the LLaMA data mixtures). τ = 0.5 spelled as sqrt():
    // IEEE-754 sqrt is correctly rounded in BOTH engines where pow(x,
    // 0.5) need not be, so the smoothed weights cross-engine hash. The
    // epochs column (w_i · B / n_i at a 1M-token budget B) is the
    // number every mixture review asks for — how many times does the
    // schedule repeat each source's data. Shape: one token-count
    // aggregate (map-side partial over the corpus scan), then
    // arithmetic over the |sources|-row relation with two 1-row scalar
    // carriers (Σn, Σsqrt) — bounded by source cardinality, never by
    // corpus volume; PlanLint-allowlisted like j30/j38.
    Q("j82_mixture_temperature",
      (s, d) => {
        val st = t(s, d, "documents")
          .groupBy("source")
          .agg(sum(size(split(col("text"), " "))).cast("long")
            .as("n_tokens"))
        val tot = st.agg(sum("n_tokens").cast("double").as("n_total"))
        val sq = st.crossJoin(broadcast(tot))
          .withColumn("sq", sqrt(col("n_tokens") / col("n_total")))
        // exact-decimal normalizer (r18-s2 review): a plain double SUM
        // of the sqrt weights is accumulation-order-dependent — the one
        // spot in this key where a partition-order ulp could reach the
        // 6-dp emit; DECIMAL(28,12) absorbs it (sqrt itself is
        // correctly-rounded IEEE, identical both engines)
        val z = sq.agg(sum(col("sq").cast("decimal(28,12)"))
          .cast("double").as("z"))
        sq.crossJoin(broadcast(z))
          .select(col("source"), col("n_tokens"),
            round(col("sq") / col("z"), 6).as("weight"),
            round((col("sq") / col("z")) * lit(1000000.0) /
              col("n_tokens"), 6).as("epochs"))
          .orderBy("source")
      },
      Some("""WITH st AS (SELECT source,
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source),
          tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS n_total FROM st),
          sq AS (SELECT source, n_tokens,
              sqrt(n_tokens / n_total) AS sq FROM st, tot),
          z AS (SELECT CAST(SUM(CAST(sq AS DECIMAL(28,12))) AS DOUBLE)
            AS z FROM sq)
        SELECT source, n_tokens,
          ROUND(sq / z, 6) AS weight,
          ROUND((sq / z) * 1000000.0 / n_tokens, 6) AS epochs
        FROM sq, z ORDER BY source""")),

    // i27 — composed streaming recipe (gate → bounded dedup → windowed
    // agg), the streaming leg of j79: see Streams.i27 for the harness
    // and the state-boundedness rationale. Oracle = the batch recompute
    // over unique filtered events (re-sends either dedup away inside
    // the watermark or drop below it — never double-count).
    Q("i27_stream_recipe",
      (s, d) => graft.streaming.Streams.i27(s, d),
      Some("""SELECT (CAST(epoch_ms(ts) AS BIGINT) // 3600000) * 3600000
            AS w_start,
          event_type, COUNT(*) AS n,
          CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE)
            AS sum_v
        FROM events
        WHERE event_type <> 'error' AND value >= 1.0
        GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    // k27 — join-strategy HINTS: /*+ SHUFFLE_MERGE */ forcing a
    // sort-merge join where the optimizer would broadcast — the ops
    // lever for the day a "small" dim outgrows executor memory and the
    // auto-broadcast OOMs (hints override size estimation without
    // touching session confs). Results are hint-invariant by contract;
    // the oracle reads the same text because DuckDB parses the hint as
    // a plain block comment. Round17Spec pins that the hint actually
    // flipped the strategy (SortMergeJoin in-plan where the unhinted
    // twin broadcasts).
    Q("k27_join_hints",
      (s, d) => Views.unique(s, "k27_ord" -> t(s, d, "orders"),
        "k27_cust" -> t(s, d, "customer")) { v =>
        s.sql(s"""
          SELECT /*+ SHUFFLE_MERGE(c) */ c.c_mktsegment,
                 COUNT(*) AS n,
                 CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 4)
                   AS DOUBLE) AS rev
          FROM ${v("k27_ord")} o JOIN ${v("k27_cust")} c
            ON o.o_custkey = c.c_custkey
          GROUP BY c.c_mktsegment ORDER BY c_mktsegment""")
      },
      Some("""SELECT /*+ SHUFFLE_MERGE(c) */ c.c_mktsegment,
          COUNT(*) AS n,
          CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 4)
            AS DOUBLE) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c_mktsegment""")),

    // a42 — output FILE SIZING (maxRecordsPerFile): the writer-side
    // lever against both failure modes of file geometry at 100 TB —
    // multi-GB files that defeat task parallelism, and the small-files
    // explosion that melts the metastore. The fixture writes one
    // task's worth of lineitem under a 10k-record cap and reads the
    // GEOMETRY back via the _metadata hidden column (a37's device):
    // the writer must emit ⌊N/10k⌋ full files plus one remainder —
    // byte-budget layout becomes row arithmetic, which is what makes
    // it oracle-checkable (the oracle derives the histogram from
    // COUNT(*) alone, never from file names).
    Q("a42_file_sizing",
      (s, d) => {
        val out = graft.ops.Scratch.unique("a42_sized")
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber")
          .coalesce(1)
          .write.option("maxRecordsPerFile", 10000)
          .mode("overwrite").parquet(out)
        s.read.parquet(out)
          .select(col("_metadata.file_path").as("f"))
          .groupBy("f").agg(count(lit(1)).as("rows_per_file"))
          .groupBy("rows_per_file")
          .agg(count(lit(1)).as("n_files"))
          .orderBy("rows_per_file")
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n FROM lineitem)
        SELECT rows_per_file, n_files FROM (
          SELECT CAST(10000 AS BIGINT) AS rows_per_file,
                 CAST(n // 10000 AS BIGINT) AS n_files
          FROM n WHERE n >= 10000
          UNION ALL
          SELECT CAST(n % 10000 AS BIGINT), CAST(1 AS BIGINT)
          FROM n WHERE n % 10000 > 0) x
        ORDER BY rows_per_file""")),

    // g9 — bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    // g3/g4 grade the DISTINCT forms; the ALL forms keep multiplicity
    // (min-count for intersect, count-subtraction for except) — the
    // semantics reconciliation queries need (how many COPIES of this
    // key does each extract hold?) and the form Spark plans WITHOUT a
    // pre-aggregation (a generated row-count column + join, not a
    // distinct). Output re-aggregates to (value, multiplicity) so the
    // bag semantics are visible in a canonical, sortable shape — a
    // DISTINCT-semantics engine would emit multiplicity 1 everywhere.
    Q("g9_set_ops_all",
      (s, d) => {
        val a = t(s, d, "lineitem").where(col("l_orderkey") < 400)
          .select("l_partkey")
        val b = t(s, d, "lineitem")
          .where(col("l_orderkey") >= 200 && col("l_orderkey") < 600)
          .select("l_partkey")
        val ia = a.intersectAll(b).groupBy("l_partkey")
          .agg(count(lit(1)).as("mult"))
          .select(lit("intersect_all").as("op"), col("l_partkey"),
            col("mult"))
        val ea = a.exceptAll(b).groupBy("l_partkey")
          .agg(count(lit(1)).as("mult"))
          .select(lit("except_all").as("op"), col("l_partkey"), col("mult"))
        ia.unionAll(ea).orderBy("op", "l_partkey")
      },
      Some("""WITH a AS (SELECT l_partkey FROM lineitem
            WHERE l_orderkey < 400),
          b AS (SELECT l_partkey FROM lineitem
            WHERE l_orderkey >= 200 AND l_orderkey < 600),
          ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
          ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        SELECT 'intersect_all' AS op, l_partkey, COUNT(*) AS mult
        FROM ia GROUP BY l_partkey
        UNION ALL
        SELECT 'except_all', l_partkey, COUNT(*) FROM ea GROUP BY l_partkey
        ORDER BY op, l_partkey""")),

    // j86 — dedup COST MODEL: the planning query an operator runs BEFORE
    // launching a pair-generating dedup at scale — the df histogram of
    // the shingle postings (log2 buckets, integer-exact via
    // strlen(bin(df))−1, never a libm log), each bucket's exact pair
    // mass Σ df·(df−1)/2, and what the pairMaxDf=256 cap keeps. The
    // capped/uncapped RATIO per bucket is precisely the knob decision:
    // buckets whose mass melts under the cap are boilerplate (route to
    // the heavy-key branch), buckets untouched by it are content. One
    // gram exchange — the same shuffle j2 itself pays, no pairs are
    // ever materialized (the model costs ~nothing next to the job it
    // plans).
    Q("j86_dedup_cost_model",
      (s, d) => {
        val g = t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .where(size(col("toks")) >= 3)
          .select(col("doc_id"), explode(expr(
            s"""array_distinct(transform(${Ngrams.starts("toks", 3)},
                 i -> ${Ngrams.gramAt("toks", 3)}))""")).as("gram"))
        g.groupBy("gram").agg(count(lit(1)).as("df"))
          .select(col("df"),
            (length(expr("bin(df)")) - 1).cast("long").as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_grams"),
            sum(expr("df * (df - 1) div 2")).as("pair_mass"),
            sum(expr(
              "least(df, 256L) * (least(df, 256L) - 1) div 2"))
              .as("capped_mass"))
          .orderBy("bucket")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
            FROM documents WHERE len(string_split(text, ' ')) >= 3),
          g AS (SELECT DISTINCT doc_id,
              tk[i.i] || ' ' || tk[i.i+1] || ' ' || tk[i.i+2] AS gram
            FROM toks, unnest(range(1, len(tk) - 1)) i(i)),
          dfreq AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram)
        SELECT CAST(strlen(bin(df)) - 1 AS BIGINT) AS bucket,
          COUNT(*) AS n_grams,
          CAST(SUM(df * (df - 1) // 2) AS BIGINT) AS pair_mass,
          CAST(SUM(LEAST(df, 256) * (LEAST(df, 256) - 1) // 2) AS BIGINT)
            AS capped_mass
        FROM dfreq GROUP BY 1 ORDER BY bucket""")),

    // j87 — token-weighted QUOTA sampling (largest-remainder
    // apportionment): draw a 100-doc sample whose per-source allocation
    // is proportional to each source's TOKEN mass — the production
    // spelling of weighted corpus sampling (budgets per source, then a
    // uniform draw inside each). Exponential-keys weighted sampling
    // (Efraimidis-Spirakis) needs ln(u) in the ORDER — libm-dependent
    // and so not cross-engine-hashable (the j32 lesson); Hamilton's
    // method is INTEGER-exact: quota_i = (N·n_i) div T, remainders
    // ranked by (N·n_i) mod T with source tie-break, +1 to the largest
    // until N. The within-source draw is j75's md5-order device, per
    // stratum (e7's window shape). Everything after the one token-count
    // aggregate runs on the |sources|-row relation.
    Q("j87_quota_sample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val N = 100L
        val st = t(s, d, "documents")
          .groupBy("source")
          .agg(sum(size(split(col("text"), " "))).cast("long").as("nt"))
        val tot = st.agg(sum("nt").as("t"))
        val wRem = Window.orderBy(
          expr(s"($N * nt) % t").desc, col("source").asc)
        val quota = st.crossJoin(broadcast(tot))
          .withColumn("base", expr(s"($N * nt) div t"))
          .withColumn("extra",
            when(row_number().over(wRem) <=
              (lit(N) - sum("base").over(Window.partitionBy())), 1L)
              .otherwise(0L))
          .select(col("source"), (col("base") + col("extra")).as("quota"))
        val wSrc = Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")))
        t(s, d, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("rn", row_number().over(wSrc).cast("long"))
          .join(broadcast(quota), Seq("source"))
          .where(col("rn") <= col("quota"))
          .select(col("source"), col("doc_id"), col("quota"))
          .orderBy("source", "doc_id")
      },
      Some("""WITH st AS (SELECT source,
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS nt
            FROM documents GROUP BY source),
          tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS t FROM st),
          q0 AS (SELECT source, nt, (100 * nt) // t AS base,
              (100 * nt) % t AS rem,
              SUM((100 * nt) // t) OVER () AS base_sum
            FROM st, tot),
          quota AS (SELECT source,
              CAST(base + CASE WHEN row_number() OVER (
                  ORDER BY rem DESC, source) <= 100 - base_sum
                THEN 1 ELSE 0 END AS BIGINT) AS quota
            FROM q0),
          ranked AS (SELECT doc_id, source, CAST(row_number() OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR))) AS BIGINT) AS rn
            FROM documents)
        SELECT r.source, r.doc_id, q.quota
        FROM ranked r JOIN quota q ON r.source = q.source
        WHERE r.rn <= q.quota
        ORDER BY r.source, r.doc_id""")),

    // m16 — ID3v2 SYNCSAFE integers: the 7-bit-packed length encoding
    // (every size byte keeps bit 7 clear so the value can never fake an
    // MPEG frame sync) — a third integer-decode discipline after m6-m10
    // fixed-width little/big-endian and m15's per-row byte-order
    // dispatch: size = b0·2^21 + b1·2^14 + b2·2^7 + b3. Fixture
    // synthesizes an ID3v2.3 header whose syncsafe size encodes a
    // doc_id-derived value; decode is pure hex-substring arithmetic,
    // map-only (the m-tier contract). Oracle recomputes from the rule.
    Q("m16_parse_id3",
      (s, d) => {
        val fixture = t(s, d, "documents").selectExpr("doc_id",
            "(doc_id * 977) % 200000 AS sz")
          .selectExpr("doc_id",
            """concat('494433', '0300', '00',
               lpad(hex((sz div 2097152) % 128), 2, '0'),
               lpad(hex((sz div 16384) % 128), 2, '0'),
               lpad(hex((sz div 128) % 128), 2, '0'),
               lpad(hex(sz % 128), 2, '0')) AS hx""")
        fixture.selectExpr("doc_id",
            "cast(conv(substring(hx, 7, 2), 16, 10) AS BIGINT) AS ver_major",
            """cast(conv(substring(hx, 13, 2), 16, 10) AS BIGINT) * 2097152
             + cast(conv(substring(hx, 15, 2), 16, 10) AS BIGINT) * 16384
             + cast(conv(substring(hx, 17, 2), 16, 10) AS BIGINT) * 128
             + cast(conv(substring(hx, 19, 2), 16, 10) AS BIGINT)
               AS tag_size""",
            "substring(hx, 1, 20) AS head_hex")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          CAST(3 AS BIGINT) AS ver_major,
          CAST((doc_id * 977) % 200000 AS BIGINT) AS tag_size,
          upper('4944330300' || '00'
            || printf('%02x', ((doc_id * 977) % 200000) // 2097152 % 128)
            || printf('%02x', ((doc_id * 977) % 200000) // 16384 % 128)
            || printf('%02x', ((doc_id * 977) % 200000) // 128 % 128)
            || printf('%02x', (doc_id * 977) % 200000 % 128)) AS head_hex
        FROM documents ORDER BY doc_id""")),

    // j84 — n-gram NOVELTY curve: per doc (in doc_id = ingestion order),
    // what fraction of its distinct 3-grams is it the FIRST to
    // contribute — the marginal-utility diagnostic behind every
    // "does another crawl snapshot still add content?" decision (the
    // dataset-scaling curve, computed corpus-side). Attribution is
    // arg-min over doc order: one distinct (doc, gram) projection, one
    // gram-keyed min, one join back — all partial-aggregated on the
    // standard corpus-sized gram exchange; nothing pairwise. Short-doc
    // guard per the j67 rule (sequence() descends below 3 tokens).
    Q("j84_ngram_novelty",
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val g = docs.select(col("doc_id"), explode(expr(
            s"""transform(${Ngrams.starts0("toks", 3)}, i ->
                 concat_ws(' ', toks[i], toks[i+1], toks[i+2]))""")).as("gram"))
          .distinct()
        val intro = g.groupBy("gram").agg(min("doc_id").as("intro"))
        val per = g.join(intro, Seq("gram"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_distinct"),
            sum(when(col("intro") === col("doc_id"), 1L).otherwise(0L))
              .as("n_new"))
        docs.select("doc_id").join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
            coalesce(col("n_new"), lit(0L)).as("n_new"),
            coalesce(round(col("n_new").cast("double") /
              col("n_distinct"), 6), lit(0.0)).as("novelty"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
            FROM documents),
          g AS (SELECT DISTINCT doc_id,
              tk[i.i] || ' ' || tk[i.i+1] || ' ' || tk[i.i+2] AS gram
            FROM toks, unnest(range(1, len(tk) - 1)) i(i)),
          intro AS (SELECT gram, MIN(doc_id) AS intro FROM g GROUP BY gram),
          per AS (SELECT g.doc_id, COUNT(*) AS n_distinct,
              CAST(SUM(CASE WHEN intro.intro = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new
            FROM g JOIN intro USING (gram) GROUP BY g.doc_id)
        SELECT d.doc_id,
          COALESCE(per.n_distinct, 0) AS n_distinct,
          COALESCE(per.n_new, 0) AS n_new,
          COALESCE(ROUND(CAST(per.n_new AS DOUBLE) / per.n_distinct, 6),
            0.0) AS novelty
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY d.doc_id""")),

    // j85 — packing-efficiency sweep: BEFORE committing a context length,
    // report what each candidate max_len costs in padding waste under
    // j33's shard-local packing rule (docs concatenated per shard
    // doc_id % 8, cut at L; the last bin of each shard is the only
    // padded one). The j74-style sweep device: one scan computes the
    // per-shard token totals, a 3-row length table crosses them, and
    // everything else is integer arithmetic — bins = ceil(T/L), waste =
    // bins·L − T, fill = T/(bins·L). At 100 TB this is a metadata-sized
    // query over a corpus-sized scan, and it is the number that decides
    // the dataloader geometry. Lengths broadcast (3-row dimension).
    Q("j85_pack_efficiency",
      (s, d) => {
        val shard = t(s, d, "documents")
          .select((col("doc_id") % 8).as("shard"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .groupBy("shard").agg(sum("n_tok").as("t"))
        shard.crossJoin(broadcast(
            s.range(1).select(explode(
              array(lit(256L), lit(1024L), lit(2048L))).as("max_len"))))
          .select(col("max_len"), col("t"),
            expr("(t - 1) div max_len + 1").as("bins"))
          .groupBy("max_len")
          .agg(sum("bins").as("n_bins"),
            sum("t").as("total_tokens"),
            round(sum("t").cast("double") /
              (sum(col("bins") * col("max_len"))).cast("double"), 6)
              .as("fill_rate"),
            sum(col("bins") * col("max_len") - col("t")).as("waste"))
          .orderBy("max_len")
      },
      Some("""WITH shard AS (SELECT doc_id % 8 AS shard,
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t
            FROM documents GROUP BY 1),
          ls AS (SELECT CAST(unnest([256, 1024, 2048]) AS BIGINT)
            AS max_len),
          b AS (SELECT max_len, t, (t - 1) // max_len + 1 AS bins
            FROM shard, ls)
        SELECT max_len,
          CAST(SUM(bins) AS BIGINT) AS n_bins,
          CAST(SUM(t) AS BIGINT) AS total_tokens,
          ROUND(CAST(SUM(t) AS DOUBLE) /
            CAST(SUM(bins * max_len) AS DOUBLE), 6) AS fill_rate,
          CAST(SUM(bins * max_len - t) AS BIGINT) AS waste
        FROM b GROUP BY max_len ORDER BY max_len""")),

    // p21 — year-over-year self-join with EXCHANGE REUSE: the TPC-DS
    // Q75-class shape — aggregate once at (priority, year) grain, then
    // join the aggregate to ITSELF shifted one year for the YoY ratio.
    // The graded plan property is that the two sides of the self-join
    // are ONE exchange: the aggregate subtrees are canonically
    // identical, so Spark's ReuseExchange must materialize the shuffle
    // once and feed both sides (Round17Spec pins ReusedExchange in the
    // executed plan) — at 100 TB that halves the heaviest stage of the
    // query. Sums run in DECIMAL before the DOUBLE emit (double SUM is
    // accumulation-order-dependent across engines); the ratio divides
    // the already-rounded doubles, so it is deterministic.
    Q("p21_yoy_selfjoin_reuse",
      (s, d) => {
        val agg = t(s, d, "orders")
          .groupBy(col("o_orderpriority").as("pri"),
            year(col("o_orderdate")).cast("long").as("yr"))
          .agg(graft.Tables.mSum(col("o_totalprice")).as("rev"),
            count(lit(1)).as("n"))
        // REUSE DISCIPLINE: the year shift lives in the JOIN CONDITION
        // (c.yr = p.yr + 1) and BOTH sides emit every aggregate column —
        // projecting yr+1 on one side, or letting column pruning drop the
        // count from the other, makes the subtrees canonically different
        // and Spark re-scans + re-aggregates the fact table (the naive
        // form measured exactly that). Identical subtrees → one exchange.
        val c = agg.as("c")
        val p = agg.as("p")
        c.join(p, col("c.pri") === col("p.pri") &&
            col("c.yr") === col("p.yr") + 1L)
          .select(col("c.pri").as("pri"), col("c.yr").as("yr"),
            col("c.rev").as("rev_cur"), col("p.rev").as("rev_prev"),
            col("c.n").as("n_cur"), col("p.n").as("n_prev"),
            round(col("c.rev") / col("p.rev"), 6).as("yoy"))
          .orderBy("pri", "yr")
      },
      Some("""WITH agg AS (SELECT o_orderpriority AS pri,
              CAST(year(o_orderdate) AS BIGINT) AS yr,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4)
                AS DOUBLE) AS rev,
              COUNT(*) AS n
            FROM orders GROUP BY 1, 2)
        SELECT c.pri, c.yr, c.rev AS rev_cur, p.rev AS rev_prev,
          c.n AS n_cur, p.n AS n_prev, ROUND(c.rev / p.rev, 6) AS yoy
        FROM agg c JOIN agg p ON c.pri = p.pri AND c.yr = p.yr + 1
        ORDER BY c.pri, c.yr""")),

    // e18 — MOVING MEDIAN (exact percentile as a window aggregate over a
    // bounded ROWS frame): the robust-smoothing twin of e4's moving
    // average — one outlier drags a mean for the whole frame but moves
    // a median one rank, which is why ops dashboards smooth with
    // medians. Spark evaluates the exact interpolated `percentile` over
    // each ≤7-row frame (bounded frames keep window state O(frame), the
    // at-scale contract); DuckDB's quantile_cont matches the
    // interpolation exactly (the k22/j68 precedent).
    Q("e18_win_median",
      (s, d) => Views.unique(s, "e18_ev" -> events(s, d)
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("value"))) { v =>
        s.sql(s"""
          SELECT event_id, user_id,
                 CAST(ROUND(percentile(value, 0.5) OVER (
                   PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
                   AS DOUBLE) AS med7
          FROM ${v("e18_ev")} ORDER BY event_id""")
      },
      Some("""SELECT event_id, user_id,
          CAST(ROUND(quantile_cont(value, 0.5) OVER (
            PARTITION BY user_id
            ORDER BY CAST(epoch_ms(ts) AS BIGINT), event_id
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
            AS DOUBLE) AS med7
        FROM events ORDER BY event_id""")),

    // p22 — TPC-DS Q67-class composite: RANK WITHIN EACH ROLLUP LEVEL —
    // the rollup produces every grouping grain in one pass, then a
    // window partitioned by grouping_id ranks inside each grain and
    // keeps the top 3. Grades the rollup→window interplay: one expand +
    // one aggregate exchange + one window exchange, never a union of
    // per-grain queries (which would rescan the fact table per grain —
    // the shape this operator exists to kill).
    Q("p22_rollup_rank",
      (s, d) => Views.unique(s, "p22_ord" -> t(s, d, "orders")) { v =>
        s.sql(s"""
          WITH r AS (
            SELECT COALESCE(o_orderpriority, '(all)') AS pri,
                   COALESCE(o_orderstatus, '(all)') AS st,
                   CAST(grouping_id(o_orderpriority, o_orderstatus)
                     AS BIGINT) AS lvl,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4)
                     AS DOUBLE) AS rev
            FROM ${v("p22_ord")}
            GROUP BY ROLLUP(o_orderpriority, o_orderstatus))
          SELECT * FROM (
            SELECT pri, st, lvl, rev,
                   CAST(rank() OVER (PARTITION BY lvl
                     ORDER BY rev DESC, pri, st) AS BIGINT) AS rk
            FROM r) x
          WHERE rk <= 3 ORDER BY lvl, rk, pri, st""")
      },
      Some("""WITH r AS (
          SELECT COALESCE(o_orderpriority, '(all)') AS pri,
                 COALESCE(o_orderstatus, '(all)') AS st,
                 CAST(GROUPING(o_orderpriority, o_orderstatus)
                   AS BIGINT) AS lvl,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4)
                   AS DOUBLE) AS rev
          FROM orders
          GROUP BY ROLLUP(o_orderpriority, o_orderstatus))
        SELECT * FROM (
          SELECT pri, st, lvl, rev,
                 CAST(rank() OVER (PARTITION BY lvl
                   ORDER BY rev DESC, pri, st) AS BIGINT) AS rk
          FROM r) x
        WHERE rk <= 3 ORDER BY lvl, rk, pri, st""")),

    // j88 — deterministic NEGATIVE SAMPLING (contrastive-pair prep): for
    // each (anchor, positive) pair, draw 4 negatives from the corpus
    // uniformly, guaranteed ≠ positive, WITHOUT rejection loops: draw
    // from a ring of size N−1 (md5-derived uniform — the established
    // cross-engine RNG) and shift draws ≥ positive up by one — the
    // classic exclusion trick, exact and branch-free, which is what
    // keeps it a pure map over the pair table at any scale (rejection
    // resampling would be an unbounded iterate). Positives are a
    // derived deterministic partner; N comes from the corpus count
    // (1-row carrier).
    Q("j88_negative_sampling",
      (s, d) => {
        val pos = t(s, d, "documents")
          .select(col("doc_id").as("anchor"),
            ((col("doc_id") * 7 + 13) % 500).as("pos"))
        val n = t(s, d, "documents").agg(count(lit(1)).as("n"))
        pos.crossJoin(broadcast(n))
          // a 0/1-doc corpus has an empty exclusion ring (N-1 = 0): no
          // negative can be drawn — emit nothing rather than mod-by-zero
          // (degenerate-data harness finding; same WHERE in the oracle)
          .where(col("n") >= 2)
          .select(col("anchor"), col("pos"),
            explode(expr("sequence(1, 4)")).as("i"), col("n"))
          .withColumn("raw", expr(
            """cast(conv(substring(md5(concat(cast(anchor AS STRING), ':',
                 cast(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % (n - 1)"""))
          .select(col("anchor"), col("pos"), col("i").cast("long").as("i"),
            (col("raw") + when(col("raw") >= col("pos"), 1L)
              .otherwise(0L)).cast("long").as("neg"))
          .orderBy("anchor", "i")
      },
      Some("""WITH n AS (SELECT COUNT(*) AS n FROM documents),
          pos AS (SELECT doc_id AS anchor, (doc_id * 7 + 13) % 500 AS pos
            FROM documents),
          drawn AS (SELECT anchor, pos, i.i AS i,
              CAST('0x' || substr(md5(CAST(anchor AS VARCHAR) || ':' ||
                CAST(i.i AS VARCHAR)), 1, 8) AS BIGINT) % (n - 1) AS raw
            FROM pos, n, unnest(range(1, 5)) i(i)
            WHERE n >= 2)
        SELECT anchor, pos, CAST(i AS BIGINT) AS i,
          CAST(raw + CASE WHEN raw >= pos THEN 1 ELSE 0 END AS BIGINT)
            AS neg
        FROM drawn ORDER BY anchor, i""")),

    // e19 — RESETTING running sum (session-scoped cumsum): the
    // two-window composition every funnel/inventory/budget query needs —
    // a lag-gap flag marks session starts (h10's 30-minute rule), a
    // first cumulative sum turns flags into session ids, a second
    // accumulates value WITHIN each (user, session). Both windows share
    // ONE (user) partitioning and ordering, so the whole thing is one
    // shuffle + one sort (the h30 shared-window discipline); sums run
    // in DECIMAL and emit DOUBLE per §8.4.
    Q("e19_win_reset_runsum",
      (s, d) => Views.unique(s, "e19_ev" -> events(s, d)
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("value"))) { v =>
        s.sql(s"""
          WITH x AS (SELECT event_id, user_id, ts_ms, value,
              CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id
                  ORDER BY ts_ms, event_id) IS NULL
                OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
                  ORDER BY ts_ms, event_id) > 1800000
                THEN 1 ELSE 0 END AS new_sess
            FROM ${v("e19_ev")}),
          se AS (SELECT event_id, user_id, ts_ms, value,
              CAST(SUM(new_sess) OVER (PARTITION BY user_id
                ORDER BY ts_ms, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS sid
            FROM x)
          SELECT event_id, user_id, sid,
                 CAST(ROUND(SUM(CAST(
                   CASE WHEN abs(value) < 1e14 THEN value END
                   AS DECIMAL(18,4))) OVER (
                   PARTITION BY user_id, sid ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS DOUBLE) AS run_v
          FROM se ORDER BY event_id""")
        // the CASE is Tables.dec's out-of-domain guard in SQL text (this
        // key is SQL-registered): a corrupt ±1e308 measure skips out of
        // the running sum like a NULL, never an ANSI cast error — and is
        // the identity on every in-domain value
      },
      Some("""WITH e AS (SELECT event_id, user_id,
              CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, value FROM events),
          x AS (SELECT event_id, user_id, ts_ms, value,
              CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id
                  ORDER BY ts_ms, event_id) IS NULL
                OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
                  ORDER BY ts_ms, event_id) > 1800000
                THEN 1 ELSE 0 END AS new_sess
            FROM e),
          se AS (SELECT event_id, user_id, ts_ms, value,
              CAST(SUM(new_sess) OVER (PARTITION BY user_id
                ORDER BY ts_ms, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS sid
            FROM x)
        SELECT event_id, user_id, sid,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                 PARTITION BY user_id, sid ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                 AS DOUBLE) AS run_v
        FROM se ORDER BY event_id""")),

    // j90 — SEMANTIC decontamination: j65/j73 catch lexical overlap;
    // paraphrased contamination needs the embedding leg — for every
    // BENCHMARK doc (source src0), the top-5 nearest TRAIN docs by
    // cosine, the review list a decontam run hands a human (or a
    // threshold). The at-scale shape is exactly what this plans:
    // benchmarks are tiny next to train corpora, so the BENCH side
    // broadcasts (25 rows here; ~10⁴ in production) and the train
    // corpus streams through ONE scan scoring against every bench
    // vector; per-bench top-5 is the e7 window on a bench-keyed
    // relation. Rounded-cosine + id tie-break (the j3 device).
    Q("j90_semantic_decontam",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings")
        val src = t(s, d, "documents").select(col("doc_id"), col("source"))
        val tagged = emb.join(src, emb("vec_id") === src("doc_id"))
          .select(col("vec_id"), col("embedding"),
            (col("source") === "src0").as("is_bench"))
        val bench = tagged.where(col("is_bench"))
          .select(col("vec_id").as("b_id"), col("embedding").as("e_b"))
        // native codegen'd cosine (r18-s2 review): the interpreted HOF
        // fold paid a lambda frame per element on the file's heaviest
        // pair table AND re-derived the constant bench norm per pair;
        // CosineSimilarity is the j3/j3c-proven bit-exact twin
        val pairs = tagged.where(!col("is_bench"))
          .crossJoin(broadcast(bench))
          .select(col("b_id"), col("vec_id").as("t_id"),
            round(graft.expressions.CosineSimilarity(s,
              col("embedding"), col("e_b")), 6).as("cos"))
        val w = Window.partitionBy("b_id").orderBy(desc("cos"), asc("t_id"))
        pairs.withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 5)
          .select(col("b_id"), col("rank"), col("t_id"), col("cos"))
          .orderBy("b_id", "rank")
      },
      Some("""WITH tagged AS (SELECT e.vec_id, e.embedding,
              d.source = 'src0' AS is_bench
            FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
          ex AS (SELECT vec_id, is_bench,
              generate_subscripts(embedding, 1) AS dd,
              CAST(unnest(embedding) AS DOUBLE) AS v FROM tagged),
          nrm AS (SELECT vec_id, is_bench, sqrt(SUM(v*v)) AS n
            FROM ex GROUP BY vec_id, is_bench),
          dots AS (SELECT b.vec_id AS b_id, t.vec_id AS t_id,
              SUM(t.v * b.v) AS dot
            FROM ex t JOIN ex b USING (dd)
            WHERE b.is_bench AND NOT t.is_bench
            GROUP BY b.vec_id, t.vec_id),
          scored AS (SELECT d.b_id, d.t_id,
              ROUND(d.dot / (nt.n * nb.n), 6) AS cos
            FROM dots d
            JOIN nrm nt ON nt.vec_id = d.t_id
            JOIN nrm nb ON nb.vec_id = d.b_id),
          ranked AS (SELECT b_id, t_id, cos,
              CAST(row_number() OVER (PARTITION BY b_id
                ORDER BY cos DESC, t_id) AS BIGINT) AS rank
            FROM scored)
        SELECT b_id, rank, t_id, cos FROM ranked
        WHERE rank <= 5 ORDER BY b_id, rank""")),

    // m17 — WARC-style RECORD WALK (text-protocol container): the crawl
    // interchange format every LLM data pipeline starts from is a
    // concatenation of header-framed records whose offsets chain
    // through a TEXTUAL Content-Length field — unlike m12's binary TLV,
    // the lengths arrive as decimal strings inside CRLF-terminated
    // headers, so the walk extracts text fields and converts, per
    // record, inside one aggregate() fold (locate() with a position
    // argument is the scanner). Map-only, content never shuffles; the
    // oracle rebuilds every record from the synthesis rule.
    Q("m17_parse_warc",
      (s, d) => {
        val fixture = t(s, d, "documents").selectExpr("doc_id",
            "cast(1 + doc_id % 3 AS INT) AS cnt")
          .selectExpr("doc_id", "cnt",
            // concat (not s"""): the s-interpolator would process the
            // \r\n escapes at Scala level and change the SQL literal
            "aggregate(" + Ngrams.seqAsc("1", "cnt") +
            """, '', (acc, i) -> concat(acc,
                 'WARC/1.0\r\nWARC-Type: ',
                 CASE WHEN i % 2 = 1 THEN 'response' ELSE 'request' END,
                 '\r\nContent-Length: ',
                 cast(20 + (doc_id * i) % 40 AS STRING),
                 '\r\n\r\n',
                 substring(repeat(md5(concat(cast(doc_id AS STRING), ':',
                   cast(i AS STRING))), 2),
                   1, cast(20 + (doc_id * i) % 40 AS INT)),
                 '\r\n\r\n')) AS payload""")
        fixture
          .selectExpr("doc_id",
            "aggregate(" + Ngrams.seqAsc("1", "cnt") +
            """,
                struct(1 AS p,
                  cast(array() AS
                    array<struct<typ:string,len:int,head:string>>) AS es),
                (acc, i) -> struct(
                  cast(locate('\r\n\r\n', payload, acc.p) + 4
                    + cast(substring(payload,
                        locate('Content-Length: ', payload, acc.p) + 16,
                        locate('\r\n\r\n', payload, acc.p)
                          - locate('Content-Length: ', payload, acc.p)
                          - 16) AS INT) + 4 AS INT) AS p,
                  concat(acc.es, array(struct(
                    substring(payload,
                      locate('WARC-Type: ', payload, acc.p) + 11,
                      locate('\r\nContent-Length', payload, acc.p)
                        - locate('WARC-Type: ', payload, acc.p) - 11)
                      AS typ,
                    cast(substring(payload,
                      locate('Content-Length: ', payload, acc.p) + 16,
                      locate('\r\n\r\n', payload, acc.p)
                        - locate('Content-Length: ', payload, acc.p)
                        - 16) AS INT) AS len,
                    substring(payload,
                      locate('\r\n\r\n', payload, acc.p) + 4, 8)
                      AS head))) AS es),
                acc -> acc.es) AS es""")
          .selectExpr("doc_id", "posexplode(es) AS (i0, e)")
          .selectExpr("doc_id", "cast(i0 + 1 AS BIGINT) AS idx",
            "e.typ AS rec_type", "cast(e.len AS BIGINT) AS content_len",
            "e.head AS body_head")
          .orderBy("doc_id", "idx")
      },
      Some("""WITH recs AS (SELECT doc_id, i.i AS idx FROM documents,
            unnest(range(1, 4)) i(i) WHERE i.i <= 1 + doc_id % 3)
        SELECT doc_id, CAST(idx AS BIGINT) AS idx,
          CASE WHEN idx % 2 = 1 THEN 'response' ELSE 'request' END
            AS rec_type,
          CAST(20 + (doc_id * idx) % 40 AS BIGINT) AS content_len,
          substring(repeat(md5(CAST(doc_id AS VARCHAR) || ':' ||
            CAST(idx AS VARCHAR)), 2), 1, 8) AS body_head
        FROM recs ORDER BY doc_id, idx""")),

    // h48 — array SET ALGEBRA surface (array_union / array_intersect /
    // array_except): the deduplicating set trio next to h6's HOFs —
    // used internally by j2's shingle intersections, graded here as a
    // user-facing surface. Outputs flatten to SORTED joined strings
    // (§8.4: no array columns in declared output; sorting also erases
    // the engines' differing element-order contracts — Spark preserves
    // left-argument order, DuckDB's list functions don't promise one).
    // Two overlapping token windows per doc make all three results
    // non-trivial; counts ride along as BIGINT.
    Q("h48_array_setops",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 15)
        .selectExpr("doc_id",
          "slice(toks, 1, 10) AS a", "slice(toks, 6, 10) AS b")
        .selectExpr("doc_id",
          "size(array_union(a, b)) AS n_union",
          "size(array_intersect(a, b)) AS n_inter",
          "size(array_except(a, b)) AS n_except",
          "array_join(array_sort(array_intersect(a, b)), ' ') AS inter_s")
        .selectExpr("doc_id", "CAST(n_union AS BIGINT) AS n_union",
          "CAST(n_inter AS BIGINT) AS n_inter",
          "CAST(n_except AS BIGINT) AS n_except", "inter_s")
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id,
            list_slice(string_split(text, ' '), 1, 10) AS a,
            list_slice(string_split(text, ' '), 6, 15) AS b
          FROM documents WHERE len(string_split(text, ' ')) >= 15),
        se AS (SELECT doc_id,
            list_distinct(list_concat(a, b)) AS u,
            list_distinct(list_filter(a, x -> list_contains(b, x))) AS i,
            list_distinct(list_filter(a, x -> NOT list_contains(b, x)))
              AS ex
          FROM w)
        SELECT doc_id,
          CAST(len(u) AS BIGINT) AS n_union,
          CAST(len(i) AS BIGINT) AS n_inter,
          CAST(len(ex) AS BIGINT) AS n_except,
          array_to_string(list_sort(i), ' ') AS inter_s
        FROM se ORDER BY doc_id""")),

    // j89 — label-centroid CONFUSION: per label, the nearest FOREIGN
    // centroid by cosine — the semantic complement of j64's lexical
    // who-copies-whom matrix (two labels whose centroids sit closest
    // are the mixture's redundancy candidates; the j71 dispersion
    // decides whether that closeness is tight duplication or broad
    // overlap). Shape: the corpus collapses to |labels| centroid rows
    // in ONE per-dimension aggregate (posexplode → (label, dim) mean —
    // j7's device), and the pairwise part runs on that 16-row relation
    // (j45's bounded-theta allowance) — no corpus-sized join anywhere.
    // Round-6 cosine + label tie-break for the argmin (the j3 device).
    Q("j89_centroid_confusion",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cent = t(s, d, "embeddings")
          .select(col("label"), posexplode(col("embedding")))
          .groupBy(col("label"), col("pos"))
          .agg(avg(col("col").cast("double")).as("v"))
        val pairs = cent.toDF("la", "pos", "va")
          .join(cent.toDF("lb", "pos", "vb"), Seq("pos"))
          .where(col("la") =!= col("lb"))
          .groupBy("la", "lb")
          // zero-norm centroid (an all-zero label cell) -> NULL cos via
          // nullif, not an ANSI divide-by-zero (r20 pathological sweep);
          // the oracle carries the same NULLIF
          .agg(round(sum(col("va") * col("vb")) /
            nullif(sqrt(sum(col("va") * col("va"))) *
             sqrt(sum(col("vb") * col("vb"))), lit(0.0)), 6).as("cos"))
        val w = Window.partitionBy("la")
          .orderBy(desc("cos"), asc("lb"))
        pairs.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("la").as("label"), col("lb").as("nearest_label"),
            col("cos"))
          .orderBy("label")
      },
      Some("""WITH e AS (SELECT label,
              generate_subscripts(embedding, 1) AS pos,
              CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
          cent AS (SELECT label, pos, AVG(v) AS v
            FROM e GROUP BY label, pos),
          pairs AS (SELECT a.label AS la, b.label AS lb,
              ROUND(SUM(a.v * b.v) / NULLIF(
                sqrt(SUM(a.v * a.v)) * sqrt(SUM(b.v * b.v)), 0), 6) AS cos
            FROM cent a JOIN cent b ON a.pos = b.pos AND a.label <> b.label
            GROUP BY a.label, b.label),
          best AS (SELECT la, lb, cos, row_number() OVER (
              PARTITION BY la ORDER BY cos DESC, lb) AS rn FROM pairs)
        SELECT la AS label, lb AS nearest_label, cos
        FROM best WHERE rn = 1 ORDER BY label""")),

    // j83 — matryoshka truncation fidelity: rank the probe's neighbors
    // by full 64-dim cosine AND by the first-16-dims cosine (the MRL
    // deployment trick — truncate stored vectors 4× and re-rank only a
    // shortlist at full precision), emitting both top-10 lists aligned
    // by rank so the divergence is visible row-by-row. This is the
    // audit that DECIDES whether the 4× storage/bandwidth cut is safe
    // for a given corpus — the eval leg of the j3/j53 tier, as j74 is
    // to the dedup thresholds. Shape: each ranking is its own
    // embeddings scan + 1-row probe broadcast ending in a
    // TakeOrderedAndProject (never a global sort) — two scans by
    // construction, since the full and sliced pipelines differ below
    // the exchange and cannot share it (r18-s2: an earlier comment
    // claimed one shared scan; the plan has two). The rank join is
    // 10×10. The probe rows are j3's 1-row broadcast carriers
    // (PlanLint-allowlisted). Ordering key is the ROUNDED cosine with
    // vec_id tie-break — the j3 cross-engine device.
    Q("j83_matryoshka_eval",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings")
        def topk(dimExpr: String => String, outId: String, outSim: String) = {
          val probe = emb.where(col("vec_id") === 0)
            .select(expr(dimExpr("embedding")).as("e0"))
          // native codegen'd cosine (r18-s2 review) — was the verbatim
          // interpreted-HOF copy of j90's old fold
          val scored = emb.crossJoin(broadcast(probe))
            .where(col("vec_id") =!= 0)
            .select(col("vec_id"),
              round(graft.expressions.CosineSimilarity(s,
                expr(dimExpr("embedding")), col("e0")), 6).as("cos"))
            .orderBy(desc("cos"), asc("vec_id")).limit(10)
          scored.select(
            row_number().over(Window.orderBy(desc("cos"), asc("vec_id")))
              .cast("long").as("rank"),
            col("vec_id").as(outId), col("cos").as(outSim))
        }
        topk(identity, "full_id", "full_sim")
          .join(topk(e => s"slice($e, 1, 16)", "trunc_id", "trunc_sim"),
            Seq("rank"))
          .orderBy("rank")
      },
      Some("""WITH e AS (SELECT vec_id,
              generate_subscripts(embedding,1) AS dd,
              CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
          p AS (SELECT dd, v FROM e WHERE vec_id = 0),
          dots AS (SELECT e.vec_id, SUM(e.v*p.v) AS dot,
              sqrt(SUM(e.v*e.v)) AS n1
            FROM e JOIN p USING (dd) WHERE e.vec_id != 0
            GROUP BY e.vec_id),
          pn AS (SELECT sqrt(SUM(v*v)) AS n0 FROM p),
          fullr AS (SELECT CAST(row_number() OVER (ORDER BY
                ROUND(dot/(n1*(SELECT n0 FROM pn)),6) DESC, vec_id)
                AS BIGINT) AS rank,
              vec_id AS full_id,
              ROUND(dot/(n1*(SELECT n0 FROM pn)),6) AS full_sim
            FROM dots),
          dots16 AS (SELECT e.vec_id, SUM(e.v*p.v) AS dot,
              sqrt(SUM(e.v*e.v)) AS n1
            FROM e JOIN p USING (dd)
            WHERE e.vec_id != 0 AND e.dd <= 16 AND p.dd <= 16
            GROUP BY e.vec_id),
          pn16 AS (SELECT sqrt(SUM(v*v)) AS n0 FROM p WHERE dd <= 16),
          truncr AS (SELECT CAST(row_number() OVER (ORDER BY
                ROUND(dot/(n1*(SELECT n0 FROM pn16)),6) DESC, vec_id)
                AS BIGINT) AS rank,
              vec_id AS trunc_id,
              ROUND(dot/(n1*(SELECT n0 FROM pn16)),6) AS trunc_sim
            FROM dots16)
        SELECT f.rank, f.full_id, f.full_sim, t.trunc_id, t.trunc_sim
        FROM fullr f JOIN truncr t USING (rank)
        WHERE f.rank <= 10 ORDER BY f.rank"""))
  )
}
