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

    // k26 — RECURSIVE CTE (Spark 4 WITH RECURSIVE): linear recursion
    // with a base-table join in the recursive term — the hierarchy walk
    // (management chains, BOM explosion, graph reachability) that
    // previously needed a driver-side loop of self-joins (the j14/j76
    // CC device) now runs engine-side. The recursion here is a binary
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
        val z = sq.agg(sum("sq").as("z"))
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
          z AS (SELECT SUM(sq) AS z FROM sq)
        SELECT source, n_tokens,
          ROUND(sq / z, 6) AS weight,
          ROUND((sq / z) * 1000000.0 / n_tokens, 6) AS epochs
        FROM sq, z ORDER BY source""")),

    // j83 — matryoshka truncation fidelity: rank the probe's neighbors
    // by full 64-dim cosine AND by the first-16-dims cosine (the MRL
    // deployment trick — truncate stored vectors 4× and re-rank only a
    // shortlist at full precision), emitting both top-10 lists aligned
    // by rank so the divergence is visible row-by-row. This is the
    // audit that DECIDES whether the 4× storage/bandwidth cut is safe
    // for a given corpus — the eval leg of the j3/j53 tier, as j74 is
    // to the dedup thresholds. Shape: one embeddings scan feeds both
    // rankings, each a TakeOrderedAndProject (never a global sort);
    // the rank join is 10×10. The probe rows are j3's 1-row broadcast
    // carriers (PlanLint-allowlisted). Ordering key is the ROUNDED
    // cosine with vec_id tie-break — the j3 cross-engine device.
    Q("j83_matryoshka_eval",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings")
        def topk(dimExpr: String => String, outId: String, outSim: String) = {
          val probe = emb.where(col("vec_id") === 0)
            .select(expr(dimExpr("embedding")).as("e0"))
          val scored = emb.crossJoin(broadcast(probe))
            .where(col("vec_id") =!= 0)
            .select(col("vec_id"), round(expr(
              s"""aggregate(zip_with(${dimExpr("embedding")}, e0,
                   (x,y) -> cast(x as double)*cast(y as double)),
                 cast(0.0 as double), (a,b) -> a+b)
               / (sqrt(aggregate(transform(${dimExpr("embedding")},
                     x -> cast(x as double)*cast(x as double)),
                   cast(0.0 as double), (a,b) -> a+b))
                * sqrt(aggregate(transform(e0,
                     x -> cast(x as double)*cast(x as double)),
                   cast(0.0 as double), (a,b) -> a+b)))"""), 6).as("cos"))
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
