package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Round-6 additions — the two missing planning/cleaning steps of a
  * training-data pipeline:
  *
  *   - `j37_paragraph_dedup` — paragraph-granularity exact dedup (the
  *     CCNet/Dolma cleaning step between doc-level j1 and fuzzy j2):
  *     repeated spans are removed EVERYWHERE but their canonical first
  *     occurrence, and documents are reassembled from the surviving
  *     spans. Paragraphs here are fixed 16-token blocks (the fixture's
  *     word-soup has no sentence boundaries; the operator shape —
  *     explode → hash → first-occurrence-wins → ordered reassembly — is
  *     identical for any splitter).
  *   - `j38_token_budget` — temperature-weighted token allocation under
  *     an epoch cap: given per-source token counts, a total training
  *     budget and max 4 epochs/source, compute each source's token
  *     allocation and epoch count (the "data budget" table a pretraining
  *     run is planned from; pairs with j30's mixture sampling, which
  *     consumes exactly these rates).
  */
object Round6 {

  /** The j39 kNN graph (vec_id, rank, nbr_id, cos) — also the edge source
    * for j46's centrality pass. Candidates are (i, j) ID pairs only — the
    * embedding vectors do not ride the bucket self-join shuffle (at 100 TB
    * that's 2× vector bytes through the exchange per candidate); they
    * re-attach by vec_id once per side AFTER the bucket join (j2b's
    * device). */
  private[graft] def knnGraph(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val bits = LlmOps.lshBuckets(s, d, Knobs.lshPlanes(s))
    val a = bits.select(col("bucket"), col("vec_id").as("i"))
    val b = bits.select(col("bucket"), col("vec_id").as("j"))
    val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val cand = a.join(b, Seq("bucket")).where(col("i") =!= col("j"))
      .select(col("i"), col("j"))
      .join(emb.toDF("i", "ea"), "i")
      .join(emb.toDF("j", "eb"), "j")
      .select(col("i"), col("j"),
        round(graft.expressions.CosineSimilarity(s, col("ea"), col("eb")), 6)
          .as("cos"))
    val w = Window.partitionBy("i").orderBy(desc("cos"), asc("j"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("i").as("vec_id"), col("rank").cast("long").as("rank"),
        col("j").as("nbr_id"), col("cos"))
  }

  /** Oracle CTE chain reproducing knnGraph in DuckDB — `r` is the ranked
    * candidate relation; `SELECT ... FROM r WHERE rank <= 3` is the graph.
    * Shared with j46's oracle (which unrolls PageRank on top). */
  private[graft] val KnnCtes: String =
    """e AS (SELECT vec_id, generate_subscripts(embedding,1) - 1 AS dim,
            CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        w AS (SELECT p.p, dm.dim,
            (CAST('0x' || substr(md5(p.p || ':' || dm.dim),1,15) AS BIGINT) % 2001 - 1000) / 1000.0 AS w
          FROM (SELECT DISTINCT dim FROM e) dm, unnest(range(0, 6)) p(p)),
        bits AS (SELECT e.vec_id, w.p,
            CASE WHEN SUM(w.w * e.v) > 0 THEN '1' ELSE '0' END AS bit
          FROM e JOIN w ON e.dim = w.dim GROUP BY e.vec_id, w.p),
        bk AS (SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket
          FROM bits GROUP BY vec_id),
        nm AS (SELECT vec_id, sqrt(SUM(v*v)) AS nm FROM e GROUP BY vec_id),
        cand AS (SELECT a.vec_id AS i, b.vec_id AS j
          FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
        dots AS (SELECT c.i, c.j, SUM(ea.v * eb.v) AS dot
          FROM cand c JOIN e ea ON ea.vec_id = c.i
            JOIN e eb ON eb.vec_id = c.j AND ea.dim = eb.dim
          GROUP BY c.i, c.j),
        scored AS (SELECT i, j, ROUND(dot / (n1.nm * n2.nm), 6) AS cos
          FROM dots JOIN nm n1 ON i = n1.vec_id JOIN nm n2 ON j = n2.vec_id),
        r AS (SELECT i, j, cos,
            row_number() OVER (PARTITION BY i ORDER BY cos DESC, j) AS rank
          FROM scored)"""

  val all: Seq[Q] = Seq(

    // Paragraph-level exact dedup. Every 16-token block is keyed by
    // md5 (the cross-engine-hashable digest; at 100 TB this would be
    // xxhash64 — j2's device — but the digest never leaves the shuffle
    // either way). Canonical occurrence = lexicographic min (doc_id,
    // blk) via a row_number window over the digest — dup groups are tiny
    // (the duplication factor), so the window state is bounded no matter
    // the corpus size; every shuffle is hash-partitioned on digest or
    // doc_id. Docs whose every block was claimed elsewhere survive as
    // empty rows (the left join) — the downstream quality gate drops
    // them, not the dedup.
    Q("j37_paragraph_dedup",
      (s, d) => {
        val B = 16
        val blocks = t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), posexplode(expr(
            // block text by O(1) element indexing, not slice — Catalyst's
            // Slice re-materializes the whole array per block, turning
            // chunking into O(len²/B) per doc (the Ngrams.gramAt class,
            // r20 pathological sweep); the inner index transform is O(B)
            s"transform(${Ngrams.seqAsc("0", s"cast((size(toks)+$B-1) div $B as int) - 1")}, " +
              s"i -> concat_ws(' ', transform(sequence(i*$B+1, least((i+1)*$B, size(toks))), " +
              s"j -> toks[j - 1])))")))
          .select(col("doc_id"), col("pos").cast("long").as("blk"),
            col("col").as("btxt"))
        // ONE pass after the digest window: collect_list skips the nulls
        // the `when` leaves for non-canonical blocks, so n_blocks and the
        // kept set come out of the same doc_id aggregation — two hash
        // exchanges total (digest, doc_id), no second scan, no left join
        val w = Window.partitionBy(md5(col("btxt"))).orderBy("doc_id", "blk")
        blocks.withColumn("rn", row_number().over(w))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_blocks"),
            sort_array(collect_list(when(col("rn") === 1,
              struct(col("blk"), col("btxt"))))).as("arr"))
          .select(col("doc_id"), col("n_blocks"),
            size(col("arr")).cast("long").as("n_kept"),
            array_join(expr("transform(arr, x -> x.btxt)"), " ").as("clean_text"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, string_split(text,' ') AS toks,
            CAST(len(string_split(text,' ')) AS BIGINT) AS n FROM documents),
        b AS (SELECT doc_id, i.i AS blk,
            array_to_string(toks[(i.i*16+1):least(n, i.i*16+16)], ' ') AS btxt
          FROM tk, unnest(range(0, (n+15)//16)) i(i)),
        k AS (SELECT doc_id, blk, btxt,
            row_number() OVER (PARTITION BY md5(btxt) ORDER BY doc_id, blk) AS rn
          FROM b),
        agg AS (SELECT doc_id, COUNT(*) AS n_kept,
            string_agg(btxt, ' ' ORDER BY blk) AS clean_text
          FROM k WHERE rn = 1 GROUP BY doc_id),
        tot AS (SELECT doc_id, COUNT(*) AS n_blocks FROM b GROUP BY doc_id)
        SELECT t.doc_id, t.n_blocks,
          COALESCE(a.n_kept, 0) AS n_kept,
          COALESCE(a.clean_text, '') AS clean_text
        FROM tot t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""")),

    // Token-budget allocation: w_s = n_s^0.5 (temperature α=0.5, j30's
    // device), raw share = B·w/Σw, capped at 4 epochs, the leftover
    // redistributed once among uncapped sources ∝ w (real allocators
    // iterate to a fixpoint; one pass is the graded arithmetic — the
    // iteration is a driver loop over a #sources-sized relation).
    // Exactness discipline: every SUM runs over DECIMAL (order-free);
    // ratios and products run in DOUBLE on values cast from those exact
    // decimals, then ROUND(…, 6) — identical IEEE ops in both engines
    // (the j17/j32 device). The per-source relation is bounded by source
    // cardinality, so the 1-row totals cross-join broadcasts at any
    // corpus size; only the token count scans the corpus.
    Q("j38_token_budget",
      (s, d) => {
        val budgetTok = 30000L // > total tokens → epoch caps genuinely bind
        val perSrc = t(s, d, "documents")
          .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
          .groupBy("source").agg(sum(col("n")).as("n_tok"))
          .select(col("source"), col("n_tok"),
            sqrt(col("n_tok").cast("double")).cast("decimal(28,12)").as("w"))
        val totw = perSrc.agg(sum(col("w")).as("sumw"))
        val raw = perSrc.crossJoin(broadcast(totw))
          .select(col("source"), col("n_tok"), col("w"),
            round(col("w").cast("double") / col("sumw").cast("double")
              * budgetTok, 6).cast("decimal(18,6)").as("raw_tok"))
          .withColumn("cap_tok", (col("n_tok") * 4).cast("decimal(18,6)"))
          .withColumn("capped_tok", least(col("raw_tok"), col("cap_tok")))
          .withColumn("is_capped", col("raw_tok") >= col("cap_tok"))
        val leftover = raw.agg(
          greatest(lit(0L).cast("decimal(18,6)"),
            (lit(budgetTok).cast("decimal(18,6)") - sum(col("capped_tok"))))
            .as("leftover"),
          sum(when(!col("is_capped"), col("w"))
            .otherwise(lit(0).cast("decimal(28,12)"))).as("sumw_unc"))
        raw.crossJoin(broadcast(leftover))
          .select(col("source"), col("n_tok"),
            round(col("w").cast("double"), 6).as("weight"),
            // the epoch cap must survive redistribution: the one-pass
            // leftover share can push an uncapped source past 4 epochs
            // (leftover > its headroom), so the sum re-clamps to cap_tok —
            // residual budget then goes unallocated, which is the correct
            // answer when every source saturates
            least(col("cap_tok"),
              col("capped_tok") + when(!col("is_capped"),
                round(col("w").cast("double") / col("sumw_unc").cast("double")
                  * col("leftover").cast("double"), 6).cast("decimal(18,6)"))
                .otherwise(lit(0).cast("decimal(18,6)"))).as("alloc_dec"))
          // output as DOUBLE: the decimals above exist for order-free SUMs;
          // surfacing them would pin an engine-specific result scale
          .select(col("source"), col("n_tok"), col("weight"),
            col("alloc_dec").cast("double").as("alloc_tok"),
            round(col("alloc_dec").cast("double") / col("n_tok"), 4).as("epochs"))
          .orderBy("source")
      },
      Some("""WITH src AS (SELECT source,
            CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tok
          FROM documents GROUP BY source),
        w AS (SELECT source, n_tok,
            CAST(sqrt(CAST(n_tok AS DOUBLE)) AS DECIMAL(28,12)) AS w FROM src),
        raw AS (SELECT source, n_tok, w,
            CAST(ROUND(CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE)
              * 30000, 6) AS DECIMAL(18,6)) AS raw_tok,
            CAST(n_tok * 4 AS DECIMAL(18,6)) AS cap_tok
          FROM w),
        capd AS (SELECT *, LEAST(raw_tok, cap_tok) AS capped_tok,
            raw_tok >= cap_tok AS is_capped FROM raw),
        lo AS (SELECT *,
            GREATEST(CAST(0 AS DECIMAL(18,6)),
              CAST(30000 AS DECIMAL(18,6)) - SUM(capped_tok) OVER ()) AS leftover,
            SUM(CASE WHEN NOT is_capped THEN w
              ELSE CAST(0 AS DECIMAL(28,12)) END) OVER () AS sumw_unc
          FROM capd),
        fin AS (SELECT source, n_tok, w,
            LEAST(cap_tok,
              capped_tok + CASE WHEN NOT is_capped THEN
                CAST(ROUND(CAST(w AS DOUBLE) / CAST(sumw_unc AS DOUBLE)
                  * CAST(leftover AS DOUBLE), 6) AS DECIMAL(18,6))
                ELSE CAST(0 AS DECIMAL(18,6)) END) AS alloc_dec
          FROM lo)
        SELECT source, n_tok, ROUND(CAST(w AS DOUBLE), 6) AS weight,
          CAST(alloc_dec AS DOUBLE) AS alloc_tok,
          ROUND(CAST(alloc_dec AS DOUBLE) / n_tok, 4) AS epochs
        FROM fin ORDER BY source""")),

    // kNN-graph construction — the missing similarity-search shape next
    // to single-probe top-k (j3) and pairwise near-dup (j12): EVERY
    // vector gets its top-3 neighbors, the input SemDeDup-style semantic
    // clustering actually consumes. All-pairs is avoided the LSH way:
    // candidates are the within-bucket pairs of j3b's 6-hyperplane
    // signature (md5-derived weights — the bucketing itself is
    // oracle-checked), cosine runs per candidate through the native
    // codegen expression, and top-3 is a per-vector window over
    // bucket-local candidates. At 100 TB the bucket is the shuffle key
    // (bucket sizes concentrate around corpus/2^planes; planes scale
    // with log of corpus size), and the window state is 3 rows per
    // vector. Singleton-bucket vectors emit no edges — the standard LSH
    // recall trade, handled by multi-probe/multi-table variants upstream.
    Q("j39_knn_graph",
      (s, d) => knnGraph(s, d).orderBy("vec_id", "rank"),
      Some(s"""WITH $KnnCtes
        SELECT i AS vec_id, CAST(rank AS BIGINT) AS rank, j AS nbr_id, cos
        FROM r WHERE rank <= 3 ORDER BY vec_id, rank""")),

    // Multi-probe variant of the kNN graph: each vector probes its own
    // bucket PLUS the 6 one-bit-flip neighbors, so near-misses across a
    // single hyperplane (including singleton-bucket vectors) regain
    // candidates — recall rises while candidate generation stays a pure
    // equi-join on the probe key (probe fan-out is planes+1, a constant;
    // a pair within hamming ≤ 1 matches on EXACTLY one probe key, so no
    // dedup pass is needed). This is the standard multi-probe LSH trade:
    // (planes+1)× probe rows for ~2× bucket coverage, still shuffle-
    // parallel at any corpus size.
    Q("j39b_knn_multiprobe",
      (s, d) => {
        // probe rows are (i, pk) ONLY — the r6 shape carried the probe
        // vector through the (planes+1)× explode and the probe-key join
        // shuffle; vectors re-attach to the surviving (i, j) candidates
        val planes = Knobs.lshPlanes(s)
        val bits = LlmOps.lshBuckets(s, d, planes)
        val probes = bits.select(col("vec_id").as("i"),
            explode(expr(s"""transform(sequence(0, $planes), p ->
              CASE WHEN p = 0 THEN bucket
              ELSE concat(substring(bucket, 1, p-1),
                CASE WHEN substring(bucket, p, 1) = '1' THEN '0' ELSE '1' END,
                substring(bucket, p+1, $planes - p)) END)""")).as("pk"))
        val target = bits.select(col("bucket").as("pk"), col("vec_id").as("j"))
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val cand = probes.join(target, Seq("pk")).where(col("i") =!= col("j"))
          .select(col("i"), col("j"))
          .join(emb.toDF("i", "ea"), "i")
          .join(emb.toDF("j", "eb"), "j")
          .select(col("i"), col("j"),
            round(graft.expressions.CosineSimilarity(s, col("ea"), col("eb")), 6)
              .as("cos"))
        val w = Window.partitionBy("i").orderBy(desc("cos"), asc("j"))
        cand.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
          .select(col("i").as("vec_id"), col("rank").cast("long").as("rank"),
            col("j").as("nbr_id"), col("cos"))
          .orderBy("vec_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding,1) - 1 AS dim,
            CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        w AS (SELECT p.p, dm.dim,
            (CAST('0x' || substr(md5(p.p || ':' || dm.dim),1,15) AS BIGINT) % 2001 - 1000) / 1000.0 AS w
          FROM (SELECT DISTINCT dim FROM e) dm, unnest(range(0, 6)) p(p)),
        bits AS (SELECT e.vec_id, w.p,
            CASE WHEN SUM(w.w * e.v) > 0 THEN '1' ELSE '0' END AS bit
          FROM e JOIN w ON e.dim = w.dim GROUP BY e.vec_id, w.p),
        bk AS (SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket
          FROM bits GROUP BY vec_id),
        pr AS (SELECT vec_id AS i,
            CASE WHEN f.f = 0 THEN bucket
            ELSE substr(bucket, 1, f.f - 1) ||
              (CASE WHEN substr(bucket, f.f, 1) = '1' THEN '0' ELSE '1' END) ||
              substr(bucket, f.f + 1) END AS pk
          FROM bk, unnest(range(0, 7)) f(f)),
        cand AS (SELECT pr.i, t.vec_id AS j
          FROM pr JOIN bk t ON pr.pk = t.bucket AND pr.i != t.vec_id),
        nm AS (SELECT vec_id, sqrt(SUM(v*v)) AS nm FROM e GROUP BY vec_id),
        dots AS (SELECT c.i, c.j, SUM(ea.v * eb.v) AS dot
          FROM cand c JOIN e ea ON ea.vec_id = c.i
            JOIN e eb ON eb.vec_id = c.j AND ea.dim = eb.dim
          GROUP BY c.i, c.j),
        scored AS (SELECT i, j, ROUND(dot / (n1.nm * n2.nm), 6) AS cos
          FROM dots JOIN nm n1 ON i = n1.vec_id JOIN nm n2 ON j = n2.vec_id),
        r AS (SELECT i, j, cos,
            row_number() OVER (PARTITION BY i ORDER BY cos DESC, j) AS rank
          FROM scored)
        SELECT i AS vec_id, CAST(rank AS BIGINT) AS rank, j AS nbr_id, cos
        FROM r WHERE rank <= 3 ORDER BY vec_id, rank""")),

    // OR-of-tables variant of the kNN graph — the OTHER standard LSH
    // recall amplifier next to multi-probe (j39b): two INDEPENDENT
    // 6-hyperplane tables (plane indices 0-5 and 6-11 of the same
    // md5-derived weight family, so both bucketings stay oracle-checked),
    // candidates = union of the two tables' within-bucket pairs. A pair
    // missed by one table's split survives if EITHER table co-buckets it
    // (miss probability squares: (1−p)² vs (1−p)), at 2× candidate cost —
    // both tables are pure equi-joins, shuffle-parallel at any corpus
    // size; the distinct collapses pairs both tables found before the
    // (expensive) cosine re-attach.
    Q("j39c_knn_twotable",
      (s, d) => {
        val planes = Knobs.lshPlanes(s)
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        def cands(bits: org.apache.spark.sql.DataFrame) =
          bits.select(col("bucket"), col("vec_id").as("i"))
            .join(bits.select(col("bucket"), col("vec_id").as("j")),
              Seq("bucket"))
            .where(col("i") =!= col("j")).select("i", "j")
        val cand = cands(LlmOps.lshBuckets(s, d, planes))
          .union(cands(LlmOps.lshBuckets(s, d, planes, planes)))
          .distinct()
        val scored = cand
          .join(emb.toDF("i", "ea"), "i")
          .join(emb.toDF("j", "eb"), "j")
          .select(col("i"), col("j"),
            round(graft.expressions.CosineSimilarity(s, col("ea"), col("eb")), 6)
              .as("cos"))
        val w = Window.partitionBy("i").orderBy(desc("cos"), asc("j"))
        scored.withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
          .select(col("i").as("vec_id"), col("rank").cast("long").as("rank"),
            col("j").as("nbr_id"), col("cos"))
          .orderBy("vec_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, generate_subscripts(embedding,1) - 1 AS dim,
            CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        w AS (SELECT p.p, dm.dim,
            (CAST('0x' || substr(md5(p.p || ':' || dm.dim),1,15) AS BIGINT) % 2001 - 1000) / 1000.0 AS w
          FROM (SELECT DISTINCT dim FROM e) dm, unnest(range(0, 12)) p(p)),
        bits AS (SELECT e.vec_id, w.p,
            CASE WHEN SUM(w.w * e.v) > 0 THEN '1' ELSE '0' END AS bit
          FROM e JOIN w ON e.dim = w.dim GROUP BY e.vec_id, w.p),
        bk AS (SELECT vec_id, p // 6 AS tbl, string_agg(bit, '' ORDER BY p) AS bucket
          FROM bits GROUP BY vec_id, p // 6),
        cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
          FROM bk a JOIN bk b
            ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id != b.vec_id),
        nm AS (SELECT vec_id, sqrt(SUM(v*v)) AS nm FROM e GROUP BY vec_id),
        dots AS (SELECT c.i, c.j, SUM(ea.v * eb.v) AS dot
          FROM cand c JOIN e ea ON ea.vec_id = c.i
            JOIN e eb ON eb.vec_id = c.j AND ea.dim = eb.dim
          GROUP BY c.i, c.j),
        scored AS (SELECT i, j, ROUND(dot / (n1.nm * n2.nm), 6) AS cos
          FROM dots JOIN nm n1 ON i = n1.vec_id JOIN nm n2 ON j = n2.vec_id),
        r AS (SELECT i, j, cos,
            row_number() OVER (PARTITION BY i ORDER BY cos DESC, j) AS rank
          FROM scored)
        SELECT i AS vec_id, CAST(rank AS BIGINT) AS rank, j AS nbr_id, cos
        FROM r WHERE rank <= 3 ORDER BY vec_id, rank""")),

    // Hybrid retrieval — the RAG-serving read path over the same corpus
    // the pipeline curates: a query is a term set PLUS a probe embedding,
    // and each document scores 0.5·lexical-overlap + 0.5·cosine, top-10.
    // The lexical half is an exact rational (|q∩terms|/|q|); the vector
    // half is the native codegen cosine against a 1-row broadcast probe
    // (j3's pattern — PlanLint-allowlisted NLJ, bounded by construction).
    // At 100 TB the doc⋈embedding join shuffles on doc_id (or is
    // co-bucketed), the probe broadcasts, and top-10 is
    // TakeOrderedAndProject — no global sort.
    Q("j41_hybrid_retrieval",
      (s, d) => {
        val qTerms = Seq("table", "scan", "join", "filter",
          "window", "agg", "sort", "hash")
        val qArr = s"array(${qTerms.map(t => s"'$t'").mkString(",")})"
        val probe = t(s, d, "embeddings").where(col("vec_id") === 0)
          .select(col("embedding").as("e0"))
        val emb = t(s, d, "embeddings")
          .select(col("vec_id").as("doc_id"), col("embedding"))
        t(s, d, "documents").select(col("doc_id"), col("text"))
          .join(emb, "doc_id").where(col("doc_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(col("doc_id"),
            round(size(array_intersect(
                array_distinct(split(col("text"), " ")), expr(qArr)))
              .cast("double") / qTerms.size, 6).as("lex_score"),
            round(graft.expressions.CosineSimilarity(s, col("embedding"), col("e0")), 6)
              .as("vec_score"))
          .withColumn("score",
            round(col("lex_score") * 0.5 + col("vec_score") * 0.5, 6))
          .orderBy(desc("score"), asc("doc_id")).limit(10)
      },
      Some("""WITH qt AS (SELECT ['table','scan','join','filter','window','agg','sort','hash'] AS q),
        lex AS (SELECT doc_id,
            ROUND(len(list_intersect(list_distinct(string_split(text, ' ')), q)) / 8.0, 6) AS lex_score
          FROM documents, qt WHERE doc_id != 0),
        e AS (SELECT vec_id, generate_subscripts(embedding,1) AS dim,
            CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        p0 AS (SELECT dim, v FROM e WHERE vec_id = 0),
        n0 AS (SELECT sqrt(SUM(v*v)) AS n0 FROM p0),
        vs AS (SELECT e.vec_id AS doc_id,
            ROUND(SUM(e.v * p0.v) / (sqrt(SUM(e.v * e.v)) * (SELECT n0 FROM n0)), 6) AS vec_score
          FROM e JOIN p0 USING (dim) WHERE e.vec_id != 0 GROUP BY e.vec_id)
        SELECT doc_id, lex_score, vec_score,
          ROUND(lex_score * 0.5 + vec_score * 0.5, 6) AS score
        FROM lex JOIN vs USING (doc_id)
        ORDER BY score DESC, doc_id LIMIT 10""")),

    // Semantic clustering end-to-end — the composition the pieces exist
    // for: LSH-bucketed candidate pairs (j39's device) thresholded at
    // cos ≥ 0.4 become an edge list, connected components (j14's hybrid
    // CC — driver union-find under the threshold, distributed min-label
    // propagation above) label every vector with its component minimum,
    // and singleton vectors keep their own id. The oracle computes the
    // same components via a DuckDB RECURSIVE CTE (reachability closure +
    // MIN over reachable labels — UNION dedup guarantees termination),
    // so even the transitive-closure step is hash-checked. At 100 TB:
    // edges are orders of magnitude smaller than the corpus (LSH bucket
    // + threshold pruning), which is exactly the regime CC.cluster's
    // hybrid was built for.
    Q("j40_semantic_clusters",
      (s, d) => {
        val tau = 0.4
        // id-only bucket self-join; vectors re-attach to candidates only
        val bits = LlmOps.lshBuckets(s, d, Knobs.lshPlanes(s))
        val a = bits.select(col("bucket"), col("vec_id").as("d1"))
        val b = bits.select(col("bucket"), col("vec_id").as("d2"))
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val edges = a.join(b, Seq("bucket")).where(col("d1") < col("d2"))
          .select(col("d1"), col("d2"))
          .join(emb.toDF("d1", "ea"), "d1")
          .join(emb.toDF("d2", "eb"), "d2")
          .select(col("d1"), col("d2"),
            round(graft.expressions.CosineSimilarity(s, col("ea"), col("eb")), 6)
              .as("cos"))
          .where(col("cos") >= tau)
          .select(col("d1"), col("d2"))
        val labeled = CC.cluster(s, edges)
        val everyVec = t(s, d, "embeddings").select(col("vec_id"))
        everyVec.join(labeled.withColumnRenamed("doc_id", "vec_id"),
            Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("cluster"), col("vec_id")).as("cluster"))
          .orderBy("vec_id")
      },
      Some("""WITH RECURSIVE e AS (SELECT vec_id, generate_subscripts(embedding,1) - 1 AS dim,
            CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        w AS (SELECT p.p, dm.dim,
            (CAST('0x' || substr(md5(p.p || ':' || dm.dim),1,15) AS BIGINT) % 2001 - 1000) / 1000.0 AS w
          FROM (SELECT DISTINCT dim FROM e) dm, unnest(range(0, 6)) p(p)),
        bits AS (SELECT e.vec_id, w.p,
            CASE WHEN SUM(w.w * e.v) > 0 THEN '1' ELSE '0' END AS bit
          FROM e JOIN w ON e.dim = w.dim GROUP BY e.vec_id, w.p),
        bk AS (SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket
          FROM bits GROUP BY vec_id),
        nm AS (SELECT vec_id, sqrt(SUM(v*v)) AS nm FROM e GROUP BY vec_id),
        cand AS (SELECT a.vec_id AS d1, b.vec_id AS d2
          FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        dots AS (SELECT c.d1, c.d2, SUM(ea.v * eb.v) AS dot
          FROM cand c JOIN e ea ON ea.vec_id = c.d1
            JOIN e eb ON eb.vec_id = c.d2 AND ea.dim = eb.dim
          GROUP BY c.d1, c.d2),
        ed AS (SELECT d1, d2 FROM dots
          JOIN nm n1 ON d1 = n1.vec_id JOIN nm n2 ON d2 = n2.vec_id
          WHERE ROUND(dot / (n1.nm * n2.nm), 6) >= 0.4),
        und AS (SELECT d1 AS src, d2 AS dst FROM ed
          UNION ALL SELECT d2, d1 FROM ed),
        reach AS (SELECT vec_id AS v, vec_id AS l FROM embeddings
          UNION
          SELECT u.dst, reach.l FROM reach JOIN und u ON u.src = reach.v)
        SELECT v AS vec_id, MIN(l) AS cluster
        FROM reach GROUP BY v ORDER BY vec_id""")))
}
