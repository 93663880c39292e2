package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Round-18 batch 3 — retrieval-quality eval, graph structure, and
  * corpus-audit operators (EXT per SURVEY §1: the reference ships the
  * QUERY channel — `pandas_td/td.py :: read_td_query`, §0-caveated
  * anchor — and these are the queries a training-data pipeline runs
  * through it).
  *
  * The eval trio (j105/j106/j107) closes the retrieval-metrics gap next
  * to j104's ROC-AUC: a pipeline that ships an ANN index (j3b/j3d/j53/
  * j54) needs graded-artifact evidence of WHAT the index returns —
  * nDCG@k and MRR against a labeled probe set, and recall@k of the LSH
  * path against the exact scan. All three share one shape: a BOUNDED
  * probe set (20 labeled query vectors) broadcasts, the corpus streams
  * through ONE scan, and everything after the per-probe top-k cut is
  * bounded-relation arithmetic (20×10 rows). That is j90's adjudicated
  * brute-force shape; at 100 TB the scoring leg routes through j90b's
  * IVF pruning unchanged — the metric layers here only consume the
  * ranked lists.
  *
  * j108 adds the first whole-graph structure audit over the j39 kNN
  * graph (j46 ranks nodes; nothing measured the graph itself): triangle
  * count + global clustering coefficient, the standard cluster-quality
  * proxy for neighborhood graphs (Watts–Strogatz 1998). Edges are
  * oriented u<v once, so each triangle is counted exactly once by two
  * equi-joins — the merge-path triangle enumeration that partitions by
  * join key at any scale (degree-ordered orientation is the production
  * refinement for hub-heavy graphs; id-order suffices for a k-bounded
  * out-degree graph).
  */
object Round18c {

  /** Exact per-probe top-k over the labeled probe set: (qid, qlabel,
    * rnk, vec_id, nlabel, cos). The 20-row probe side broadcasts; the
    * corpus side is one scan through the codegen'd cosine (j3c's
    * expression). The rank window partitions by qid — fine for a
    * bounded audit probe set (20 reducers × corpus/20 rows); a larger
    * probe sweep keeps the same columns but routes candidates through
    * j90b's IVF cells first. */
  private def probeTop(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val emb = t(s, d, "embeddings")
    val probes = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").as("qe"))
    val scored = emb.crossJoin(broadcast(probes))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id"),
        col("label").as("nlabel"),
        round(graft.expressions.CosineSimilarity(s,
          col("embedding"), col("qe")), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Oracle CTE chain mirroring [[probeTop]]: `top` is (qid, qlabel,
    * rnk, vec_id, nlabel, cos) for the 20 probes × top-10. Same 6-dp
    * cosine rounding and (cos DESC, vec_id) tiebreak as the Spark
    * window, so the ranked lists hash-match. Written as a SUFFIX of
    * [[Round6.KnnCtes]] (consumes its `e`/`nm` relations) so the exact
    * cosine top-k has ONE oracle definition across the eval trio —
    * j107 composes both chains and a tiebreak/rounding fix cannot
    * drift between "exact" legs (r18-s3 review). Unreferenced KnnCtes
    * members (the LSH chain) are never evaluated by DuckDB in
    * j105/j106. Zero-norm cosine is COALESCE(dot/NULLIF(nm,0),0) = 0 —
    * the one convention every cosine oracle shares with the Spark legs'
    * CosineSimilarity (r19 ADVICE: a zero vector in the corpus must not
    * make only the eval-trio oracles diverge). */
  private val EvalCtes: String =
    """q AS (SELECT vec_id AS qid, label AS qlabel FROM embeddings
          WHERE vec_id < 20),
        qd AS (SELECT qq.qid, e2.vec_id, SUM(e2.v * ep.v) AS dot
          FROM q qq JOIN e ep ON ep.vec_id = qq.qid
          JOIN e e2 ON e2.dim = ep.dim AND e2.vec_id != qq.qid
          GROUP BY qq.qid, e2.vec_id),
        qs AS (SELECT qd.qid, qd.vec_id,
            ROUND(COALESCE(qd.dot/NULLIF(n1.nm*n2.nm,0),0),6) AS cos
          FROM qd JOIN nm n1 ON qd.vec_id = n1.vec_id
            JOIN nm n2 ON qd.qid = n2.vec_id),
        qr AS (SELECT qid, vec_id, cos, row_number() OVER
            (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk FROM qs),
        top AS (SELECT qr.qid, q.qlabel, qr.rnk, qr.vec_id,
            em.label AS nlabel, qr.cos
          FROM qr JOIN q USING (qid) JOIN embeddings em
            ON em.vec_id = qr.vec_id
          WHERE qr.rnk <= 10)"""

  def all: Seq[Q] = Seq(

    // nDCG@10 of exact cosine retrieval against the label channel
    // (binary relevance: neighbor shares the probe's label). The log2
    // rank discount is rounded to 6 dp PER TERM and summed as
    // DECIMAL(18,12) on both engines — the sum is exact decimal
    // arithmetic, so engine libm variance in log2 would have to cross a
    // 6-dp rounding boundary to surface (the 10 discount values sit
    // ≥3e-8 from their nearest boundary; Round18cSpec pins all ten
    // against the DuckDB-computed literals). IDCG truncates the ideal
    // list at min(k, R) where R = corpus count of same-label vectors —
    // per-probe R comes from ONE equi-join on label, never a rank pass.
    Q("j105_ndcg",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val disc = s.range(1, 11).select(col("id").as("rnk"),
          round(lit(1.0) / log2(col("id") + 1), 6)
            .cast(DecimalType(18, 12)).as("dc"))
        val zero = lit(0).cast(DecimalType(18, 12))
        val dcg = probeTop(s, d).join(broadcast(disc), "rnk")
          .groupBy("qid")
          .agg(sum(when(col("nlabel") === col("qlabel"), col("dc"))
            .otherwise(zero)).as("dcgd"))
        val q = emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"))
        val nrel = emb.select(col("label"), col("vec_id"))
          .join(broadcast(q), col("label") === col("qlabel") &&
            col("vec_id") =!= col("qid"))
          .groupBy("qid").agg(count(lit(1)).as("n_rel"))
        val idcg = nrel.join(broadcast(disc),
            col("rnk") <= least(lit(10L), col("n_rel")))
          .groupBy("qid").agg(sum(col("dc")).as("idcgd"))
        // LEFT joins: a probe whose label no other vector carries has
        // no nrel/idcg row — it must still report (n_rel=0, ndcg=0)
        // so the eval trio always emits the same 20-probe set
        // (r18-s3 review; j106/j107 already had this property)
        q.join(nrel, Seq("qid"), "left").join(dcg, Seq("qid"), "left")
          .join(idcg, Seq("qid"), "left")
          .select(col("qid"), coalesce(col("n_rel"), lit(0L)).as("n_rel"),
            coalesce(col("dcgd").cast("double"), lit(0.0)).as("dcg"),
            coalesce(col("idcgd").cast("double"), lit(0.0)).as("idcg"),
            coalesce(round(col("dcgd").cast("double") /
              col("idcgd").cast("double"), 6), lit(0.0)).as("ndcg"))
          .orderBy("qid")
      },
      Some(s"""WITH ${Round6.KnnCtes}, $EvalCtes,
        disc AS (SELECT r AS rnk,
            CAST(ROUND(1.0/log2(r+1),6) AS DECIMAL(18,12)) AS dc
          FROM unnest(range(1,11)) t(r)),
        dcg AS (SELECT top.qid,
            SUM(CASE WHEN nlabel = qlabel THEN disc.dc
                ELSE CAST(0 AS DECIMAL(18,12)) END) AS dcgd
          FROM top JOIN disc ON top.rnk = disc.rnk GROUP BY top.qid),
        nrel AS (SELECT q.qid, COUNT(*) AS n_rel
          FROM q JOIN embeddings em
            ON em.label = q.qlabel AND em.vec_id != q.qid
          GROUP BY q.qid),
        idcg AS (SELECT nrel.qid, SUM(disc.dc) AS idcgd
          FROM nrel JOIN disc ON disc.rnk <= LEAST(10, nrel.n_rel)
          GROUP BY nrel.qid)
        SELECT q.qid, COALESCE(nrel.n_rel, 0) AS n_rel,
          COALESCE(CAST(dcg.dcgd AS DOUBLE), 0.0) AS dcg,
          COALESCE(CAST(idcg.idcgd AS DOUBLE), 0.0) AS idcg,
          COALESCE(ROUND(CAST(dcg.dcgd AS DOUBLE)
            /CAST(idcg.idcgd AS DOUBLE), 6), 0.0) AS ndcg
        FROM q LEFT JOIN nrel USING (qid) LEFT JOIN dcg USING (qid)
          LEFT JOIN idcg USING (qid)
        ORDER BY qid""")),

    // MRR@10 over the same ranked lists: reciprocal rank of the FIRST
    // same-label neighbor, 0 when none lands in the top-10. Pure
    // rational arithmetic (1/r of an integer rank) — no libm anywhere,
    // so the 6-dp round is decorative. The aggregation is a bounded
    // MIN-FILTER over the 200-row top-k relation.
    Q("j106_mrr",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"))
        val fr = probeTop(s, d).groupBy("qid")
          .agg(min(when(col("nlabel") === col("qlabel"), col("rnk")))
            .as("fr"))
        q.join(fr, Seq("qid"), "left")
          .select(col("qid"), col("qlabel"),
            coalesce(col("fr"), lit(0L)).as("first_rel_rank"),
            coalesce(round(lit(1.0) / col("fr"), 6), lit(0.0)).as("rr"))
          .orderBy("qid")
      },
      Some(s"""WITH ${Round6.KnnCtes}, $EvalCtes,
        fr AS (SELECT qid,
            MIN(CASE WHEN nlabel = qlabel THEN rnk END) AS fr
          FROM top GROUP BY qid)
        SELECT q.qid, q.qlabel, COALESCE(fr.fr, 0) AS first_rel_rank,
          COALESCE(ROUND(1.0/fr.fr, 6), 0.0) AS rr
        FROM q LEFT JOIN fr USING (qid) ORDER BY qid""")),

    // Recall@10 of the LSH-bucketed ANN path (j3b's device: 6
    // hyperplanes, in-bucket cosine rank) against the exact scan, per
    // probe. The graded twin of the j3b/j2b spec-level recall pins: the
    // ANN leg generates candidates by bucket EQUI-join (the 64× prune),
    // the exact leg is the probeTop scan, and the overlap count is a
    // 200-row join. n_ann < 10 happens when a probe's bucket is thin —
    // reported, not hidden (it is the multi-probe j39b motivation).
    Q("j107_recall_at_k",
      (s, d) => {
        val bk = LlmOps.lshBuckets(s, d, Knobs.lshPlanes(s))
        val emb = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val probes = bk.where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("bucket").as("pb"))
        val cand = bk.join(broadcast(probes),
            col("bucket") === col("pb") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"))
          .join(emb.toDF("qid", "qe"), "qid")
          .join(emb.toDF("vec_id", "ce"), "vec_id")
          .select(col("qid"), col("vec_id"),
            round(graft.expressions.CosineSimilarity(s,
              col("ce"), col("qe")), 6).as("cos"))
        val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
        val ann = cand.withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 10).select(col("qid"), col("vec_id"))
        val exact = probeTop(s, d).select(col("qid"), col("vec_id"))
        val exn = exact.groupBy("qid").agg(count(lit(1)).as("n_exact"))
        val ann_n = ann.groupBy("qid").agg(count(lit(1)).as("n_ann"))
        val hit = exact.join(ann, Seq("qid", "vec_id"))
          .groupBy("qid").agg(count(lit(1)).as("n_hit"))
        exn.join(ann_n, Seq("qid"), "left").join(hit, Seq("qid"), "left")
          .select(col("qid"), col("n_exact"),
            coalesce(col("n_ann"), lit(0L)).as("n_ann"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            round(coalesce(col("n_hit"), lit(0L)) /
              col("n_exact").cast("double"), 4).as("recall"))
          .orderBy("qid")
      },
      Some(s"""WITH ${Round6.KnnCtes}, $EvalCtes,
        ex AS (SELECT qid, vec_id FROM top),
        ann AS (SELECT i AS qid, j AS vec_id FROM r
          WHERE i < 20 AND rank <= 10),
        exn AS (SELECT qid, COUNT(*) AS n_exact FROM ex GROUP BY qid),
        ann_n AS (SELECT qid, COUNT(*) AS n_ann FROM ann GROUP BY qid),
        hit AS (SELECT ex.qid, COUNT(*) AS n_hit
          FROM ex JOIN ann ON ex.qid = ann.qid AND ex.vec_id = ann.vec_id
          GROUP BY ex.qid)
        SELECT exn.qid, exn.n_exact,
          COALESCE(ann_n.n_ann, 0) AS n_ann,
          COALESCE(hit.n_hit, 0) AS n_hit,
          ROUND(COALESCE(hit.n_hit, 0) / CAST(exn.n_exact AS DOUBLE), 4)
            AS recall
        FROM exn LEFT JOIN ann_n USING (qid) LEFT JOIN hit USING (qid)
        ORDER BY qid""")),

    // Triangle count + global clustering coefficient of the j39 kNN
    // graph. Orient every undirected edge u<v once; a triangle u<v<w is
    // then exactly one (u,v)⋈(v,w)⋈(u,w) equi-join chain — the
    // shuffle-parallel enumeration (each join partitions on its key;
    // no vector ever rides the edge shuffle). Wedges Σ d(d−1)/2 come
    // from one degree aggregation; clustering = 3T/wedges. The three
    // 1-row totals cross-join at the end (scalar carriers, j82's
    // allowance).
    Q("j108_graph_triangles",
      (s, d) => {
        // the oriented edge relation is consumed FOUR times (degree,
        // three triangle-join legs, edge count) — materialize it once
        // (eager localCheckpoint, j90b's device) instead of re-running
        // knnGraph's LSH candidate join per consumer (r18-s3: 1.60 s →
        // 1.15 s min at sf0.1, plan exchanges 16 → 5)
        val ed = Round6.knnGraph(s, d)
          .select(least(col("vec_id"), col("nbr_id")).as("u"),
            greatest(col("vec_id"), col("nbr_id")).as("v"))
          .distinct().localCheckpoint()
        val deg = ed.select(col("u").as("x"))
          .unionAll(ed.select(col("v").as("x")))
          .groupBy("x").agg(count(lit(1)).as("dg"))
        val tri = ed.toDF("u1", "v1")
          .join(ed.toDF("u2", "v2"), col("u2") === col("v1"))
          .join(ed.toDF("u3", "v3"),
            col("u3") === col("u1") && col("v3") === col("v2"))
          .agg(count(lit(1)).as("n_tri"))
        val wg = deg.agg(count(lit(1)).as("n_nodes"),
          sum(expr("dg * (dg - 1) div 2")).as("wedges"))
        val en = ed.agg(count(lit(1)).as("n_edges"))
        en.crossJoin(wg).crossJoin(tri)
          .select(col("n_nodes"), col("n_edges"),
            col("wedges").as("n_wedges"), col("n_tri"),
            // wedges=0 (every node degree <= 1 — isolated edges under
            // thin LSH buckets) implies n_tri=0; define clustering = 0.0
            // instead of an ANSI DIVIDE_BY_ZERO (r19 ADVICE). coalesce:
            // an EMPTY edge relation leaves sum(...) NULL, which must
            // take the same branch as the oracle's COALESCE(...,0)
            when(coalesce(col("wedges"), lit(0L)) === 0, lit(0.0))
              .otherwise(round(lit(3.0) * col("n_tri") / col("wedges"), 6))
              .as("clustering"))
      },
      Some(s"""WITH ${Round6.KnnCtes},
        ed AS (SELECT DISTINCT LEAST(i,j) AS u, GREATEST(i,j) AS v
          FROM r WHERE rank <= 3),
        deg AS (SELECT x, COUNT(*) AS dg FROM
          (SELECT u AS x FROM ed UNION ALL SELECT v AS x FROM ed)
          GROUP BY x),
        tri AS (SELECT COUNT(*) AS n_tri FROM ed e1
          JOIN ed e2 ON e2.u = e1.v
          JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v),
        wg AS (SELECT COUNT(*) AS n_nodes,
            CAST(SUM((dg * (dg - 1)) // 2) AS BIGINT) AS n_wedges
          FROM deg),
        en AS (SELECT COUNT(*) AS n_edges FROM ed)
        SELECT wg.n_nodes, en.n_edges, wg.n_wedges, tri.n_tri,
          ROUND(COALESCE(3.0 * tri.n_tri / NULLIF(wg.n_wedges, 0), 0), 6)
            AS clustering
        FROM en, wg, tri""")),

    // Character-class profile per source: lower/upper/digit/space/other
    // ratios off length deltas of class-stripping regexp_replace —
    // integer counts until the final division, so the 6-dp round is
    // exact division of exact sums. Map-only scan + one bounded
    // aggregation; the script-mix histogram is the cheap first gate a
    // multilingual crawl pipeline runs before lang-ID (j13) spends
    // n-gram work (ASCII classes only — deliberately locale-free, the
    // same class semantics in Java and RE2/DuckDB regex).
    Q("j109_script_mix",
      (s, d) => {
        def stripped(cls: String) =
          length(col("text")) - length(regexp_replace(col("text"), cls, ""))
        val r = t(s, d, "documents").select(col("source"),
          length(col("text")).as("tot"),
          stripped("[a-z]").as("lo"), stripped("[A-Z]").as("up"),
          stripped("[0-9]").as("dg"), stripped("[ ]").as("sp"))
        // a source whose every doc is empty text has sum(tot)=0 — define
        // all its ratios as 0.0 rather than an ANSI divide-by-zero /
        // IEEE NaN (r19 ADVICE; same 0-for-degenerate convention as the
        // zero-norm cosine oracles)
        // (coalesce: an all-NULL-text source has sum(tot) NULL, which
        // must take the degenerate branch too, like the oracle's COALESCE)
        def guarded(num: org.apache.spark.sql.Column) =
          when(coalesce(sum(col("tot")), lit(0L)) === 0, lit(0.0))
            .otherwise(round(num / sum(col("tot")).cast("double"), 6))
        def ratio(c: String) =
          guarded(sum(col(c)).cast("double")).as(c + "_r")
        r.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("tot")).as("n_chars"),
            ratio("lo"), ratio("up"), ratio("dg"), ratio("sp"),
            guarded((sum(col("tot")) - sum(col("lo")) - sum(col("up")) -
              sum(col("dg")) - sum(col("sp"))).cast("double")).as("other_r"))
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT source, LENGTH(text) AS tot,
          LENGTH(text) - LENGTH(regexp_replace(text, '[a-z]', '', 'g')) AS lo,
          LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g')) AS up,
          LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS dg,
          LENGTH(text) - LENGTH(regexp_replace(text, '[ ]', '', 'g')) AS sp
        FROM documents)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(tot) AS BIGINT) AS n_chars,
          ROUND(COALESCE(CAST(SUM(lo) AS DOUBLE)
            /NULLIF(CAST(SUM(tot) AS DOUBLE), 0), 0), 6) AS lo_r,
          ROUND(COALESCE(CAST(SUM(up) AS DOUBLE)
            /NULLIF(CAST(SUM(tot) AS DOUBLE), 0), 0), 6) AS up_r,
          ROUND(COALESCE(CAST(SUM(dg) AS DOUBLE)
            /NULLIF(CAST(SUM(tot) AS DOUBLE), 0), 0), 6) AS dg_r,
          ROUND(COALESCE(CAST(SUM(sp) AS DOUBLE)
            /NULLIF(CAST(SUM(tot) AS DOUBLE), 0), 0), 6) AS sp_r,
          ROUND(COALESCE(CAST(SUM(tot)-SUM(lo)-SUM(up)-SUM(dg)-SUM(sp)
            AS DOUBLE)/NULLIF(CAST(SUM(tot) AS DOUBLE), 0), 0), 6) AS other_r
        FROM c GROUP BY source ORDER BY source""")),

    // Deterministic 5-fold cross-validation assignment (j15's md5
    // device, mod 5) with the per-(fold, source) stratification audit a
    // CV split ships with: every doc lands in exactly one fold
    // (Round18cSpec pins the partition identity), and source_share
    // exposes stratification drift — the hash is source-blind, so a
    // fold whose share strays from 1/k flags a thin stratum, not a bug.
    // One scan, one bounded aggregation, one window over the ≤ k×|src|
    // audit rows.
    Q("j110_kfold_assign",
      (s, d) => {
        val f = t(s, d, "documents").select(
          expr(Hashes.bucket("doc_id", 5)).as("fold"),
          col("source"), col("n_chars"))
        val g = f.groupBy("fold", "source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("tot_chars"))
        g.select(col("fold"), col("source"), col("n_docs"), col("tot_chars"),
            round(col("n_docs").cast("double") /
              sum(col("n_docs")).over(Window.partitionBy("source"))
                .cast("double"), 4).as("source_share"))
          .orderBy("fold", "source")
      },
      Some(s"""WITH f AS (SELECT
          ${Hashes.bucketSql("doc_id", 5)} AS fold,
          source, n_chars FROM documents),
        g AS (SELECT fold, source, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS tot_chars
          FROM f GROUP BY fold, source)
        SELECT fold, source, n_docs, tot_chars,
          ROUND(CAST(n_docs AS DOUBLE) /
            CAST(SUM(n_docs) OVER (PARTITION BY source) AS DOUBLE), 4)
            AS source_share
        FROM g ORDER BY fold, source""")),

    // Bigram PMI collocations: pointwise mutual information
    // ln(c12·N / (c1·c2)) over the corpus bigram table, top-20 by
    // count. c1/c2 are the bigram-slot marginals (counts of w1 in the
    // first slot / w2 in the second); the PMI argument is built from
    // exact integer counts through the same two correctly-rounded
    // double multiplies and one divide on both engines — ONE libm ln
    // per output row on an identical double (the j81/j61 discipline).
    // The gram window is the
    // guarded Ngrams.starts builder (r17 item 1); n-gram counting is
    // one explode + hash aggregation, shuffle-parallel on the gram key;
    // the marginals re-aggregate the BIGRAM table (vocabulary-bounded),
    // never the corpus. N is a 1-row scalar carrier (j82's allowance).
    Q("j111_pmi_collocations",
      (s, d) => {
        val bg = t(s, d, "documents")
          .select(split(col("text"), " ").as("toks"))
          .select(explode(expr("transform(" + Ngrams.starts("toks", 2) +
            ", i -> struct(element_at(toks, i) as w1," +
            " element_at(toks, i + 1) as w2))")).as("b"))
          .select(col("b.w1"), col("b.w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val tot = bg.agg(sum(col("c12")).as("n"))
        val c1 = bg.groupBy("w1").agg(sum(col("c12")).as("c1"))
        val c2 = bg.groupBy("w2").agg(sum(col("c12")).as("c2"))
        bg.where(col("c12") >= 2)
          .join(c1, "w1").join(c2, "w2").crossJoin(tot)
          // each count casts to double BEFORE the products: c12·N and
          // c1·c2 overflow 64-bit integers at large-corpus counts
          // (n ≈ 1e13 bigrams × c12 ≈ 1e10 — Spark would wrap, DuckDB
          // would raise; r18-s3 review), while the double path is the
          // same two correctly-rounded multiplies on both engines
          .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
            round(log((col("c12").cast("double") * col("n").cast("double")) /
              (col("c1").cast("double") * col("c2").cast("double"))), 6)
              .as("pmi"))
          .orderBy(desc("c12"), asc("w1"), asc("w2")).limit(20)
      },
      Some("""WITH tok AS (SELECT string_split(text, ' ') AS toks
          FROM documents),
        bi AS (SELECT toks[i] AS w1, toks[i+1] AS w2
          FROM tok, unnest(range(1, len(toks))) t(i)
          WHERE len(toks) >= 2),
        bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
        tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM bg),
        c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bg GROUP BY w1),
        c2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM bg GROUP BY w2)
        SELECT bg.w1, bg.w2, bg.c12, c1.c1, c2.c2,
          ROUND(LN((CAST(bg.c12 AS DOUBLE) * CAST(t.n AS DOUBLE)) /
            (CAST(c1.c1 AS DOUBLE) * CAST(c2.c2 AS DOUBLE))), 6) AS pmi
        FROM bg JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN tot t
        WHERE bg.c12 >= 2
        ORDER BY bg.c12 DESC, bg.w1, bg.w2 LIMIT 20"""))
  )
}
