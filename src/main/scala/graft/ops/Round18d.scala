package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-18 batch 4 — the kNN-graph audit pair that completes j108's
  * structure census (label-noise and hubness, the two standard
  * neighborhood-graph pathologies) plus MMR diversified re-ranking
  * (Carbonell & Goldstein 1998), the greedy selection step a retrieval
  * pipeline runs over a bounded shortlist.
  *
  * All three stay in the j39 cost class: the graph keys consume the
  * knnGraph edge relation (LSH-bucketed candidate generation, vectors
  * never ride the candidate shuffle) and collapse to bounded audit
  * rows; MMR's greedy loop runs entirely on a 20-row shortlist — the
  * corpus is touched exactly once to build it.
  */
object Round18d {

  def all: Seq[Q] = Seq(

    // Label-noise audit via neighborhood disagreement (Wilson 1972's
    // editing rule, the standard noisy-label screen): for every vector
    // with kNN edges, the fraction of its k=3 neighbors carrying a
    // DIFFERENT label; aggregated per label class. A vector whose
    // neighborhood outvotes its own label (disagree >= 2/3) is flagged.
    // Joins are equi (edge endpoints → labels), output is |labels|
    // rows; at 100 TB the only heavy stage is knnGraph's candidate
    // join, which j2b's device already bounds.
    Q("j112_knn_label_noise",
      (s, d) => {
        val lab = t(s, d, "embeddings").select(col("vec_id"), col("label"))
        val per = Round6.knnGraph(s, d)
          .select(col("vec_id"), col("nbr_id"))
          .join(lab, "vec_id")
          .join(lab.toDF("nbr_id", "nbr_label"), "nbr_id")
          .groupBy(col("vec_id"), col("label"))
          .agg(count(lit(1)).as("k"),
            sum(when(col("nbr_label") =!= col("label"), 1L).otherwise(0L))
              .as("dis"))
        per.groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            round(sum(col("dis")).cast("double") /
              sum(col("k")).cast("double"), 6).as("disagree_rate"),
            sum(when(col("dis") * 3 >= col("k") * 2, 1L).otherwise(0L))
              .as("n_flagged"))
          .orderBy("label")
      },
      Some(s"""WITH ${Round6.KnnCtes},
        g AS (SELECT i, j FROM r WHERE rank <= 3),
        per AS (SELECT g.i, li.label,
            COUNT(*) AS k,
            SUM(CASE WHEN lj.label != li.label THEN 1 ELSE 0 END) AS dis
          FROM g JOIN embeddings li ON li.vec_id = g.i
            JOIN embeddings lj ON lj.vec_id = g.j
          GROUP BY g.i, li.label)
        SELECT label, COUNT(*) AS n_vecs,
          ROUND(CAST(SUM(dis) AS DOUBLE)/CAST(SUM(k) AS DOUBLE), 6)
            AS disagree_rate,
          CAST(SUM(CASE WHEN dis * 3 >= k * 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged
        FROM per GROUP BY label ORDER BY label""")),

    // Hubness audit: the in-degree distribution of the directed kNN
    // graph. High-dimensional ANN indexes develop hub vectors that
    // appear in a disproportionate share of neighbor lists
    // (Radovanović et al. 2010) — the histogram (in-degree → how many
    // vectors) plus the max-hub row is the audit an index ships with.
    // One count aggregation over the edge relation, then a histogram
    // over the |distinct in-degree| rows; vectors never appearing as a
    // neighbor are the in_deg=0 bucket, recovered by an anti-join
    // count, not a corpus outer join.
    Q("j114_hubness_audit",
      (s, d) => {
        val g = Round6.knnGraph(s, d).select(col("vec_id"), col("nbr_id"))
        // indeg feeds BOTH union branches (histogram + anti-join zero
        // bucket) — materialize once or knnGraph's candidate join runs
        // twice (r18-s3 review; j108/j113's device)
        val indeg = g.groupBy(col("nbr_id")).agg(count(lit(1)).as("in_deg"))
          .localCheckpoint()
        val nonzero = indeg.groupBy("in_deg")
          .agg(count(lit(1)).as("n_vectors"))
        val zero = t(s, d, "embeddings").select(col("vec_id"))
          .join(indeg.select(col("nbr_id").as("vec_id")), Seq("vec_id"),
            "left_anti")
          .agg(count(lit(1)).as("n_vectors"))
          .select(lit(0L).as("in_deg"), col("n_vectors"))
          .where(col("n_vectors") > 0)
        nonzero.select(col("in_deg"), col("n_vectors"))
          .unionAll(zero)
          .orderBy("in_deg")
      },
      Some(s"""WITH ${Round6.KnnCtes},
        g AS (SELECT i, j FROM r WHERE rank <= 3),
        indeg AS (SELECT j, COUNT(*) AS in_deg FROM g GROUP BY j),
        nonzero AS (SELECT in_deg, COUNT(*) AS n_vectors
          FROM indeg GROUP BY in_deg),
        zero AS (SELECT CAST(0 AS BIGINT) AS in_deg,
            COUNT(*) AS n_vectors
          FROM embeddings em WHERE NOT EXISTS
            (SELECT 1 FROM indeg WHERE indeg.j = em.vec_id))
        SELECT in_deg, n_vectors FROM nonzero
        UNION ALL SELECT in_deg, n_vectors FROM zero WHERE n_vectors > 0
        ORDER BY in_deg""")),

    // MMR diversified re-rank (λ = 0.7, k = 5) of probe 0's exact
    // top-20 cosine shortlist: each step picks
    // argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), ties by vec_id.
    // The greedy loop is UNROLLED over the bounded shortlist — the
    // corpus is scanned once to build the 20-row shortlist and its
    // 20×20 sim matrix; every iteration is then bounded-relation
    // algebra (the j53/j54 unrolled-training discipline). rel and sim
    // are 6-dp-rounded cosines, and λ·rel / (1−λ)·sim are single IEEE
    // multiplies of identical doubles, so both engines walk the same
    // greedy path bit-for-bit.
    Q("j113_mmr_rerank",
      (s, d) => {
        // BOTH weights as literal doubles: lit(1.0 - 0.7) would be
        // 0.30000000000000004 — one ulp off the 0.3 the DuckDB oracle
        // and the spec's recompute parse, enough to flip a 6-dp argmax
        // at a rounding boundary (r18-s3 review)
        val lam = 0.7
        val lamC = 0.3
        val emb = t(s, d, "embeddings")
        val probe = emb.where(col("vec_id") === 0)
          .select(col("embedding").as("e0"))
        // shortlist and sim matrix are re-consumed by every greedy
        // step: materialize both eagerly (j90b's localCheckpoint
        // device) so the corpus is scanned ONCE and the unrolled loop
        // is pure bounded-relation algebra over 20/380-row LogicalRDDs
        // (without this, each of the 5 steps re-derived the whole
        // probe-scan subtree — 5.15 s vs 1.02 s min at sf0.1)
        val short = emb.crossJoin(broadcast(probe))
          .where(col("vec_id") =!= 0)
          .select(col("vec_id"),
            round(graft.expressions.CosineSimilarity(s,
              col("embedding"), col("e0")), 6).as("rel"))
          .orderBy(desc("rel"), asc("vec_id")).limit(20)
          .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
          .localCheckpoint()
        val sims = short.toDF("a", "ra", "ea")
          .crossJoin(broadcast(short.toDF("b", "rb", "eb")))
          .where(col("a") =!= col("b"))
          .select(col("a"), col("b"),
            round(graft.expressions.CosineSimilarity(s,
              col("ea"), col("eb")), 6).as("sim"))
          .localCheckpoint()
        val cands = short.select(col("vec_id"), col("rel"))
        // greedy unroll: step 1 is pure relevance; steps 2..5 subtract
        // the max similarity to the already-selected set
        var selected = cands
          .select(lit(1L).as("step"), col("vec_id"), col("rel"),
            round(lit(lam) * col("rel"), 6).as("mmr_score"))
          .orderBy(desc("mmr_score"), asc("vec_id")).limit(1)
        for (step <- 2 to 5) {
          val sel = selected.select(col("vec_id").as("b"))
          val next = cands.join(sel.toDF("vec_id"), Seq("vec_id"),
              "left_anti")
            .join(sims, col("vec_id") === col("a"))
            .join(sel, Seq("b"))
            .groupBy(col("vec_id"), col("rel"))
            .agg(max(col("sim")).as("msim"))
            .select(lit(step.toLong).as("step"), col("vec_id"), col("rel"),
              round(lit(lam) * col("rel") -
                lit(lamC) * col("msim"), 6).as("mmr_score"))
            .orderBy(desc("mmr_score"), asc("vec_id")).limit(1)
          // checkpoint the growing selection so later steps reference
          // a <=5-row LogicalRDD instead of re-executing every earlier
          // step's argmax subtree (the plan otherwise pyramids)
          selected = selected.unionAll(next).localCheckpoint()
        }
        selected.orderBy("step")
      },
      Some(s"""WITH ${Round6.KnnCtes},
        p AS (SELECT dim, v FROM e WHERE vec_id = 0),
        sl AS (SELECT e.vec_id,
            ROUND(COALESCE(SUM(e.v*p.v) / NULLIF(n1.nm *
              (SELECT sqrt(SUM(v*v)) FROM p), 0), 0), 6) AS rel
          FROM e JOIN p USING (dim) JOIN nm n1 ON n1.vec_id = e.vec_id
          WHERE e.vec_id != 0
          GROUP BY e.vec_id, n1.nm
          ORDER BY rel DESC, e.vec_id LIMIT 20),
        sims AS (SELECT a.vec_id AS a, b.vec_id AS b,
            ROUND(COALESCE(SUM(ea.v*eb.v)/NULLIF(na.nm*nb.nm, 0), 0), 6)
              AS sim
          FROM sl a JOIN sl b ON a.vec_id != b.vec_id
          JOIN e ea ON ea.vec_id = a.vec_id
          JOIN e eb ON eb.vec_id = b.vec_id AND eb.dim = ea.dim
          JOIN nm na ON na.vec_id = a.vec_id
          JOIN nm nb ON nb.vec_id = b.vec_id
          GROUP BY a.vec_id, b.vec_id, na.nm, nb.nm),
        s1 AS (SELECT CAST(1 AS BIGINT) AS step, vec_id, rel,
            ROUND(0.7 * rel, 6) AS mmr_score
          FROM sl ORDER BY mmr_score DESC, vec_id LIMIT 1),
        s2 AS (SELECT CAST(2 AS BIGINT) AS step, c.vec_id, c.rel,
            ROUND(0.7 * c.rel - 0.3 * MAX(s.sim), 6) AS mmr_score
          FROM sl c JOIN sims s ON s.a = c.vec_id
            AND s.b IN (SELECT vec_id FROM s1)
          WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
          GROUP BY c.vec_id, c.rel
          ORDER BY mmr_score DESC, c.vec_id LIMIT 1),
        s3 AS (SELECT CAST(3 AS BIGINT) AS step, c.vec_id, c.rel,
            ROUND(0.7 * c.rel - 0.3 * MAX(s.sim), 6) AS mmr_score
          FROM sl c JOIN sims s ON s.a = c.vec_id
            AND s.b IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2)
          WHERE c.vec_id NOT IN
            (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2)
          GROUP BY c.vec_id, c.rel
          ORDER BY mmr_score DESC, c.vec_id LIMIT 1),
        s4 AS (SELECT CAST(4 AS BIGINT) AS step, c.vec_id, c.rel,
            ROUND(0.7 * c.rel - 0.3 * MAX(s.sim), 6) AS mmr_score
          FROM sl c JOIN sims s ON s.a = c.vec_id
            AND s.b IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
              UNION SELECT vec_id FROM s3)
          WHERE c.vec_id NOT IN
            (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
              UNION SELECT vec_id FROM s3)
          GROUP BY c.vec_id, c.rel
          ORDER BY mmr_score DESC, c.vec_id LIMIT 1),
        s5 AS (SELECT CAST(5 AS BIGINT) AS step, c.vec_id, c.rel,
            ROUND(0.7 * c.rel - 0.3 * MAX(s.sim), 6) AS mmr_score
          FROM sl c JOIN sims s ON s.a = c.vec_id
            AND s.b IN (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
              UNION SELECT vec_id FROM s3 UNION SELECT vec_id FROM s4)
          WHERE c.vec_id NOT IN
            (SELECT vec_id FROM s1 UNION SELECT vec_id FROM s2
              UNION SELECT vec_id FROM s3 UNION SELECT vec_id FROM s4)
          GROUP BY c.vec_id, c.rel
          ORDER BY mmr_score DESC, c.vec_id LIMIT 1)
        SELECT step, vec_id, rel, mmr_score FROM s1
        UNION ALL SELECT step, vec_id, rel, mmr_score FROM s2
        UNION ALL SELECT step, vec_id, rel, mmr_score FROM s3
        UNION ALL SELECT step, vec_id, rel, mmr_score FROM s4
        UNION ALL SELECT step, vec_id, rel, mmr_score FROM s5
        ORDER BY step""")),

    // Weighted sampling WITHOUT replacement, k=20, weight = n_chars —
    // Efraimidis & Vitter's exponential-clocks form: each doc draws
    // priority −ln(u)/w (an Exp(w) arrival time) and the k SMALLEST
    // arrivals are the sample, inclusion odds proportional to weight.
    // u is hash-derived ((md5-bucket+1)/2^24+1 — the Hashes device, so
    // the draw is reproducible across engines, cluster sizes, and
    // retries: the same no-RNG-state discipline as j16/j22b), and the
    // priority is rounded to 9 dp with a doc_id tiebreak so the top-k
    // cut is deterministic. One map-only scan → TakeOrderedAndProject;
    // no shuffle of the corpus at any scale. Completes the sampling
    // family: j22b (per-stratum rate), j75 (exact n), j87 (quota),
    // j92 (rejection), j115 (weight-proportional without replacement).
    Q("j115_weighted_sample_es",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("pri"), col("doc_id"))
        t(s, d, "documents")
          // a zero-weight doc has an infinite Exp(0) clock — inclusion
          // probability 0 — and would divide by zero under ANSI mode
          // (NgramGuardSpec's empty-doc sweep caught this)
          .where(col("n_chars") > 0)
          .select(col("doc_id"), col("n_chars").as("w"),
            // divisor cast: a bare 16777217.0 literal is DECIMAL(9,1)
            // to Spark's parser and the quotient inherits DECIMAL —
            // the oracle computes in DOUBLE
            expr(s"round((${Hashes.bucket("doc_id", 16777216)} + 1)" +
              " / cast(16777217 as double), 9)").as("u"))
          .select(col("doc_id"), col("w"), col("u"),
            round(-log(col("u")) / col("w"), 9).as("pri"))
          .orderBy(asc("pri"), asc("doc_id")).limit(20)
          .withColumn("rank", row_number().over(w).cast("long"))
          .select("rank", "doc_id", "w", "u", "pri")
          .orderBy("rank")
      },
      Some(s"""WITH draw AS (SELECT doc_id, n_chars AS w,
            ROUND((${Hashes.bucketSql("doc_id", 16777216)} + 1)
              / 16777217.0, 9) AS u
          FROM documents WHERE n_chars > 0),
        pri AS (SELECT doc_id, w, u, ROUND(-LN(u) / w, 9) AS pri
          FROM draw),
        top AS (SELECT doc_id, w, u, pri FROM pri
          ORDER BY pri, doc_id LIMIT 20)
        SELECT CAST(row_number() OVER (ORDER BY pri, doc_id) AS BIGINT)
            AS rank, doc_id, w, u, pri
        FROM top ORDER BY rank"""))
  )
}
