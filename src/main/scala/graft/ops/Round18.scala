package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-18 additions. Headline: j90b — the IVF-pruned leg of semantic
  * decontamination (r17 verdict item 4). The j-keys are EXT per SURVEY
  * §1 (BASELINE.json north-star extensions); reference surface for SQL
  * passthrough remains `pandas_td/td.py :: read_td_query` (§0-caveated
  * anchor).
  */
object Round18 {

  /** j90b's candidate core, shared with ScaleSoak's decontam row:
    * `tagged` is (vec_id, embedding, label, is_bench); returns the IVF-
    * pruned scored pairs (b_id, t_id, cos) — per-label decimal-exact
    * centroids, rounded-argmax cell assignment, bench probes search
    * their `nprobe` nearest cells, train docs stay in their home cell,
    * candidates via equi-join on cell. */
  private[graft] def ivfPairs(
      tagged: org.apache.spark.sql.DataFrame,
      nprobe: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = tagged.sparkSession
    val dims = tagged.select(col("vec_id"), col("label"), col("is_bench"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("is_bench"), col("dim"),
        col("v").cast("double").as("v"))
    // coarse quantizer: decimal-exact per-dim means per label cell
    // (order-independent sums → byte-identical centroids cross-engine)
    val centd = dims.groupBy("label", "dim")
      .agg((sum(col("v").cast("decimal(28,12)")) / count(lit(1)))
        .cast("double").as("c"))
      .select(col("label").as("cell"), col("dim"), col("c"))
    val norms = dims.groupBy("vec_id")
      .agg(sqrt(sum(col("v") * col("v"))).as("nv"))
    val cnorms = centd.groupBy("cell")
      .agg(sqrt(sum(col("c") * col("c"))).as("nc"))
    val csim = dims.join(broadcast(centd), "dim")
      .groupBy("vec_id", "cell").agg(sum(col("v") * col("c")).as("dot"))
      .join(norms, "vec_id").join(broadcast(cnorms), "cell")
      .select(col("vec_id"), col("cell"),
        round(col("dot") / (col("nv") * col("nc")), 6).as("csim"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(desc("csim"), asc("cell"))
    val assigned = csim.withColumn("rn", row_number().over(wAssign))
    val benchIds = tagged.where(col("is_bench"))
      .select(col("vec_id").as("b_id"), col("embedding").as("e_b"))
    val probeCells = assigned.join(benchIds,
        assigned("vec_id") === benchIds("b_id"))
      .where(col("rn") <= nprobe)
      .select(col("b_id"), col("cell"), col("e_b"))
    val trainCells = assigned.where(col("rn") === 1)
      .join(tagged.where(!col("is_bench"))
        .select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id").as("t_id"), col("cell"), col("embedding"))
    trainCells.join(broadcast(probeCells), "cell")
      .select(col("b_id"), col("t_id"),
        round(graft.expressions.CosineSimilarity(s,
          col("embedding"), col("e_b")), 6).as("cos"))
  }

  def all: Seq[Q] = Seq(

    // j90b — IVF-PRUNED semantic decontamination. j90's brute-force
    // bench×train cosine sweep is the correct review-list shape, but at
    // 10⁴ bench probes × a 100 TB train corpus the per-train-doc constant
    // (10⁴ cosines each) dominates. This key routes both sides through
    // the j3d IVF coarse quantizer: per-label DECIMAL-exact centroids
    // (16 cells — broadcastable at any corpus size), every tagged vector
    // assigned to its argmax-cosine cell (rounded to 6 before the argmax
    // so the winner is ulp-robust cross-engine, ties ascending), each
    // BENCH probe searches only its nprobe=6 nearest cells. Train-side
    // work drops from |bench|×|train| cosines to |bench|×(6/16 of train)
    // — and at scale the cell id is the partition key: candidate
    // generation is an equi-join on cell, so a probe touches nprobe/k of
    // the corpus instead of streaming all of it (k here is pinned to the
    // 16 fixture labels; production sizes k ~ √N so nprobe/k ≪ 1).
    // nprobe was CHOSEN FROM THE MEASURED RECALL CURVE vs j90's exact
    // top-5 at sf0.01: nprobe 2 → 0.39, 4 → 0.64, 6 → 0.78 — the
    // synthetic embeddings are weakly clustered (near-worst case for a
    // coarse quantizer; text embeddings cluster far more sharply), so
    // the curve, not a folklore default, sets the knob. Recall ≥ 0.7 is
    // pinned in Round18Spec (the j2b/j2c pattern), as is the scored-pair
    // fraction: cells are UNEVEN and bench probes concentrate on heavy
    // cells, so the measured pair mass is 0.60 of brute force (not the
    // even-cell 6/16 = 0.375) — the honest prune on this corpus; the
    // soak's decontam section records the same masses at the 20k-vector
    // corpus. The answer is the IVF algorithm's own answer and the
    // oracle replays the SAME algorithm, so the key is oracle-exact.
    Q("j90b_decontam_ivf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = t(s, d, "embeddings")
        val src = t(s, d, "documents").select(col("doc_id"), col("source"))
        val tagged = emb.join(src, emb("vec_id") === src("doc_id"))
          .select(col("vec_id"), col("embedding"), col("label"),
            (col("source") === "src0").as("is_bench"))
        val pairs = ivfPairs(tagged, nprobe = 6)
        val w = Window.partitionBy("b_id").orderBy(desc("cos"), asc("t_id"))
        pairs.withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 5)
          .select(col("b_id"), col("rank"), col("t_id"), col("cos"))
          .orderBy("b_id", "rank")
      },
      Some("""WITH tagged AS (SELECT e.vec_id, e.embedding, e.label,
              d.source = 'src0' AS is_bench
            FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
          ex AS (SELECT vec_id, label, is_bench,
              generate_subscripts(embedding, 1) - 1 AS dim,
              CAST(unnest(embedding) AS DOUBLE) AS v FROM tagged),
          centd AS (SELECT label AS cell, dim,
              CAST(SUM(CAST(v AS DECIMAL(28,12))) / COUNT(*) AS DOUBLE) AS c
            FROM ex GROUP BY label, dim),
          norms AS (SELECT vec_id, sqrt(SUM(v*v)) AS nv FROM ex GROUP BY vec_id),
          cnorms AS (SELECT cell, sqrt(SUM(c*c)) AS nc FROM centd GROUP BY cell),
          csim AS (SELECT ex.vec_id, centd.cell,
              ROUND(SUM(ex.v * centd.c) / (ANY_VALUE(n.nv) * ANY_VALUE(cn.nc)), 6) AS csim
            FROM ex JOIN centd USING (dim)
              JOIN norms n ON ex.vec_id = n.vec_id
              JOIN cnorms cn ON centd.cell = cn.cell
            GROUP BY ex.vec_id, centd.cell),
          ranked AS (SELECT vec_id, cell, csim,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY csim DESC, cell) AS rn
            FROM csim),
          bench AS (SELECT vec_id AS b_id FROM tagged WHERE is_bench),
          pcells AS (SELECT r.vec_id AS b_id, r.cell FROM ranked r
            JOIN bench b ON r.vec_id = b.b_id WHERE r.rn <= 6),
          tcells AS (SELECT r.vec_id AS t_id, r.cell FROM ranked r
            JOIN tagged t ON r.vec_id = t.vec_id
            WHERE r.rn = 1 AND NOT t.is_bench),
          cand AS (SELECT p.b_id, t.t_id FROM pcells p
            JOIN tcells t ON p.cell = t.cell),
          dots AS (SELECT c.b_id, c.t_id,
              SUM(tv.v * bv.v) AS dot
            FROM cand c
            JOIN ex tv ON tv.vec_id = c.t_id
            JOIN ex bv ON bv.vec_id = c.b_id AND bv.dim = tv.dim
            GROUP BY c.b_id, c.t_id),
          scored AS (SELECT d.b_id, d.t_id,
              ROUND(d.dot / (nt.nv * nb.nv), 6) AS cos
            FROM dots d
            JOIN norms nt ON nt.vec_id = d.t_id
            JOIN norms nb ON nb.vec_id = d.b_id),
          rk AS (SELECT b_id, t_id, cos,
              CAST(row_number() OVER (PARTITION BY b_id
                ORDER BY cos DESC, t_id) AS BIGINT) AS rank
            FROM scored)
        SELECT b_id, rank, t_id, cos FROM rk
        WHERE rank <= 5 ORDER BY b_id, rank"""))
  )
}
