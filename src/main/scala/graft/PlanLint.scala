package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: plan lint across the whole registry — per key, count
  * exchanges / join strategies / scans-with-pushdown, and flag smells
  * (cartesian products, nested-loop joins outside the known-small cases).
  * Usage: runMain graft.PlanLint [sfDir] */
object PlanLint {
  // keys where a nested-loop/cartesian is intentional (tiny/broadcast side:
  // dim×dim cross, all-pairs upper triangle, single-row probe broadcast)
  private val nljAllowed = Set("c8_join_cross", "j12_dedup_embed",
    "j3_sim_topk", "j3c_sim_native",
    // quantized cosine: same 1-row probe broadcast as j3
    "j26_embed_quantize",
    // mixture: the (T, Σw) scalar row cross-joins the ~20-row source
    // counts — bounded by source cardinality, never by data volume
    "j30_source_mixture",
    // IVF: vectors × broadcast centroids is the assignment step (k small
    // by construction), plus the 1-row probe broadcast
    "j3d_sim_ivf",
    // DSIR: the 1-row corpus-totals scalar cross-joins the fixed 4096-row
    // bucket table (both bounded by construction, never by data volume)
    "j32_importance_weight",
    // token budget: 1-row Σw / leftover totals cross-join the per-source
    // relation (bounded by source cardinality, never by data volume)
    "j38_token_budget",
    // hybrid retrieval: the 1-row probe-embedding broadcast (j3's pattern)
    "j41_hybrid_retrieval",
    // LSH bucket assignment (LlmOps.lshProject): the 1-row hyperplane
    // weight-array carrier broadcasts (planes × dim doubles, bounded by
    // embedding dim); candidate generation itself stays an equi-join —
    // PlanSpec pins that the bucket join is never the NLJ
    "j3b_sim_lsh", "j39_knn_graph", "j39b_knn_multiprobe",
    "j39c_knn_twotable", "j39d_knn_topk_native", "j40_semantic_clusters",
    // BM25: the 1-row (N, avgdl) statistics carrier broadcasts
    "j42_bm25",
    // unigram LM: the 1-row corpus-token-total carrier broadcasts (j42's
    // stats-carrier pattern; the vocab join itself is the equi-join)
    "j61_unigram_lm_score",
    // interpolated LM: the same 1-row corpus-total carrier as j61 (the
    // vocab and bigram-context joins stay equi-joins)
    "j66_interpolated_lm",
    // perplexity buckets: j61's 1-row total carrier; the tercile
    // threshold relation (|languages| rows) joins back as an equi-join
    "j68_perplexity_buckets",
    // composed recipe: the same 1-row total carrier inside its
    // perplexity stage (every other join is equi / broadcast-threshold)
    "j79_data_recipe",
    // Q22: the 1-row global-average-balance scalar broadcasts over the
    // anti-joined customers (the dormancy probe itself is the anti join,
    // pinned in Round16cSpec)
    "p9_tpch_q22",
    // Q11: the 1-row global-total cut broadcasts over the per-part
    // aggregate (the share-of-total HAVING shape)
    "p16_tpch_q11",
    // ICWS: the K-row (16) slot table broadcasts over the tf relation
    // (bounded by the signature length, never data volume); candidate
    // generation is the banded equi-join
    "j60c_dedup_weighted_icws",
    // RRF: BM25's stats carrier + the 1-row probe-embedding broadcast
    "j43_rrf_fusion",
    // corpus overlap: the pairwise theta join runs on the |sources|-row
    // SKETCH relation (one HLL per source), never the corpus
    "j45_corpus_overlap",
    // PQ re-rank: the 1-row full-probe broadcast over the 50-row
    // shortlist (j3's pattern; ADC + codebook joins stay equi)
    "j53_pq_ann",
    // IVF-PQ: three bounded probe carriers (1-row probe × 8-row coarse
    // centroids, × nprobe cells, × 50-row shortlist); cell assignment,
    // code joins and LUT joins stay equi
    "j54_ivfpq_ann",
    // theta set algebra: the pairwise theta join runs on the |types|-row
    // SKETCH relation (j45's allowance with exact set semantics)
    "d24_theta_set_algebra",
    // MaxSim: the |Q|=5-row query-token carrier broadcasts (j41's
    // term-set allowance); the corpus side streams map-only
    "j55_maxsim_retrieval",
    // filtered ANN: the 1-row probe broadcast (j3's pattern); the label
    // predicate is pushed to the scan ahead of it
    "j57_filtered_ann",
    // mixture temperature: two 1-row scalar carriers (Σn, Σsqrt) over
    // the |sources|-row relation (j30/j38's allowance)
    "j82_mixture_temperature",
    // matryoshka eval: j3's 1-row probe broadcast, twice (full + trunc)
    "j83_matryoshka_eval",
    // pack sweep: the 3-row candidate-length dimension broadcasts over
    // the 8-row per-shard totals (both bounded by construction)
    "j85_pack_efficiency",
    // quota sample: the 1-row token-total carrier over the |sources|-row
    // relation (j82's allowance)
    "j87_quota_sample",
    // negative sampling: the 1-row corpus-count carrier over the pair
    // table (the draws themselves are a pure map)
    "j88_negative_sampling",
    // semantic decontam: the BENCHMARK side broadcasts (bounded by
    // benchmark size — tiny by nature next to train corpora); the train
    // corpus streams through one scan
    "j90_semantic_decontam",
    // shard-loss audit: the final join is 1-row global totals × 1-row
    // within-shard totals (j82/j87's scalar-carrier allowance)
    "j98_shard_dedup_loss",
    // retrieval eval trio: the 20-row labeled probe set broadcasts over
    // one corpus scan (j90's bounded-benchmark allowance); j105 adds the
    // 10-row rank-discount dim theta-joined to the 20-row R relation
    "j105_ndcg",
    "j106_mrr",
    "j107_recall_at_k",
    // triangle census: the triangle/wedge/edge totals are three 1-row
    // scalar carriers (j82's allowance); the enumeration joins are equi
    "j108_graph_triangles",
    // PMI: the 1-row bigram-total carrier over the vocabulary-bounded
    // bigram relation (j82's allowance)
    "j111_pmi_collocations",
    // MMR: j3's 1-row probe broadcast builds the 20-row shortlist; the
    // 20×20 sim matrix is a bounded-shortlist cross (j85's allowance);
    // every greedy step is bounded-relation algebra
    "j113_mmr_rerank",
    // graph audits: the only BNLJ is knnGraph's inherited 1-row
    // hyperplane-weight carrier (j39's allowance)
    "j112_knn_label_noise",
    "j114_hubness_audit")

  // r18 verdict item 3: unpartitioned-Window allowlist — same pattern as
  // the NLJ list. A `Window` with an EMPTY partition spec moves its whole
  // input to ONE task; that is a scale-killer on a corpus relation but
  // fine (and often semantically required) on (a) a TOTAL-ORDER operator
  // the user asked for, or (b) a bounded relation (top-k shortlists,
  // vocab/source-sized aggregates). Every entry carries the bounding
  // argument; a NEW key with a global window over an unbounded relation
  // trips the lint. Populated after running the counter over the full
  // registry at sf0.001 (filled below, one rationale per entry).
  private val globalWindowAllowed: Set[String] = Set(
    // -- semantically-global total-order operators: the OUTPUT is a
    //    global order/quantile; at 100 TB these run as a range-
    //    partitioned global sort (Spark's SortExec on rangepartitioning),
    //    and the scaladoc of each documents the scale posture --
    "e6_win_ntile",          // ntile over the total order IS the operator
    "e9_win_distribution",   // percent_rank/cume_dist over the total order
    "j16_shuffle_det",       // global training order = hash-sort + position
    "j93_curriculum_order",  // global curriculum interleave (scaladoc: swap
                             // ntile for percentile-cut buckets at 100 TB)
    // -- bounded relations: the window input's row count is fixed by
    //    construction (post-limit shortlists, calendar/source/bin/vocab-
    //    sized aggregates), never proportional to corpus size --
    "h19_resample_ffill",    // 30-row generated calendar spine
    "j43_rrf_fusion",        // two rank windows on <= 100-row post-limit legs
    "j81_zipf_slope",        // rank window on the top-100 post-limit vocab
    "j83_matryoshka_eval",   // rank windows on the 10-row post-limit lists
    "j87_quota_sample",      // remainder/base-sum windows on |sources| rows
    "j96_kneser_ney",        // P_cont total over the |vocab|-sized per-w agg
    "j103_calibration_bins", // ECE totals over the <= 10-row bin relation
    "j104_roc_auc",          // cum-neg over the 6-dp score histogram
                             // (<= 10^6 rows by construction)
    "j115_weighted_sample_es", // rank over the 20-row post-limit sample
    "j116_psi_drift",          // share/PSI totals over the <= 10-row bins
    "j117_epoch_schedule",     // |S| and budget totals over |sources| rows
    "j119_epoch_redistribute", // j117's plan reused: same |sources|-row
                               // window; the fill itself is a one-row fold
    "j121_filter_yield",       // cumulative/total windows on the 10-row
                               // generated threshold spine
    "p23_cumulative_channels") // running totals over the |days| relation
                               // (~2,400 rows, calendar-bounded)

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var smells = 0
    var globalWindows = 0
    SparkEntry.registry.sortBy(_.key).foreach { q =>
      // streaming / side-effecting keys execute work on construction — skip
      val sideEffecting = Set("a7", "a8", "a11", "a12", "a13",
        "i4", "i5", "i6", "i7", "i8", "i9")
      if (sideEffecting.exists(p => q.key.startsWith(p + "_"))) {
        println(f"${q.key}%-28s (skipped: executes on construction)")
      } else try {
        val qe = q.fn(spark, sf).queryExecution
        val p = qe.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(p).length
        val ex = n("Exchange hashpartitioning") + n("Exchange rangepartitioning")
        val bhj = n("BroadcastHashJoin"); val smj = n("SortMergeJoin")
        val bnl = n("BroadcastNestedLoopJoin"); val cart = n("CartesianProduct")
        val push = n("PushedFilters: \\[[^\\]]")
        // unpartitioned windows: counted on the OPTIMIZED LOGICAL plan
        // (AQE wraps the physical tree, and "no partition spec" is a
        // logical property anyway). Stages a key materialized eagerly
        // during construction (localCheckpoint) are already LogicalRDDs
        // here — those windows ran on bounded checkpointed relations.
        val gwin = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.size
        globalWindows += gwin
        val flags = new StringBuilder
        if (cart > 0) { flags.append(" CARTESIAN!"); smells += 1 }
        if (bnl > 0 && !nljAllowed(q.key)) { flags.append(" NLJ!"); smells += 1 }
        if (gwin > 0 && !globalWindowAllowed(q.key)) {
          flags.append(" GLOBALWIN!"); smells += 1
        }
        println(f"${q.key}%-28s exch=$ex bhj=$bhj smj=$smj bnl=$bnl gwin=$gwin pushed=$push$flags")
      } catch { case e: Throwable =>
        println(f"${q.key}%-28s ERROR ${e.getMessage.take(80)}"); smells += 1
      }
    }
    println(s"SMELLS=$smells")
    println(s"GLOBAL_WINDOWS=$globalWindows (allowlisted keys: ${globalWindowAllowed.size})")
    // r17 verdict item 6: record how many SURVEY-contract keys carry an
    // asserted headline plan property (the ContractPlanSpec sweep).
    println(s"CONTRACT_ASSERTED=${PlanContract.contractKeys.size}")
    spark.stop()
  }
}
