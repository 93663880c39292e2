package graft

import org.apache.spark.sql.SparkSession

/** Generates PLANS.md: formatted physical plans of headline operators —
  * committed evidence that the scale-critical plan properties hold
  * (pushdown, partition pruning, broadcast choice, zero-exchange bucketed
  * join, custom exec nodes). Usage: runMain graft.PlanReport [sfDir] */
object PlanReport {
  private val headline = Seq(
    "a2_scan_project"        -> "projection pruning reaches the parquet ReadSchema",
    "a3_scan_time_range"     -> "td_time_range expands to pushed same-type range filters on bare ts",
    "a14_source_partitioned" -> "partitionBy layout read back with PartitionFilters",
    "a15_sink_time_buckets"  -> "TD-style time-bucket sink; pruned read-back",
    "c2_join_broadcast"      -> "small dim broadcast (distributed_join=False analog)",
    "c11_join_bucketed"      -> "bucketed co-located join: zero Exchange at the join",
    "c10c_join_asof_native"  -> "custom AsOfJoinExec: one exchange+sort per side",
    "c12_join_interval"      -> "custom IntervalJoinExec: active-set sweep",
    "d1_agg_groupby"         -> "two-phase hash aggregation (partial + final)",
    "f2_topk_global"         -> "global top-k as TakeOrderedAndProject",
    "j3c_sim_native"         -> "native cosine expression inside whole-stage codegen",
    "j8b_dedup_hamming"      -> "banded hamming: equi-join candidates, no NLJ",
    "j12_dedup_embed"        -> "exact all-pairs as a block grid: equi-join cells, no full-table broadcast",
    "j2b_dedup_minhash"      -> "minhash bands: (doc, band, hash) candidates, signatures re-join after dedup",
    "j2_dedup_near"          -> "pairs emitted in-place from grouped postings; heavy-df fallback behind its size guard",
    "a20_sort_layout"        -> "range-sorted layout: shipdate predicate pushed to the re-laid-out scan",
    "c13_join_bloom"         -> "runtime bloom probe filters lineitem BEFORE its join shuffle",
    "c14_join_salted"        -> "hot key spread over 8 salts; dim replicated, no single-reducer hotspot",
    "j28_dedup_incremental"  -> "incoming bands equi-join the corpus band index; exact verify on candidates only",
    "j31_semdedup"           -> "semantic dedup candidates from a cluster-id equi-join, no cartesian",
    "j35_corpus_pipeline"    -> "whole pipeline in one plan: lang/quality filters pushed to the scan under the dedup shuffles",
    "d21_approx_top_k"       -> "mergeable frequent-items sketch: partial aggregation, no raw-value shuffle",
    "j42_bm25"               -> "BM25: dl rides the tf agg — broadcast-only joins, one corpus shuffle",
    "m2b_decode_image"       -> "byte-level PNG/JPEG header decode: map-only binary arithmetic off the scan",
    "k7_presto_dialect_row"  -> "Presto-dialect aliases expand to native expressions; filter still pushes",
    "j46_graph_pagerank"     -> "integer PageRank: iterations read checkpointed edges, never the LSH pipeline",
    "j47_repeated_ngrams"    -> "repeated-n-gram coverage: one gram shuffle, doc-keyed window, no interval merge",
    "m6_decode_wav"          -> "RIFF/WAVE little-endian decode: map-only per-byte hex reassembly off the scan",
    "k9_presto_dialect_map"  -> "map_agg family: one collect_list through partial/final, map built in projection",
    "e11_topk_native"        -> "custom TopKPerGroupExec: partial heap phase below final, pruned scan, no sort",
    "h27_td_sessionize_window" -> "native window sessionizer: ONE Window exec over one shuffle+sort",
    "j52_decontam_bloom"     -> "bloom probe filters train grams map-side BELOW the exact bench join",
    "j53_pq_ann"             -> "PQ: codes equi-join the broadcast LUT; re-rank fetches 50 ids, never scans vectors",
    "j54_ivfpq_ann"          -> "IVF-PQ: cell + code + per-cell LUT joins all equi/broadcast; probed cells gate the candidates",
    "d24_theta_set_algebra"  -> "theta set ops on the |types|-row sketch relation, one corpus aggregation below",
    "h34_lat_long_to_country" -> "geo lookup as a broadcast equi-join on the grid cell; point-in-box residual in-bucket",
    "j55_maxsim_retrieval"   -> "MaxSim: 5-row query carrier broadcasts; corpus streams through max+sum aggregations",
    "d26_topk_time_rollup"   -> "frequent-items rollup: day combine aggregates hour SKETCH rows off one events scan",
    "d27_bitmap_exact_distinct" -> "exact bitmap uniques: OR/AND re-aggregate stored bitmap rows, one corpus pass",
    "c16_join_nullsafe"      -> "null-safe equality still plans a broadcast HASH join, no NLJ",
    "j90b_decontam_ivf"      -> "IVF decontam: candidates from the cell equi-join; 16-row centroid relation broadcasts",
    "p23_cumulative_channels" -> "Q51 shape: both channels pre-aggregate to day grain BELOW the full outer",
    "c10e_join_asof_tolerance" -> "as-of with tolerance: window predicate inside the join bounds candidate fan-out",
    "j98_shard_dedup_loss"   -> "shard-loss audit: two bounded aggregations, 1-row totals join",
    "k28_pipe_syntax"        -> "SQL pipe chain resolves to the standard two-phase agg + pushed filter",
    "p25_tpch_q3"            -> "Q3 verbatim: all three predicates pushed, top-10 as TakeOrderedAndProject",
    "j103_calibration_bins"  -> "calibration audit: one corpus scan collapses to <=10 bins before the ECE window",
    "j104_roc_auc"           -> "exact AUC: rank window runs over the bounded per-score histogram, never the corpus",
    "j105_ndcg"              -> "nDCG: 20-probe broadcast over ONE corpus scan; discount/ideal legs are bounded-relation algebra",
    "j108_graph_triangles"   -> "triangle census: checkpointed oriented edges, two equi-joins, three 1-row totals",
    "j113_mmr_rerank"        -> "MMR: corpus scanned once into checkpointed shortlist+sims; greedy steps are 20-row algebra")

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — headline physical plans (generated by `runMain graft.PlanReport`)\n\n")
    sb.append(s"Scale factor dir: `$sf`. Pre-AQE `sparkPlan` (deterministic shape);\n")
    sb.append("see PlanSpec/PlanLint for the asserted properties.\n")
    headline.foreach { case (key, why) =>
      val plan = SparkEntry.queries(key)(spark, sf).queryExecution.sparkPlan.toString
      sb.append(s"\n## `$key` — $why\n\n```\n")
      // trim very long lines (wide ReadSchemas) but keep the operators
      plan.linesIterator.take(40).foreach { l =>
        sb.append(if (l.length > 200) l.take(197) + "..." else l).append('\n')
      }
      sb.append("```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"PLANS.md written (${headline.size} plans)")
    spark.stop()
  }
}
