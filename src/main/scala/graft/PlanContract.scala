package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape contract for the 74 SURVEY-§3 contract keys (r17 verdict
  * item 6): every contract key gets at least one asserted headline
  * property on its executed physical plan, so "the plan you'd want at
  * 100×" is a mechanical gate, not a sampled claim. ContractPlanSpec
  * runs the sweep in `sbt test`; PlanLint prints the asserted-key count
  * next to SMELLS so the closing gate records coverage.
  *
  * Checks are STRING predicates over `executedPlan.toString` — the same
  * surface PlanLint counts on (exchange placement only exists after
  * EnsureRequirements; `sparkPlan` has no Exchange nodes at all). Every
  * registry key sorts its output for hash stability, so ONE
  * rangepartitioning exchange is part of the harness shape, never a
  * smell — the map-only assertion therefore bans `Exchange
  * hashpartitioning` (a real shuffle), not the output sort.
  *
  * Each family's headline property (what breaks first at 1000
  * executors): scans → pushdown/pruning reaches the FileScan and a
  * LIMIT stays TakeOrderedAndProject; filters → predicates in
  * PushedFilters, IN-subquery → semi join; joins → the RIGHT strategy
  * (broadcast vs SMJ vs semi/anti, cross stays broadcast-NLJ);
  * aggregation → two-phase hash (partial below final), grouping
  * analytics → exactly one Expand; windows → Window exec, rank-k →
  * WindowGroupLimit; top-k → never a full sort; set ops → semi/anti
  * rewrite; scalar families → map-only (no hash exchange, no join, no
  * agg the expression didn't need); llm/udx → candidates via equi-join,
  * no cartesian anywhere.
  */
object PlanContract {

  final case class Check(name: String, ok: String => Boolean)

  private def has(t: String) = Check(s"has:$t", _.contains(t))
  private def not(t: String) = Check(s"not:$t", !_.contains(t))
  private def atLeast(n: Int, t: String) =
    Check(s"ge$n:$t", p => countOf(p, t) >= n)
  private def exactly(n: Int, t: String) =
    Check(s"eq$n:$t", p => countOf(p, t) == n)
  private def countOf(p: String, t: String): Int = {
    var i = 0; var n = 0
    while ({ i = p.indexOf(t, i); i >= 0 }) { n += 1; i += t.length }
    n
  }
  /** Non-empty parquet pushdown: `PushedFilters: [` with content. */
  private val pushedNonEmpty = Check("pushed-filters-nonempty", p =>
    p.linesIterator.exists(l =>
      l.contains("PushedFilters: [") && !l.contains("PushedFilters: []")))
  /** Projection pruning visible in the scan: every ReadSchema in the
    * plan carries at most `maxCols` columns. */
  private def readSchemaAtMost(maxCols: Int) =
    Check(s"readschema<=${maxCols}cols", p =>
      p.linesIterator.filter(_.contains("ReadSchema:")).forall { l =>
        l.substring(l.indexOf("ReadSchema:")).count(_ == ',') <= maxCols - 1
      })
  private val noNlj =
    Seq(not("BroadcastNestedLoopJoin"), not("CartesianProduct"))
  /** Map-only modulo the harness output sort: no data shuffle, no join,
    * no aggregation. ("Join"/"HashAggregate" are substrings of every
    * join/agg exec name, incl. the broadcast and object variants.) */
  private val mapOnly = Seq(not("Exchange hashpartitioning"),
    not("Join"), not("HashAggregate"), not("CartesianProduct"))
  /** Two-phase hash aggregation: >=2 HashAggregate execs (the substring
    * also matches ObjectHashAggregate — partial+final object hash is the
    * same scale property for sketch/collect aggregates). */
  private val twoPhaseAgg = atLeast(2, "HashAggregate")

  /** key → asserted headline properties. ContractPlanSpec pins that this
    * key set is EXACTLY the 74 SURVEY contract keys. */
  val checks: Map[String, Seq[Check]] = Map(
    // ---- a: scans / sources / sinks ----
    "a1_scan_full"        -> (has("FileScan parquet") +: mapOnly),
    "a2_scan_project"     -> (readSchemaAtMost(3) +: mapOnly),
    "a3_scan_time_range"  -> (pushedNonEmpty +: mapOnly),
    "a4_scan_limit"       -> Seq(has("TakeOrderedAndProject"),
                                 not("Exchange hashpartitioning")),
    "a5_read_job"         -> (twoPhaseAgg +: noNlj),
    "a6_catalog"          -> (has("Union") +: noNlj),
    "a7_sink_append"      -> (has("FileScan parquet") +: mapOnly),
    "a8_sink_replace_fail" -> (has("FileScan parquet") +: mapOnly),
    "a9_time_synthesis"   -> (has("FileScan parquet") +: mapOnly),
    "a10_source_json"     -> mapOnly,
    // ---- b: project / filter ----
    "b1_project_arith"    -> (has("Project") +: mapOnly),
    "b2_filter_compound"  -> (pushedNonEmpty +: mapOnly),
    "b3_filter_like_regex" -> (pushedNonEmpty +: mapOnly),
    "b4_filter_in_subquery" -> (Seq(has("LeftSemi"), pushedNonEmpty) ++ noNlj),
    // ---- c: joins ----
    "c1_join_inner"       -> (has("BroadcastHashJoin") +: noNlj),
    "c2_join_broadcast"   -> (has("BroadcastHashJoin") +: noNlj),
    "c3_join_shuffle"     -> (Seq(has("SortMergeJoin"),
                                  not("BroadcastHashJoin")) ++ noNlj),
    "c4_join_left"        -> (Seq(has("LeftOuter"),
                                  has("BroadcastHashJoin")) ++ noNlj),
    "c5_join_full"        -> (Seq(has("FullOuter"),
                                  has("SortMergeJoin")) ++ noNlj),
    "c6_join_semi"        -> (has("LeftSemi") +: noNlj),
    "c7_join_anti"        -> (has("LeftAnti") +: noNlj),
    // c8 IS the cross product — the check is that it stays a broadcast
    // NLJ (bounded side broadcast), never a shuffled cartesian
    "c8_join_cross"       -> Seq(has("BroadcastNestedLoopJoin"),
                                 not("CartesianProduct")),
    // theta (non-equi) join must still find its equi core
    "c9_join_theta"       -> (has("BroadcastHashJoin") +: noNlj),
    "c10_join_asof"       -> (Seq(has("Window"), pushedNonEmpty) ++ noNlj),
    // ---- d: aggregation ----
    "d1_agg_groupby"      -> (twoPhaseAgg +: noNlj),
    "d2_agg_distinct"     -> (atLeast(4, "HashAggregate") +: noNlj),
    "d3_agg_multidistinct" -> (Seq(exactly(1, "Expand"), twoPhaseAgg) ++ noNlj),
    "d4_agg_rollup"       -> (Seq(exactly(1, "Expand"), twoPhaseAgg) ++ noNlj),
    "d5_agg_cube"         -> (Seq(exactly(1, "Expand"), twoPhaseAgg) ++ noNlj),
    "d6_agg_grouping_sets" -> (Seq(exactly(1, "Expand"), twoPhaseAgg) ++ noNlj),
    "d7_agg_approx_distinct" -> (atLeast(2, "ObjectHashAggregate") +: noNlj),
    "d8_agg_percentile"   -> (atLeast(2, "ObjectHashAggregate") +: noNlj),
    "d9_agg_having"       -> (Seq(twoPhaseAgg,
        Check("having-filter-above-agg", p =>
          p.indexOf("Filter") >= 0 &&
          p.indexOf("Filter") < p.indexOf("HashAggregate"))) ++ noNlj),
    "d10_agg_stats"       -> (twoPhaseAgg +: noNlj),
    "d11_agg_collect"     -> (atLeast(2, "ObjectHashAggregate") +: noNlj),
    // ---- e: windows ----
    "e1_win_rank"         -> (has("Window") +: noNlj),
    "e2_win_lag_lead"     -> (has("Window") +: noNlj),
    "e3_win_runsum"       -> (has("Window") +: noNlj),
    "e4_win_moving"       -> (has("Window") +: noNlj),
    "e5_win_first_last"   -> (has("Window") +: noNlj),
    "e6_win_ntile"        -> (has("Window") +: noNlj),
    // rank<=k must push below the window as a group-limit at scale
    "e7_topk_per_group"   -> (has("WindowGroupLimit") +: noNlj),
    // ---- f: sort / top-k ----
    "f1_sort_multi"       -> (has("Sort") +: mapOnly),
    "f2_topk_global"      -> Seq(has("TakeOrderedAndProject"),
                                 not("Exchange")),
    // ---- g: set ops ----
    "g1_union_all"        -> (Seq(has("Union"),
                                  not("Exchange hashpartitioning")) ++ noNlj),
    "g2_union_distinct"   -> (Seq(has("Union"), twoPhaseAgg) ++ noNlj),
    "g3_intersect"        -> (Seq(has("LeftSemi"), twoPhaseAgg) ++ noNlj),
    "g4_except"           -> (Seq(has("LeftAnti"), twoPhaseAgg) ++ noNlj),
    // ---- h: scalar expression families ----
    "h1_str"              -> mapOnly,
    "h2_date"             -> mapOnly,
    "h3_td_time_range"    -> (pushedNonEmpty +: mapOnly),
    "h4_math"             -> mapOnly,
    "h5_json"             -> mapOnly,
    "h6_array"            -> mapOnly,
    "h7_map"              -> mapOnly,
    "h8_case_cond"        -> mapOnly,
    "h9_cast"             -> mapOnly,
    "h10_sessionize"      -> (Seq(has("Window"),
        // the two window passes share one shuffle (PlanSpec's pin)
        exactly(1, "Exchange hashpartitioning")) ++ noNlj),
    // ---- i: streaming semantics, batch-checkable legs ----
    "i1_win_tumbling"     -> (Seq(twoPhaseAgg, pushedNonEmpty) ++ noNlj),
    "i2_win_sliding"      -> (Seq(has("Expand"), twoPhaseAgg) ++ noNlj),
    "i3_win_session"      -> (twoPhaseAgg +: noNlj),
    "i4_watermark_late"   -> noNlj,
    "i5_stream_dedup"     -> noNlj,
    "i6_stream_ingest"    -> noNlj,
    // ---- j: LLM-pipeline headliners ----
    "j1_dedup_exact"      -> (twoPhaseAgg +: noNlj),
    "j2_dedup_near"       -> noNlj,
    // j3's 1-row probe broadcast is the PlanLint-allowlisted BNLJ; the
    // headline property is the heap-based top-k (no full sort)
    "j3_sim_topk"         -> Seq(has("TakeOrderedAndProject"),
                                 not("CartesianProduct")),
    "j4_text_tf"          -> (Seq(has("Generate"),
                                  has("WindowGroupLimit")) ++ noNlj),
    "j5_text_stats"       -> (twoPhaseAgg +: noNlj),
    "j6_multimodal_join"  -> (has("BroadcastHashJoin") +: noNlj),
    "j7_embed_agg"        -> (twoPhaseAgg +: noNlj),
    // ---- k: user extensions ----
    "k1_udf_scalar"       -> (not("BatchEvalPython") +: mapOnly),
    "k2_udaf_weighted_mean" -> (atLeast(2, "ObjectHashAggregate") +: noNlj),
    "k3_udtf_ngrams"      -> (has("Generate") +: mapOnly)
  )

  val contractKeys: Seq[String] = checks.keys.toSeq.sorted

  /** Run every check; returns (key, failed-check-names) for failures. */
  def evaluate(spark: SparkSession, sf: String): Seq[(String, Seq[String])] =
    contractKeys.flatMap { key =>
      // executedPlan (PlanLint's surface), NOT sparkPlan: exchange
      // placement only exists after EnsureRequirements, and "no shuffle
      // here" is half the contract
      val planOrErr =
        try Right(SparkEntry.queries(key)(spark, sf)
          .queryExecution.executedPlan.toString)
        catch { case e: Throwable => Left(s"plan-error: ${e.getMessage}") }
      // a key that cannot even plan must FAIL the sweep — an error
      // string would vacuously satisfy every negative-only check set
      val failed = planOrErr match {
        case Left(err)   => Seq(err.take(120))
        case Right(plan) =>
          checks(key).collect { case c if !c.ok(plan) => c.name }
      }
      if (failed.isEmpty) None else Some(key -> failed)
    }
}
