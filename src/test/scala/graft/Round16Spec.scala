package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pins: the weighted prefix filter's losslessness (j60b must
  * equal j60's capped-pair-core output exactly — the PPJoin principle
  * generalized to multisets has provable recall 1.0, so any divergence is
  * a bug, not sketch noise), and the spans-only j56b's agreement with
  * j56's full-text spelling on the shared stats columns. */
class Round16Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def run(key: String) = SparkEntry.queries(key)(spark, TestSpark.sf)

  test("j60b weighted prefix filter is output-identical to j60's capped pair core") {
    val exact = run("j60_dedup_weighted").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = run("j60b_dedup_weighted_prefix").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact == pref,
      s"only-exact: ${exact -- pref}; only-prefix: ${pref -- exact}")
    assert(exact.nonEmpty)
  }

  test("j60b prefix index drops the boilerplate tail (hot types never indexed) and stays lossless") {
    import spark.implicits._
    // production-shaped micro-corpus: type 99 is boilerplate (df 3, the
    // max — every doc carries it) but is a SMALL fraction of each doc's
    // weight, like a shared header in real text. Canonical order is
    // (df asc, sh asc) → 99 sorts LAST; with τ = 0.5 each doc's prefix
    // bound is tot − ⌈tot/2⌉ and the boilerplate's cum_before (all the
    // rare mass precedes it) exceeds the bound in every doc.
    // (A hot type carrying MOST of a doc's weight legitimately belongs
    // in its prefix — a pair can qualify on boilerplate alone then; the
    // filter adapts per doc, which is exactly its correctness property.)
    val tf = Seq(
      (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (1L, 5L, 1L),
      (1L, 11L, 1L), (1L, 12L, 1L), (1L, 99L, 1L),            // tot 8
      (2L, 1L, 1L), (2L, 2L, 1L), (2L, 3L, 1L), (2L, 4L, 1L), (2L, 5L, 1L),
      (2L, 13L, 1L), (2L, 14L, 1L), (2L, 99L, 1L),            // tot 8
      (3L, 21L, 1L), (3L, 22L, 1L), (3L, 23L, 1L), (3L, 24L, 1L),
      (3L, 25L, 1L), (3L, 26L, 1L), (3L, 99L, 1L)             // tot 7
    ).toDF("doc_id", "sh", "c")
    val tot = Seq((1L, 8L), (2L, 8L), (3L, 7L)).toDF("doc_id", "tot")
    val prefix = ops.Round16.weightedPrefix(tf, tot, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hot type is in NO prefix — the heavy-key join mass is gone
    assert(!prefix.exists(_._2 == 99L), s"boilerplate type indexed: $prefix")
    // losslessness: docs 1,2 share types 1-5 and 99 → Σmin = 6,
    // wjac = 6/(8+8-6) = 0.6 ≥ 0.5 — the pair keeps a shared PREFIX
    // witness among its rare types (cum_before ≤ 4 ⇒ types 1-3 at least)
    assert(prefix.contains((1L, 1L)) && prefix.contains((2L, 1L)),
      s"qualifying pair lost its prefix witness: $prefix")
  }

  test("j60c ICWS sketch recovers the exact weighted near-dup pairs (j60)") {
    val exact = run("j60_dedup_weighted").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val icws = run("j60c_dedup_weighted_icws").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // fixture pairs all sit at wjac ≥ 0.9 → 8×2 banding recall ≈ 1−2e-6;
    // the exact re-score kills false positives, so equality is the bar
    assert(exact == icws,
      s"only-exact: ${exact -- icws}; only-icws: ${icws -- exact}")
    assert(icws.nonEmpty)
  }

  test("ICWS slot-match rate estimates weighted Jaccard (the Ioffe property)") {
    // two hand-built bags with known J_w = Σmin/Σmax: run the j60c slot
    // computation standalone over K=256 slots and check the agreement
    // rate lands near J_w (binomial 3σ). Pinning the ESTIMATOR (not just
    // the end-to-end key, whose exact re-score would mask a broken
    // sketch that still finds candidates).
    import spark.implicits._
    val K = 256
    val tf = (Seq((1L, 10L, 4L), (1L, 11L, 2L), (1L, 12L, 2L)) ++
      Seq((2L, 10L, 2L), (2L, 11L, 2L), (2L, 13L, 4L)))
      .toDF("doc_id", "sh", "c")
    // J_w = (min(4,2)+min(2,2)+0+0) / (max over union: 4+2+2+4) = 4/12
    val jw = 4.0 / 12.0
    val sig = ops.Round16.icwsSlots(tf, K)
    val bySlot = sig.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getStruct(2)).toMap
    val matches = (0L until K).count(k => bySlot((1L, k)) == bySlot((2L, k)))
    val rate = matches.toDouble / K
    val sigma = math.sqrt(jw * (1 - jw) / K)
    assert(math.abs(rate - jw) <= 3 * sigma + 1e-9,
      f"ICWS match rate $rate%.3f vs J_w $jw%.3f (3σ = ${3 * sigma}%.3f)")
  }

  test("j56b stats agree with j56's full-text output (dup_tokens, n_tokens)") {
    val full = run("j56_substring_dedup").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val spans = run("j56b_substring_spans").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(full.keySet == spans.keySet)
    full.foreach { case (id, (nTok, dupTok)) =>
      val (nTok2, dupTok2, nSpans) = spans(id)
      assert(nTok2 == nTok && dupTok2 == dupTok, s"doc $id stats diverge")
      // spans partition the covered positions: 0 ≤ n_spans ≤ dup_tokens,
      // and spans exist iff covered tokens exist
      assert((nSpans == 0) == (dupTok == 0), s"doc $id span/token mismatch")
      assert(nSpans <= dupTok)
    }
  }

  test("a35: nested-struct schema pruning and nested-field pushdown reach the scan") {
    val df = run("a35_nested_struct_prune")
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    // ReadSchema carries only the selected nested leaf — the struct's
    // other field and the whole payload struct never leave the footer
    assert(scan.contains("meta") && scan.contains("event_type"),
      s"nested leaf missing from scan: $scan")
    assert(!scan.contains("payload"), s"unused struct not pruned: $scan")
    // the nested-field predicate reaches PushedFilters
    assert(scan.contains("PushedFilters") && scan.contains("meta.user_id"),
      s"nested filter not pushed: $scan")
  }

  test("c19: null-safe equality plans as a HASHED join key (no nested loop)") {
    val plan = run("c19_join_null_safe").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"null-safe join fell back to a non-hashed strategy:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hashed/merge join:\n$plan")
  }

  test("k16 bound query prunes and pushes down like the literal form") {
    val df = run("k16_param_query")
    val plan = df.queryExecution.executedPlan.toString
    // the bound o_orderdate/o_orderstatus predicates must reach the scan
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_orderstatus") && plan.contains("o_orderdate"),
      s"bound filters did not push down:\n$plan")
  }
}
