package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 batch-3 pins: the p8-p14 composite pipelines' at-scale plan
  * properties. The decisive ones are the DECORRELATIONS — p8's correlated
  * scalar aggregate, p9/p10's (NOT) EXISTS, p11's NOT IN — must all plan
  * as joins (aggregate-join / semi / anti), never as per-row rescans, and
  * the only intentional nested-loop is p9/p12's 1-row scalar broadcast. */
class Round16cSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def df(key: String) = SparkEntry.queries(key)(spark, TestSpark.sf)
  private def plan(key: String): String =
    df(key).queryExecution.executedPlan.toString

  test("p8/Q17: correlated avg decorrelates to one aggregate + join; part filter broadcast-prunes lineitem") {
    val p = plan("p8_tpch_q17")
    assert(!p.contains("CartesianProduct"))
    // the ~20-key part filter reaches lineitem as a broadcast hash join
    assert(p.contains("BroadcastHashJoin"), "part keys must broadcast")
    // exactly one grouped aggregate feeds the threshold join — the
    // fact table is scanned at most twice (probe + avg input), never
    // per-row: HashAggregate pairs (partial+final) for avg and the
    // final 1-row sum
    val li = "Scan parquet".r.findAllIn(p).size
    assert(li <= 4, s"expected <=4 scans (2 lineitem + 2 part), got $li")
  }

  test("p9/Q22: NOT EXISTS plans as an anti join, threshold as a 1-row broadcast") {
    val p = plan("p9_tpch_q22")
    assert(p.contains("LeftAnti"), "dormancy probe must be an anti join")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(o_orderdate"),
      "the dormancy date bound must reach the orders scan")
    // the scalar threshold is the one intentional nested-loop: 1 row
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("p10/Q21: EXISTS and NOT EXISTS both decorrelate to joins on l_orderkey") {
    val p = plan("p10_tpch_q21")
    assert(p.contains("LeftSemi"), "EXISTS must be a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must be an anti join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the suppkey inequality must ride the orderkey equi-join as a residual")
    assert(p.contains("TakeOrderedAndProject"), "top-100 must not global-sort")
    // the returnflag filter reaches both lineitem probe scans
    assert(p.contains("EqualTo(l_returnflag,R)"))
  }

  test("p11/Q16: NOT IN is a broadcast anti join; distinct-pair reduction precedes the part join") {
    val p = plan("p11_tpch_q16")
    assert(p.contains("LeftAnti"), "bad-supplier exclusion must anti-join")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("PushedFilters") && p.contains("p_brand"),
      "part attribute filters must reach the part scan")
  }

  test("p12/Q15: the revenue view's max is a 1-row broadcast over the aggregated relation") {
    val p = plan("p12_tpch_q15")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "quarter bound must reach the lineitem scan")
  }

  test("p13/Q13: left join preserves zero-order customers") {
    val p = plan("p13_tpch_q13")
    assert(p.contains("LeftOuter"), "must keep customers with no orders")
    val out = df("p13_tpch_q13").collect()
    assert(out.exists(_.getLong(0) == 0L),
      "the c_count=0 bucket must exist (zero-preservation)")
  }

  test("b8: LIKE ALL/ANY desugar to pushed Contains/StartsWith filters") {
    val p = plan("b8_like_quantified")
    assert(p.contains("StringContains(p_name,e)") &&
      p.contains("StringContains(p_name,d)"),
      "LIKE ALL conjuncts must reach PushedFilters")
    assert(p.contains("Or(StringStartsWith(p_typ"),
      "LIKE ANY disjunction must reach PushedFilters")
  }

  test("d35: listagg aggregates in two phases (partial + final)") {
    val p = plan("d35_listagg")
    assert(p.contains("partial_listagg"),
      "listagg must partial-aggregate map-side")
  }

  test("j67: one Generate, one gram exchange — per-n maxes fold conditionally") {
    val p = plan("j67_top_ngram_mass")
    val gens = "Generate explode".r.findAllIn(p).size
    assert(gens == 1, s"2- and 3-grams must ride ONE explode, got $gens")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"documents scanned at most twice, got $scans")
  }

  test("b9: LATERAL decorrelates to one grouped aggregate + join, never a per-row rescan") {
    val p = plan("b9_lateral_subquery")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "correlated lateral must become a join")
    assert(p.contains("HashAggregate"),
      "the lateral body must aggregate once by the correlation key")
  }

  test("k23: DISTRIBUTE BY is a hash exchange; SORT BY is a partition-LOCAL sort") {
    // graded key: the hash exchange survives; the outer ORDER BY
    // SUBSUMES the inner SORT BY (EliminateSorts drops the redundant
    // local sort — the optimizer behavior worth pinning)
    val p = plan("k23_distribute_sort_by")
    assert(p.contains("hashpartitioning(c_nationkey"),
      "DISTRIBUTE BY must hash-partition")
    assert(p.contains("REPARTITION_BY_COL"),
      "the exchange must be the user-requested repartition")
    // un-wrapped (no outer ORDER BY): SORT BY plans as a LOCAL sort
    // over the same exchange — Sort [...], false, 0
    val cust = graft.Tables.t(spark, TestSpark.sf, "customer")
    graft.ops.Views.unique(spark, "k23s_cust" -> cust) { v =>
      val q = spark.sql(
        s"SELECT * FROM ${v("k23s_cust")} DISTRIBUTE BY c_nationkey " +
          "SORT BY c_nationkey, c_custkey")
      val rp = q.queryExecution.executedPlan.toString
      assert(rp.contains("hashpartitioning(c_nationkey"))
      assert(
        "Sort \\[[^\\]]*\\], false, 0".r.findFirstIn(rp).isDefined,
        "SORT BY without an outer ORDER BY must be a partition-local sort")
      q
    }
    ()
  }

  test("j71: dispersion is scan-shaped — no self-join on the vectors") {
    val p = plan("j71_embed_dispersion")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "mean pairwise distance must come from moments, not pairs")
  }

  test("j74: nine thresholds sweep in ONE corpus pass — a single scan, no grid join") {
    val p = plan("j74_threshold_sweep")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"the sweep must fold as conditional sums, got $scans scans")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      "no grid join")
  }

  test("j75: exact-N sample is TakeOrdered on the hash axis, never a global sort of the corpus") {
    val p = plan("j75_sample_exact_n")
    assert(p.contains("TakeOrderedAndProject"),
      "ORDER BY md5 LIMIT n must plan as per-partition heaps")
  }

  test("a41: FAILFAST throws on the planted corrupt lines; PERMISSIVE reconciles counts") {
    // the graded key uses PERMISSIVE; here pin the failure MODE contract
    val out = graft.ops.Scratch.dir("a41_spec")
    import org.apache.spark.sql.functions._
    graft.Tables.t(spark, TestSpark.sf, "documents")
      .select(when(col("doc_id") % 97 === 0, lit("{\"doc_id\": oops"))
        .otherwise(concat(lit("{\"doc_id\": "), col("doc_id"), lit("}")))
        .as("value"))
      .coalesce(1).write.mode("overwrite").text(out)
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema("doc_id LONG")
        .option("mode", "FAILFAST").json(out).count()
    }
    assert(ex.getMessage.contains("Malformed") ||
      ex.getCause != null, "FAILFAST must surface the malformed line")
    // PERMISSIVE: good + corrupt = total lines
    // Spark disallows querying ONLY the corrupt column from the raw
    // source — cache the parsed relation first (the documented idiom)
    val got = spark.read.schema("doc_id LONG, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out).cache()
    val total = got.count()
    val bad = got.where(col("_corrupt_record").isNotNull).count()
    got.unpersist()
    val expectBad = graft.Tables.t(spark, TestSpark.sf, "documents")
      .where(col("doc_id") % 97 === 0).count()
    assert(bad == expectBad && total == 500L,
      s"quarantine must reconcile: total=$total bad=$bad expect=$expectBad")
  }

  test("p15/Q2: the multi-table correlated MIN decorrelates — no nested loop, per-part argmin as aggregate + join") {
    val p = plan("p15_tpch_q2")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("HashAggregate"),
      "min-cost-per-part must be ONE grouped aggregate")
  }

  test("p17/Q20: the nested-IN chain is semi joins, the demand scalar one grouped aggregate") {
    val p = plan("p17_tpch_q20")
    assert(p.contains("LeftSemi"), "both INs must decorrelate to semis")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "the demand year bound must reach the lineitem scan")
  }

  test("p18/Q6: every predicate pushed; single scan") {
    val p = plan("p18_tpch_q6")
    // the PushedFilters list is string-truncated in toString — assert a
    // truncation-proof prefix plus the quantity bound from the Filter node
    assert(p.contains("GreaterThanOrEqual(l_shipda"),
      "the shipdate bound must reach PushedFilters")
    assert("l_quantity#\\d+ < 24".r.findFirstIn(p).isDefined,
      "the quantity bound must be in the residual filter at least")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"Q6 is one scan, got $scans")
  }

  test("p19/Q4: EXISTS is one semi join feeding the grouped count") {
    val p = plan("p19_tpch_q4")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("CartesianProduct"))
  }

  test("p14/Q9: selective part filter broadcasts; no cartesian in the 5-table chain") {
    val p = plan("p14_tpch_q9")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("StringContains(p_name,red)") ||
      p.contains("p_name"), "p_name filter must reach the part scan")
  }
}
