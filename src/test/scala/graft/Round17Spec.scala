package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins.
  *
  * Session-state concurrency (r16 verdict item 6): the Spark-4 SQL
  * surface keys mutate session state — k19 DECLAREs a session variable,
  * k22 flips the scripting conf (in a child session) and registers temp
  * views. Their discipline is per-invocation unique names + finally-drops
  * (k22 additionally isolates its conf in `newSession()`), which is what
  * the dual-SF Verify regime relies on when two Verify drivers hit the
  * SAME shared SparkSession from different threads. This spec pins the
  * no-interference claim directly: run the state-mutating keys
  * concurrently against one session, several iterations per thread, and
  * require every interleaved result to equal the serial baseline.
  */
class Round17Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def rows(key: String): Seq[String] =
    SparkEntry.queries(key)(spark, TestSpark.sf)
      .collect().map(_.toString).toSeq

  test("k19 + k22 session-state keys are interference-free under concurrency") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global

    val keys = Seq("k19_session_vars", "k22_sql_script",
      "k20_execute_immediate")
    val baseline: Map[String, Seq[String]] =
      keys.map(k => k -> rows(k)).toMap

    // 2 threads per key × 3 iterations each, all in flight at once
    // against the SHARED session — the same shape as the driver's
    // dual-SF Verify regime.
    val futs = for {
      k <- keys; _ <- 1 to 2
    } yield Future((1 to 3).map { _ => k -> rows(k) })

    val outcomes = Await.result(Future.sequence(futs), 10.minutes).flatten
    outcomes.foreach { case (k, got) =>
      assert(got == baseline(k),
        s"$k produced a different result under concurrent session mutation")
    }
  }

  test("k26 recursion plans as UnionLoop with an equi-join frontier step") {
    val df = SparkEntry.queries("k26_recursive_cte")(spark, TestSpark.sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("UnionLoop"), "recursive CTE must plan as UnionLoop")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "the parent link must stay an equi-join (child DIV 2 = parent)")
    val rows = df.collect()
    assert(rows.length == 127)
    assert(rows.map(_.getLong(1)).max == 6L, "expected tree depth 6 at k<=127")
  }

  test("j82 weights form a distribution; j83 rank lists align") {
    val w = SparkEntry.queries("j82_mixture_temperature")(spark, TestSpark.sf)
      .collect().map(_.getDouble(2))
    assert(math.abs(w.sum - 1.0) < 1e-4, s"weights must sum to 1, got ${w.sum}")
    val m = SparkEntry.queries("j83_matryoshka_eval")(spark, TestSpark.sf)
      .collect()
    assert(m.length == 10 && m.map(_.getLong(0)).toSeq == (1L to 10L),
      "both rankings must emit aligned ranks 1..10")
    // both lists descend and stay in cosine range (rank-1 values are NOT
    // ordered across lists: fewer dims = higher cosine variance, so the
    // truncated top-1 routinely exceeds the full top-1 on random vectors)
    Seq(2, 4).foreach { c =>
      val sims = m.map(_.getDouble(c)).toSeq
      assert(sims == sims.sorted.reverse && sims.forall(s =>
        s >= -1.0 && s <= 1.0), s"col $c must descend within [-1,1]")
    }
  }

  test("b11 lateral LIMIT decorrelates to WindowGroupLimit, never a rescan") {
    val p = SparkEntry.queries("b11_lateral_topk")(spark, TestSpark.sf)
      .queryExecution.sparkPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "correlated LIMIT must plan as a group-limit, not a per-row subquery")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
    // the outer c_custkey <= 50 bound must be inferred onto the orders side
    assert(p.contains("(o_custkey") && p.contains("<= 50)"),
      "outer filter must transfer to the lateral input")
  }

  test("m15 parses both byte orders and stays map-only") {
    val df = SparkEntry.queries("m15_parse_exif")(spark, TestSpark.sf)
    val rows = df.collect()
    assert(rows.map(_.getString(1)).toSet == Set("II", "MM"))
    // decode must be one scan + projection (plus the output sort):
    // content bytes never shuffle through a join or aggregate
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p.take(400))
  }

  test("p21 self-joined aggregate reuses ONE exchange") {
    val df = SparkEntry.queries("p21_yoy_selfjoin_reuse")(spark, TestSpark.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("TableCacheQueryStage")
      || p.contains("ReusedQueryStage"),
      s"the (pri, yr) aggregate must materialize once for both join sides:\n${p.take(600)}")
  }

  test("j84 novelty: doc 0 introduces everything it has; fractions in [0,1]") {
    val rows = SparkEntry.queries("j84_ngram_novelty")(spark, TestSpark.sf)
      .collect()
    val first = rows.find(_.getLong(0) == 0L).get
    assert(first.getLong(1) == first.getLong(2),
      "the first doc in ingestion order introduces all of its grams")
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("k27 hint flips broadcast to sort-merge; results hint-invariant") {
    val hinted = SparkEntry.queries("k27_join_hints")(spark, TestSpark.sf)
    assert(hinted.queryExecution.sparkPlan.toString.contains("SortMergeJoin"),
      "SHUFFLE_MERGE hint must force SMJ")
    import org.apache.spark.sql.functions._
    val o = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
    val c = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
    val unhinted = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")), 4)
          .cast("double").as("rev"))
      .orderBy("c_mktsegment")
    assert(unhinted.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"),
      "customer is broadcast-sized here; without the hint it must broadcast")
    assert(hinted.collect().toSeq == unhinted.collect().toSeq,
      "join strategy must never change the result")
  }

  test("integer identities: j87 quotas sum to N; j85 waste closes the books") {
    val q = SparkEntry.queries("j87_quota_sample")(spark, TestSpark.sf)
      .collect()
    assert(q.length == 100, s"quota sample must emit exactly N=100 rows")
    val j85 = SparkEntry.queries("j85_pack_efficiency")(spark, TestSpark.sf)
      .collect()
    j85.foreach { r =>
      val (l, bins, tok, waste) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))
      assert(bins * l - tok == waste, s"waste identity broken at L=$l")
    }
    // longer contexts always pack no worse in bins and no better in waste
    assert(j85.map(_.getLong(1)).toSeq == j85.map(_.getLong(1)).toSeq
      .sorted.reverse, "bin count must fall as max_len grows")
  }

  test("j89 confusion matrix is total and never self-referential") {
    val rows = SparkEntry.queries("j89_centroid_confusion")(
      spark, TestSpark.sf).collect()
    val nLabels = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select("label").distinct().count()
    assert(rows.length == nLabels, "one row per label")
    assert(rows.forall(r => r.getInt(0) != r.getInt(1)),
      "nearest centroid must be foreign")
  }

  test("j79 stage-cache knob changes the plan, never the result") {
    val cached = rows("j79_data_recipe")
    spark.conf.set(ops.Knobs.RecipeStageCacheKey, "false")
    try {
      val lazyRows = rows("j79_data_recipe")
      assert(lazyRows == cached,
        "recipe output must be knob-invariant (KnobsSpec contract)")
    } finally spark.conf.unset(ops.Knobs.RecipeStageCacheKey)
  }
}
