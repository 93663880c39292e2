package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-15 keys whose corpus-statistical paths
  * are oracle-hash-checked: a34 VARIANT extraction (strict vs try, type
  * casting, missing paths), j57 filtered-ANN invariants. */
class Round15Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("a34: variant_get strict/try semantics and typed casting") {
    val r = spark.sql("""SELECT
        variant_get(parse_json('{"a": {"b": [1, 2.5, "x"]}}'), '$.a.b[1]', 'double') AS d,
        variant_get(parse_json('{"n": 42}'), '$.n', 'string') AS cast_str,
        try_variant_get(parse_json('{"n": 42}'), '$.missing', 'bigint') AS miss,
        try_variant_get(parse_json('{"n": "abc"}'), '$.n', 'bigint') AS badcast
      """).collect().head
    assert(r.getDouble(0) == 2.5)       // nested array index path
    assert(r.getString(1) == "42")      // numeric → string cast succeeds
    assert(r.isNullAt(2))               // missing path → NULL under try
    assert(r.isNullAt(3))               // uncastable → NULL under try
    // strict variant_get on an uncastable value is an analysis/runtime
    // ERROR, not a silent null — the try_ form is the lenient one
    intercept[Exception] {
      spark.sql("""SELECT variant_get(parse_json('{"n": "abc"}'), '$.n', 'bigint')""")
        .collect()
    }
  }

  test("h35: try_* yields NULL exactly where the strict ANSI form throws") {
    // Spark 4 default is ANSI mode: the strict forms must ERROR on the
    // same inputs the try_ forms null out — if ansi were silently off,
    // these intercepts fail and the h35 key would be grading nothing
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    def one(q: String) = spark.sql(s"SELECT $q AS x").collect().head
    assert(one("try_divide(1.0, 0)").isNullAt(0))
    intercept[Exception](one("1.0 / 0"))
    assert(one("try_add(9223372036854775807, 1)").isNullAt(0))
    intercept[Exception](one("9223372036854775807 + 1"))
    assert(one("try_cast('x' AS INT)").isNullAt(0))
    intercept[Exception](one("CAST('x' AS INT)"))
    assert(one("try_element_at(array(1), 2)").isNullAt(0))
    intercept[Exception](one("element_at(array(1), 2)"))
    // the measured trap pinned: index 0 throws THROUGH try_element_at
    intercept[Exception](one("try_element_at(array(1), 0)"))
  }

  test("k14: LATERAL VIEW OUTER keeps singleton groups with NULL pos/v") {
    val rows = SparkEntry.queries("k14_hive_dialect_struct")(spark, TestSpark.sf)
      .collect()
    val singletons = rows.filter(_.getLong(2) == 1L) // n == 1 → arr NULL
    assert(singletons.nonEmpty, "fixture must exercise the OUTER path")
    assert(singletons.forall(r => r.isNullAt(5) && r.isNullAt(6)),
      "OUTER must preserve the row with NULL pos/v")
    val exploded = rows.filter(_.getLong(2) >= 2L)
    assert(exploded.nonEmpty)
    assert(exploded.forall(r => !r.isNullAt(5)),
      "non-singleton groups explode their 2-element array")
  }

  test("g7: non-terminating recursion ERRORS at the level limit (no hang), limit is a knob") {
    // the runaway guard behind the graded ancestor walk: a recursive CTE
    // whose step never empties must surface the engine's recursion-level
    // error — bounded failure, not an unbounded loop of shuffle rounds
    val limitKey = "spark.sql.cteRecursionLevelLimit"
    val prior = spark.conf.getOption(limitKey)
    try {
      spark.conf.set(limitKey, "20")
      val e = intercept[Throwable] {
        spark.sql("""WITH RECURSIVE r(n) AS (
            SELECT 1 UNION ALL SELECT n + 1 FROM r)
          SELECT count(*) AS c FROM r""").collect()
      }
      val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
        .toUpperCase
      assert(msg.contains("RECURSION"), s"expected a recursion-limit error, got: $e")
      // ... and a limit ABOVE the fixpoint depth changes nothing: the
      // graded walk terminates from its own empty-frontier condition
      spark.conf.set(limitKey, "50")
      val depth = ops.Round15.all.find(_.key == "g7_recursive_cte").get
        .fn(spark, TestSpark.sf)
        .agg(org.apache.spark.sql.functions.max("depth")).head().getLong(0)
      val maxCk = Tables.t(spark, TestSpark.sf, "customer")
        .where(org.apache.spark.sql.functions.col("c_custkey") < 500)
        .agg(org.apache.spark.sql.functions.max("c_custkey")).head().getLong(0)
      // ⌊log2 maxCk⌋ rounds to fixpoint — terminates well inside the rail
      assert(depth == (63 - java.lang.Long.numberOfLeadingZeros(maxCk)).toLong)
    } finally prior match {
      case Some(v) => spark.conf.set(limitKey, v)
      case None    => spark.conf.unset(limitKey)
    }
  }

  test("g7: the recursion step reads ONLY the filtered previous frontier (row-bounded)") {
    // plan-shape rail: the step branch must be Filter(ak > 1) over
    // UnionLoopRef — each round's input is the live frontier, not the
    // accumulated closure and not a re-scan of the base relation
    val df = ops.Round15.all.find(_.key == "g7_recursive_cte").get
      .fn(spark, TestSpark.sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("UnionLoopRef"), s"recursive plan lost its loop ref:\n$plan")
    val lines = plan.linesIterator.toSeq
    val refIdx = lines.indexWhere(_.contains("UnionLoopRef"))
    val guarded = lines.slice(math.max(0, refIdx - 3), refIdx)
      .exists(l => l.contains("Filter") && l.contains("> 1"))
    assert(guarded, s"no frontier filter directly above UnionLoopRef:\n$plan")
    // the step must NOT rescan the parquet base relation — one scan total
    // (the anchor); the loop ref is the only step input
    assert(lines.count(_.contains("Relation")) +
      lines.count(_.contains("FileScan")) <= 1,
      s"recursion step re-scans the base relation:\n$plan")
  }

  test("j57: filtered top-5 is the label-restricted exact ranking") {
    val rows = SparkEntry.queries("j57_filtered_ann")(spark, TestSpark.sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getInt(1) == 3), "every survivor carries the filter label")
    val cos = rows.map(_.getDouble(2)).toSeq
    assert(cos == cos.sorted.reverse, "ranked by similarity desc")
    // cross-check against the unfiltered exact ranking: the filtered
    // top-5 must equal (full ranking restricted to label 3).take(5) —
    // the under-recall a post-filtered ANN shortlist would show here
    val emb = graft.Tables.t(spark, TestSpark.sf, "embeddings")
    val probe = emb.where(col("vec_id") === 0).select(col("embedding").as("e0"))
    val full = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        round(graft.expressions.CosineSimilarity(spark, col("embedding"), col("e0")), 6)
          .as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .collect()
    val expect = full.filter(_.getInt(1) == 3).take(5)
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(rows.map(r => (r.getLong(0), r.getDouble(2))).toSeq == expect)
  }
}
