package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-20 batch: deficit-redistribution epoch schedule + conversation-
  * level cross-template near-dedup. Each key is pinned by an INDEPENDENT
  * Scala recompute (a different code path from the Column/HOF
  * expressions under test) on top of the DuckDB hash gate.
  */
class Round20Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private val sf = TestSpark.sf
  private val Cap = 4L

  test("j119: water-filling matches an independent recompute; budget conserved") {
    val out = SparkEntry.queries("j119_epoch_redistribute")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val masses = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == masses.keySet)
    // independent recompute: capacity-point budget (4·Σn), round-1
    // uniform targets, then the SAME water-filling rounds in plain Scala
    // (share computed ONCE per round from the round-start state, every
    // unsaturated source absorbs min(share, headroom), terminate when
    // share hits 0)
    val srcs = masses.keys.toSeq.sorted
    val budget = Cap * masses.values.sum
    val target = budget / srcs.size
    val served1 = srcs.map(s => s -> math.min(Cap * masses(s), target)).toMap
    var pool = budget - served1.values.sum
    val extra = scala.collection.mutable.Map(srcs.map(_ -> 0L): _*)
    var rounds = 0
    var done = false
    while (!done) {
      rounds += 1
      val unsat = srcs.filter(s => Cap * masses(s) - served1(s) - extra(s) > 0)
      val share = if (unsat.nonEmpty) pool / unsat.size else 0L
      if (share <= 0) done = true
      else {
        val adds = unsat.map(s =>
          s -> math.min(share, Cap * masses(s) - served1(s) - extra(s)))
        adds.foreach { case (s, a) => extra(s) += a }
        pool -= adds.map(_._2).sum
      }
    }
    assert(rounds <= srcs.size + 1, "termination bound")
    srcs.foreach { s =>
      val r = out(s)
      assert(r.getLong(1) == masses(s), s"n_tokens $s")
      assert(r.getLong(2) == target, s"target $s")
      assert(r.getLong(3) == served1(s), s"served_r1 $s")
      assert(r.getLong(4) == extra(s), s"extra_tokens $s")
      val tot = served1(s) + extra(s)
      assert(r.getLong(5) == tot, s"served_total $s")
      assert(tot <= Cap * masses(s), s"repeat cap violated for $s")
      val epochs = if (masses(s) == 0) 0.0
        else math.round(tot.toDouble / masses(s) * 1e6) / 1e6
      assert(r.getDouble(6) == epochs, s"epochs $s")
      assert(r.getLong(7) == pool, s"residual $s")
    }
    // CONSERVATION (the key's defining identity): every budget token is
    // either served or explicitly residual
    assert(out.values.map(_.getLong(5)).sum + pool == budget,
      "served_total + residual must equal the budget exactly")
    // the second pass is genuinely EXERCISED at this regime: non-uniform
    // masses mean above-mean sources start with headroom and absorb
    // redistributed deficit tokens
    assert(extra.values.exists(_ > 0),
      "capacity-point regime must redistribute a nonzero amount")
    assert(out.values.exists(_.getLong(4) > 0))
    // pool == remaining headroom is invariant, so the fill ends
    // all-saturated up to integer crumbs: residual < |sources|
    assert(pool < srcs.size, s"residual $pool >= |S| ${srcs.size}")
    // termination is EXACT: the loop may only stop when no unsaturated
    // source can absorb a positive integer share
    val unsatEnd = srcs.count(s => Cap * masses(s) - served1(s) - extra(s) > 0)
    assert(unsatEnd == 0 || pool < unsatEnd,
      "terminated while a source could still absorb a positive share")
  }

  test("j120: planted cross-template duplicates pair at est_jac 1.0; raw-text dedup misses them") {
    val out = SparkEntry.queries("j120_dedup_conversation")(spark, sf).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // expected plants: doc N (N ≡ 8 mod 9) re-renders doc N−1's
    // conversation — pair (N−1, N) whenever the shared conversation has
    // ≥ 3 content tokens (shingling floor)
    val expected = docs.keySet.filter(n => n % 9 == 8 && docs.contains(n - 1))
      .filter { n =>
        val toks = docs(n - 1).replace('\n', ' ').replace('\r', ' ')
          .split(" ", -1)
        val nSyn = (2 + (n - 1) % 5).toInt
        toks.take(nSyn * 4).count(_.nonEmpty) >= 3
      }
      .map(n => (n - 1, n))
    assert(expected.nonEmpty, "fixture must contain planted re-renders")
    assert(expected.subsetOf(pairs),
      s"missing planted pairs: ${expected.diff(pairs)}")
    // identical conversation content -> identical signatures -> 1.0
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    expected.foreach(p => assert(byPair(p) == 1.0, s"est_jac $p"))
    // ONLY this key pairs them: the raw source texts differ, so document-
    // level MinHash dedup (j2b, same banding machinery) never emits them
    expected.foreach { case (a, b) =>
      assert(docs(a) != docs(b), s"fixture texts of $a/$b must differ")
    }
    val j2bPairs = SparkEntry.queries("j2b_dedup_minhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.intersect(j2bPairs).isEmpty,
      "raw-text dedup must NOT see the cross-template plants")
  }

  test("a16: spine plans as a distributed Range, never a sequence() array") {
    // regression pin for the r20 pathological find: a single corrupt
    // far-future timestamp once made the hour span ~70M, which the old
    // explode(sequence(lo, hi)) materialized as ONE in-memory array.
    // The committed sweep fixture is span-bounded (its results are
    // collect()ed), so the defect is pinned here at the PLAN level.
    val df = SparkEntry.queries("a16_time_spine")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Range "), s"spine must come from Range:\n$plan")
    assert(!plan.toLowerCase.contains("sequence("),
      "spine must not materialize a sequence() array")
  }

  test("a16: pre-epoch hour buckets FLOOR like the oracle's // (not truncate)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_a16floor").toString
    for (tbl <- Tables.names if tbl != "events") {
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(dir, s"$tbl.parquet"),
        java.nio.file.Paths.get(TestSpark.sf, s"$tbl.parquet"))
    }
    // 1969-12-31 23:30:00 UTC = -1800000 ms: hb must floor to -1, not
    // truncate to 0 (Spark `/`+cast truncates toward zero — the
    // Round13.floorDiv divergence class, r20 review finding)
    Seq((0L, "1969-12-31 23:30:00", 1L, "view", 1.0, "{}"),
        (1L, "1970-01-01 00:30:00", 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("a16_time_spine")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(-3600000L -> 1L, 0L -> 1L),
      s"pre-epoch bucket must floor (hour -1), got $out")
  }

  test("cleanCoord: NULL stays NULL; NaN -> 0; saturates at +-100; identity inside") {
    // pins the r20 review finding: Spark's greatest/least SKIP null
    // arguments, so an unguarded clamp turned NULL elements into -100 —
    // silently dragging centroid means (the null-riddled sweep only
    // asserts no-throw, so only a unit pin catches it)
    import spark.implicits._
    val out = Seq[java.lang.Double](null, Double.NaN, 1e30, -1e30, 0.5, -99.9)
      .toDF("x").select(graft.ops.LlmOps.cleanCoord(col("x")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(None, Some(0.0), Some(100.0), Some(-100.0),
      Some(0.5), Some(-99.9)))
  }

  test("j121: yield curve matches a recompute; monotone; threshold 0 = corpus") {
    val out = SparkEntry.queries("j121_filter_yield")(spark, sf)
      .collect().sortBy(_.getDouble(0))
    assert(out.length == 10, "one row per candidate threshold")
    // independent recompute of per-doc (score bin, token count)
    val j49 = SparkEntry.queries("j49_quality_logistic")(spark, sf)
    val scoreIdx = j49.schema.fieldNames.indexOf("score")
    val scores = j49.collect()
      .map(r => r.getLong(0) -> r.getDouble(scoreIdx)).toMap
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bins = scores.map { case (id, sc) =>
      id -> math.min(math.floor(sc * 10).toInt, 9) }
    val tDocs = bins.size
    // toSeq before map: bins.keys is a Set and mapping it to token
    // counts would collapse duplicate counts
    val tToks = bins.keys.toSeq.map(toks).sum
    out.foreach { r =>
      val t = math.round(r.getDouble(0) * 10).toInt
      val kept = bins.filter(_._2 >= t).keys.toSeq
      assert(r.getLong(1) == kept.size.toLong, s"docs_kept at $t")
      assert(r.getLong(2) == kept.map(toks).sum, s"toks_kept at $t")
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      assert(r.getDouble(3) == r6(kept.size.toDouble / tDocs), s"doc_frac $t")
      assert(r.getDouble(4) == r6(kept.map(toks).sum.toDouble / tToks),
        s"tok_frac $t")
    }
    // curve is monotone non-increasing in the threshold, and t=0 keeps all
    assert(out.sliding(2).forall(p => p(0).getLong(1) >= p(1).getLong(1)))
    assert(out.head.getLong(1) == tDocs && out.head.getLong(2) == tToks)
  }

  test("j122: survivors = union-find over j120 pairs; plants collapse to the A-render") {
    val out = SparkEntry.queries("j122_conversation_survivors")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val pairs = SparkEntry.queries("j120_dedup_conversation")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent recompute: plain-Scala union-find over the pair list
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == docs, "one row per corpus doc")
    out.foreach { case (id, cl, keep) =>
      assert(cl == find(id), s"cluster of $id")
      assert(keep == (cl == id), s"keep flag of $id")
    }
    // every planted (N−1, N) pair shares a cluster whose canonical
    // member is the A-rendered original, which is the one kept
    pairs.filter { case (a, b) => b % 9 == 8 && a == b - 1 }
      .foreach { case (a, b) =>
        val cl = out.find(_._1 == a).get._2
        assert(out.find(_._1 == b).get._2 == cl, s"plant $a/$b split")
        assert(!out.find(_._1 == b).get._3 || cl == b,
          s"re-render $b kept over an earlier canonical")
      }
  }
}
