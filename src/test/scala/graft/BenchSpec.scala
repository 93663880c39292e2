package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench protocol helpers that shape the driver artifact —
  * above all the r19 verdict item 1 fix: the mover self-adjudication
  * diff must be scale-factor-aware (BENCH_r19 shipped 42 cross-SF noise
  * movers because a builder sf0.001 sanity run had seeded
  * target/bench_full.json and the diff never checked its `sf`). */
class BenchSpec extends AnyFunSuite {

  test("parsePriorBench extracts the queries map and the recorded sf") {
    val (qs, sf) = Bench.parsePriorBench(
      """{"metric":"total","value":1.0,"queries":{"q1":0.416,"q2":2},
         "sf":"/root/testdata/sf0.001"}""")
    assert(qs == Map("q1" -> 0.416, "q2" -> 2.0))
    assert(sf.contains("/root/testdata/sf0.001"))
  }

  test("moversOf SKIPS with an explicit reason on a cross-SF history") {
    // the exact r19 contamination shape: prior run at sf0.001, current at
    // sf0.1 — j51's 0.416 s vs 7.8 s is a meaningless 18x "mover"
    val (movers, skipped) = Bench.moversOf(
      results = Seq("j51_dedup_editdist" -> 7.788),
      prevQs = Map("j51_dedup_editdist" -> 0.416),
      prevSf = Some("/root/testdata/sf0.001"),
      curSf = "/root/testdata/sf0.1")
    assert(movers.isEmpty, "cross-SF history must produce NO movers")
    assert(skipped.exists(_.startsWith("sf_mismatch")), s"got $skipped")
  }

  test("moversOf SKIPS when the prior artifact carries no sf field") {
    val (movers, skipped) = Bench.moversOf(
      Seq("q1" -> 2.0), Map("q1" -> 0.5), prevSf = None, curSf = "/x/sf0.1")
    assert(movers.isEmpty && skipped.exists(_.contains("prev=unknown")))
  }

  test("moversOf flags same-SF >=1.5x movers both ways, up-movers first") {
    val sf = "/root/testdata/sf0.1"
    val (movers, skipped) = Bench.moversOf(
      results = Seq("up" -> 3.0, "down" -> 1.0, "steady" -> 1.4,
        "jitter" -> 0.45, "fresh" -> 9.9),
      prevQs = Map("up" -> 1.0, "down" -> 2.0, "steady" -> 1.0,
        "jitter" -> 0.1),
      prevSf = Some(sf), curSf = sf)
    assert(skipped.isEmpty)
    // steady (1.4x) below threshold; jitter exempt (both < 0.5 s);
    // fresh has no history; up-mover sorts ahead of down-mover
    assert(movers.map(_._1) == Seq("up", "down"))
    assert(movers.head._2 == (1.0, 3.0))
  }

  test("moversOf with no history yields no movers and no skip reason") {
    val (movers, skipped) =
      Bench.moversOf(Seq("q1" -> 2.0), Map.empty, None, "/x/sf0.1")
    assert(movers.isEmpty && skipped.isEmpty)
  }

  test("untimed control warm-up runs clean before the timed bracket") {
    // r20 verdict item 4: the bracket must open JIT-warm. warmControl is
    // the exact code path main calls before controlStart; it must execute
    // the control key end-to-end and report success.
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      assert(Bench.warmControl(spark, "/root/testdata/sf0.001"),
        "control warm-up must run the control key clean")
      // and the key it warms is the key the bracket times
      assert(Bench.controlKey == "j2_dedup_near")
    } finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
  }

  test("repoRoot anchors manifest + round detection to the checkout") {
    // sbt test runs from the repo root, but the anchor must come from the
    // build.sbt walk, not the cwd accident the r19 advice flagged
    assert(java.nio.file.Files.exists(Bench.repoRoot.resolve("build.sbt")))
    assert(java.nio.file.Files.exists(Bench.manifestPath),
      "committed registry manifest must resolve against the repo root")
    // every manifest key is a registry key (renames warn; the manifest is
    // regenerated at round close so it trails the registry, never leads)
    val reg = SparkEntry.registry.map(_.key).toSet
    import scala.jdk.CollectionConverters._
    val prior = java.nio.file.Files.readAllLines(Bench.manifestPath).asScala
      .map(_.trim).filter(_.nonEmpty).toSet
    assert(prior.subsetOf(reg), s"manifest keys absent from registry: ${prior.diff(reg)}")
    // debut detection = registry minus manifest
    assert(Bench.newKeys(reg.toSeq.sorted) == reg.diff(prior))
  }
}
