package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CC, Knobs, LlmOps}

/** Runtime scale-knob coverage: overrides must actually change the built
  * plan/result shape, defaults must reproduce the oracle geometry, and
  * the pathological values the clamps exist for must be safe. */
class KnobsSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally kv.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("lsh.planes override changes the bucket width; default is 6") {
    val defWidth = LlmOps.lshBuckets(spark, TestSpark.sf, Knobs.lshPlanes(spark))
      .select(length(col("bucket"))).distinct().collect().map(_.getInt(0)).toSet
    assert(defWidth == Set(6))
    withConf(Knobs.LshPlanesKey -> "3") {
      val w = LlmOps.lshBuckets(spark, TestSpark.sf, Knobs.lshPlanes(spark))
        .select(length(col("bucket"))).distinct().collect().map(_.getInt(0)).toSet
      assert(w == Set(3))
    }
  }

  test("minhash.k / bandSize overrides change signature and band geometry") {
    withConf(Knobs.MinhashKKey -> "8", Knobs.MinhashBandSizeKey -> "2") {
      val sig = LlmOps.minhashSigs(spark, TestSpark.sf)
      assert(sig.select(size(col("sig"))).distinct().collect()
        .map(_.getInt(0)).toSet == Set(8))
      val bands = LlmOps.minhashBands(sig)
        .select(col("band")).distinct().collect().map(_.getInt(0)).toSet
      assert(bands == (0 until 4).toSet, s"8 slots / 2 per band = 4 bands, got $bands")
    }
    // defaults: 32 slots, 8 bands — the geometry every oracle encodes
    val sig = LlmOps.minhashSigs(spark, TestSpark.sf)
    assert(sig.select(size(col("sig"))).distinct().collect()
      .map(_.getInt(0)).toSet == Set(32))
  }

  test("minhash.k must be a multiple of the band size") {
    withConf(Knobs.MinhashKKey -> "10", Knobs.MinhashBandSizeKey -> "4") {
      assertThrows[IllegalArgumentException](Knobs.minhashK(spark))
    }
  }

  test("cc.collectThreshold=0 forces the distributed path with identical labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("d1", "d2")
    val viaDriver = CC.cluster(spark, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaIterative = withConf(Knobs.CcCollectThresholdKey -> "0") {
      CC.cluster(spark, edges).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(viaDriver.sameElements(viaIterative),
      s"paths disagree: ${viaDriver.toSeq} vs ${viaIterative.toSeq}")
  }

  test("cc.collectThreshold beyond Int.MaxValue is clamped, not overflowed") {
    import spark.implicits._
    withConf(Knobs.CcCollectThresholdKey -> s"${Long.MaxValue}") {
      assert(Knobs.ccCollectThreshold(spark) == Int.MaxValue.toLong - 2L)
      val out = CC.cluster(spark, Seq((5L, 6L)).toDF("d1", "d2")).collect()
      assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((5L, 5L), (6L, 5L)))
    }
    // explicit-arg path clamps too (the CC.scala:87 Int overflow)
    val out = CC.cluster(spark,
      Seq((7L, 8L)).toDF("d1", "d2"), Long.MaxValue).collect()
    assert(out.length == 2)
  }

  test("pq.shortlist / ivf.nprobe at their limits: ANN output IS the exact top-10") {
    import org.apache.spark.sql.functions._
    val q = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint))")
        .as("qv"))
    val probe = q.where(col("vec_id") === 0).select(col("qv").as("pv"))
    val exact = q.crossJoin(broadcast(probe)).where(col("vec_id") =!= 0)
      .select(col("vec_id"), expr(
        "aggregate(zip_with(qv, pv, (p, q) -> (p - q) * (p - q)), 0L, (a, v) -> a + v)")
        .as("d2"))
      .orderBy(asc("d2"), asc("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    try {
      // shortlist ≥ corpus and nprobe ≥ cells: the approximations are
      // pure pre-filters, so the exact re-rank must recover the truth
      spark.conf.set(graft.ops.Knobs.PqShortlistKey, "100000")
      spark.conf.set(graft.ops.Knobs.IvfNprobeKey, "1024")
      for (k <- Seq("j53_pq_ann", "j54_ivfpq_ann")) {
        val out = SparkEntry.queries(k)(spark, TestSpark.sf)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(out == exact, s"$k at the knob limit diverges from exact")
      }
    } finally {
      spark.conf.unset(graft.ops.Knobs.PqShortlistKey)
      spark.conf.unset(graft.ops.Knobs.IvfNprobeKey)
    }
  }

  test("grid.blocks override re-tiles j12's block grid, output unchanged") {
    val default = SparkEntry.queries("j12_dedup_embed")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    val retiled = withConf(Knobs.GridBlocksKey -> "3") {
      SparkEntry.queries("j12_dedup_embed")(spark, TestSpark.sf)
        .collect().map(_.toSeq).toSet
    }
    assert(default == retiled, "grid tiling is a pure physical choice")
    assert(default.nonEmpty)
  }

  test("lsh buckets are partitioning-invariant (order-free projection)") {
    // the r7 shape summed w·v in shuffle-partition order — a near-zero
    // projection could flip under a different partitioning; the array-
    // ordered DotProduct must produce bit-identical buckets whatever the
    // plan's parallelism
    val default = LlmOps.lshBuckets(spark, TestSpark.sf, 6).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val single = withConf("spark.sql.shuffle.partitions" -> "1") {
      LlmOps.lshBuckets(spark, TestSpark.sf, 6).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    assert(default == single, "buckets changed with partitioning")
    assert(default.values.forall(_.length == 6))
  }

  test("session-3 keys are partitioning-invariant (h27/h28/h30/j50)") {
    // h27: per-partition window state; h28: SpaceSaving in its exact
    // regime (no eviction ⇒ merge-order-free); h30: window blend
    // multiplies-then-divides identically per row; j50: long-sum groupBy.
    // Each must produce byte-identical rows at 1 shuffle partition.
    for (key <- Seq("h27_td_sessionize_window", "h28_td_approx_most_frequent",
        "h30_interpolate_linear", "j50_bpe_apply")) {
      val default = SparkEntry.queries(key)(spark, TestSpark.sf)
        .collect().map(_.toSeq).toSeq
      val single = withConf("spark.sql.shuffle.partitions" -> "1") {
        SparkEntry.queries(key)(spark, TestSpark.sf)
          .collect().map(_.toSeq).toSeq
      }
      assert(default == single, s"$key changed with partitioning")
      assert(default.nonEmpty, key)
    }
  }

  test("DotProduct matches a left-to-right scalar reference, handles edges") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 64).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Array.fill(n)(rnd.nextFloat() * 2 - 1),
        Array.fill(n)(rnd.nextDouble() * 2 - 1))
    } :+ ((64L, Array.empty[Float], Array.empty[Double])) :+
      ((65L, Array(1.0f, 2.0f, 3.0f), Array(0.5)))  // length mismatch → min(n)
    val df = rows.toDF("id", "x", "w")
    val got = df.select(col("id"),
        graft.expressions.DotProduct(spark, col("x"), col("w")).as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, x, w) =>
      var ref = 0.0
      (0 until math.min(x.length, w.length)).foreach(i => ref += x(i).toDouble * w(i))
      assert(got(id) == ref, s"row $id: ${got(id)} vs $ref")
    }
  }

  test("pairs.maxDf override forces the heavy-key join path, output unchanged") {
    val default = SparkEntry.queries("j2_dedup_near")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSet
    val forced = withConf(Knobs.PairMaxDfKey -> "2") {
      SparkEntry.queries("j2_dedup_near")(spark, TestSpark.sf)
        .collect().map(_.toSeq).toSet
    }
    assert(default == forced, "heavy-path output must equal array-path output")
    assert(default.nonEmpty)
  }

  test("stream.shufflePartitions re-partitions the state stores, output unchanged") {
    // the r15 floor-probe knob: streaming state partitioning is a physical
    // choice an operator retunes with state size — results must not move
    val default = SparkEntry.queries("i12_stream_complete_mode")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    val retuned = withConf(
        graft.streaming.Streams.StreamShufflePartitionsKey -> "2") {
      SparkEntry.queries("i12_stream_complete_mode")(spark, TestSpark.sf)
        .collect().map(_.toSeq).toSeq
    }
    assert(default == retuned, "state partitioning is a pure physical choice")
    assert(default.nonEmpty)
    intercept[IllegalArgumentException] {
      withConf(graft.streaming.Streams.StreamShufflePartitionsKey -> "0") {
        SparkEntry.queries("i12_stream_complete_mode")(spark, TestSpark.sf)
      }
    }
  }
}
