package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 scale-mechanics operators: layout pruning (a20), runtime Bloom
  * join pruning (c13), int8 quantized ANN (j26), containment dedup (j27).
  * The oracle checks their OUTPUT; these tests pin the scale mechanism
  * itself (disjoint file ranges, sketch pruning, quantization recall) and
  * brute-force the containment measure. */
class Round5Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def run(key: String) = SparkEntry.queries(key)(spark, TestSpark.sf)

  test("a20: range-partitioned sorted layout yields disjoint per-file min/max") {
    val out = java.nio.file.Files.createTempDirectory("graft_a20spec").toString
    spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length >= 2, "expected multiple range files")
    // footer min/max is what the scan skips on; per-file ranges must not
    // overlap (this is the property that makes the predicate prune files)
    val ranges = files.map { f =>
      // ISO-format strings order lexicographically — avoids caring whether
      // the round-tripped column is TIMESTAMP or TIMESTAMP_NTZ
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("l_shipdate").cast("string")),
          max(col("l_shipdate").cast("string"))).head()
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(lo2 >= hi1, s"file ranges overlap: hi=$hi1 lo=$lo2")
      case _ =>
    }
    // layout never changes results
    val a = run("a20_sort_layout").collect().map(_.toSeq).toSeq
    val b = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast("decimal(18,4)")), 4).cast("double").as("sum_qty"))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("c13: bloom pre-filter prunes the probe side and keeps the join exact") {
    val sf = TestSpark.sf
    val dim = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bytes = graft.functions.Bloom.build(dim, dim.count(), 0.03, col("o_orderkey"))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val total = li.count()
    val kept = li.where(graft.functions.Bloom.mightContain(spark, bytes,
      col("l_orderkey"))).count()
    val trueMatches = li.join(dim, li("l_orderkey") === dim("o_orderkey")).count()
    assert(kept < total, "bloom filter pruned nothing")
    assert(kept >= trueMatches, "bloom filter dropped true matches (impossible)")
    // ~20% of orders are URGENT; with 3% fpp the kept fraction must be far
    // below the unfiltered probe side
    assert(kept.toDouble / total < 0.5, s"pruning too weak: $kept/$total")
    // the probe predicate is Spark's codegen'd expression, visible in the plan
    val plan = run("c13_join_bloom").queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain") || plan.contains("might_contain"),
      "BloomFilterMightContain missing from the physical plan")
    // and the graded result equals the plain join
    val viaBloom = run("c13_join_bloom").collect().map(_.toSeq).toSeq
    val plain = li.join(dim, li("l_orderkey") === dim("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice").cast("decimal(18,4)")), 4).cast("double")
          .as("sum_price"))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(viaBloom == plain)
  }

  test("j26: int8-quantized cosine top-k keeps high recall vs exact top-k") {
    val exact = run("j3_sim_topk").collect().map(_.getLong(0)).toSet
    val quant = run("j26_embed_quantize").collect().map(_.getLong(0)).toSet
    val overlap = (exact & quant).size
    assert(overlap >= 8, s"quantized recall too low: $overlap/10 ($quant vs $exact)")
  }

  test("j27: containment pairs match a brute-force shingle-set reference") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
      .filter(_._2.length >= 3)
      .map { case (id, toks) =>
        id -> toks.sliding(3).map(_.mkString(" ")).toSet
      }
    val expect = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      (d1, s1) = docs(i)
      (d2, s2) = docs(j)
      inter = (s1 & s2).size
      cont = inter.toDouble / math.min(s1.size, s2.size)
      if cont >= 0.8
    } yield {
      val (lo, hi) = if (d1 < d2) (d1, d2) else (d2, d1)
      (lo, hi, BigDecimal(cont).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }).toSet
    val got = run("j27_dedup_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(expect.nonEmpty, "fixture should contain at least one containment pair")
  }

  test("a21: z-order bounds BOTH dimensions per file; 1-D sort only bounds its own") {
    val out = java.nio.file.Files.createTempDirectory("graft_a21spec").toString
    spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .withColumn("zval", graft.ops.Round5.zOrder16(
        expr("cast(datediff(l_shipdate, date '1995-01-01') as bigint)"),
        col("l_partkey")))
      .repartitionByRange(16, col("zval")).sortWithinPartitions("zval")
      .drop("zval").write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length >= 4)
    // per-file bounding box in (shipdate, partkey); the query box is the
    // a21 predicate — z-order locality must leave some files fully outside
    val boxes = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("l_shipdate").cast("string")), max(col("l_shipdate").cast("string")),
          min("l_partkey"), max("l_partkey")).head()
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
    }
    val hit = boxes.count { case (dLo, dHi, pLo, pHi) =>
      dHi >= "1997-01-01" && dLo < "1997-07-01" && pLo < 500L
    }
    assert(hit < files.length,
      s"z-order pruned nothing: $hit/${files.length} files intersect the 2-D query box")
    // layout never changes results
    val a = run("a21_zorder").collect().map(_.toSeq).toSeq
    val b = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01").cast("timestamp") &&
        col("l_partkey") < 500)
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast("decimal(18,4)")), 4).cast("double").as("sum_qty"))
      .orderBy("l_linestatus").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("j28: incremental dedup is exact on verified pairs and recovers planted dups") {
    val got = run("j28_dedup_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every emitted (incoming, corpus) pair must be odd → even
    got.foreach { case (i, c) =>
      assert(i % 2 == 1 && c % 2 == 0, s"wrong split: ($i, $c)")
    }
    // exact mixed-parity near-dups at jac ≥ 0.8 are near-certain LSH
    // catches (8×4 banding: P[miss] ≈ (1−0.8⁴)⁸ < 3%·… ≈ 2% worst case;
    // the planted fixture dups are ≥ 0.9 → P[miss] ≈ 2e-4) — all of them
    // must be present, or the band join is broken
    val planted = run("j2_dedup_near").collect()
      .filter(r => r.getDouble(2) >= 0.8)
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a + b) % 2 == 1 }
      .map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) }
      .toSet
    assert(planted.subsetOf(got), s"LSH missed planted dups: ${planted -- got}")
    assert(got.nonEmpty, "fixture should contain mixed-parity near-dups")
  }

  test("i13: dedup state is evicted past the watermark (the bounded-state trade)") {
    import graft.streaming.Streams.Ev
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val H = 3600L * 1000
    def run(bounded: Boolean): Seq[Long] = {
      val ms = MemoryStream[Ev]
      val base = ms.toDF()
        .withColumn("ts_t", timestamp_millis(col("ts_ms")))
        .withWatermark("ts_t", "1 hour")
      val deduped = (if (bounded) base.dropDuplicatesWithinWatermark("event_id")
        else base.dropDuplicates("event_id")).select("event_id")
      val qn = "i13sem_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val ck = java.nio.file.Files.createTempDirectory("graft_i13sem").toString
      val q = deduped.writeStream.outputMode("append").format("memory")
        .queryName(qn).option("checkpointLocation", ck).start()
      // (B offset: timestamp 0 itself is swallowed at the epoch boundary)
      val B = 100 * H
      // batch 1: id=1 at B plus a sentinel at B+3h → watermark B+2h at
      // batch end, so id=1's dedup state (expires B+1h) becomes evictable
      ms.addData(Ev(1L, B, 0L, "a", 0.0), Ev(99L, B + 3 * H, 0L, "a", 0.0))
      q.processAllAvailable()
      // batch 2: any row — eviction runs at THIS batch's end with the
      // B+2h watermark, removing id=1 from the bounded store
      ms.addData(Ev(98L, B + 3 * H, 0L, "a", 0.0))
      q.processAllAvailable()
      // batch 3: id=1 re-arrives ABOVE the watermark (B+2.5h — a retry
      // stamped with a fresh time, the realistic duplicate at scale; any
      // retry still carrying its ORIGINAL time would be below the
      // watermark by the time its state evicts, i.e. dropped as late)
      ms.addData(Ev(1L, B + 2 * H + H / 2, 0L, "a", 0.0))
      q.processAllAvailable()
      q.stop()
      spark.table(qn).collect().map(_.getLong(0)).toSeq.sorted
    }
    // unbounded dropDuplicates: state never evicts → retry suppressed; the
    // price is O(stream) state. Within-watermark: state already evicted →
    // the retry re-emits; the price of O(window) state — and re-sends with
    // their ORIGINAL timestamp still never duplicate (registry harness
    // proves that: i13's oracle run re-sends the whole event set).
    assert(run(bounded = false) == Seq(1L, 98L, 99L))
    assert(run(bounded = true) == Seq(1L, 1L, 98L, 99L))
  }

  test("j30: mixture take lands on the 40% budget and flattens a skewed corpus") {
    // fixture corpus: take ≈ budget within md5-bucket binomial noise
    val total = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").count()
    val take = run("j30_source_mixture").count()
    val frac = take.toDouble / total
    assert(frac > 0.3 && frac < 0.5, s"take fraction $frac far from 0.4 budget")
    // synthetic skew: α=0.5 must give the SMALL source a higher keep RATE
    // than the large one (that is what temperature reweighting is for)
    val dir = java.nio.file.Files.createTempDirectory("graft_j30").toString
    import spark.implicits._
    ((0L until 2000L).map(i => (i, "big")) ++ (2000L until 2100L).map(i => (i, "small")))
      .toDF("doc_id", "source")
      .withColumn("text", lit("x y z")).withColumn("lang", lit("en"))
      .withColumn("n_chars", lit(5L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("j30_source_mixture")(spark, dir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bigRate = got.getOrElse("big", 0L).toDouble / 2000.0
    val smallRate = got.getOrElse("small", 0L).toDouble / 100.0
    assert(smallRate > bigRate,
      s"temperature failed to flatten: small=$smallRate big=$bigRate")
  }

  test("d19: capped-domain sketches are EXACT; per-group and union reconcile") {
    // the graded query sketches o_custkey % 512 — below the lgK=14
    // coupon-list capacity the estimate IS the exact coupon count, which
    // is what lets d19 carry a hash-matching DuckDB oracle
    val rows = run("d19_hll_partial_merge").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length >= 2 && rows.exists(_._1 == "ALL"))
    rows.foreach { case (g, est, exact) =>
      assert(est == exact,
        s"group $g: capped-domain sketch must be exact, got $est vs $exact")
    }
    val all = rows.find(_._1 == "ALL").get._2
    val maxPart = rows.filter(_._1 != "ALL").map(_._2).max
    assert(all >= maxPart)
  }

  test("d19 estimate tier: full-key sketch union stays within the lgK=14 bound") {
    // the unbounded-domain variant of the same pipeline — the regime the
    // oracle can't hash-check, pinned here instead (d7/d18's grading mode)
    Tables.t(spark, TestSpark.sf, "orders")
      .createOrReplaceTempView("graft_d19t_orders")
    val rows = spark.sql("""
      WITH parts AS (
        SELECT o_orderpriority, hll_sketch_agg(o_custkey, 14) AS sk,
               COUNT(DISTINCT o_custkey) AS exact_nd
        FROM graft_d19t_orders GROUP BY o_orderpriority)
      SELECT o_orderpriority,
             CAST(hll_sketch_estimate(sk) AS BIGINT) AS est_nd, exact_nd
      FROM parts
      UNION ALL
      SELECT 'ALL',
             CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT),
             (SELECT COUNT(DISTINCT o_custkey) FROM graft_d19t_orders)
      FROM parts""").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (g, est, exact) =>
      val err = math.abs(est - exact).toDouble / exact
      // lgK=14 ⇒ RSE ≈ 0.8%; 5% is a generous multi-σ bound
      assert(err <= 0.05, s"group $g: estimate $est vs exact $exact (err $err)")
    }
    val all = rows.find(_._1 == "ALL").get._2
    val maxPart = rows.filter(_._1 != "ALL").map(_._2).max
    assert(all >= maxPart)
  }
}
