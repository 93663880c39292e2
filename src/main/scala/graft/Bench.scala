package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Bench {

  /** Tier split (r17 verdict item 3): at 383 keys the full sweep is ~28
    * minutes of driver wall and a contention cross-section that outgrew
    * the retry/mover budget (a 3.4 s query was charged 103.9 s through a
    * retry that itself landed in the slow window). `core` — the default —
    * keeps every key a perf reader actually consults: the 74 SURVEY-
    * contract keys, the TPC-H p-tier, the steady-state slow cohort (pair
    * core, Ed-Join, streams, ANN — the keys whose movement means
    * anything), and keys new this round. The variant/dialect tail
    * (k-dialect aliases, h-scalar variants, a-geometry) runs under
    * `full` — the builder's closing sweep records it in BASELINE.md each
    * round, so full-registry numbers still exist per round with a
    * smaller per-run cross-section. Select with SPARK_GRAFT_BENCH_TIER
    * or argv[0] ∈ {core, full}. */
  // single source of truth: PlanContract owns the 74-key contract census
  // (ContractPlanSpec pins it against the SURVEY set), so the core tier
  // can never drift from the asserted contract
  private val contractKeyPrefixes: Set[String] =
    PlanContract.contractKeys.map(_.takeWhile(_ != '_')).toSet
  /** Steady-state slow cohort — the keys whose per-round movement carries
    * signal (BENCH_r17 slowest-20 post-adjudication + the retry-queue
    * regulars). Kept by full key name so a rename breaks the bench loudly
    * (unknown keys are reported, not silently dropped). */
  private val slowCohortKeys: Set[String] = Set(
    "j2_dedup_near", "j2b_dedup_minhash", "j2c_dedup_prefix",
    "j14_dedup_clusters", "j24_sketch_error", "j27_dedup_containment",
    "j28_dedup_incremental", "j44_cluster_safe_split",
    "j51_dedup_editdist", "j53_pq_ann", "j54_ivfpq_ann",
    "j55_maxsim_retrieval", "j56_substring_dedup", "j60_dedup_weighted",
    "j60b_dedup_weighted_prefix", "j60c_dedup_weighted_icws",
    "j63_softdedup_weights", "j64_source_dup_matrix",
    "j65_decontam_fuzzy", "j79_data_recipe", "j90_semantic_decontam",
    "k16_param_query",
    "i8_stream_stream_join", "i21_stream_left_outer_join",
    "i26_stream_full_outer_join", "i27_stream_recipe")
  /** Keys added this round — always in core for their debut round. */
  private val newThisRound: Set[String] = Set(
    "j90b_decontam_ivf", "j91_gopher_rules", "j92_rejection_sample",
    "j93_curriculum_order", "j94_tokenizer_fertility",
    "j95_span_corruption", "m18_parse_tar", "p23_cumulative_channels",
    "e20_win_distribution", "j96_kneser_ney", "j97_char_entropy",
    "j98_shard_dedup_loss",
    "d29_agg_histogram", "j99_importance_ess",
    "c10e_join_asof_tolerance", "j100_bloom_planner", "j101_lsh_geometry",
    "k28_pipe_syntax",
    "p24_tpch_q1", "p25_tpch_q3", "j102_judge_agreement",
    "j103_calibration_bins", "h49_time_type", "j104_roc_auc",
    "j105_ndcg", "j106_mrr", "j107_recall_at_k", "j108_graph_triangles",
    "j109_script_mix", "j110_kfold_assign", "j111_pmi_collocations",
    "j112_knn_label_noise", "j113_mmr_rerank", "j114_hubness_audit",
    "j115_weighted_sample_es")

  private[graft] def coreKeys(all: Seq[String]): Seq[String] =
    all.filter { k =>
      contractKeyPrefixes.contains(k.takeWhile(_ != '_')) ||
        k.takeWhile(_ != '_').matches("p\\d+") ||
        slowCohortKeys.contains(k) || newThisRound.contains(k)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val tier = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_TIER")).getOrElse("core")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: JIT the scan/agg/join/window codegen paths once so
    // first-query JVM warmup isn't charged to an arbitrary query.
    // Best-effort — a warmup failure must never take down the bench.
    try {
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      o.groupBy("o_orderstatus").agg(sum(col("o_totalprice"))).count()
      o.join(broadcast(n), o("o_custkey") % 25 === n("n_nationkey")).count()
      o.select(row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("o_orderkey")).as("rn")).count()
      // ... and the explode / higher-order-function / string-hash paths the
      // j-group leans on (Janino + C2 compile of generator and lambda
      // evaluation dominates the first such query otherwise)
      val doc = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
      doc.select(explode(split(col("text"), " ")).as("tk"))
        .select(md5(col("tk")), xxhash64(col("tk"))).count()
      doc.select(expr(
        """aggregate(transform(split(text, ''), c -> cast(ascii(c) as bigint)),
          cast(0 as bigint), (a, b) -> (a * 31 + b) % 1000000007)""")).count()
      // ... and the streaming machinery the i-group pays for otherwise:
      // micro-batch engine, checkpoint plumbing, HDFS + RocksDB state
      // stores (incl. the native lib load) via one tiny windowed agg each
      import spark.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      Seq("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
        .foreach { prov =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", prov)
          spark.conf.set("spark.sql.shuffle.partitions", "2")
          val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
          val ck = java.nio.file.Files.createTempDirectory("graft_warm").toString
          val q = ms.toDF().withColumn("ts", timestamp_millis(col("value")))
            .withWatermark("ts", "1 second")
            .groupBy(window(col("ts"), "1 second")).count()
            .writeStream.outputMode("append").format("memory")
            .queryName("warm_" + prov.hashCode.abs)
            .option("checkpointLocation", ck).start()
          ms.addData(1L to 50L)
          q.processAllAvailable()
          q.stop()
        }
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed (continuing): ${e.getMessage}")
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
    }

    // Every query is measured COLD and independent: queries may persist()
    // intermediates for intra-query reuse (legitimate — part of the query),
    // but Spark's CacheManager would otherwise hand those cached plans to
    // every LATER query with a matching subtree (the shingle postings feed
    // j14/j2/j2c/j23), so per-query times would measure cache luck, not the
    // operator — and 142 never-released MEMORY_AND_DISK caches accumulate
    // into eviction/GC pressure that tanks whichever query runs late.
    def releaseCaches(): Unit = {
      spark.catalog.clearCache()                       // DataFrame persists
      spark.sparkContext.getPersistentRDDs.values      // localCheckpoints
        .foreach(_.unpersist(blocking = false))
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    def timeOne(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } finally releaseCaches()
    }
    // CONTROL BRACKET: time the j2 control before AND after the sweep.
    // r6's driver bench charged six alphabetically-consecutive keys 15-95x
    // their steady-state (a machine-contention window); with the control
    // emitted at both ends a contaminated bracket is detectable from the
    // JSON alone (control_end >> control_start, or vice versa) without
    // re-running anything. Control runs are diagnostics — NOT in `total`.
    val controlKey = "j2_dedup_near"
    def controlRun(): Double =
      try timeOne(controlKey) catch { case _: Throwable => -1.0 }
    val controlStart = controlRun()
    // Queries whose first run >= 30 s get NO inline rerun (bounds wall-clock
    // when the machine is genuinely sick) — instead they queue for ONE
    // retry at the END of the run, when a contention phase has usually
    // passed. r6: exactly the >=30 s spike victims kept their spike times.
    val retryQueue = scala.collection.mutable.ArrayBuffer.empty[String]
    val allKeys = SparkEntry.queries.keys.toSeq.sorted
    val benchKeys = tier match {
      case "full" => allKeys
      case _      => coreKeys(allKeys)
    }
    // a slow-cohort/new-key rename must fail loudly, not silently shrink
    // the core tier
    (slowCohortKeys ++ newThisRound).diff(allKeys.toSet).foreach { k =>
      System.err.println(s"[bench] WARNING: tier key not in registry: $k")
    }
    val firstPass = benchKeys.map { name =>
      val tStart = System.nanoTime()
      val t = try {
        val t1 = timeOne(name)
        // whole-RUN noise (machine load, GC alignment) has swung identical
        // binaries between 88 s and 102 s totals with every query shifted
        // by the same ~15-40% — a single sample per query measures the
        // machine, not the operator. Re-run once and keep the min. The
        // threshold is deliberately far above every query's steady-state
        // time (slowest ≈ 5 s): a load spike can triple a first run (a
        // ~4 s query was once charged 13.9 s because it crossed a lower
        // 10 s threshold and got no second chance), so only a genuinely
        // pathological run (≥ 30 s) defers its second chance to the
        // end-of-run retry queue to bound wall-clock NOW.
        if (t1 < 30.0) {
          // a rerun flake must not discard the valid first measurement nor
          // charge both runs' wall-clock — keep t1 and only note the flake
          try math.min(t1, timeOne(name)) catch { case e: Throwable =>
            System.err.println(s"[bench] $name rerun flaked (keeping first): ${e.getMessage}")
            t1
          }
        } else { retryQueue += name; t1 }
      } catch { case e: Throwable =>
        // a broken query must NOT masquerade as a fast one: keep its
        // elapsed wall-clock and flag it
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        (System.nanoTime() - tStart) / 1e9
      }
      name -> t
    }
    // End-of-run retry: one more sample for each >=30 s outlier, keep the
    // min. The JSON records first/retry pairs so a reader can tell a real
    // slow query (retry confirms) from a contaminated charge (retry 15-95x
    // faster, as the r6 judge measured on the same binary).
    // A flaked retry records the -1.0 SENTINEL, not tFirst: retry == first
    // would read as "retry confirmed the query is genuinely slow" — the
    // exact distinction the retried field exists to provide. The total
    // still charges tFirst.
    val retried = retryQueue.toSeq.map { name =>
      val tFirst = firstPass.find(_._1 == name).get._2
      val tRetry = try timeOne(name) catch { case e: Throwable =>
        System.err.println(s"[bench] $name end-of-run retry flaked (keeping first): ${e.getMessage}")
        -1.0
      }
      name -> (tFirst, tRetry)
    }.toMap
    val results = firstPass.map { case (name, t) =>
      name -> retried.get(name)
        .map { case (f, r) => if (r < 0) f else math.min(f, r) }.getOrElse(t)
    }
    val controlEnd = controlRun()
    def fmt(v: Double): String = f"$v%.3f"
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val controlJson = s"""{"key":"$controlKey","start":${fmt(controlStart)},"end":${fmt(controlEnd)}}"""
    def retriedJsonOf(entries: Seq[(String, (Double, Double))]): String =
      entries.sortBy(_._1).map { case (k, (f, r)) =>
        "\"" + k + "\":{\"first\":" + fmt(f) + ",\"retry\":" + fmt(r) + "}"
      }.mkString("{", ",", "}")
    val retriedJson = retriedJsonOf(retried.toSeq)
    // stdout carries only the slowest few retried pairs (a heavily
    // contaminated run could queue dozens of >=30 s outliers and overflow
    // the driver's bounded stdout tail — the failure mode the slowest-20
    // query cap below exists to prevent); the full map lives in
    // target/bench_full.json. n_retried preserves the total count.
    val retriedStdoutJson =
      retriedJsonOf(retried.toSeq.sortBy { case (_, (f, _)) => -f }.take(8))
    // Full per-query detail goes to a FILE; stdout carries ONE compact JSON
    // line (slowest 20 only). The driver captures a bounded tail of stdout —
    // round 1's full 103-entry map overflowed it and failed to parse
    // (BENCH_r01.json "parsed": null), so the line must stay short.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val outDir = java.nio.file.Paths.get("target")
    java.nio.file.Files.createDirectories(outDir)
    // SELF-ADJUDICATION: diff this run against the PREVIOUS bench_full.json
    // (read before overwrite) and machine-flag >1.5x movers either way.
    // Four rounds of judging have adjudicated the same ±25-40% machine-phase
    // band on the pair-core keys by hand; with the movers list + the control
    // bracket in the JSON itself, "code regression or phase noise?" is
    // answerable from one artifact: movers with control_end ≈ control_start
    // and no code diff are real; movers inside a skewed bracket are phase.
    // Sub-second keys are exempt (JIT/GC jitter dominates |t| < 0.5 s).
    val prevQs: Map[String, Double] = try {
      val p = outDir.resolve("bench_full.json")
      if (java.nio.file.Files.exists(p)) {
        import org.json4s._
        org.json4s.jackson.JsonMethods.parse(
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8")) \ "queries" match {
          case JObject(fs) => fs.collect {
            case (k, JDouble(v)) => k -> v
            case (k, JInt(v)) => k -> v.toDouble
          }.toMap
          case _ => Map.empty
        }
      } else Map.empty
    } catch { case e: Throwable =>
      System.err.println(s"[bench] prior bench_full.json unreadable (no movers): ${e.getMessage}")
      Map.empty
    }
    val movers = results.flatMap { case (k, now) =>
      prevQs.get(k).collect {
        case prev if math.max(prev, now) >= 0.5 && prev > 0 &&
            (now / prev >= 1.5 || prev / now >= 1.5) =>
          k -> (prev, now)
      }
    }.sortBy { case (_, (prev, now)) =>
      // up-movers FIRST (r16 verdict item 4: the 120 s budget expired with
      // 9 movers unadjudicated, and the ones that matter are up-movers —
      // a down-mover is never a regression). Within each class, worst
      // |log ratio| first.
      (if (now > prev) 0 else 1, -math.abs(math.log(now / prev)))
    }
    // MOVER ADJUDICATION (same process, same binary): the r13 driver run
    // shipped 23 phase-noise movers that a judge then re-measured by hand;
    // this closes that loop inside the artifact. Each flagged mover is
    // re-run min-of-3 at the END of the sweep (a contention phase has
    // usually passed by then), bracketed by a third j2 control sample, so
    // every movers row carries its own steady-state re-measure: readj ≈
    // prev → the in-run sample was phase noise; readj ≈ now ≫ prev → a
    // real code-level regression. Bounded: worst-24 movers (up-movers
    // queued first, see the sort above) and a 240 s wall budget — raised
    // from 12/120 s after the r16 artifact shipped with 9 of 21 movers
    // unadjudicated at 360 registry keys; up-movers-first means the budget
    // can now only truncate down-movers, which are never regressions.
    // The budget is enforced as ELAPSED WALL TIME around the loop (not a
    // sum of successful per-query seconds): a flaked run's wall-clock and
    // a single slow query's overshoot both count, so on a sick machine the
    // stated bound actually bounds the bench.
    // r18 (r17 verdict item 2c): up-movers with ratio >= 2 are MANDATORY —
    // they get a readj sample even past the soft budget (one sample
    // instead of min-of-3; shipping the spike unadjudicated is the only
    // wrong answer). Optional movers (down-movers, small up-movers) honor
    // the soft budget only. Bounded even on a machine sick for the WHOLE
    // sweep (where dozens of keys can show ratio >= 2): mandatory movers
    // process worst-first (the sort above) under a hard 900 s cap; any
    // mandatory mover the hard cap truncates is self-reported in the
    // artifact under "unadjudicated_mandatory" instead of silently
    // shipping — the reader sees exactly which spikes carry no
    // steady-state re-measure. Keys already recorded in `failed` never
    // re-run here (a deterministic failure would burn the budget to
    // reproduce an exception).
    val adjBudgetSec = 240.0
    val adjHardCapSec = 900.0
    val adjStart = System.nanoTime()
    def adjSpent: Double = (System.nanoTime() - adjStart) / 1e9
    val unadjMandatory = scala.collection.mutable.ArrayBuffer.empty[String]
    val adjudicated = movers.flatMap { case (k, (prev, now)) =>
      val mandatory = now > prev && now / prev >= 2.0
      if (failed.contains(k)) None
      else if (!mandatory && adjSpent > adjBudgetSec) None
      else if (mandatory && adjSpent > adjHardCapSec) {
        unadjMandatory += k
        System.err.println(s"[bench] $k mandatory adjudication dropped at hard cap")
        None
      } else {
        val nRuns = if (adjSpent > adjBudgetSec) 1 else 3
        val runs = (1 to nRuns).flatMap { i =>
          if (i > 1 && adjSpent > adjBudgetSec && !mandatory) None
          else try Some(timeOne(k))
          catch { case e: Throwable =>
            System.err.println(s"[bench] $k adjudication flaked: ${e.getMessage}")
            None
          }
        }
        runs.minOption.map(k -> _)
      }
    }.toMap
    val controlPostAdj = if (adjudicated.nonEmpty) controlRun() else -1.0
    // SLOW-COHORT REQUEUE (r17 verdict item 2a): r17 charged a 3.4 s query
    // 103.9 s because its one retry landed in the same contention window
    // as the first pass. Rather than estimate a phase band, apply the
    // strictly stronger rule: ANY key whose accepted charge is still
    // >= 15 s and that has no adjudication sample yet gets a final
    // min-of-2 here — the latest point in the run, when the phase has had
    // the longest time to pass — under its own wall budget, with a control
    // sample after so the artifact shows what phase the requeue ran in.
    val rqBudgetSec = 300.0
    val rqStart = System.nanoTime()
    def rqSpent: Double = (System.nanoTime() - rqStart) / 1e9
    val requeued = results
      .filter { case (k, v) =>
        v >= 15.0 && !adjudicated.contains(k) && !failed.contains(k) }
      .sortBy(-_._2)
      .flatMap { case (k, _) =>
        if (rqSpent > rqBudgetSec) None
        else {
          val runs = (1 to 2).flatMap { i =>
            if (i > 1 && rqSpent > rqBudgetSec) None
            else try Some(timeOne(k))
            catch { case e: Throwable =>
              System.err.println(s"[bench] $k requeue flaked: ${e.getMessage}")
              None
            }
          }
          runs.minOption.map(k -> _)
        }
      }.toMap
    val controlPostRq = if (requeued.nonEmpty) controlRun() else -1.0
    // corrected_total (r17 verdict item 2b): the number the judge
    // previously recomputed by hand — every per-query charge replaced by
    // its best steady-state re-measure (retry is already folded into
    // `results`; this folds adjudication + requeue samples too). `value`
    // stays the raw accepted total for cross-round comparability.
    val corrected = results.map { case (k, v) =>
      k -> math.min(v,
        math.min(adjudicated.getOrElse(k, v), requeued.getOrElse(k, v)))
    }
    val correctedTotal = corrected.map(_._2).sum
    def moversJsonOf(entries: Seq[(String, (Double, Double))]): String =
      entries.map { case (k, (prev, now)) =>
        "\"" + k + "\":{\"prev\":" + fmt(prev) + ",\"now\":" + fmt(now) +
          ",\"ratio\":" + fmt(now / prev) +
          adjudicated.get(k).map(r => ",\"readj\":" + fmt(r)).getOrElse("") + "}"
      }.mkString("{", ",", "}")
    val controlFullJson = s"""{"key":"$controlKey","start":${fmt(controlStart)},"end":${fmt(controlEnd)},"post_adj":${fmt(controlPostAdj)},"post_rq":${fmt(controlPostRq)}}"""
    val requeuedJson = requeued.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val unadjJson = unadjMandatory.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    java.nio.file.Files.write(outDir.resolve("bench_full.json"),
      s"""{"metric":"total","value":${fmt(total)},"corrected_total":${fmt(correctedTotal)},"unit":"sec","tier":"$tier","n_registry":${allKeys.size},"queries":$fullQs,"sf":"$sfDir","failed":$failedJson,"control":$controlFullJson,"retried":$retriedJson,"requeued":$requeuedJson,"unadjudicated_mandatory":$unadjJson,"movers":${moversJsonOf(movers)}}"""
        .getBytes("UTF-8"))
    val slowest = corrected.sortBy(-_._2).take(20)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // stdout stays bounded: worst 8 movers only, full list in the file
    println(s"""{"metric":"total","value":${fmt(total)},"corrected_total":${fmt(correctedTotal)},"unit":"sec","tier":"$tier","n_queries":${results.size},"n_registry":${allKeys.size},"queries":$slowest,"sf":"$sfDir","failed":$failedJson,"control":$controlFullJson,"n_retried":${retried.size},"retried":$retriedStdoutJson,"requeued":$requeuedJson,"n_movers":${movers.size},"n_adjudicated":${adjudicated.size},"unadjudicated_mandatory":$unadjJson,"movers":${moversJsonOf(movers.take(8))}}""")
    spark.stop()
  }
}
