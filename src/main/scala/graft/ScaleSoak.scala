package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale soak of the dedup/ANN tier (VERDICT r13 item 4): the
  * Σdf²/banding/prefix-filter claims are SkewSpec-demonstrated at 4k
  * docs; this main re-measures them head-to-head at 10× (40k docs, 20k
  * embeddings — 10× the SkewSpec fixture / sf0.1 embeddings) under two
  * knob settings each, so the crossover points the scaladocs assert are
  * MEASURED, not argued. Results land in BASELINE.md.
  *
  * Fixture (deterministic, no RNG, SkewSpec's generator scaled 10×):
  * every third doc opens with the same 7-token boilerplate header
  * (shingle df ≈ 13,333 — 52× the 256 postings cap, the quadratic-blowup
  * regime), bodies are 6 five-token phrases from a 40,009-phrase pool
  * (body shingle df ≈ 12 — unchanged from SkewSpec, so the skew RATIO
  * grows with the corpus exactly as it does in production). Two planted
  * exact-dup pairs are the expected j2-family output. Embeddings are
  * murmur3-derived uniform vectors (label = vec_id % 16).
  */
object ScaleSoak {
  private val BOILER = "terms of service apply to all content"
  private val NDocs = 40000L
  private val NVecs = 20000L
  private val Pool = 40009L // ~10x SkewSpec's 4001-phrase pool

  def main(args: Array[String]): Unit = {
    // optional section filter: any of neardup | ann | j60 | sub | ev
    // (no args = all sections) — re-measuring one family must not cost a
    // full 10-minute sweep
    val sections: Set[String] =
      if (args.isEmpty)
        Set("neardup", "ann", "j60", "sub", "ev", "decontam", "page",
          "recipe", "auc", "evalm", "graphm", "conv", "sched")
      else args.toSet
    def section(name: String)(body: => Unit): Unit =
      if (sections.contains(name)) body
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val d = graft.ops.Scratch.dir("scalesoak")
    // documents: generated distributed (range → columns), not driver-side
    def phraseCol(slot: Int) = {
      // slot-phrase mixing as SkewSpec: phrase((id*(13+17j) + 311j) % Pool)
      val p = pmod(col("src") * (13 + 17 * slot) + 311 * slot, lit(Pool))
      concat_ws(" ", (0 until 5).map(k => format_string(s"p%dw$k", p)): _*)
    }
    spark.range(NDocs).toDF("doc_id")
      .withColumn("src", when(col("doc_id") === 101L, 100L)
        .when(col("doc_id") === 201L, 200L).otherwise(col("doc_id")))
      .withColumn("body", concat_ws(" ", (0 until 6).map(phraseCol): _*))
      .withColumn("text", when(pmod(col("src"), lit(3)) === 0,
        concat(lit(s"$BOILER "), col("body"))).otherwise(col("body")))
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("scalesoak").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(8)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    spark.range(NVecs).toDF("vec_id")
      .select(col("vec_id"),
        expr("transform(sequence(0, 63), i -> " +
          "cast((pmod(hash(vec_id, i), 1000) - 500) / 500.0 as float))").as("embedding"),
        pmod(col("vec_id"), lit(16)).cast("int").as("label"))
      .coalesce(8)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def run(key: String, confs: Map[String, String]): Unit = {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val (sec, rows) = time(SparkEntry.queries(key)(spark, d).count())
        val tag = if (confs.isEmpty) "defaults"
          else confs.map { case (k, v) => s"${k.split('.').last}=$v" }.mkString(",")
        println(f"""SOAK {"key":"$key","conf":"$tag","sec":$sec%.2f,"rows":$rows}""")
      } finally {
        confs.keys.foreach(spark.conf.unset)
        release()
      }
    }

    // candidate-mass diagnostics (the quantity the plans bound)
    def mass(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("sh").agg(count(lit(1)).as("df")).where(col("df") >= 2)
        .agg(coalesce(sum(expr("df * (df - 1) / 2")), lit(0L)).cast("long"))
        .collect()(0).getLong(0)
    val fullMass = mass(graft.ops.LlmOps.shinglesWithCount(spark, d)); release()
    val prefMass = mass(graft.ops.LlmOps.prefixIndex(spark, d, 0.5)); release()
    println(s"""SOAK {"diag":"join_mass","full":$fullMass,"prefix":$prefMass}""")

    // near-dup family: default knobs vs a loosened df cap / coarser bands
    section("neardup") {
      Seq("j2_dedup_near", "j2b_dedup_minhash", "j2c_dedup_prefix").foreach { k =>
        run(k, Map.empty)
      }
      run("j2_dedup_near", Map(graft.ops.Knobs.PairMaxDfKey -> "1024"))
      run("j2b_dedup_minhash", Map(graft.ops.Knobs.MinhashBandSizeKey -> "8"))
      run("j2c_dedup_prefix", Map.empty) // repeat: order-independence check
    }

    // ANN family: brute vs LSH-bucketed vs PQ vs IVF-PQ, two dials each
    section("ann") {
      Seq("j3_sim_topk", "j3b_sim_lsh", "j53_pq_ann", "j54_ivfpq_ann").foreach { k =>
        run(k, Map.empty)
      }
      run("j3b_sim_lsh", Map(graft.ops.Knobs.LshPlanesKey -> "8"))
      run("j53_pq_ann", Map(graft.ops.Knobs.PqShortlistKey -> "200"))
      run("j54_ivfpq_ann", Map(graft.ops.Knobs.IvfNprobeKey -> "4"))
    }

    // j60 weighted Jaccard on the SAME skewed corpus (r16): the r15 soak
    // measured the uncapped tf⋈tf shape at 446.2M candidate pairs /
    // 205.6 s here; routed through the capped weighted pair core it must
    // land in the same class as j2/j2c (the five boilerplate 3-grams sit
    // at df≈13,333 — 52× the cap — so the heavy-key branch carries them).
    section("j60") {
      run("j60_dedup_weighted", Map.empty)
      run("j60_dedup_weighted", Map(graft.ops.Knobs.PairMaxDfKey -> "1024"))
      // the lossless weighted-prefix sibling must land in j2c's class —
      // the boilerplate types sort last in the canonical order and never
      // enter the candidate join
      run("j60b_dedup_weighted_prefix", Map.empty)
      // the ICWS sketch sibling: signature cost linear in corpus mass,
      // banded equi-join candidates, exact re-score — j2b's class
      run("j60c_dedup_weighted_icws", Map.empty)
    }

    // j56/j56b substring dedup under LONG-boilerplate skew (r16): the
    // 7-token header above never yields a fully-internal 8-gram, so a
    // separate corpus plants a 40-token boilerplate paragraph in every
    // 5th doc — 33 hot grams at df = 8,000 each. j56's cost model is
    // LINEAR in duplicated mass (hot-gram window partitions of 8k rows,
    // covered explode ×k on the duplicated spans only — nothing
    // pairwise); the soak proves the no-quadratic claim and measures
    // what j56b's spans-only output saves by never regrouping the
    // corpus text.
    def runAt(key: String, dir: String, tag: String): Unit = {
      try {
        val (sec, rows) = time(SparkEntry.queries(key)(spark, dir).count())
        println(f"""SOAK {"key":"$key","conf":"$tag","sec":$sec%.2f,"rows":$rows}""")
      } finally release()
    }
    section("sub") {
    val dSub = graft.ops.Scratch.dir("scalesoak_sub")
    val boiler40 = (0 until 40).map(i => s"bp$i").mkString(" ")
    spark.range(NDocs).toDF("doc_id")
      .withColumn("src", when(col("doc_id") === 101L, 100L)
        .when(col("doc_id") === 201L, 200L).otherwise(col("doc_id")))
      .withColumn("body", concat_ws(" ", (0 until 6).map(phraseCol): _*))
      .withColumn("text", when(pmod(col("src"), lit(5)) === 0,
        concat(lit(s"$boiler40 "), col("body"))).otherwise(col("body")))
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("scalesoak").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(8)
      .write.mode("overwrite").parquet(s"$dSub/documents.parquet")
    runAt("j56_substring_dedup", dSub, "sub40")
    runAt("j56b_substring_spans", dSub, "sub40")
    }

    // c18 binned range join vs its c12b SMJ twin on a HOT-USER events
    // fixture (r16): one bot user owns 60k events uniform over a year;
    // c12b's equi-join-on-user + post-filter shape materializes all
    // 60k²/2 = 1.8G same-key pairs of that user in ONE sort-merge group
    // (one task — parallelism can't help a single key), while c18 meets
    // pairs only inside shared 6-hour buckets (≈41 events per bucket,
    // ~2.5M comparisons total, spread across partitions) — the measured
    // kill of the hot-key quadratic the binned join exists for. 10k
    // background users × 10 events keep the non-skewed mass honest.
    // Output is identical (both hash-match the interval oracle at bench
    // SF, and both emit the same row count here).
    // cross-corpus decontam: j65's banded candidate path vs the
    // inverted-index brute twin (shared-shingle train×bench join, the
    // Σdf²-bounded shape boilerplate melts) — same split, same exact
    // verify, same output pairs
    section("decontam") {
      run("j65_decontam_fuzzy", Map.empty)
      val (sec, rows) = time {
        val sh = graft.ops.LlmOps.shingles(spark, d)
        val n = graft.ops.LlmOps.shingleCounts(spark, d)
        sh.where(col("doc_id") % 17 =!= 0).toDF("d1", "sh")
          .join(sh.where(col("doc_id") % 17 === 0).toDF("d2", "sh"), "sh")
          .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
          .join(n.toDF("d1", "n1"), "d1")
          .join(n.toDF("d2", "n2"), "d2")
          .where(col("inter").cast("double") /
            (col("n1") + col("n2") - col("inter")).cast("double") >= 0.5)
          .count()
      }
      println(f"""SOAK {"key":"brute_cross_decontam","conf":"sharedshingle","sec":$sec%.2f,"rows":$rows}""")
      release()
      // j73's excision core under the same %17 split: detection cost +
      // the covered-position explode (×4 on hit mass) + the per-doc
      // text regroup — measures what excision adds ON TOP of detection
      // on the boilerplate-heavy corpus (every boilerplate doc shares
      // grams with the bench partition's boilerplate docs)
      val (sec3, rows3) = time {
        val docs = spark.read.parquet(s"$d/documents.parquet")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .where(size(col("toks")) >= 4)
        graft.ops.Round16c.exciseStats(docs, col("doc_id") % 17 === 0)
          .where(col("removed_tokens") > 0).count()
      }
      println(f"""SOAK {"key":"j73_excise_cross","conf":"mod17","sec":$sec3%.2f,"rows":$rows3}""")
      release()
      // SEMANTIC leg at the 20k-vector corpus (r17 verdict item 4):
      // j90's brute bench×train cosine sweep vs j90b's IVF-pruned
      // candidate core, same bench split (every 400th vector → 50
      // probes). The soak's murmur3-uniform embeddings are the coarse
      // quantizer's WORST case, so this row measures scored-pair MASS
      // and wall, not recall (recall is pinned on the fixture corpus in
      // Round18Spec). rows = scored pairs: brute is |bench|·|train|;
      // IVF is Σ_probe (probed cells' train mass) — with the soak's
      // even vec_id%16 cells the even-cell bound 6/16 applies, unlike
      // the fixture's uneven cells.
      val emb20 = spark.read.parquet(s"$d/embeddings.parquet")
      val isB = pmod(col("vec_id"), lit(400)) === 0
      val (secBr, pairsBr) = time {
        val bench = emb20.where(isB)
          .select(col("vec_id").as("b_id"), col("embedding").as("e_b"))
        emb20.where(!isB).crossJoin(broadcast(bench))
          .select(round(graft.expressions.CosineSimilarity(spark,
            col("embedding"), col("e_b")), 6).as("cos"))
          .where(col("cos").isNotNull).count()
      }
      println(f"""SOAK {"key":"j90_brute_sweep","conf":"bench50","sec":$secBr%.2f,"rows":$pairsBr}""")
      release()
      val (secIv, pairsIv) = time {
        val tagged = emb20.select(col("vec_id"), col("embedding"),
          col("label"), isB.as("is_bench"))
        graft.ops.Round18.ivfPairs(tagged, nprobe = 6)
          .where(col("cos").isNotNull).count()
      }
      println(f"""SOAK {"key":"j90b_ivf_pruned","conf":"bench50,nprobe6","sec":$secIv%.2f,"rows":$pairsIv}""")
      release()
    }

    // pagination at depth: f4's OFFSET vs f5's keyset cursor, page 20 at
    // row 1,000,000 of a 2M-row sorted stream. OFFSET must materialize
    // and discard everything before the page; the keyset filter prunes
    // before the top-k, so page cost is depth-independent.
    section("page") {
      val dP = graft.ops.Scratch.dir("scalesoak_page")
      spark.range(2000000L).toDF("k")
        .select(col("k"), pmod(hash(col("k")), lit(100000)).as("ts"),
          md5(col("k").cast("string")).as("pay"))
        .coalesce(8).write.mode("overwrite").parquet(dP)
      val tbl = spark.read.parquet(dP)
      // cursor = last row before the page (computed once, untimed — in
      // production it arrives with the previous page's response)
      val cur = tbl.orderBy("ts", "k").offset(999999).limit(1)
        .select("ts", "k").collect()(0)
      val (sOff, nOff) = time {
        tbl.orderBy("ts", "k").offset(1000000).limit(20).count()
      }
      println(f"""SOAK {"key":"page_offset","conf":"depth1M","sec":$sOff%.2f,"rows":$nOff}""")
      release()
      val (sKey, nKey) = time {
        tbl.where(struct(col("ts"), col("k")) >
            struct(lit(cur.getInt(0)), lit(cur.getLong(1))))
          .orderBy("ts", "k").limit(20).count()
      }
      println(f"""SOAK {"key":"page_keyset","conf":"depth1M","sec":$sKey%.2f,"rows":$nKey}""")
      release()
    }

    // j79 composed recipe END-TO-END at 10× skew (r16 verdict item 5):
    // every stage is individually soaked above, but the COMPOSITION
    // (quality gate → paragraph dedup → perplexity cut → excision in one
    // lazy plan) is what a production run executes. The claim to prove:
    // the single-plan form does not recompute the corpus per stage — its
    // end-to-end cost must land near the SUM of its stage families run
    // separately (j9 + j1-class dedup + j68 + j73), not their product,
    // and the executed plan must show exchange reuse where stages share
    // the tokenized-train scan. Corpus: the boilerplate-skewed 40k-doc
    // generator with a %17 bench split (src0) and two languages so the
    // per-lang quantile cut is non-trivial.
    section("recipe") {
      val dR = graft.ops.Scratch.dir("scalesoak_recipe")
      spark.range(NDocs).toDF("doc_id")
        .withColumn("src", when(col("doc_id") === 101L, 100L)
          .when(col("doc_id") === 201L, 200L).otherwise(col("doc_id")))
        .withColumn("body", concat_ws(" ", (0 until 6).map(phraseCol): _*))
        .withColumn("text", when(pmod(col("src"), lit(3)) === 0,
          concat(lit(s"$BOILER "), col("body"))).otherwise(col("body")))
        .select(col("doc_id"), col("text"),
          when(pmod(col("doc_id"), lit(2)) === 0, "en").otherwise("fr")
            .as("lang"),
          when(pmod(col("doc_id"), lit(17)) === 0, "src0").otherwise("web")
            .as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .coalesce(8)
        .write.mode("overwrite").parquet(s"$dR/documents.parquet")
      // j79 under BOTH stage-cache settings, measuring WORK (input +
      // shuffle-write bytes summed over completed stages via listener)
      // alongside wall — wall alone misleads at this SF: duplicate
      // subtrees schedule in parallel across the 32 idle threads, so the
      // recompute multiplier (which grows with corpus mass) hides while
      // the one-off cache-fill pass shows. The work columns are what
      // extrapolate.
      def workOf(key: String, dir: String, confs: Map[String, String],
          tag: String): Unit = {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val inRec = new java.util.concurrent.atomic.AtomicLong
        val shuf = new java.util.concurrent.atomic.AtomicLong
        val cpuNs = new java.util.concurrent.atomic.AtomicLong
        val nStages = new java.util.concurrent.atomic.AtomicLong
        val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]
        val lis = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val m = e.stageInfo.taskMetrics
            if (m != null) {
              inRec.addAndGet(m.inputMetrics.recordsRead)
              shuf.addAndGet(m.shuffleWriteMetrics.bytesWritten)
              cpuNs.addAndGet(m.executorCpuTime)
              nStages.incrementAndGet()
              stages.add(f"${m.executorRunTime}ms ${e.stageInfo.name.takeWhile(_ != '\n').take(60)}")
            }
          }
        }
        spark.sparkContext.addSparkListener(lis)
        try {
          val (sec, rows) = time(SparkEntry.queries(key)(spark, dir).count())
          Thread.sleep(2000) // listener bus drain
          println(f"""SOAK {"key":"$key","conf":"$tag","sec":$sec%.2f,"rows":$rows,"scan_rows":${inRec.get},"shuffle_mb":${shuf.get / 1048576},"cpu_sec":${cpuNs.get / 1e9}%.1f,"stages":${nStages.get}}""")
          if (sys.env.contains("SOAK_STAGE_DUMP"))
            stages.toArray.map(_.toString)
              .sortBy(s => -s.takeWhile(_ != 'm').toLong)
              .take(8).foreach(s => System.err.println(s"STAGE $s"))
        } finally {
          spark.sparkContext.removeSparkListener(lis)
          confs.keys.foreach(spark.conf.unset)
          release()
        }
      }
      workOf("j79_data_recipe", dR, Map.empty, "skew10x,stageCache=on")
      // r17 verdict item 5 — the CORPUS cache-level ladder: the narrow
      // flag tables persist in all three rows; only the parsed-corpus
      // copy (the 100-TB-scale storage question) changes level. scan_rows
      // is the column that extrapolates: `none` re-parses the corpus per
      // stage reference, so its scan mass is the no-cache multiplier
      // while its shuffle/cpu stay flat (flags still cached).
      workOf("j79_data_recipe", dR,
        Map(graft.ops.Knobs.RecipeCorpusCacheLevelKey -> "disk_only"),
        "skew10x,corpus=disk_only")
      workOf("j79_data_recipe", dR,
        Map(graft.ops.Knobs.RecipeCorpusCacheLevelKey -> "none"),
        "skew10x,corpus=none")
      workOf("j79_data_recipe", dR,
        Map(graft.ops.Knobs.RecipeStageCacheKey -> "false"),
        "skew10x,stageCache=off")
      // stage families separately on the SAME corpus — the sum is the
      // "no recompute multiplier" yardstick for the composed number above
      Seq("j9_text_quality", "j1_dedup_exact", "j68_perplexity_buckets",
        "j73_decontam_excise").foreach(k => runAt(k, dR, "skew10x"))
      // the r17 planning keys on the same skewed corpus: j86 must price
      // the boilerplate bucket as the dominant pair mass (the number
      // that justifies the pairMaxDf cap BEFORE running j2), j84's
      // novelty attribution is one more gram-exchange-shaped pass
      Seq("j86_dedup_cost_model", "j84_ngram_novelty")
        .foreach(k => runAt(k, dR, "skew10x"))
      // r18: the Kneser-Ney table on the same skewed corpus — one gram
      // exchange + two vocab-sized re-aggregations; boilerplate skew
      // concentrates bigram mass exactly like production web text
      runAt("j96_kneser_ney", dR, "skew10x")
    }

    // j104's scale claim head-to-head (r18 s2): exact AUC via the
    // per-score histogram (the key) vs the textbook per-doc rank window
    // (the naive shape). At 400k docs the histogram collapses to the
    // distinct-score relation BEFORE the single-partition rank window,
    // so the window input is what extrapolates: bounded at 10^6 rows by
    // 6-dp rounding for the key, = corpus size for the naive. Work
    // metrics (listener records/shuffle/cpu) land beside wall because
    // 32 idle local threads hide single-reducer stalls at this SF.
    section("auc") {
      val dAuc = graft.ops.Scratch.dir("scalesoak_auc")
      val NA = sys.env.getOrElse("SOAK_AUC_DOCS", "4000000").toLong
      spark.range(NA).toDF("doc_id")
        .withColumn("src", col("doc_id"))
        .withColumn("body", concat_ws(" ", (0 until 6).map(phraseCol): _*))
        .withColumn("text", when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("the a of and in the "), col("body")))
          .otherwise(col("body")))
        .select(col("doc_id"), col("text"),
          when(pmod(col("doc_id"), lit(2)) === 0, "en").otherwise("fr")
            .as("lang"),
          lit("web").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .coalesce(8)
        .write.mode("overwrite").parquet(s"$dAuc/documents.parquet")
      def workDf(tag: String)(body: => Long): Unit = {
        val inRec = new java.util.concurrent.atomic.AtomicLong
        val shuf = new java.util.concurrent.atomic.AtomicLong
        val cpuNs = new java.util.concurrent.atomic.AtomicLong
        val lis = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val m = e.stageInfo.taskMetrics
            if (m != null) {
              inRec.addAndGet(m.inputMetrics.recordsRead)
              shuf.addAndGet(m.shuffleWriteMetrics.bytesWritten)
              cpuNs.addAndGet(m.executorCpuTime)
            }
          }
        }
        spark.sparkContext.addSparkListener(lis)
        try {
          val (sec, rows) = time(body)
          Thread.sleep(2000) // listener bus drain
          println(f"""SOAK {"key":"auc","conf":"$tag","sec":$sec%.2f,"rows":$rows,"scan_rows":${inRec.get},"shuffle_mb":${shuf.get / 1048576},"cpu_sec":${cpuNs.get / 1e9}%.1f}""")
        } finally {
          spark.sparkContext.removeSparkListener(lis)
          release()
        }
      }
      workDf("histogram_window(j104)") {
        SparkEntry.queries("j104_roc_auc")(spark, dAuc).count()
      }
      // the naive shape, implemented FAIRLY (one aggregation pass after
      // the ranking, no recompute): every corpus row flows through the
      // global ORDER BY score window
      workDf("naive_corpus_rank") {
        import org.apache.spark.sql.expressions.Window
        val ranked = graft.ops.Round9.j49Scored(spark, dAuc)
          .select(col("score"), (col("swf") >= 0.03).cast("int").as("l"))
          .withColumn("rk", rank().over(Window.orderBy("score")))
          .withColumn("cnt",
            count(lit(1)).over(Window.partitionBy("score")))
          .withColumn("avgrk", col("rk") + (col("cnt") - 1) / 2.0)
        ranked.agg(
            sum(when(col("l") === 1, col("avgrk"))).as("rp"),
            sum(col("l")).cast("long").as("p"),
            count(lit(1)).as("n"))
          .select(round((col("rp") - col("p") * (col("p") + 1) / 2.0) /
            (col("p") * (col("n") - col("p"))), 6).as("auc"))
          .count()
      }
      val distinctScores = graft.ops.Round9.j49Scored(spark, dAuc)
        .select("score").distinct().count()
      release()
      println(s"""SOAK {"diag":"auc_hist_rows","corpus":$NA,"distinct_scores":$distinctScores}""")
    }

    section("ev") {
    val dEv = graft.ops.Scratch.dir("scalesoak_ev")
    val yearMs = 365L * 86400 * 1000
    spark.range(160000L).toDF("event_id")
      .select(col("event_id"),
        when(col("event_id") < 60000L, 0L)
          .otherwise(expr("1 + (event_id - 60000) div 10")).as("user_id"),
        // bot: uniform hash-spray over the year; background: same spray
        expr(s"timestamp_millis(1704067200000 + pmod(hash(event_id), ${yearMs}))")
          .as("ts"))
      .coalesce(8)
      .write.mode("overwrite").parquet(s"$dEv/events.parquet")
    runAt("c18_join_range_binned", dEv, "hotuser60k")
    runAt("c12b_join_interval_smj", dEv, "hotuser60k")
    }

    // retrieval-eval scaling claim (r18-s3): the trio's scaladocs argue
    // the 20-probe sweep costs a small CONSTANT number of corpus scans
    // (the probe side broadcasts) — never probes×corpus. scan_rows here
    // is the SUM of numOutputRows over every FileSourceScanExec of the
    // key's own executed plan (exact, unlike stage-level
    // inputMetrics.recordsRead, which this harness measured reporting 0
    // for AQE shuffle-map parquet stages — accounting gap noted in
    // BASELINE). j3 (1-row probe, one corpus pass + one pruned probe
    // file) calibrates the unit. j113 is excluded from the scan table:
    // its corpus work runs inside eager localCheckpoints whose plans
    // are not reachable afterwards — its evidence is the recorded
    // 5.15 s → 1.02 s checkpoint delta and the plan collapse.
    section("evalm") {
      def scanOf(key: String): Unit = {
        try {
          val df = SparkEntry.queries(key)(spark, d)
          val t0 = System.nanoTime()
          val rows = df.collect().length
          val sec = (System.nanoTime() - t0) / 1e9
          def scans(p: org.apache.spark.sql.execution.SparkPlan)
              : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
            p match {
              case a: org.apache.spark.sql.execution.adaptive
                    .AdaptiveSparkPlanExec => scans(a.executedPlan)
              // materialized AQE stages are LEAVES of the final plan —
              // the real scan subtrees hang off their `plan` member
              case q: org.apache.spark.sql.execution.adaptive
                    .QueryStageExec => scans(q.plan)
              case r: org.apache.spark.sql.execution.exchange
                    .ReusedExchangeExec => Seq.empty // counted at source
              case s: org.apache.spark.sql.execution.FileSourceScanExec =>
                Seq(s)
              case o => o.children.flatMap(scans) ++
                o.subqueries.flatMap(scans)
            }
          val scanRows = scans(df.queryExecution.executedPlan)
            .map(_.metrics("numOutputRows").value).sum
          println(f"""SOAK {"key":"$key","conf":"20k_vecs","sec":$sec%.2f,"rows":$rows,"scan_rows":$scanRows}""")
        } finally release()
      }
      Seq("j3_sim_topk", "j105_ndcg", "j106_mrr", "j107_recall_at_k")
        .foreach(scanOf)
    }

    // j108's scale claim (r18 verdict item 6): the triangle census is
    // bounded-relation algebra AFTER one materialization of the oriented
    // kNN edge relation — so what must stay flat as the corpus grows is
    // the exchange count of the post-checkpoint plan (the edge relation
    // itself is k-bounded: |edges| <= k·|vecs|). scan_rows is blind here
    // (the corpus scan runs inside the eager localCheckpoint, j113's
    // documented accounting gap), so the soak records wall, the plan's
    // exchange count, and the edge mass actually checkpointed.
    // conversation-level dedup at 10x the graded corpus: the r20 claim to
    // pin is that the PAIR RELATION stays LSH-band-bounded (linear-ish in
    // corpus: the |docs|/9 planted re-renders plus phrase-pool near-dups),
    // never the quadratic all-pairs shape — and that the survivor pass
    // (CC + corpus join) rides the same bound
    section("conv") {
      try {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries("j120_dedup_conversation")(spark, d)
        val n = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val exch = "Exchange".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
        val planted = (8L until NDocs by 9L).size
        println(f"""SOAK {"key":"j120_dedup_conversation","conf":"10x_docs","sec":$sec%.2f,"pairs":$n,"planted":$planted,"exchanges":$exch}""")
      } finally release()
      run("j122_conversation_survivors", Map.empty)
    }

    // j119's water-fill is O(|S|²) interpreted-lambda work inside ONE
    // aggregate() expression evaluated on a single row (r20 verdict watch
    // item / r21 hand-down): ≤|S|+1 rounds × O(|S|) array arithmetic,
    // zero parallelism by construction. Measure it at catalog scales the
    // fixtures never reach — |S| = 1k and 10k sources (docs = 2·|S| so
    // the corpus scan stays trivial and the fold is the only thing that
    // grows). The fixture-scale fold (|S| ≈ 20) is sub-second; the
    // verdict threshold is "if the interpreted-HOF wall exceeds ~seconds
    // at 10k, restructure to a driver-bounded loop" (j48's precedent).
    section("sched") {
      Seq(1000L, 10000L).foreach { s =>
        val d2 = graft.ops.Scratch.dir(s"soak_sched_$s")
        spark.range(2L * s).toDF("doc_id")
          .select(col("doc_id"),
            concat_ws(" ", (0 until 8).map(k =>
              format_string(s"w%dk$k", pmod(col("doc_id"), lit(97)))): _*)
              .as("text"),
            lit("en").as("lang"),
            format_string("src%05d", pmod(col("doc_id"), lit(s))).as("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .coalesce(4)
          .write.mode("overwrite").parquet(s"$d2/documents.parquet")
        try {
          val t0 = System.nanoTime()
          val n = SparkEntry.queries("j119_epoch_redistribute")(spark, d2).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"""SOAK {"key":"j119_epoch_redistribute","conf":"S=$s","sec":$sec%.2f,"rows":$n}""")
        } finally release()
      }
    }

    section("graphm") {
      try {
        // time CONSTRUCTION too: j108 runs the corpus-proportional LSH
        // candidate join + edge localCheckpoint eagerly while the query
        // is built — starting the clock at collect() would exclude the
        // dominant stage (r19 review finding)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries("j108_graph_triangles")(spark, d)
        val out = df.collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val exch = "Exchange".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
        // n_edges is column 1 of the single output row
        val edges = if (out.nonEmpty) out(0).getLong(1) else -1L
        println(f"""SOAK {"key":"j108_graph_triangles","conf":"20k_vecs","sec":$sec%.2f,"rows":${out.length},"n_edges":$edges,"exchanges":$exch}""")
      } finally release()
    }

    spark.stop()
  }
}
