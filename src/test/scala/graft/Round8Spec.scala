package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round8Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private def run(key: String) =
    SparkEntry.queries(key)(spark, TestSpark.sf)

  test("j42 BM25 agrees with a driver-side reference scorer") {
    val qTerms = Seq("table", "scan", "join", "filter",
      "window", "agg", "sort", "hash")
    val docs = Tables.t(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ").toSeq)
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val tf = docs.flatMap { case (id, toks) =>
      toks.filter(qTerms.contains).groupBy(identity)
        .map { case (t0, occ) => (id, t0, occ.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t0, rs) => t0 -> rs.length.toLong }
    val scores = tf.groupBy(_._1).map { case (id, rs) =>
      val dl = docs.find(_._1 == id).get._2.length.toLong
      id -> rs.map { case (_, t0, f) =>
        BigDecimal(math.log((n - df(t0) + 0.5) / (df(t0) + 0.5) + 1.0)
            * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl / avgdl)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
    }
    val expected = scores.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
    val got = run("j42_bm25").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(got.length == math.min(10, expected.length))
    got.zip(expected).foreach { case ((gid, gsc), (eid, esc)) =>
      assert(gid == eid, s"rank order: got doc $gid, expected $eid")
      assert(math.abs(gsc - esc) < 1e-4, s"doc $gid: $gsc vs $esc")
    }
  }

  test("a23 version-1 read is immune to the version-2 append") {
    val orders = Tables.t(spark, TestSpark.sf, "orders")
    val v1Expect = orders.where(col("o_orderkey") % 3 =!= 0).count()
    val v2Expect = orders.count()
    val out = run("a23_time_travel").collect()
      .groupBy(_.getAs[Long]("version"))
      .view.mapValues(_.map(_.getAs[Long]("n_orders")).sum).toMap
    assert(out(1L) == v1Expect,
      s"v1 must still see only batch 1 after the append: ${out(1L)} vs $v1Expect")
    assert(out(2L) == v2Expect, s"v2 must see everything: ${out(2L)} vs $v2Expect")
  }

  test("a24 version diff reads exactly the appended batch") {
    val orders = Tables.t(spark, TestSpark.sf, "orders")
    val batch2 = orders.where(col("o_orderkey") % 3 === 0).count()
    val out = run("a24_version_diff").collect()
    assert(out.map(_.getAs[Long]("n_orders")).sum == batch2,
      "the delta must be batch 2, nothing more, nothing less")
  }

  test("j43 RRF fuses both legs: scores decompose into the two rank terms") {
    val out = run("j43_rrf_fusion").collect()
    assert(out.length == 10)
    out.foreach { r =>
      val rLex = Option(r.getAs[java.lang.Long]("r_lex")).map(_.toLong)
      val rVec = Option(r.getAs[java.lang.Long]("r_vec")).map(_.toLong)
      assert(rLex.isDefined || rVec.isDefined, s"row with no leg: $r")
      val expect = rLex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rVec.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") -
        BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"rrf must be 1/(60+r_lex) + 1/(60+r_vec): $r")
    }
    // fused output is ordered and a doc present in BOTH legs at equal
    // ranks dominates one present in a single leg at the same rank
    val scores = out.map(_.getAs[Double]("rrf"))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  test("j44 split moves whole near-dup clusters; assignment matches j15's device") {
    val out = run("j44_cluster_safe_split").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("bucket"), r.getAs[String]("split")))
    val nDocs = Tables.t(spark, TestSpark.sf, "documents").count()
    assert(out.length == nDocs, "every document must be assigned")
    // one split per cluster — the leakage guard itself
    out.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._4).toSet.size == 1,
        s"cluster $c straddles splits: ${members.toSeq}")
    }
    // cluster ids are component minima (≤ every member's doc_id)
    assert(out.forall { case (id, c, _, _) => c <= id })
    // bucket→split thresholds are j15's
    out.foreach { case (_, _, b, sp) =>
      val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(sp == expect)
    }
    // near-dup pairs exist in the fixture, so at least one real (>1 doc)
    // cluster must have moved as a unit
    assert(out.groupBy(_._2).exists(_._2.length > 1),
      "fixture must contain at least one nontrivial cluster")
  }

  test("a25 merge rewrites only stats-selected files; untouched files carry forward") {
    val c = graft.ops.Round8.mergeCommit(spark, TestSpark.sf, "a25t")
    assert(c.v1.size == 8, s"range-partitioned base must be 8 files: ${c.v1.size}")
    assert(c.affected.nonEmpty, "fixture must contain matched keys")
    assert(c.affected.subsetOf(c.candidates) && c.candidates.subsetOf(c.v1))
    assert(c.candidates.size < c.v1.size,
      s"stats must prune: ${c.candidates.size} of ${c.v1.size} files scanned")
    assert((c.v1 -- c.affected).subsetOf(c.v2),
      "every untouched v1 file must carry forward into v2 by reference")
    // contents: updates applied exactly once, inserts present, rest intact
    val orders = Tables.t(spark, TestSpark.sf, "orders")
    val mx = orders.agg(max(col("o_orderkey"))).head().getLong(0)
    val lo = mx / 8
    val v2 = spark.read.parquet(c.v2.toSeq: _*)
    val nIns = orders.where(col("o_orderkey") % 499 === 0).count()
    assert(v2.count() == orders.count() + nIns, "merged cardinality")
    val mism = v2.join(orders.select(col("o_orderkey"),
        col("o_totalprice").as("orig")), "o_orderkey")
      .where(
        when(col("o_orderkey") % 7 === 0 && col("o_orderkey") <= lo,
          col("o_totalprice") =!= col("orig") * 2)
        .otherwise(col("o_totalprice") =!= col("orig")))
      .count()
    assert(mism == 0, s"$mism rows with wrong post-merge price")
  }

  test("a26 delete is copy-on-write and the vacuum set is exactly the rewritten files") {
    val c = graft.ops.Round8.deleteCommit(spark, TestSpark.sf, "a26t")
    assert(c.affected.nonEmpty && c.affected.size < c.v1.size,
      "delete must rewrite a strict subset of the table's files")
    assert((c.v1 -- c.v2) == c.affected,
      "files unreferenced by v2 (the vacuumable set) must be exactly the rewritten ones")
    val orders = Tables.t(spark, TestSpark.sf, "orders")
    val lo = orders.agg(max(col("o_orderkey"))).head().getLong(0) / 8
    val v2 = spark.read.parquet(c.v2.toSeq: _*)
    assert(v2.where(col("o_orderkey") % 3 === 0 && col("o_orderkey") <= lo)
      .count() == 0, "no deleted row may survive in v2")
    assert(v2.count() == orders
      .where(!(col("o_orderkey") % 3 === 0 && col("o_orderkey") <= lo)).count(),
      "only matching rows may be deleted")
  }

  test("i16 stream commits atomic-prefix versions; a replay commits nothing new") {
    import graft.ops.Scratch
    val (src, tbl, mani, ck) = (Scratch.dir("i16tsrc"), Scratch.dir("i16ttbl"),
      Scratch.dir("i16tmani"), Scratch.dir("i16tck"))
    graft.streaming.Streams.i16CountVersions = true
    val agg = graft.streaming.Streams
      .i16Run(spark, TestSpark.sf, src, tbl, mani, ck).collect()
    val vs = graft.streaming.Streams.i16Versions
    val total = Tables.events(spark, TestSpark.sf).count()
    assert(vs.size >= 2, s"rate limit must split the drain into >1 version: $vs")
    assert(vs.map(_._2) == vs.map(_._2).sorted && vs.map(_._2).distinct == vs.map(_._2),
      s"version row counts must be strictly increasing prefixes: $vs")
    assert(vs.last._2 == total, "latest version must hold the full stream")
    assert(agg.map(_.getAs[Long]("n")).sum == total)
    // pinned read: version 0 still resolves to its original prefix even
    // though later versions exist on disk
    val v0 = spark.read.parquet(
      spark.read.parquet(s"$mani/v=${vs.head._1}")
        .collect().map(_.getString(0)).toIndexedSeq: _*).count()
    assert(v0 == vs.head._2, "pinned version must be immune to later commits")
    // exactly-once: a replay over the same checkpoint re-reads nothing
    // and commits no new version
    graft.streaming.Streams.i16Run(spark, TestSpark.sf, src, tbl, mani, ck)
    graft.streaming.Streams.i16CountVersions = false
    assert(graft.streaming.Streams.i16Versions == vs,
      "a restarted run must not re-commit or extend any version")
  }

  test("d22 hour-sketch rollup reconciles with exact daily uniques") {
    val out = run("d22_hll_time_rollup").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("est_users") == r.getAs[Long]("exact_users"),
        s"day ${r.getAs[Long]("day")}: union estimate must be exact below saturation")
      assert(r.getAs[Long]("n_hours") >= 1 && r.getAs[Long]("n_hours") <= 24)
    }
    val days = Tables.events(spark, TestSpark.sf)
      .select(expr("ts_ms div 86400000")).distinct().count()
    assert(out.length == days, "one row per day present in the fixture")
  }

  test("i20 stream-built sketch table equals batch d22; replay and re-merge are no-ops") {
    import graft.ops.Scratch
    val (src, tbl, ck) =
      (Scratch.dir("i20tsrc"), Scratch.dir("i20ttbl"), Scratch.dir("i20tck"))
    def versions() = Option(new java.io.File(tbl).listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.startsWith("v="))
      .map(_.drop(2).toLong).toIndexedSeq.sorted
    val out = graft.streaming.Streams
      .i20Run(spark, TestSpark.sf, src, tbl, ck).collect()
    // the stream-maintained pre-aggregate serves the same day rollup as
    // the batch-built one (column-for-column — same d22 algebra)
    val batch = run("d22_hll_time_rollup").collect()
    assert(out.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    val vs = versions()
    assert(vs.size >= 2, s"rate limit must split the drain into >1 version: $vs")
    // register-max idempotence: merging the final table with itself moves
    // no estimate — the property that makes sketch maintenance retry-safe
    val tblDf = spark.read.parquet(s"$tbl/v=${vs.last}")
    def estimates(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("day", "hour").agg(expr("hll_union_agg(sk)").as("sk"))
      .select(col("day"), col("hour"),
        expr("CAST(hll_sketch_estimate(sk) AS BIGINT)").as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(estimates(tblDf.unionAll(tblDf)) == estimates(tblDf))
    // exactly-once: a replay over the same checkpoint commits no new
    // version and reproduces the identical rollup
    val out2 = graft.streaming.Streams
      .i20Run(spark, TestSpark.sf, src, tbl, ck).collect()
    assert(out2.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
    assert(versions() == vs, "a restarted run must not commit a new version")
  }

  test("j45 sketch overlap equals the exact pairwise intersection in the coupon regime") {
    val fps = Tables.t(spark, TestSpark.sf, "documents")
      .select(col("source"),
        expr("cast(conv(substring(md5(text),1,4),16,10) as bigint) % 512").as("fp"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val out = run("j45_corpus_overlap").collect()
    assert(out.length == fps.size * (fps.size - 1) / 2, "one row per unordered pair")
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(a < b)
      assert(r.getAs[Long]("nd_a") == fps(a).size)
      assert(r.getAs[Long]("nd_union") == (fps(a) ++ fps(b)).size,
        s"union estimate must be exact below saturation: $a/$b")
      assert(r.getAs[Long]("nd_overlap") == (fps(a) & fps(b)).size,
        s"inclusion-exclusion must recover the exact intersection: $a/$b")
    }
    // the diagnostic is non-degenerate on the fixture: some pair overlaps
    assert(out.exists(_.getAs[Long]("nd_overlap") > 0))
  }

  test("j42 BM25 ranks the saturating property correctly on a planted corpus") {
    // one doc stuffed with a rare query term must outrank docs with a
    // common one (idf), and tf saturates: 50 occurrences don't score 50x
    import spark.implicits._
    val dir = graft.ops.Scratch.dir("bm25")
    val filler = (0 until 50).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (0L, s"join $filler"),                                  // rare term, tf=1
      (1L, (0 until 50).map(_ => "table").mkString(" ") + " " + filler), // common term, tf=50
      (2L, s"table $filler"),                                 // common term, tf=1
      (3L, filler))                                           // no query terms
    // make 'table' common: 30 more docs containing it once
    val common = (10L until 40L).map(i => (i, s"table doc$i $filler"))
    (docs ++ common).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fx"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("j42_bm25")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toMap
    assert(!out.contains(3L), "doc with no query terms must not appear")
    assert(out(0L) > out(2L), "rare-term doc must outrank common-term doc (idf)")
    // tf saturation: 50x tf gives < 3x the tf=1 score with k1=1.2
    assert(out(1L) < 3.0 * out(2L),
      s"tf must saturate: tf=50 ${out(1L)} vs tf=1 ${out(2L)}")
    assert(out(1L) > out(2L), "more matches still rank higher")
  }
}
