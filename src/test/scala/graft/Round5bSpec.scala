package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 session-2 operators: TD time-format parity (h18), engine-side
  * resample+ffill (h19), describe (d20), SemDeDup (j31), DSIR importance
  * weighting (j32), manifest-incremental ingest (a22) and bounded-batch
  * stream backfill (i14). The oracle checks outputs; these tests pin the
  * semantic invariants the oracle can't see (roundtrips, gap-fill actually
  * firing, brute-force agreement, batch splitting). */
class Round5bSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def run(key: String) = SparkEntry.queries(key)(spark, TestSpark.sf)

  test("h18: td_time_parse inverts td_time_format on every row") {
    val rows = run("h18_td_time_format").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("t_sec")) == r.getLong(r.fieldIndex("t_roundtrip")),
        s"roundtrip broke: $r")
      val h = r.getInt(r.fieldIndex("hour_of_day"))
      assert(h >= 0 && h <= 23)
    }
  }

  test("h19: spine is complete and gap days carry the last seen value") {
    val rows = run("h19_resample_ffill").collect()
    assert(rows.length == 30, "one row per spine day, observed or not")
    // fixture sparsity: some days must have no qualifying events (else the
    // op degenerates to a plain daily agg and ffill is never exercised)
    val gaps = rows.filter(_.getLong(2) == 0L)
    assert(gaps.nonEmpty, "expected gap days at this SF")
    // LOCF: a gap day's value equals the previous day's filled value
    rows.sliding(2).foreach {
      case Array(prev, cur) if cur.getLong(2) == 0L =>
        assert(cur.getDouble(1) == prev.getDouble(1),
          s"gap day ${cur.getString(0)} not filled from previous")
      case _ =>
    }
  }

  test("d20: describe stats are internally consistent") {
    val rows = run("d20_describe").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows.keySet == Set("count", "mean", "std", "min", "q25", "q50", "q75", "max"))
    for (i <- Seq[((Double, Double)) => Double](_._1, _._2)) {
      assert(i(rows("min")) <= i(rows("q25")))
      assert(i(rows("q25")) <= i(rows("q50")))
      assert(i(rows("q50")) <= i(rows("q75")))
      assert(i(rows("q75")) <= i(rows("max")))
      assert(i(rows("min")) <= i(rows("mean")) && i(rows("mean")) <= i(rows("max")))
      assert(i(rows("std")) >= 0)
    }
  }

  test("j31: kept set matches a brute-force within-cell SemDeDup") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val dropped = (for {
      a <- e; b <- e
      if a._2 == b._2 && a._1 < b._1 &&
        BigDecimal(cos(a._3, b._3)).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.35
    } yield b._1).toSet
    val got = run("j31_semdedup").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got.size == e.length)
    e.foreach { case (id, _, _) =>
      val expect = if (dropped(id)) 0 else 1
      assert(got(id) == expect, s"vec $id kept=${got(id)} expected $expect")
    }
  }

  test("j32: importance weights upweight target-like docs, exclude the target") {
    val rows = run("j32_importance_weight").collect()
    assert(rows.nonEmpty)
    // target-domain docs never appear in the scored output
    val src = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach(r => assert(src(r.getLong(0)) != "src0"))
    // descending by weight
    val ws = rows.map(_.getDouble(1)).toSeq
    assert(ws == ws.sorted.reverse)
    assert(ws.forall(_ > 0))
  }

  test("j33: shard streams are contiguous and bins cut at 2048") {
    val rows = run("j33_sequence_pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_._1)
      // each doc starts exactly where the previous one ended
      inOrder.sliding(2).foreach {
        case Array((_, _, n1, off1, _), (_, _, _, off2, _)) =>
          assert(off2 == off1 + n1, "stream gap within shard")
        case _ =>
      }
      inOrder.foreach { case (_, _, _, off, bin) => assert(bin == off / 2048) }
    }
  }

  test("j34: chunks cover every token and advance by the stride") {
    val rows = run("j34_chunk_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nTok = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val inOrder = cs.sortBy(_._2)
      inOrder.zipWithIndex.foreach { case ((_, cid, start, len), i) =>
        assert(cid == i && start == i * 48L && len >= 1)
      }
      val (_, _, lastStart, lastLen) = inOrder.last
      assert(lastStart + lastLen == nTok(doc), s"doc $doc tail uncovered")
      inOrder.dropRight(1).foreach { case (_, _, start, len) =>
        assert(len == 64L, s"doc $doc non-final chunk not full-width")
      }
    }
  }

  test("m5: re-crawled shard collapses to one copy per digest") {
    val rows = run("m5_binary_dedup").collect()
    assert(rows.nonEmpty)
    // sf0.001 has no natural exact dups, so every group is the re-crawl
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_copies")) == 2L)
      assert(r.getLong(r.fieldIndex("keep_id")) % 7 == 0)
    }
  }

  test("m1/m5 byte semantics: non-ASCII payloads count UTF-8 bytes, not characters") {
    // Spark length(binary) counts BYTES; DuckDB length(VARCHAR) counts
    // CHARACTERS — the oracles use strlen (bytes) so both engines agree on
    // non-ASCII text, and this fixture is the proof the bench corpus
    // (pure ASCII) can't give: é/ö are 2 UTF-8 bytes, ☃ is 3.
    import spark.implicits._
    val dir = graft.ops.Scratch.dir("nonascii")
    val docs = Seq((0L, "héllo wörld ☃"), (7L, "plain ascii"))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("fx"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val utf8 = docs.map { case (id, t) => id -> t.getBytes("UTF-8").length.toLong }.toMap
    val chars = docs.toMap
    val m1 = SparkEntry.queries("m1_binary_meta")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bytes")).toMap
    assert(m1 == utf8, s"m1 n_bytes $m1 != UTF-8 byte counts $utf8")
    assert(m1(0L) > chars(0L).length.toLong,
      "non-ASCII row must count bytes > chars (the strlen contract)")
    // m5's bytes_saved rides the same byte length; both fixture docs land
    // in the re-crawled doc_id%7==0 shard, so both form 2-copy groups
    val m5 = SparkEntry.queries("m5_binary_dedup")(spark, dir).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("bytes_saved")).toMap
    assert(m5 == utf8, s"m5 bytes_saved $m5 != UTF-8 byte counts $utf8")
  }

  test("j35: pipeline stages filter monotonically and survivors obey the gates") {
    val rows = run("j35_corpus_pipeline").collect()
    assert(rows.nonEmpty)
    val filtered = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .where(col("lang").isin("en", "de") && col("n_chars") >= 120 &&
        size(split(col("text"), " ")) >= 20)
    assert(rows.length < filtered.count(), "dedup stages dropped nothing")
    rows.foreach { r =>
      assert(Set("en", "de")(r.getString(r.fieldIndex("lang"))))
      assert(r.getLong(r.fieldIndex("n_tok")) >= 20)
      assert(r.getLong(r.fieldIndex("shard")) == r.getLong(0) % 8)
    }
  }

  test("i15: streamed band-index candidates contain every verified near-dup pair") {
    val cands = run("i15_stream_band_index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.nonEmpty)
    // the stream must never LOSE a pair the exact batch verify confirms
    val verified = run("j28_dedup_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(cands),
      s"band index lost verified pairs: ${verified -- cands}")
  }

  test("h20: funnel stage times are ordered and inside their conversion windows") {
    val rows = run("h20_funnel").collect()
    assert(rows.nonEmpty)
    val stages = rows.map(_.getInt(4))
    assert(stages.exists(_ < 3), "fixture must show drop-off, else the windows prove nothing")
    rows.foreach { r =>
      val tv = r.getLong(1)
      if (!r.isNullAt(2)) {
        val tc = r.getLong(2)
        assert(tc > tv && tc <= tv + 86400000L)
        if (!r.isNullAt(3)) {
          val tp = r.getLong(3)
          assert(tp > tc && tp <= tc + 86400000L)
        }
      } else assert(r.isNullAt(3), "purchase without click is impossible")
    }
  }

  test("a22: incremental result equals the single-pass full read") {
    val inc = run("a22_incremental_manifest").collect().map(_.toSeq).toSeq
    val full = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")), 4)
          .cast("double").as("sum_price"))
      .orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
    assert(inc == full)
  }

  test("i14: backfill drains in multiple bounded micro-batches, losslessly") {
    val agg = run("i14_stream_backfill").collect().map(_.toSeq).toSeq
    assert(graft.streaming.Streams.i14Batches > 1,
      s"expected >1 micro-batch, got ${graft.streaming.Streams.i14Batches}")
    val full = Tables.events(spark, TestSpark.sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,4)")), 4)
          .cast("double").as("sum_v"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(agg == full)
  }
}
