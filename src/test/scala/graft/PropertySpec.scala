package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Td, WeightedMean}

/** Property tests (SURVEY.md §6.2): td_time_range boundary semantics,
  * sessionize gap invariants, WeightedMean merge laws. Uses raw scalacheck
  * generators with fixed seeds (scalatest+scalacheck only — no
  * scalatestplus bridge in the offline dependency set). */
class PropertySpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("WeightedMean merge is commutative/associative with zero identity") {
    val g = Gen.listOfN(6, Gen.zip(Gen.choose(0.0, 1e5), Gen.choose(0.0, 50.0)))
    samples(Gen.zip(g, g), 50).foreach { case (xs, ys) =>
      val bx = xs.foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      val by = ys.foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      assert(WeightedMean.merge(bx, by) == WeightedMean.merge(by, bx))
      assert(WeightedMean.merge(bx, WeightedMean.zero) == bx)
      val whole = (xs ++ ys).foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      assert(WeightedMean.finish(WeightedMean.merge(bx, by)) == WeightedMean.finish(whole))
    }
  }

  test("j73 excision core matches a driver-side reference on random corpora") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // tiny alphabet so 4-gram collisions are common; doc lengths 4..12
    val tokGen = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.choose(4, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val corpusGen = Gen.listOfN(8, docGen)
    samples(corpusGen, 20).foreach { corpus =>
      val docs = corpus.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      val isBench = (id: Long) => id % 3 == 0
      // reference: bench gram set → covered spans → excise, plain Scala
      val benchGrams = docs.filter(d => isBench(d._1))
        .flatMap(_._2.sliding(4).filter(_.size == 4).map(_.mkString(" ")))
        .toSet
      val expected = docs.filterNot(d => isBench(d._1)).map { case (id, ts) =>
        val covered = (1 to ts.size - 3)
          .filter(p => benchGrams.contains(ts.slice(p - 1, p + 3).mkString(" ")))
          .flatMap(p => p to p + 3).toSet
        val kept = ts.zipWithIndex.collect {
          case (t, i0) if !covered(i0 + 1) => t
        }
        (id, ts.size.toLong, (ts.size - kept.size).toLong,
          md5hex(kept.mkString(" ")))
      }.sortBy(_._1)
      val df = docs.toDF("doc_id", "toks")
      val got = graft.ops.Round16c
        .exciseStats(df, col("doc_id") % 3 === 0)
        .orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq
      assert(got == expected, s"corpus=$docs")
    }
  }

  test("td_interval parses signed compound duration specs") {
    assert(Td.tdIntervalSeconds("-7d") == -7L * 86400)
    assert(Td.tdIntervalSeconds("12h") == 12L * 3600)
    assert(Td.tdIntervalSeconds("+90m") == 90L * 60)
    assert(Td.tdIntervalSeconds("2w") == 2L * 604800)
    assert(Td.tdIntervalSeconds("-30s") == -30L)
    assert(Td.tdIntervalSeconds("1d12h") == 86400L + 12 * 3600)
    intercept[IllegalArgumentException](Td.tdIntervalSeconds("7x"))
    intercept[IllegalArgumentException](Td.tdIntervalSeconds("d7"))
    intercept[IllegalArgumentException](Td.tdIntervalSeconds(""))
  }

  test("td_time_range is half-open [from, to)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      "2024-01-01 00:00:00", // == from: included
      "2024-01-01 12:00:00",
      "2024-01-02 00:00:00", // == to: excluded
      "2023-12-31 23:59:59"  // < from: excluded
    ).toDF("s").select(to_timestamp(col("s")).as("ts"))
    assert(df.where(Td.tdTimeRange(col("ts"), "2024-01-01", "2024-01-02")).count() == 2)
    assert(df.where(Td.tdTimeRange(col("ts"), None, Some("2024-01-01"))).count() == 1)
    assert(df.where(Td.tdTimeRange(col("ts"), Some("2024-01-01"), None)).count() == 3)
    assert(df.where(Td.tdTimeRange(col("ts"), None, None)).count() == 4)
  }

  test("custom as-of operator agrees with a driver-side reference on random data") {
    import spark.implicits._
    // small key domain + coarse times → plenty of duplicate keys/times
    // (tie-break paths) and keys with no eligible right rows
    val g = Gen.listOfN(80, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))
    samples(Gen.zip(g, g), 3).foreach { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("l_id", "k", "t")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("r_id", "rk", "rt")
      val got = graft.plans.AsOf.join(left, right, "k", "rk", "t", "rt", "r_id")
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val byKey = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .groupBy(_._1)
      val expect = ls.zipWithIndex.flatMap { case ((k, t), i) =>
        byKey.get(k).flatMap { cands =>
          val ok = cands.filter(_._2 <= t)
          if (ok.isEmpty) None
          else Some((i.toLong, ok.maxBy(c => (c._2, c._3))._3))
        }
      }.toSet
      assert(got == expect)
    }
  }

  test("top-k operator agrees with a driver-side sort reference on random data") {
    import spark.implicits._
    // small group domain + a COARSE value grid so score ties are common
    // (the tie-break path), plus groups with fewer than k rows
    val g = Gen.listOfN(120,
      Gen.zip(Gen.choose(0L, 7L), Gen.choose(0, 12)))
    samples(g, 3).foreach { rows =>
      val df = rows.zipWithIndex
        .map { case ((grp, v), i) => (grp, v.toDouble / 4.0, i.toLong) }
        .toDF("g", "v", "t")
      val got = graft.plans.TopK.perGroup(df, "g", "v", "t", 3)
        .select("g", "rn", "t").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = rows.zipWithIndex
        .map { case ((grp, v), i) => (grp, v.toDouble / 4.0, i.toLong) }
        .groupBy(_._1).toSeq.flatMap { case (grp, rs) =>
          rs.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
            .map { case (r, idx) => (grp, idx + 1L, r._3) }
        }.toSet
      assert(got == expect)
    }
  }

  test("as-of directions/tolerance/outer agree with a driver-side reference") {
    import spark.implicits._
    val g = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))
    samples(Gen.zip(g, g), 3).foreach { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("l_id", "k", "t")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("r_id", "rk", "rt")
      val byKey = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .groupBy(_._1)
      for (dir <- Seq("backward", "forward", "nearest"); tol <- Seq(-1L, 10L)) {
        val got = graft.plans.AsOf.join(left, right, "k", "rk", "t", "rt", "r_id",
            direction = dir, tolerance = tol, leftOuter = true)
          .select("l_id", "r_id").collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
        val expect = ls.zipWithIndex.map { case ((k, t), i) =>
          val cands = byKey.getOrElse(k, Nil)
          def inTol(d: Long) = tol < 0 || d <= tol
          // backward: max (rt, tie) among rt ≤ t; forward: min (rt, tie)
          // among rt ≥ t; nearest: closer Δ wins, tie → backward
          val back = cands.filter(c => c._2 <= t && inTol(t - c._2))
            .sortBy(c => (c._2, c._3)).lastOption
          val fwd = cands.filter(c => c._2 >= t && inTol(c._2 - t))
            .sortBy(c => (c._2, c._3)).headOption
          val m = dir match {
            case "backward" => back
            case "forward"  => fwd
            case "nearest"  => (back, fwd) match {
              case (Some(b), Some(f)) =>
                if (t - b._2 <= f._2 - t) Some(b) else Some(f)
              case (b, f) => b.orElse(f)
            }
          }
          (i.toLong, m.map(_._3).getOrElse(-1L))
        }.toSet
        assert(got == expect, s"direction=$dir tolerance=$tol")
      }
    }
  }

  test("sessionize: new session iff gap exceeds timeout; ids contiguous from 1") {
    import spark.implicits._
    val gapMs = 1000L
    val gen = Gen.listOfN(120, Gen.zip(Gen.choose(0L, 4L), Gen.choose(1L, 2500L)))
    samples(gen, 3).foreach { sample =>
      // per-user increasing timestamps from generated deltas
      val rows = sample.zipWithIndex
        .groupBy(_._1._1).toSeq.flatMap { case (user, evs) =>
          var t = 0L
          evs.map { case ((_, delta), idx) => t += delta; (idx.toLong, user, t) }
        }
      val df = rows.toDF("event_id", "user_id", "ts_ms")
      val out = Td.tdSessionize(df, "user_id", "ts_ms", gapMs, "event_id")
        .select("user_id", "ts_ms", "event_id", "session_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      out.groupBy(_._1).foreach { case (_, evs) =>
        val ordered = evs.sortBy(e => (e._2, e._3))
        var prevTs = Option.empty[Long]
        var expected = 0L
        ordered.foreach { case (_, ts, _, sid) =>
          val isNew = prevTs.forall(p => ts - p > gapMs)
          if (isNew) expected += 1
          assert(sid == expected, s"ts=$ts prev=$prevTs sid=$sid expected=$expected")
          prevTs = Some(ts)
        }
      }
    }
  }

  test("CC: union-find and distributed propagation agree on random graphs") {
    import spark.implicits._
    val gEdge = Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L))
      .suchThat { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    (0 until 5).foreach { i =>
      val edges = samples(gEdge, 60).distinct
      val pairs = edges.toDF("d1", "d2")
      val viaUf = graft.ops.CC.unionFind(edges)
      val undirected = pairs
        .union(pairs.select(org.apache.spark.sql.functions.col("d2"),
          org.apache.spark.sql.functions.col("d1")))
        .toDF("src", "dst")
      val viaIter = graft.ops.CC.iterative(spark, undirected)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(viaUf == viaIter, s"round $i: union-find and propagation disagree")
    }
  }

  test("interval-join sweep agrees with a brute-force reference on random data") {
    import spark.implicits._
    // small key domain, short spans → dense overlap, key-boundary and
    // zero-length-interval edge cases
    val gIv = Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L), Gen.choose(0L, 10L))
    samples(Gen.zip(Gen.listOfN(50, gIv), Gen.listOfN(50, gIv)), 3)
      .foreach { case (ls, rs) =>
        val left = ls.zipWithIndex.map { case ((k, s, w), i) =>
          (i.toLong, k, s, s + w) }.toDF("l_id", "k", "l_s", "l_e")
        val right = rs.zipWithIndex.map { case ((k, s, w), i) =>
          (i.toLong, k, s, s + w) }.toDF("r_id", "rk", "r_s", "r_e")
        val got = graft.plans.IntervalJoin.join(left, right,
            "k", "rk", "l_s", "l_e", "r_s", "r_e")
          .select("l_id", "r_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val expect = (for {
          ((lk, lsv, lw), i) <- ls.zipWithIndex
          ((rk, rsv, rw), j) <- rs.zipWithIndex
          if lk == rk && rsv < lsv + lw && rsv + rw > lsv
        } yield (i.toLong, j.toLong)).toSet
        assert(got == expect)
      }
  }

  test("banded hamming candidates lose no pair vs brute force (random 60-bit)") {
    import spark.implicits._
    val gBits = Gen.choose(0L, (1L << 60) - 1)
    // mix of uniform fingerprints (far apart) and perturbed near-twins
    (0 until 3).foreach { round =>
      val base = samples(gBits, 30)
      val twins = base.take(10).zipWithIndex.map { case (h, i) =>
        h ^ (1L << (i % 60)) ^ (1L << ((i * 7 + 3) % 60)) // dist 2-ish
      }
      val all = (base ++ twins).zipWithIndex.map { case (h, i) => (i.toLong, h) }
      val got = graft.ops.LlmOps.hammingPairsForTest(all.toDF("doc_id", "sh"), 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = (for {
        (i, hi) <- all; (j, hj) <- all if i < j
        d = java.lang.Long.bitCount(hi ^ hj) if d <= 8
      } yield (i, j, d.toLong)).toSet
      assert(got == expect, s"round $round")
    }
  }

  test("pair generation matches brute-force Jaccard on random set corpora") {
    import spark.implicits._
    // small shingle universe forces heavy sharing (df up to the doc count),
    // exercising many-postings arrays and, at maxDf=3, the join fallback
    val gSet = Gen.listOfN(8, Gen.choose(0L, 24L)).map(_.toSet)
    (0 until 3).foreach { round =>
      val sets = samples(gSet, 25).zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
        .filter(_._2.nonEmpty)
      val shDf = sets.flatMap { case (i, s) => s.map(v => (i, v)) }
        .toDF("doc_id", "sh")
      val nDf = sets.map { case (i, s) => (i, s.size.toLong) }.toDF("doc_id", "n")
      val expect = (for {
        (i, si) <- sets; (j, sj) <- sets if i < j
        inter = (si & sj).size
        jac = inter.toDouble / (si.size + sj.size - inter) if jac >= 0.5
      } yield (i, j, inter.toLong)).toSet
      Seq(256, 3).foreach { cap =>
        val got = graft.ops.LlmOps.jaccardPairs(shDf, nDf, cap)
          .select("d1", "d2", "inter").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == expect, s"round $round cap $cap: " +
          s"extra=${got -- expect} missing=${expect -- got}")
      }
    }
  }

  test("weighted pair core and weighted prefix filter match brute-force weighted Jaccard") {
    import spark.implicits._
    // random MULTISET corpora: small type universe, counts 1..4 — heavy
    // type sharing exercises the capped light/heavy split (cap 3 forces
    // the heavy branch) and the weighted prefix's cum_before bound
    val gBag = Gen.listOfN(10, Gen.zip(Gen.choose(0L, 19L), Gen.choose(1L, 4L)))
      .map(_.groupMapReduce(_._1)(_._2)(_ + _))
    (0 until 3).foreach { round =>
      val bags = samples(gBag, 22).zipWithIndex
        .map { case (b, i) => (i.toLong, b) }.filter(_._2.nonEmpty)
      val tfDf = bags.flatMap { case (i, b) => b.map { case (sh, c) => (i, sh, c) } }
        .toDF("doc_id", "sh", "c")
      val totDf = bags.map { case (i, b) => (i, b.values.sum) }.toDF("doc_id", "tot")
      def wj(a: Map[Long, Long], b: Map[Long, Long]): (Long, Long) = {
        val inter = (a.keySet & b.keySet).toSeq.map(k => math.min(a(k), b(k))).sum
        (inter, a.values.sum + b.values.sum - inter)
      }
      val expect = (for {
        (i, bi) <- bags; (j, bj) <- bags if i < j
        (inter, uni) = wj(bi, bj) if inter.toDouble / uni >= 0.5
      } yield (i, j, inter)).toSet
      // capped pair core, both physical paths
      Seq(256, 3).foreach { cap =>
        val got = graft.ops.LlmOps.weightedPairSums(tfDf, cap)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        // weightedPairSums emits ALL sharing pairs; apply the threshold
        val tot = bags.toMap
        val gotThr = got.filter { case (i, j, inter) =>
          inter.toDouble / (tot(i).values.sum + tot(j).values.sum - inter) >= 0.5
        }
        assert(gotThr == expect, s"round $round cap $cap: " +
          s"extra=${gotThr -- expect} missing=${expect -- gotThr}")
      }
      // weighted prefix: every qualifying pair keeps a shared prefix type
      val prefix = graft.ops.Round16.weightedPrefix(tfDf, totDf, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      expect.foreach { case (i, j, _) =>
        val shared = bags.toMap.apply(i).keySet & bags.toMap.apply(j).keySet
        assert(shared.exists(sh => prefix((i, sh)) && prefix((j, sh))),
          s"round $round: qualifying pair ($i,$j) lost its prefix witness")
      }
    }
  }

  test("prefix-filtered near-dup (j2c) equals the full inverted-index join (j2)") {
    import spark.implicits._
    // synthetic corpora with planted near-dups: base texts plus variants
    // sharing long prefixes (high Jaccard) and unrelated noise docs
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val gDoc = Gen.listOfN(12, Gen.choose(0, words.size - 1))
    (0 until 3).foreach { round =>
      val bases = samples(gDoc, 8).map(_.map(words).mkString(" "))
      val docs = bases.zipWithIndex.flatMap { case (text, i) =>
        val toks = text.split(" ")
        Seq((i * 10L, text),
          // near-dup: swap the final token — Jaccard of 3-gram shingles
          // stays high for 12-token docs
          (i * 10L + 1, (toks.dropRight(1) :+ "omega").mkString(" ")))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_ppj$round")
      docs.toDF("doc_id", "text")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("source", org.apache.spark.sql.functions.lit("gen"))
        .withColumn("n_chars",
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val a = SparkEntry.queries("j2_dedup_near")(spark, dir.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val b = SparkEntry.queries("j2c_dedup_prefix")(spark, dir.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(a.nonEmpty, s"round $round produced no near-dup pairs")
      assert(a == b, s"round $round: j2c diverged from j2")
    }
  }

  test("containment (j27) and incremental (j28) dedup fuzz vs driver brute force") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val gDoc = Gen.listOfN(12, Gen.choose(0, words.size - 1))
    (0 until 3).foreach { round =>
      val bases = samples(gDoc, 8).map(_.map(words).mkString(" "))
      val docs = bases.zipWithIndex.flatMap { case (text, i) =>
        val toks = text.split(" ")
        Seq(
          (i * 10L, text),                                   // base (even)
          (i * 10L + 1, (toks.dropRight(1) :+ "omega").mkString(" ")), // marginal near-dup (odd)
          (i * 10L + 3, text + " omega2"),                   // high-jac extension (odd)
          (i * 10L + 4, text + " nza nzb nzc nzd nze nzf"))  // containment wrap (even)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_cfz$round")
      docs.toDF("doc_id", "text")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("source", org.apache.spark.sql.functions.lit("gen"))
        .withColumn("n_chars", org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val sets = docs.map { case (id, text) =>
        id -> text.split(" ").sliding(3).map(_.mkString(" ")).toSet
      }
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      // j27: full equality against brute-force containment ≥ 0.8
      val expectCont = (for {
        ((d1, s1), i) <- sets.zipWithIndex; (d2, s2) <- sets.drop(i + 1)
        inter = (s1 & s2).size
        cont = inter.toDouble / math.min(s1.size, s2.size) if cont >= 0.8
      } yield {
        val (lo, hi) = if (d1 < d2) (d1, d2) else (d2, d1)
        (lo, hi, r6(cont))
      }).toSet
      val gotCont = SparkEntry.queries("j27_dedup_containment")(spark, dir.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r6(r.getDouble(2)))).toSet
      assert(gotCont == expectCont,
        s"round $round j27: extra=${gotCont -- expectCont} missing=${expectCont -- gotCont}")
      assert(expectCont.nonEmpty)
      // j28: every emitted pair exact (⊆ brute-force mixed-parity ≥ 0.5
      // with the right value); the high-jac plants (~0.9) must be found
      // (LSH recovery is deterministic here — fixed corpus, fixed seeds)
      val exact = (for {
        (d1, s1) <- sets; (d2, s2) <- sets
        if d1 % 2 == 1 && d2 % 2 == 0
        inter = (s1 & s2).size
        jac = inter.toDouble / (s1.size + s2.size - inter) if jac >= 0.5
      } yield (d1, d2) -> r6(jac)).toMap
      val got28 = SparkEntry.queries("j28_dedup_incremental")(spark, dir.toString)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r6(r.getDouble(2)))).toMap
      got28.foreach { case (pair, jac) =>
        assert(exact.get(pair).contains(jac),
          s"round $round j28: $pair=$jac not in brute force ${exact.get(pair)}")
      }
      val plants = bases.indices.map(i => (i * 10L + 3, i * 10L)).filter(exact.contains)
      assert(plants.nonEmpty)
      plants.foreach { p =>
        assert(got28.contains(p), s"round $round j28: missed planted pair $p")
      }
    }
  }

  test("zOrder16 is injective and componentwise monotone on 16-bit inputs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // pairs of points with p1 dominated by p2 (x1<=x2, y1<=y2): the Morton
    // key must never order them the other way — this is WHY one range sort
    // on z bounds both dimensions per file (a21). Plus injectivity: two
    // distinct points never collide in z.
    val coord = Gen.choose(0L, 65535L)
    val pts = samples(Gen.zip(coord, coord, coord, coord), 300)
      .map { case (x1, y1, dx, dy) =>
        (x1, y1, math.min(x1 + dx % 1000, 65535L), math.min(y1 + dy % 1000, 65535L))
      }
    val rows = pts.toDF("x1", "y1", "x2", "y2")
      .select(graft.ops.Round5.zOrder16(col("x1"), col("y1")).as("z1"),
        graft.ops.Round5.zOrder16(col("x2"), col("y2")).as("z2"),
        col("x1"), col("y1"), col("x2"), col("y2"))
      .collect()
    rows.foreach { r =>
      val (z1, z2) = (r.getLong(0), r.getLong(1))
      assert(z1 <= z2,
        s"dominated point ordered after: (${r.getLong(2)},${r.getLong(3)}) z=$z1 vs (${r.getLong(4)},${r.getLong(5)}) z=$z2")
      if (r.getLong(2) != r.getLong(4) || r.getLong(3) != r.getLong(5))
        assert(z1 != z2, "distinct points collided in z")
    }
  }

  test("funnel agrees with a driver-side sequential reference on random events") {
    import spark.implicits._
    val types = Gen.oneOf("view", "click", "purchase", "other")
    val evGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0L, 11L), types, Gen.choose(0L, 400000L)))
    (0 until 8).foreach { round =>
      val evs = samples(evGen, 1).head.map { case (u, t, ts) => (u, t, ts) }
      val windowMs = 100000L
      val got = graft.ops.Round5b.funnel(
          evs.toDF("user_id", "event_type", "ts_ms"), windowMs)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      // sequential reference
      val byUser = evs.groupBy(_._1)
      val ref = byUser.flatMap { case (u, es) =>
        val views = es.filter(_._2 == "view").map(_._3)
        if (views.isEmpty) None else {
          val tv = views.min
          val tc = es.filter(e => e._2 == "click" && e._3 > tv && e._3 <= tv + windowMs)
            .map(_._3).minOption
          val tp = tc.flatMap(c => es.filter(e =>
            e._2 == "purchase" && e._3 > c && e._3 <= c + windowMs)
            .map(_._3).minOption)
          Some(u -> (tv, tc, tp))
        }
      }
      assert(got == ref, s"round $round funnel mismatch")
    }
  }

  test("shard packing agrees with a driver-side prefix-sum reference") {
    import spark.implicits._
    val docGen = Gen.listOfN(80, Gen.choose(1L, 300L))
    (0 until 8).foreach { round =>
      val nToks = samples(docGen, 1).head.zipWithIndex
        .map { case (n, i) => (i.toLong, n) }
      val binSize = 512L; val shards = 4
      val got = graft.ops.Round5b.packShards(
          nToks.toDF("doc_id", "n_tok"), binSize, shards)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
      val ref = nToks.groupBy(_._1 % shards).flatMap { case (sh, docs) =>
        var acc = 0L
        docs.sortBy(_._1).map { case (id, n) =>
          val off = acc; acc += n
          id -> (sh, off, off / binSize)
        }
      }
      assert(got == ref, s"round $round packing mismatch")
    }
  }

  test("r13 dialect shims agree with JVM references on random strings") {
    val s = spark
    graft.functions.Presto.register(s)
    import s.implicits._
    // fixed 12-char strings over a small alphabet incl. the regex
    // metachars '.' and '|' — the hazard class split/regexp must handle
    val strGen = Gen.listOfN(12,
      Gen.oneOf('a', 'b', 'c', 'd', 'e', '.', '|', ' ')).map(_.mkString)
    val cases = samples(Gen.zip(strGen, strGen), 60)
    val rows = cases.toDF("a", "b").selectExpr("a", "b",
        "strrpos(a, substr(b, 1, 2)) AS rp",
        "hamming_distance(a, b) AS hd",
        "split(a, '.') AS sp",
        "regexp_extract(a, '[a-e]+') AS re0",
        "transform(ngrams(split(a, ''), 3), g -> array_join(g, '')) AS g3",
        "round(array_average(transform(split(a, ''), c -> ascii(c))), 6) AS avg_cp")
      .collect()
    rows.foreach { r =>
      val a = r.getString(0); val b = r.getString(1)
      val sub = b.take(2)
      assert(r.getInt(2) == a.lastIndexOf(sub) + 1,
        s"strrpos('$a','$sub')") // lastIndexOf is -1-based-absent ⇒ +1 = 0
      assert(r.getLong(3) == a.zip(b).count { case (x, y) => x != y },
        s"hamming('$a','$b')")
      assert(r.getSeq[String](4) ==
        a.split(java.util.regex.Pattern.quote("."), -1).toSeq,
        s"split('$a','.')")
      assert(r.getString(5) == "[a-e]+".r.findFirstIn(a).getOrElse(""),
        s"regexp_extract('$a')")
      assert(r.getSeq[String](6) == a.sliding(3).toSeq, s"ngrams('$a',3)")
      val ref = a.map(_.toInt.toDouble).sum / a.length
      assert(math.abs(r.getDouble(7) - (math.rint(ref * 1e6) / 1e6)) < 1e-9,
        s"array_average('$a')")
    }
  }

  test("normalize matches java.text.Normalizer on mixed composed/decomposed text") {
    val s = spark
    graft.functions.Presto.register(s)
    import s.implicits._
    // alphabet mixes plain ASCII, a precomposed é, and the decomposed
    // pair (e + U+0301) so random strings hit real (de)composition work
    val strGen = Gen.listOfN(8,
      Gen.oneOf("a", "e", "é", "é", "f", "ﬁ")).map(_.mkString)
    val cases = samples(strGen, 50)
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = cases.toDF("t")
        .selectExpr("t", s"normalize(t, '$form') AS n").collect()
      got.foreach { r =>
        val expected = java.text.Normalizer.normalize(
          r.getString(0), java.text.Normalizer.Form.valueOf(form))
        assert(r.getString(1) == expected, s"normalize($form) on ${r.getString(0)}")
      }
    }
  }

  test("td_sessionize_window partitions rows identically to the lag+sum sessionizer") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Td.register(spark)
    // random event streams: few keys, clustered times so both in-session
    // steps and >gap breaks occur
    val evGen = Gen.listOfN(60, Gen.zip(
      Gen.choose(1L, 4L),                   // key
      Gen.choose(0L, 40L).map(_ * 100L)))   // time (collisions likely)
    samples(evGen, 20).zipWithIndex.foreach { case (evs, i) =>
      val df = evs.zipWithIndex
        .map { case ((k, t), id) => (id.toLong, k, t) }
        .toDF("event_id", "uid", "time")
      df.createOrReplaceTempView(s"prop_sess_$i")
      val gap = 500L
      // reference: the h10 two-window composition (ordinal session ids)
      val ref = Td.tdSessionize(df, "uid", "time", gap, "event_id")
        .select(col("event_id"), concat_ws("/", col("uid"), col("session_id")).as("sid"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val got = spark.sql(s"""SELECT event_id,
          td_sessionize_window(time, $gap, uid)
            OVER (PARTITION BY uid ORDER BY time, event_id) AS sid
        FROM prop_sess_$i""")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // same PARTITION of events into sessions: the id alphabets differ
      // (ordinal vs md5), so compare the induced equivalence classes
      def classes(m: Map[Long, String]) =
        m.groupBy(_._2).values.map(_.keys.toSet).toSet
      assert(classes(got) == classes(ref), s"case $i disagreed")
    }
  }

  test("j62 URL canonicalization agrees with a driver-side reference on random URLs") {
    import spark.implicits._
    // driver-side mirror of Round16b.canonicalizeUrl's exact contract
    def refCanon(url: String): String = {
      val base = url.takeWhile(_ != '#')
      val (pre, query) = base.indexOf('?') match {
        case -1 => (base, "")
        case i  => (base.take(i), base.drop(i + 1))
      }
      val Array(schemeRaw, rest) = pre.split("://", 2)
      val slash = rest.indexOf('/')
      val hostRaw = if (slash == -1) rest else rest.take(slash)
      val path0 = if (slash == -1) "" else rest.drop(slash)
      val host = hostRaw.toLowerCase
        .replaceFirst("^www\\.", "").replaceFirst(":443$", "")
      val p1 = path0.replaceFirst("/$", "")
      val path = if (p1.isEmpty) "/" else p1
      val qsort =
        if (query.isEmpty) ""
        else "?" + query.split('&').sorted.mkString("&")
      s"${schemeRaw.toLowerCase}://$host$path$qsort"
    }
    val seg = Gen.oneOf("a", "B", "x9", "download", "Path")
    val gUrl = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "hTTps")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("Example.com", "sub.Site.ORG", "data.io")
      port <- Gen.oneOf("", ":443", ":8080")
      nseg <- Gen.choose(0, 3)
      segs <- Gen.listOfN(nseg, seg)
      trail <- Gen.oneOf("", "/")
      nq <- Gen.choose(0, 3)
      qs <- Gen.listOfN(nq, Gen.zip(Gen.oneOf("a", "b", "Zz"),
        Gen.choose(0, 9)))
      frag <- Gen.oneOf("", "#Top", "#s2")
    } yield {
      val path = if (segs.isEmpty) trail
        else segs.mkString("/", "/", "") + trail
      val q = if (qs.isEmpty) ""
        else "?" + qs.map { case (k, v) => s"$k=$v" }.mkString("&")
      s"$scheme://$www$host$port$path$q$frag"
    }
    val urls = samples(gUrl, 300).distinct
    val got = ops.Round16b.canonicalizeUrl(
        urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
          .toDF("doc_id", "url"))
      .select("url", "canon").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    urls.foreach { u =>
      assert(got(u) == refCanon(u), s"url $u: ${got(u)} != ${refCanon(u)}")
    }
    // the collapse property on a planted quartet: four spellings, one page
    val variants = Seq(
      "HTTPS://WWW.Example.com:443/Download/?b=2&a=1#x",
      "https://example.COM/Download?a=1&b=2",
      "https://www.example.com/Download/?a=1&b=2#y",
      "HTTPS://example.com:443/Download?b=2&a=1")
    val canons = variants.map(refCanon).distinct
    assert(canons == Seq("https://example.com/Download?a=1&b=2"), canons)
  }
}
