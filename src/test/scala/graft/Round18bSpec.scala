package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 batch-2 pins: the TPC-H closers (p24/p25) get plan-shape +
  * invariant asserts; the eval keys (j102/j103) get a driver-side
  * recompute of their statistic from their own emitted counts — the
  * arithmetic can't drift from the definition without failing here. */
class Round18bSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private val sf = TestSpark.sf

  test("p24 Q1: filter pushed, 2-phase agg, charge/disc/base ordering") {
    val df = SparkEntry.queries("p24_tpch_q1")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined,
      "shipdate bound must reach the parquet scan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "Q1 is a single-table aggregate — no join belongs in this plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 9) // |returnflag| × |linestatus|
    rows.foreach { r =>
      val base = r.getAs[Double]("sum_base_price")
      val disc = r.getAs[Double]("sum_disc_price")
      val charge = r.getAs[Double]("sum_charge")
      assert(disc <= base + 1e-6, "discounting must not raise revenue")
      assert(charge >= disc - 1e-6, "tax must not lower the charge")
      assert(r.getAs[Double]("avg_disc") >= 0.0 &&
        r.getAs[Double]("avg_disc") < 1.0)
    }
    val totalOrders = rows.map(_.getAs[Long]("count_order")).sum
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_shipdate") <= Tables.tsLit("1998-09-02")).count()
    assert(totalOrders == expected, "group counts must partition the scan")
  }

  test("p25 Q3: top-10 via TakeOrderedAndProject, both date bounds pushed") {
    val df = SparkEntry.queries("p25_tpch_q3")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "LIMIT over ORDER BY must not be a global sort")
    assert("PushedFilters: \\[[^\\]]*o_orderdate".r.findFirstIn(plan).isDefined)
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined)
    assert("PushedFilters: \\[[^\\]]*c_mktsegment".r.findFirstIn(plan).isDefined)
    val rows = df.collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "revenue must be non-increasing")
    assert(rows.map(_.getAs[Long]("l_orderkey")).distinct.length == 10,
      "grouped by orderkey — no duplicate keys in the top list")
  }

  test("h49: TIME leg agrees with the epoch-arithmetic reference") {
    val rows = SparkEntry.queries("h49_time_type")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_am"),
          r.getAs[Int]("eh") * 3600 + r.getAs[Int]("em") * 60 +
            r.getAs[Int]("es"),
          r.getAs[Int]("lh") * 3600 + r.getAs[Int]("lm") * 60 +
            r.getAs[Int]("ls"))).toMap
    // independent reference: the same stats from ts_ms modular
    // arithmetic, no TIME type involved — the typed leg must agree
    val ref = Tables.events(spark, sf)
      .select(col("event_type"),
        ((col("ts_ms") / 1000).cast("long") % 86400L).as("sod"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("sod") < 43200L, 1L).otherwise(0L)).as("am"),
        min("sod").as("mn"), max("sod").as("mx"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("am"),
          r.getAs[Long]("mn").toInt, r.getAs[Long]("mx").toInt)).toMap
    assert(rows == ref, s"TIME leg $rows vs epoch reference $ref")
    assert(rows.nonEmpty)
  }

  test("j104: AUC matches a driver-side average-rank recompute; gini = 2·auc−1") {
    val row = SparkEntry.queries("j104_roc_auc")(spark, sf).collect().head
    val auc = row.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(row.getAs[Double]("gini") - (2 * auc - 1)) < 2e-6)
    // independent reference: per-doc (score, label) pairs, classic
    // average-rank Mann-Whitney — no histogram, no window
    val pairs = ops.Round9.j49Scored(spark, sf)
      .select(col("score"), (col("swf") >= 0.03).cast("int").as("l"))
      .collect().map(r => (r.getAs[Double]("score"), r.getAs[Int]("l")))
    val sorted = pairs.sortBy(_._1)
    val ranks = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) { // average ranks over tie runs
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val avg = (i + 1 + j).toDouble / 2 // mean of ranks i+1..j
      for (k <- i until j) ranks(k) = avg
      i = j
    }
    val nPos = sorted.count(_._2 == 1).toDouble
    val nNeg = sorted.length - nPos
    val rPos = sorted.indices.filter(sorted(_)._2 == 1).map(ranks).sum
    val ref = (rPos - nPos * (nPos + 1) / 2) / (nPos * nNeg)
    assert(math.abs(auc - ref) < 1e-6, s"emitted $auc vs rank-form $ref")
    assert(row.getAs[Long]("n_pos") == nPos.toLong &&
      row.getAs[Long]("n_neg") == nNeg.toLong)
  }

  test("j102: confusion cells partition n; kappa matches its definition") {
    val r = SparkEntry.queries("j102_judge_agreement")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n")
    val (n11, n10, n01, n00) = (row.getAs[Long]("n11"),
      row.getAs[Long]("n10"), row.getAs[Long]("n01"), row.getAs[Long]("n00"))
    assert(n11 + n10 + n01 + n00 == n)
    // non-degeneracy, not full population: the (0,0) cell holds only
    // 1-2 fixture docs, so a regen may legitimately empty a cell — what
    // must hold is that kappa is defined (both judges non-constant)
    assert(Seq(n11, n10, n01, n00).count(_ > 0) >= 2,
      "both judges collapsed to a constant — kappa undefined")
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble / n) * ((n11 + n01).toDouble / n) +
      ((n01 + n00).toDouble / n) * ((n10 + n00).toDouble / n)
    if (pe < 1.0) {
      val kappa = (po - pe) / (1.0 - pe)
      assert(math.abs(row.getAs[Double]("kappa") - kappa) < 1e-6,
        s"emitted kappa ${row.getAs[Double]("kappa")} vs recomputed $kappa")
      assert(kappa >= -1.0 && kappa <= 1.0)
    } else assert(row.isNullAt(row.fieldIndex("kappa")),
      "pe == 1 must emit NULL kappa on both engines")
  }

  test("j103: bins partition the corpus; ECE matches a recompute from bins") {
    val rows = SparkEntry.queries("j103_calibration_bins")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(r => { val b = r.getAs[Int]("bin"); b >= 0 && b <= 9 }))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_b")).sum == nDocs,
      "every doc lands in exactly one bin")
    // ECE recompute from the emitted per-bin stats (6-dp rounded inputs
    // give ≤ ~1e-5 slack vs the key's unrounded internal computation)
    val total = rows.map(_.getAs[Long]("n_b")).sum.toDouble
    val ece = rows.map(r => r.getAs[Long]("n_b") *
      math.abs(r.getAs[Double]("accuracy") - r.getAs[Double]("confidence")))
      .sum / total
    val emitted = rows.map(_.getAs[Double]("ece")).distinct
    assert(emitted.length == 1, "ECE is a corpus constant, same on every row")
    assert(math.abs(emitted.head - ece) < 1e-4,
      s"emitted ECE ${emitted.head} vs bin-recomputed $ece")
    rows.foreach { r =>
      assert(r.getAs[Double]("accuracy") >= 0.0 &&
        r.getAs[Double]("accuracy") <= 1.0)
      assert(r.getAs[Double]("confidence") >= 0.0 &&
        r.getAs[Double]("confidence") <= 1.0)
    }
  }
}
