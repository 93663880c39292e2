package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-2 operators: partition pruning (a14), shuffle-free bucketed join
  * (c11), the CharNGrams Generator (k3), split determinism (j15), and
  * frame-sampling bounds (m3). */
class Round2Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("a14 read after partitionBy write prunes to the lang=en partition") {
    val df = SparkEntry.queries("a14_source_partitioned")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"), p)
    // pruned read returns only the partition's rows
    val expect = Tables.t(spark, TestSpark.sf, "documents")
      .where(col("lang") === "en").count()
    assert(df.count() == expect)
  }

  test("a15 time-bucketed read prunes hour-bucket partitions") {
    val df = SparkEntry.queries("a15_sink_time_buckets")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(time_bucket"), p)
  }

  test("a19 plans a dynamic partition pruning subquery on the fact scan") {
    val df = SparkEntry.queries("a19_dpp")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"), p)
  }

  test("c11 bucketed-join key plans exactly one exchange (the groupBy)") {
    val df = SparkEntry.queries("c11_join_bucketed")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    // the join itself is co-located: the only hash exchange left is the
    // post-join aggregation on c_mktsegment
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected only the agg exchange:\n$p")
  }

  test("char_ngrams generates positioned trigrams; short/empty rows vanish") {
    import spark.implicits._
    graft.expressions.CharNGrams.register(spark)
    Seq((1L, "abcd"), (2L, "ab"), (3L, "xyz")).toDF("id", "s")
      .createOrReplaceTempView("ng_in")
    val rows = spark.sql(
      """SELECT id, pos, gram FROM ng_in
        LATERAL VIEW char_ngrams(s, 3) t AS pos, gram
        ORDER BY id, pos""").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1L, 0, "abc"), (1L, 1, "bcd"), (3L, 0, "xyz")))
  }

  test("char_ngrams rejects non-positive n at analysis time") {
    graft.expressions.CharNGrams.register(spark)
    spark.sql("SELECT 'abcd' AS s").createOrReplaceTempView("ng_bad")
    Seq(0, -1).foreach { n =>
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(s"SELECT pos, gram FROM ng_bad " +
          s"LATERAL VIEW char_ngrams(s, $n) t AS pos, gram").collect())
      assert(e.getMessage.contains("positive"), e.getMessage)
    }
  }

  test("j15 split is deterministic and 3-way exhaustive") {
    val a = SparkEntry.queries("j15_split_hash")(spark, TestSpark.sf).collect()
    val b = SparkEntry.queries("j15_split_hash")(spark, TestSpark.sf).collect()
    assert(a.toSeq == b.toSeq) // identical across runs — no RNG anywhere
    val splits = a.map(_.getString(2)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    val train = a.count(_.getString(2) == "train").toDouble / a.length
    assert(train > 0.6 && train < 0.95, s"train fraction $train")
  }

  test("d18 approx percentiles land within 5% of exact") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("d18_agg_approx_percentile")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.t(spark, TestSpark.sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    approx.foreach { case (flag, (a25, a50, a75)) =>
      val e = exact(flag)
      Seq(a25 -> e(0), a50 -> e(1), a75 -> e(2)).foreach { case (a, x) =>
        assert(math.abs(a - x) / x < 0.05, s"$flag: approx $a vs exact $x")
      }
    }
  }

  test("j22 stratified sample: deterministic, per-stratum fraction in range") {
    val a = SparkEntry.queries("j22_sample_stratified")(spark, TestSpark.sf).collect()
    val b = SparkEntry.queries("j22_sample_stratified")(spark, TestSpark.sf).collect()
    assert(a.toSeq == b.toSeq) // fixed seed ⇒ same sample every run
    val total = Tables.t(spark, TestSpark.sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = a.groupBy(_.getString(1)).map { case (l, rows) => l -> rows.length }
    got.foreach { case (lang, n) =>
      val frac = n.toDouble / total(lang)
      assert(frac > 0.0 && frac < 0.95, s"$lang sampled frac $frac")
    }
  }

  test("m3 samples 4 in-range frame indices per doc") {
    val rows = SparkEntry.queries("m3_frame_sample")(spark, TestSpark.sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length == 4))
    assert(rows.forall { r =>
      val n = r.getLong(1); val idx = r.getLong(3)
      idx >= 0 && idx < n
    })
    // first sample is frame 0, last is the final frame
    assert(rows.filter(_.getLong(2) == 0).forall(_.getLong(3) == 0L))
    assert(rows.filter(_.getLong(2) == 3).forall(r => r.getLong(3) == r.getLong(1) - 1))
  }
}
