package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TdTimeRange RuntimeReplaceable: post-analysis type dispatch — epoch
  * LONG/INT, TIMESTAMP, TIMESTAMP_NTZ columns all take same-type, bare-
  * column comparisons (pushdown-visible); tz arg shifts STRING bounds
  * only; NULL bound = unbounded. */
class TdTimeRangeSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private def register(): Unit = functions.Td.register(spark)

  // epoch seconds for 2024-01-01T00:00:00Z .. +3 days
  private val day0 = 1704067200L

  test("LONG epoch-seconds column: long-vs-long comparison, correct rows") {
    register()
    (0 to 9).map(i => (i.toLong, day0 + i * 86400L)).toDF("id", "time")
      .createOrReplaceTempView("ttr_long")
    val got = spark.sql(
      "SELECT id FROM ttr_long WHERE td_time_range(time, '2024-01-02', '2024-01-05') ORDER BY id")
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
    // numeric epoch bounds work too, and ignore the tz argument
    val got2 = spark.sql(
      s"SELECT id FROM ttr_long WHERE td_time_range(time, ${day0 + 86400}, ${day0 + 4 * 86400}, 'Asia/Tokyo') ORDER BY id")
      .as[Long].collect().toSeq
    assert(got2 == Seq(1L, 2L, 3L))
  }

  test("INT epoch-seconds column evaluates (no post-analysis type mismatch)") {
    register()
    (0 to 9).map(i => (i, (day0 + i * 86400L).toInt)).toDF("id", "time")
      .createOrReplaceTempView("ttr_int")
    val got = spark.sql(
      "SELECT id FROM ttr_int WHERE td_time_range(time, '2024-01-02', '2024-01-05') ORDER BY id")
      .as[Int].collect().toSeq
    assert(got == Seq(1, 2, 3))
  }

  test("TIMESTAMP_NTZ fixture column: matches plain comparison AND pushes to scan") {
    register()
    val li = Tables.t(spark, TestSpark.sf, "lineitem")
    li.createOrReplaceTempView("ttr_li")
    val viaFn = spark.sql(
      "SELECT count(*) FROM ttr_li WHERE td_time_range(l_shipdate, '1997-01-01', '1997-03-01')")
      .head().getLong(0)
    val viaCmp = spark.sql(
      """SELECT count(*) FROM ttr_li WHERE l_shipdate >= '1997-01-01'
         AND l_shipdate < '1997-03-01'""").head().getLong(0)
    assert(viaFn == viaCmp && viaFn > 0)
    // the predicate must reach the parquet source as a pushed filter on
    // the BARE column (no cast wrapping l_shipdate)
    if (li.schema("l_shipdate").dataType.typeName.contains("ntz")) {
      val df = spark.sql(
        "SELECT l_orderkey FROM ttr_li WHERE td_time_range(l_shipdate, '1997-01-01', '1997-03-01')")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
        s"expected pushed l_shipdate filter:\n$plan")
    }
  }

  test("NULL bounds are unbounded on that side") {
    register()
    (0 to 9).map(i => (i.toLong, day0 + i * 86400L)).toDF("id", "time")
      .createOrReplaceTempView("ttr_nb")
    assert(spark.sql(
      "SELECT count(*) FROM ttr_nb WHERE td_time_range(time, NULL, '2024-01-03')")
      .head().getLong(0) == 2L)
    assert(spark.sql(
      "SELECT count(*) FROM ttr_nb WHERE td_time_range(time, '2024-01-03', NULL)")
      .head().getLong(0) == 8L)
    assert(spark.sql(
      "SELECT count(*) FROM ttr_nb WHERE td_time_range(time, NULL, NULL)")
      .head().getLong(0) == 10L)
  }

  test("tz argument interprets STRING bounds in that zone") {
    register()
    // 2024-01-02 00:00 in UTC+9 (Asia/Tokyo) = 2024-01-01 15:00 UTC
    (Seq(("a", day0 + 14 * 3600L), ("b", day0 + 16 * 3600L)))
      .toDF("id", "time").createOrReplaceTempView("ttr_tz")
    val got = spark.sql(
      "SELECT id FROM ttr_tz WHERE td_time_range(time, '2024-01-02', '2024-01-03', 'Asia/Tokyo') ORDER BY id")
      .as[String].collect().toSeq
    assert(got == Seq("b"))
  }

  test("tz argument applies to STRING bounds on a TIMESTAMP_NTZ column too") {
    register()
    // NTZ wall clocks around 2024-01-01T15:00 (the fixtures' convention:
    // NTZ wall clock == UTC instant). '2024-01-02' in Asia/Tokyo is the
    // instant 2024-01-01T15:00Z → NTZ bound 2024-01-01T15:00.
    (Seq(("a", "2024-01-01T14:00:00"), ("b", "2024-01-01T16:00:00")))
      .toDF("id", "w").selectExpr("id", "cast(w as timestamp_ntz) AS time")
      .createOrReplaceTempView("ttr_ntz_tz")
    val got = spark.sql(
      "SELECT id FROM ttr_ntz_tz WHERE td_time_range(time, '2024-01-02', '2024-01-03', 'Asia/Tokyo') ORDER BY id")
      .as[String].collect().toSeq
    assert(got == Seq("b"))
    // without tz the same strings parse as wall-clock midnight → no rows
    val bare = spark.sql(
      "SELECT id FROM ttr_ntz_tz WHERE td_time_range(time, '2024-01-02', '2024-01-03')")
      .count()
    assert(bare == 0L)
  }

  test("a non-literal 4th argument is an analysis error, not a silent session-zone fallback") {
    register()
    (0 to 3).map(i => (s"Asia/Tokyo", day0 + i * 86400L)).toDF("zone", "time")
      .createOrReplaceTempView("ttr_badtz")
    // a column where a zone literal was meant (the typo scenario)
    val e = intercept[Exception](spark.sql(
      "SELECT count(*) FROM ttr_badtz WHERE td_time_range(time, '2024-01-01', '2024-01-03', zone)")
      .collect())
    assert(e.getMessage.contains("timezone"), e.getMessage)
    // NULL zone likewise rejected
    intercept[Exception](spark.sql(
      "SELECT count(*) FROM ttr_badtz WHERE td_time_range(time, '2024-01-01', '2024-01-03', NULL)")
      .collect())
  }

  test("Tables.events legacy branch: LONG epoch-nanos ts still derives ts_ms/ts_t") {
    // current driver fixtures carry timestamp[us]; pin the OTHER generation
    // (epoch-nanos LongType, rounds 1-10) so the dispatch in Tables.events
    // keeps both paths alive
    val dir = java.nio.file.Files.createTempDirectory("ttr_legacy").toString
    val nanos0 = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z
    (0 to 3).map(i => (i.toLong, nanos0 + i * 3600L * 1000000000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    val r = ev.orderBy("event_id")
      .select("ts_ms", "ts_t").collect()
    assert(r(0).getLong(0) == 1704067200000L)
    assert(r(1).getLong(0) == 1704067200000L + 3600000L)
    assert(r(0).getTimestamp(1).toInstant.toEpochMilli == 1704067200000L)
  }

  test("LTZ generation: tz-adjusted µs ts exercises the TIMESTAMP arms end to end") {
    // the THIRD physical generation Tables.events/TdTimeRange accept —
    // parquet timestamp[us] with isAdjustedToUTC=true (TimestampType).
    // No driver fixture has shipped it yet; pin it synthetically so a
    // silent regen flipping the parquet flag cannot land in never-run
    // dispatch arms (Tables.scala case _, TdTimeRange.scala case _).
    register()
    val dir = java.nio.file.Files.createTempDirectory("ttr_ltz").toString
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    (0 to 47).map(i =>
        (i.toLong, java.sql.Timestamp.from(base.plusSeconds(i * 3600L))))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // writer default TIMESTAMP_MICROS is tz-adjusted → must read back LTZ
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      s"expected instant TIMESTAMP read-back, got ${raw.schema("ts").dataType}")
    val ev = Tables.events(spark, dir)
    val r = ev.orderBy("event_id").select("ts_ms", "ts_t").collect()
    assert(r(0).getLong(0) == 1704067200000L)
    assert(r(1).getLong(0) == 1704067200000L + 3600000L)
    assert(r(0).getTimestamp(1).toInstant.toEpochMilli == 1704067200000L)
    // helper dispatch (case _ instant arm): the Jan-2 day slice is 24 rows
    assert(ev.where(functions.Td.tdTimeRangeEvents(
      ev, "ts", "2024-01-02", "2024-01-03")).count() == 24L)
    // SQL face: same slice, and SimplifyCasts must strip the no-op cast so
    // the predicate reaches the parquet scan on the BARE column
    raw.createOrReplaceTempView("ttr_ltz")
    val df = spark.sql(
      "SELECT event_id FROM ttr_ltz WHERE td_time_range(ts, '2024-01-02', '2024-01-03')")
    assert(df.count() == 24L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"expected pushed bare-ts filter:\n$plan")
  }

  test("events fixture: a3-style range via td_time_range matches tdTimeRangeEvents") {
    register()
    val ev = Tables.events(spark, TestSpark.sf)
    val viaHelper = ev.where(
      functions.Td.tdTimeRangeEvents(ev, "ts", "2024-01-05", "2024-01-10")).count()
    ev.createOrReplaceTempView("ttr_ev")
    val viaSql = spark.sql(
      "SELECT count(*) FROM ttr_ev WHERE td_time_range(ts_t, '2024-01-05', '2024-01-10')")
      .head().getLong(0)
    assert(viaHelper == viaSql)
  }
}
