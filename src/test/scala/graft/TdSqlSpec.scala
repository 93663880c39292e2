package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-13 SQL-callable TD UDF tier (functions/Td.scala builders):
  * td_time_format / td_time_parse / td_time_add / td_date_trunc /
  * td_scheduled_time / td_interval / td_first / td_last / td_md5 /
  * td_url_decode — semantics per public TD UDF docs, plus the literal-
  * argument strictness and session-zone-independence contracts.
  */
class TdSqlSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._
  import graft.functions.Td

  // 2024-01-15T12:34:56Z
  private val t0 = 1705322096L

  private def sql1(q: String): org.apache.spark.sql.Row = {
    Td.register(spark)
    Seq(t0).toDF("time").createOrReplaceTempView("td_sql_one")
    spark.sql(q).head()
  }

  test("td_time_format renders epoch seconds in the target zone") {
    val r = sql1("""SELECT
      td_time_format(time, 'yyyy-MM-dd HH:mm:ss', 'Asia/Tokyo') AS jst,
      td_time_format(time, 'yyyy-MM-dd') AS utc_d,
      td_time_format(time, 'yyyy-MM-dd HH:mm', 'America/New_York') AS ny
      FROM td_sql_one""")
    assert(r.getString(0) == "2024-01-15 21:34:56")
    assert(r.getString(1) == "2024-01-15")
    assert(r.getString(2) == "2024-01-15 07:34")
  }

  test("td_time_parse is td_time_format's inverse in any zone") {
    val r = sql1("""SELECT
      td_time_parse('2024-01-15 21:34:56', 'Asia/Tokyo') AS jst,
      td_time_parse('2024-01-15 12:34:56') AS utc,
      td_time_parse('2024-01-15') AS midnight
      FROM td_sql_one""")
    assert(r.getLong(0) == t0)
    assert(r.getLong(1) == t0)
    assert(r.getLong(2) == 1705276800L)
  }

  test("td_time_add applies signed fixed-unit duration specs") {
    val r = sql1("""SELECT
      td_time_add(time, '-1d2h') AS back,
      td_time_add(time, '1w') AS fwd,
      td_time_add(time, '30s', 'Asia/Tokyo') AS s30
      FROM td_sql_one""")
    assert(r.getLong(0) == t0 - 93600L)
    assert(r.getLong(1) == t0 + 604800L)
    assert(r.getLong(2) == t0 + 30L)
  }

  test("td_date_trunc truncates on the target zone's wall clock") {
    val r = sql1("""SELECT
      td_date_trunc('day', time, 'Asia/Tokyo') AS d_jst,
      td_date_trunc('day', time) AS d_utc,
      td_date_trunc('month', time) AS m_utc,
      td_date_trunc('week', time) AS w_utc,
      td_date_trunc('quarter', time, 'America/New_York') AS q_ny
      FROM td_sql_one""")
    assert(r.getLong(0) == 1705244400L) // 2024-01-15 00:00 JST
    assert(r.getLong(1) == 1705276800L) // 2024-01-15 00:00 UTC
    assert(r.getLong(2) == 1704067200L) // 2024-01-01 UTC
    assert(r.getLong(3) == 1705276800L) // Mon 2024-01-15 UTC
    assert(r.getLong(4) == 1704085200L) // 2024-01-01 00:00 EST
  }

  test("td_scheduled_time folds the session's schedule anchor") {
    spark.conf.set("spark.graft.scheduled_time", "2024-01-10 05:00:00")
    try {
      val r = sql1("SELECT td_scheduled_time() AS s FROM td_sql_one")
      assert(r.getLong(0) == 1704862800L)
    } finally spark.conf.unset("spark.graft.scheduled_time")
  }

  test("td_interval windows anchor at the scheduled time") {
    spark.conf.set("spark.graft.scheduled_time", "2024-01-10 05:00:00")
    try {
      Td.register(spark)
      // spread of epochs around the scheduled day, JST and UTC boundaries
      val times = Seq(
        1704639600L, // 2024-01-08 00:00 JST
        1704726000L, // 2024-01-09 00:00 JST
        1704812399L, // 2024-01-09 23:59:59 JST
        1704812400L, // 2024-01-10 00:00 JST
        1704855599L, 1704855600L, 1704862799L, 1704862800L)
      times.toDF("time").createOrReplaceTempView("td_iv")
      def sel(spec: String, tz: String = "UTC"): Set[Long] =
        spark.sql(s"SELECT time FROM td_iv WHERE td_interval(time, '$spec', '$tz')")
          .as[Long].collect().toSet
      // '-1d' JST = the whole previous Tokyo day
      assert(sel("-1d", "Asia/Tokyo") == Set(1704726000L, 1704812399L))
      // '1d' JST = the current Tokyo day
      assert(sel("1d", "Asia/Tokyo") ==
        Set(1704812400L, 1704855599L, 1704855600L, 1704862799L, 1704862800L))
      // '-2h' UTC = [03:00, 05:00) on the scheduled day
      assert(sel("-2h") == Set(1704855600L, 1704862799L))
      // '-1d/-1d' JST = the day before yesterday
      assert(sel("-1d/-1d", "Asia/Tokyo") == Set(1704639600L))
    } finally spark.conf.unset("spark.graft.scheduled_time")
  }

  test("tdIntervalBounds calendar arithmetic, incl. week/quarter/DST") {
    val sched = 1704862800L // 2024-01-10T05:00:00Z, a Wednesday
    assert(Td.tdIntervalBounds(sched, "-1M", "UTC") ==
      (1701388800L, 1704067200L)) // Dec 2023
    assert(Td.tdIntervalBounds(sched, "1M", "UTC") ==
      (1704067200L, 1706745600L)) // Jan 2024
    assert(Td.tdIntervalBounds(sched, "-1w", "UTC") ==
      (1704067200L, 1704672000L)) // Mon Jan 1 .. Mon Jan 8
    assert(Td.tdIntervalBounds(sched, "-1q", "UTC") ==
      (1696118400L, 1704067200L)) // Oct 1 2023 .. Jan 1 2024
    assert(Td.tdIntervalBounds(sched, "-1y", "UTC") ==
      (1672531200L, 1704067200L)) // 2023
    // spring-forward: the NY day of 2024-03-10 is 23 wall-clock hours
    val schedDst = 1710177600L // 2024-03-11T17:00Z ≈ 13:00 EDT
    val (lo, hi) = Td.tdIntervalBounds(schedDst, "-1d", "America/New_York")
    assert((lo, hi) == (1710046800L, 1710129600L))
    assert(hi - lo == 82800L)
  }

  test("td_first/td_last are argmin/argmax over one or more keys") {
    Td.register(spark)
    Seq((1L, "a", 10.0), (2L, "b", 5.0), (3L, "a", 7.0), (4L, "b", 9.0))
      .toDF("k", "g", "v").createOrReplaceTempView("td_fl")
    val r = spark.sql("""SELECT g,
        td_first(v, k) AS first_v, td_last(v, k) AS last_v,
        td_last(k, v, k) AS argmax_v
      FROM td_fl GROUP BY g ORDER BY g""").collect()
    assert(r(0).getDouble(1) == 10.0 && r(0).getDouble(2) == 7.0)
    assert(r(1).getDouble(1) == 5.0 && r(1).getDouble(2) == 9.0)
    assert(r(0).getLong(3) == 1L && r(1).getLong(3) == 4L)
  }

  test("td_md5 and td_url_decode match their reference values") {
    val r = sql1("""SELECT td_md5('abc') AS m,
      td_url_decode('a%20b%2Fc+d') AS u FROM td_sql_one""")
    assert(r.getString(0) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getString(1) == "a b/c d")
  }

  test("literal-argument and spec strictness") {
    Td.register(spark)
    Seq(t0).toDF("time").createOrReplaceTempView("td_sql_one")
    // non-literal format / zone / spec → parse-time error, not silence
    intercept[Exception](spark.sql(
      "SELECT td_time_format(time, cast(time AS string)) FROM td_sql_one").collect())
    intercept[Exception](spark.sql(
      "SELECT td_time_add(time, '1x') FROM td_sql_one").collect())
    intercept[Exception](spark.sql(
      "SELECT td_date_trunc('fortnight', time) FROM td_sql_one").collect())
    intercept[Exception](spark.sql(
      "SELECT time FROM td_sql_one WHERE td_interval(time, 'yesterday')").collect())
    // td_interval / td_scheduled_time without the schedule conf → error
    spark.conf.unset("spark.graft.scheduled_time")
    intercept[Exception](spark.sql(
      "SELECT time FROM td_sql_one WHERE td_interval(time, '-1d')").collect())
  }

  test("the tier is independent of spark.sql.session.timeZone") {
    val q = """SELECT
      td_time_format(time, 'yyyy-MM-dd HH:mm:ss', 'Asia/Tokyo') AS f,
      td_time_parse('2024-01-15 21:34:56', 'Asia/Tokyo') AS p,
      td_date_trunc('day', time, 'Asia/Tokyo') AS t,
      td_time_string(time, 'd!', 'Asia/Tokyo') AS s,
      td_time_string(time, 'h', 'America/New_York') AS so
      FROM td_sql_one"""
    val underUtc = sql1(q)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (zone <- Seq("Asia/Tokyo", "America/New_York")) {
        spark.conf.set("spark.sql.session.timeZone", zone)
        assert(sql1(q) == underUtc, s"session zone $zone changed output")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("td_interval bounds fold to pushable bare-column comparisons") {
    spark.conf.set("spark.graft.scheduled_time", "2024-01-10 05:00:00")
    try {
      Td.register(spark)
      Tables.events(spark, TestSpark.sf)
        .select(col("event_id"), expr("ts_ms div 1000").as("time"))
        .createOrReplaceTempView("td_iv_push")
      val df = spark.sql(
        "SELECT event_id FROM td_iv_push WHERE td_interval(time, '-1d', 'Asia/Tokyo')")
      val plan = df.queryExecution.optimizedPlan.toString
      // the filter must be plain literal comparisons on the time column —
      // no td_interval residue, no UDF barrier
      assert(plan.contains(">= 1704726000") && plan.contains("< 1704812400"),
        s"expected folded epoch bounds in:\n$plan")
    } finally spark.conf.unset("spark.graft.scheduled_time")
  }
}
