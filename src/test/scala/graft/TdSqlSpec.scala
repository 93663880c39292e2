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

  test("td_md5, td_sha1 and td_url_decode match their reference values") {
    val r = sql1("""SELECT td_md5('abc') AS m, td_sha1('abc') AS s,
      td_url_decode('a%20b%2Fc+d') AS u FROM td_sql_one""")
    assert(r.getString(0) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getString(1) == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(r.getString(2) == "a b/c d")
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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("td_sessionize_window assigns deterministic per-session ids") {
    Td.register(spark)
    // user 1: [1000, 1100] | gap 2000s | [3200]; user 2: [1000]
    Seq((1L, 1000L, 1L), (2L, 1100L, 1L), (3L, 3200L, 1L), (4L, 1000L, 2L))
      .toDF("event_id", "time", "uid").createOrReplaceTempView("td_sess")
    val rows = spark.sql("""SELECT event_id,
        td_sessionize_window(time, 1800, uid)
          OVER (PARTITION BY uid ORDER BY time, event_id) AS sid
      FROM td_sess ORDER BY event_id""").collect()
    val ids = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids(1L) == md5hex("1000:1") && ids(2L) == md5hex("1000:1"),
      "rows within the timeout share the session-start id")
    assert(ids(3L) == md5hex("3200:1"), "a gap > timeout opens a new session")
    assert(ids(4L) == md5hex("1000:2"),
      "the salt separates same-start sessions across partitions")
  }

  test("td_sessionize_window boundary: a gap of exactly timeout continues") {
    Td.register(spark)
    Seq((1L, 0L), (2L, 1800L), (3L, 1801L + 1800L))
      .toDF("event_id", "time").createOrReplaceTempView("td_sess_b")
    val rows = spark.sql("""SELECT event_id,
        td_sessionize_window(time, 1800)
          OVER (ORDER BY time, event_id) AS sid
      FROM td_sess_b ORDER BY event_id""").collect()
    assert(rows(0).getString(1) == rows(1).getString(1),
      "gap == timeout stays in-session (strict > opens)")
    assert(rows(2).getString(1) != rows(1).getString(1))
    assert(rows(0).getString(1) == md5hex("0"), "no salt → md5(start) alone")
  }

  test("td_sessionize_window rejects non-window use and bad types") {
    Td.register(spark)
    Seq((1L, 1000L)).toDF("event_id", "time")
      .createOrReplaceTempView("td_sess_e")
    intercept[Exception] {
      spark.sql("SELECT td_sessionize_window(time, 1800) FROM td_sess_e")
        .collect()
    }
    intercept[Exception] {
      spark.sql("""SELECT td_sessionize_window(cast(time AS string), 1800)
          OVER (ORDER BY time) FROM td_sess_e""").collect()
    }
  }

  test("td_approx_most_frequent returns the exact top-k map when capacity holds") {
    Td.register(spark)
    // frequencies: a×4, b×3, c×2, d×1
    Seq("a", "a", "a", "a", "b", "b", "b", "c", "c", "d")
      .toDF("v").createOrReplaceTempView("td_amf")
    val m = spark.sql(
      "SELECT td_approx_most_frequent(3, v, 10) AS m FROM td_amf")
      .head().getMap[String, Long](0)
    assert(m == Map("a" -> 4L, "b" -> 3L, "c" -> 2L))
  }

  test("td_approx_most_frequent stays capacity-bounded and keeps the heavy head") {
    Td.register(spark)
    // one heavy term among a long uniform tail; capacity 8 << 101 distinct
    val rows = (1 to 100).map(i => s"t$i") ++ Seq.fill(50)("heavy")
    rows.toDF("v").createOrReplaceTempView("td_amf_cap")
    val m = spark.sql(
      "SELECT td_approx_most_frequent(2, v, 8) AS m FROM td_amf_cap")
      .head().getMap[String, Long](0)
    assert(m.size == 2)
    assert(m.contains("heavy"), s"heavy hitter must survive eviction: $m")
    // SpaceSaving over-counts by at most N/capacity
    assert(m("heavy") >= 50L && m("heavy") <= 50L + 150L / 8 + 1)
  }

  test("td_parse_agent classifies the mainstream UA families") {
    Td.register(spark)
    val uas = Seq(
      ("chrome-linux", "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/120.0.0.0 Safari/537.36"),
      ("safari-mac", "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 Version/17.1 Safari/605.1.15"),
      ("firefox-win", "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) Gecko/20100101 Firefox/121.0"),
      ("chrome-android", "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 Chrome/120.0.6099.43 Mobile Safari/537.36"),
      ("safari-iphone", "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 Version/17.1 Mobile/15E148 Safari/604.1"),
      ("edge-win", "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91"))
    uas.toDF("label", "ua").createOrReplaceTempView("td_ua")
    val got = spark.sql("""SELECT label, td_parse_agent(ua) AS m FROM td_ua""")
      .collect().map(r => r.getString(0) -> r.getMap[String, String](1)).toMap
    assert(got("chrome-linux")("browser") == "Chrome" &&
      got("chrome-linux")("os") == "Linux" &&
      got("chrome-linux")("browser_version") == "120.0.0.0" &&
      got("chrome-linux")("category") == "pc")
    assert(got("safari-mac")("browser") == "Safari" &&
      got("safari-mac")("os") == "Mac OSX" &&
      got("safari-mac")("browser_version") == "17.1" &&
      got("safari-mac")("os_version") == "10_15_7")
    assert(got("firefox-win")("browser") == "Firefox" &&
      got("firefox-win")("os") == "Windows" &&
      got("firefox-win")("os_version") == "10.0")
    assert(got("chrome-android")("os") == "Android" &&
      got("chrome-android")("category") == "smartphone" &&
      got("chrome-android")("os_version") == "14")
    assert(got("safari-iphone")("os") == "iOS" &&
      got("safari-iphone")("category") == "smartphone" &&
      got("safari-iphone")("os_version") == "17_1")
    assert(got("edge-win")("browser") == "Edge" &&
      got("edge-win")("browser_version") == "120.0.2210.91")
    // null in → null out, not a map of empty fields
    assert(spark.sql("SELECT td_parse_agent(CAST(NULL AS STRING))")
      .head().isNullAt(0))
  }

  test("td_sessionize_window rejects a non-positive timeout") {
    Td.register(spark)
    Seq((1L, 1000L)).toDF("event_id", "time")
      .createOrReplaceTempView("td_sess_t0")
    intercept[Exception] {
      spark.sql("""SELECT td_sessionize_window(time, 0)
          OVER (ORDER BY time) FROM td_sess_t0""").collect()
    }
    intercept[Exception] {
      spark.sql("""SELECT td_sessionize_window(time, -5)
          OVER (ORDER BY time) FROM td_sess_t0""").collect()
    }
  }

  test("td_approx_most_frequent validates its literal arguments") {
    Td.register(spark)
    Seq("a").toDF("v").createOrReplaceTempView("td_amf_e")
    intercept[Exception] {
      spark.sql("SELECT td_approx_most_frequent(5, v, 3) FROM td_amf_e")
        .collect() // capacity < num
    }
    intercept[Exception] {
      spark.sql("SELECT td_approx_most_frequent(v, v, 10) FROM td_amf_e")
        .collect() // non-literal num
    }
  }
}
