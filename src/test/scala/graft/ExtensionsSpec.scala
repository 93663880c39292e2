package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions + IVF ANN semantics. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("registerAll exposes td_time_range and cosine_similarity to SQL") {
    GraftExtensions.registerAll(spark)
    Tables.t(spark, TestSpark.sf, "orders").createOrReplaceTempView("orders_x")
    val n = spark.sql(
      "SELECT count(*) FROM orders_x WHERE td_time_range(o_orderdate, '1996-01-01', '1997-01-01')")
      .head().getLong(0)
    assert(n > 0 && n < 1500)
    Tables.t(spark, TestSpark.sf, "embeddings").createOrReplaceTempView("emb_x")
    val c = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) FROM emb_x LIMIT 1")
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("extensions class injects the same functions at session build") {
    // verify the injection hook wires up without error on a fresh builder
    // (same JVM: the active session is reused, so assert via the
    // injected-builder path directly)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // building a Column through the injected builder must analyze fine
    GraftExtensions.registerAll(spark)
    assert(spark.sql("SELECT cosine_similarity(array(cast(1.0 as float)), array(cast(1.0 as float)))")
      .head().getDouble(0) == 1.0)
  }

  test("registerAll/inject carry the whole Presto dialect") {
    // the builder list is what injectFunction ships at session build —
    // wiring must accept every entry without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(graft.functions.Presto.builders.size >= 50)
    // and registerAll exposes the dialect names to plain spark.sql
    GraftExtensions.registerAll(spark)
    val r = spark.sql("""SELECT strpos('hello', 'll') AS p,
        to_iso8601(DATE '2024-02-29') AS d,
        normalize('ﬁre', 'NFKC') AS n""").head()
    assert(r.getInt(0) == 3 && r.getString(1) == "2024-02-29"
      && r.getString(2) == "fire")
  }

  test("registerAll carries the session-3 TD tier additions") {
    GraftExtensions.registerAll(spark)
    import spark.implicits._
    Seq((1L, 1000L), (2L, 1100L)).toDF("id", "time")
      .createOrReplaceTempView("ext_sess")
    val sess = spark.sql("""SELECT td_sessionize_window(time, 1800)
        OVER (ORDER BY time, id) AS sid FROM ext_sess""").collect()
    assert(sess.length == 2 && sess(0).getString(0) == sess(1).getString(0))
    val amf = spark.sql("""SELECT td_approx_most_frequent(1, x, 4) AS m
        FROM (SELECT explode(array('a','a','b')) AS x)""")
      .head().getMap[String, Long](0)
    assert(amf == Map("a" -> 2L))
    val ua = spark.sql("""SELECT td_parse_agent(
        'Mozilla/5.0 (X11; Linux x86_64) Chrome/120.0 Safari/537.36')['os']""")
      .head().getString(0)
    assert(ua == "Linux")
  }

  test("registerAll exposes char_ngrams and heavy_hitters to SQL") {
    GraftExtensions.registerAll(spark)
    val grams = spark.sql(
      "SELECT pos, gram FROM (SELECT 'abcd' AS s) LATERAL VIEW char_ngrams(s, 2) t AS pos, gram ORDER BY pos")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(grams == Seq((0, "ab"), (1, "bc"), (2, "cd")))
    val hh = spark.sql(
      "SELECT inline(heavy_hitters(x, 2)) FROM (SELECT explode(array('a','a','b')) AS x)")
      .collect()
    assert(hh.nonEmpty)
  }

  test("IVF ANN returns descending exact cosines from probed cells only") {
    val out = SparkEntry.queries("j3d_sim_ivf")(spark, TestSpark.sf).collect()
    assert(out.nonEmpty && out.length <= 5)
    val cos = out.map(_.getDouble(2))
    assert(cos.sameElements(cos.sorted.reverse))
    assert(out.map(_.getInt(1)).distinct.length <= 2) // nprobe = 2 cells
  }
}
