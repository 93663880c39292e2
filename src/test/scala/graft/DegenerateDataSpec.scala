package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide degenerate-data harness (r18 verdict item 5): the three
  * targeted sweeps (short-doc, zero-embedding, degenerate-events) found
  * 16 real defects by feeding hostile fixtures to the keys reading ONE
  * table each. This generalizes the pattern to the whole input surface
  * at once: every registry key runs over (a) an ALL-EMPTY variant of the
  * ten fixture tables, (b) a SINGLE-ROW variant, (c) a PATHOLOGICAL
  * row-shape variant, and (d) a NULL-riddled variant.
  *
  * r22 (verdict item 2, suite-wall bound): the four sweeps — 1782 s of
  * single-JVM wall together, the reason the driver's `sbt test` leg
  * truncated in r21 — are now FOUR suites, one sweep each, so
  * build.sbt's testGrouping can run each in its own forked JVM in
  * parallel with the rest of the suite. Coverage is unchanged: every
  * registry key still runs over every variant.
  *
  * Empty input exercises a class the per-table sweeps cannot: aggregates
  * that feed divisions (0-row totals), limit(1) carriers that vanish,
  * windows over nothing, min/max that go NULL. Single-row input
  * exercises the no-neighbor class globally (self-joins, lag/lead,
  * pair enumeration) — including j108's wedges=0 clustering guard,
  * whose 12-vector embedding sweep fixture could not reach it.
  *
  * The empty/single variants are derived from the REAL sf0.001 fixtures
  * by truncation, so schemas (including the events.ts physical-type
  * dispatch in Tables.events) stay exactly what the engine sees in
  * production. Keys only have to not THROW; emptiness of results is
  * legitimate.
  */
trait DegenerateSweep { self: AnyFunSuite =>
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  /** Save/restore a session conf around `body` (r19 advice: the sweep set
    * nanosAsLong on the SHARED TestSpark session and leaked reader
    * behavior into whichever suite ran next). */
  protected def withConf[A](key: String, value: String)(body: => A): A = {
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  protected def buildVariant(tag: String, n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_degen$tag").toString
    // same reader posture as Tables.events: a legacy TIMESTAMP(NANOS)
    // events fixture reads as epoch-nanos LONG and round-trips as such
    withConf("spark.sql.legacy.parquet.nanosAsLong", "true") {
      for (tbl <- Tables.names) {
        spark.read.parquet(s"${TestSpark.sf}/$tbl.parquet")
          .limit(n).coalesce(1).write.parquet(s"$dir/$tbl.parquet")
      }
    }
    dir
  }

  protected def sweep(dir: String, tag: String): Unit = {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var executed = 0
    var attempted = 0
    SparkEntry.registry.foreach { q =>
      attempted += 1
      try {
        q.fn(spark, dir).collect()
        executed += 1
      } catch {
        case e: Throwable =>
          failures += s"${q.key}: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).replace('\n', ' ').take(180)
      }
      // the sweep runs 420+ keys back to back: persisted intermediates and
      // localCheckpoints from one key must not accumulate into the next.
      // Keyed on ATTEMPTS, not successes (r19 advice: a failure-heavy
      // sweep otherwise stops cleaning and checkpoints pile up).
      if (attempted % 64 == 0) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    assert(failures.isEmpty,
      s"\n$tag-table sweep broke ${failures.size} key(s):\n  " +
        failures.mkString("\n  "))
    assert(executed == SparkEntry.registry.size,
      s"$tag sweep executed $executed of ${SparkEntry.registry.size}")
  }
}

class DegenerateEmptySpec extends AnyFunSuite with DegenerateSweep {
  test("every registry key survives ALL-EMPTY input tables") {
    sweep(buildVariant("empty", 0), "empty")
  }
}

class DegenerateSingleRowSpec extends AnyFunSuite with DegenerateSweep {
  test("every registry key survives SINGLE-ROW input tables") {
    sweep(buildVariant("single", 1), "single-row")
  }
}

// sweep (c): PATHOLOGICAL ROW SHAPES — the per-row extremes a crawler
// actually produces and the empty/single/null sweeps cannot reach: a
// 20k-token document, a single 70k-char token (a binary blob pasted
// into text; > writeUTF's 65,535-byte cap), a 10k-fold repeated
// token, pre-epoch and far-future timestamps, ±1.7e308/NaN measures,
// and embedding vectors carrying ±1e30, denormals, and NaN. Keys only
// have to not THROW; Inf/NaN outputs and dropped rows are legitimate.
// (The sweep's FIRST run used a 50k-token doc and year-1/9999
// timestamps and broke 18 keys — all fixed; the committed sizes are
// bounded so the suite's wall stays reasonable, and the two classes
// the shrink no longer reaches are pinned separately: a16's
// spine-materialization by Round20Spec's plan-shape test, the
// DECIMAL/quantizer overflow classes by the retained extreme VALUES
// here.)
class DegeneratePathologicalSpec extends AnyFunSuite with DegenerateSweep {
  test("every registry key survives pathological row shapes") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_degenpath").toString
    withConf("spark.sql.legacy.parquet.nanosAsLong", "true") {
      for (tbl <- Tables.names
          if tbl != "documents" && tbl != "events" && tbl != "embeddings") {
        spark.read.parquet(s"${TestSpark.sf}/$tbl.parquet")
          .limit(4).coalesce(1).write.parquet(s"$dir/$tbl.parquet")
      }
      // sizes chosen to exercise the classes while keeping the sweep's
      // wall bounded: the gram/char pipelines on a giant doc pay the
      // inference-pushdown re-evaluation cost quadratically (see
      // Ngrams.gramAt), and the blob must exceed writeUTF's 65,535-byte
      // cap to probe sketch serializers
      val big = (0 until 20000).map(i => s"w$i").mkString(" ")
      val blob = "x" * 70000
      val rep = Seq.fill(10000)("tok").mkString(" ")
      val alt = (0 until 5000).map(i => if (i % 2 == 0) "a" else "b").mkString(" ")
      import spark.implicits._
      Seq(
        (0L, "a plain short document for contrast", "en", "src0", 36L),
        (1L, big, "en", "src1", big.length.toLong),
        (2L, blob, "xx", "src2", blob.length.toLong),
        (3L, rep, "en", "src0", rep.length.toLong),
        (4L, "", "en", "src1", 0L),
        (5L, alt, "de", "src2", alt.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$dir/documents.parquet")
      // calendar edges bounded to a ~60-year span: spine keys (a16)
      // legitimately enumerate one row per hour in [min, max], and the
      // sweep collect()s results — pre-epoch and far-future still
      // exercise negative-epoch and overflow arithmetic
      Seq(
        (0L, "1969-12-25 00:00:00", 1L, "view", 1.0, """{"k":1}"""),
        (1L, "2031-01-01 23:59:59", 1L, "view", 1.7e308, """{"k":2}"""),
        (2L, "2024-01-01 00:00:00", 2L, "click", -1.7e308, "{}"),
        (3L, "2024-01-01 00:00:01", 2L, "click", Double.NaN, "not json"),
        (4L, "2024-01-01 00:00:02", 3L, "buy", 1e-310, null))
        .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
        .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      Seq(
        (0L, Seq.tabulate(64)(i => i.toFloat / 64f), 0),
        (1L, Seq.fill(64)(1e30f), 1),
        (2L, Seq.fill(64)(-1e30f), 2),
        (3L, Seq.fill(64)(1e-40f), 3),
        (4L, Seq.tabulate(64)(i => if (i == 0) Float.NaN else 0.5f), 4),
        (5L, Seq.fill(64)(0f), 5))
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    }
    sweep(dir, "pathological")
  }
}

// sweep (d): the remaining hostile class after empty/single-row: NULLs in
// the nullable columns of EVERY table at once (r19 verdict item 3 widened
// this from documents-only). Per table the row-identity column stays
// intact and every other column goes NULL on its own prime stride, so
// null and non-null rows interleave and every key sees both classes in
// one relation — the shape a production corpus has after a failed
// extraction stage, a partial join, or a late-arriving dimension.
// Orders/lineitem additionally null their JOIN keys (o_orderkey /
// o_custkey / l_partkey / l_suppkey: SQL null-key semantics drop those
// rows from equi-joins — they must drop, not throw), and embeddings
// carries both whole-NULL vectors and NULL elements INSIDE otherwise
// valid arrays (the class a failed encoder shard produces). Keys only
// have to not THROW; null rows legitimately drop out of pipelines.
class DegenerateNullSpec extends AnyFunSuite with DegenerateSweep {
  test("every registry key survives NULL-riddled columns in all ten tables") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{Column, DataFrame}
    val dir = java.nio.file.Files.createTempDirectory("graft_degennull").toString
    // key % m == 0 -> NULL; distinct primes per column interleave combos
    def nulled(key: Column, m: Int, c: String): Column =
      when(pmod(key, lit(m)) === 0, lit(null)).otherwise(col(c)).as(c)
    def keep(cs: String*): Seq[Column] = cs.map(col)
    withConf("spark.sql.legacy.parquet.nanosAsLong", "true") {
      def rd(name: String): DataFrame =
        spark.read.parquet(s"${TestSpark.sf}/$name.parquet")
      def wr(name: String)(cols: Seq[Column]): Unit =
        rd(name).select(cols: _*).coalesce(1)
          .write.parquet(s"$dir/$name.parquet")
      wr("region")(keep("r_regionkey") :+ nulled(col("r_regionkey"), 2, "r_name"))
      wr("nation")(keep("n_nationkey") ++ Seq(
        nulled(col("n_nationkey"), 3, "n_name"),
        nulled(col("n_nationkey"), 5, "n_regionkey")))
      wr("customer")(keep("c_custkey") ++ Seq(
        nulled(col("c_custkey"), 3, "c_name"),
        nulled(col("c_custkey"), 5, "c_nationkey"),
        nulled(col("c_custkey"), 7, "c_acctbal"),
        nulled(col("c_custkey"), 11, "c_mktsegment")))
      wr("supplier")(keep("s_suppkey") ++ Seq(
        nulled(col("s_suppkey"), 3, "s_name"),
        nulled(col("s_suppkey"), 5, "s_nationkey"),
        nulled(col("s_suppkey"), 7, "s_acctbal")))
      wr("part")(keep("p_partkey") ++ Seq(
        nulled(col("p_partkey"), 3, "p_name"),
        nulled(col("p_partkey"), 5, "p_brand"),
        nulled(col("p_partkey"), 7, "p_type"),
        nulled(col("p_partkey"), 11, "p_size"),
        nulled(col("p_partkey"), 13, "p_retailprice")))
      wr("orders")(Seq(
        nulled(col("o_orderkey"), 17, "o_orderkey"),
        nulled(col("o_orderkey"), 3, "o_custkey"),
        nulled(col("o_orderkey"), 5, "o_orderstatus"),
        nulled(col("o_orderkey"), 7, "o_totalprice"),
        nulled(col("o_orderkey"), 11, "o_orderdate"),
        nulled(col("o_orderkey"), 13, "o_orderpriority")))
      val lk = col("l_orderkey") * 8 + col("l_linenumber")
      wr("lineitem")(keep("l_orderkey", "l_linenumber") ++ Seq(
        nulled(lk, 3, "l_partkey"),
        nulled(lk, 5, "l_suppkey"),
        nulled(lk, 7, "l_quantity"),
        nulled(lk, 11, "l_extendedprice"),
        nulled(lk, 13, "l_discount"),
        nulled(lk, 17, "l_tax"),
        nulled(lk, 19, "l_returnflag"),
        nulled(lk, 23, "l_linestatus"),
        nulled(lk, 29, "l_shipdate")))
      wr("events")(keep("event_id") ++ Seq(
        nulled(col("event_id"), 13, "ts"),
        nulled(col("event_id"), 3, "user_id"),
        nulled(col("event_id"), 5, "event_type"),
        nulled(col("event_id"), 7, "value"),
        nulled(col("event_id"), 11, "props")))
      wr("documents")(keep("doc_id") ++ Seq(
        nulled(col("doc_id"), 3, "text"),
        nulled(col("doc_id"), 5, "lang"),
        nulled(col("doc_id"), 7, "source"),
        nulled(col("doc_id"), 3, "n_chars")))
      wr("embeddings")(keep("vec_id") ++ Seq(
        when(pmod(col("vec_id"), lit(3)) === 0, lit(null))
          .when(pmod(col("vec_id"), lit(5)) === 0,
            // NULL elements INSIDE an otherwise valid vector
            transform(col("embedding"), (x, i) =>
              when(pmod(i, lit(4)) === 0, lit(null).cast("float"))
                .otherwise(x)))
          .otherwise(col("embedding")).as("embedding"),
        nulled(col("vec_id"), 7, "label")))
    }
    sweep(dir, "null-riddled")
  }
}
