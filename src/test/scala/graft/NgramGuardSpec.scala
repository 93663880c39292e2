package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ngrams

/** r17 verdict item 1 — the short-doc n-gram hazard class, closed three
  * ways: (1) a SOURCE LINT rejecting any open-coded
  * `sequence(<digit>, … size|length(` window outside Ngrams.scala (the
  * j67 bug pattern: guard and window drifting into different functions);
  * (2) unit pins of the guarded builders on 0/1/2/3-token inputs;
  * (3) a corpus sweep running EVERY documents-reading registry key over a
  * fixture whose documents table is dominated by 0/1/2/3-token docs — all
  * keys must build and execute without throwing and without spurious
  * grams (Spark's `sequence(1, n)` is DESCENDING for n < 1, so an
  * unguarded window either fabricates grams or dies in `slice`). */
class NgramGuardSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("lint: no open-coded size/length-bounded sequence() outside Ngrams") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    assume(java.nio.file.Files.isDirectory(root))
    val pat = java.util.regex.Pattern.compile(
      "sequence\\(\\s*\\d+\\s*,[^)]{0,160}?(size|length)\\(",
      java.util.regex.Pattern.DOTALL)
    val walk = java.nio.file.Files.walk(root)
    val offenders =
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .filterNot(_.getFileName.toString == "Ngrams.scala")
        .filter { p =>
          pat.matcher(new String(java.nio.file.Files.readAllBytes(p))).find()
        }.map(_.toString).toList
      finally walk.close()
    assert(offenders.isEmpty,
      s"\nopen-coded gram window(s) — route through graft.ops.Ngrams: $offenders")
  }

  // r18 verdict item 2: the size/length lint closed the GRAM windows, but
  // ~7 repetition-fold sites still open-coded `sequence(1, cnt)` where
  // cnt is a column that is >= 1 by construction TODAY — the same
  // "guard lives elsewhere" shape the n-gram class had. This dimension
  // flags any `sequence(<digit>, <bare-identifier bound>)` in src/main
  // outside Ngrams.scala: a data-dependent upper bound must route
  // through Ngrams.seqAsc (EMPTY, not DESCENDING, when the bound drops
  // below lo). Scala-interpolated bounds (`sequence(0, $planes)`) are
  // compile-time constants and exempt; `//` comments are stripped first.
  // Allowlist entries require an inline justification here.
  test("lint: no open-coded digit-lo sequence() with a bare column bound") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    assume(java.nio.file.Files.isDirectory(root))
    // bound starts with a bare identifier or a cast(/expr-wrapped one —
    // not a digit (constant), not `$` (Scala constant interpolation),
    // not a quote (timestamp literals)
    val pat = java.util.regex.Pattern.compile(
      "sequence\\(\\s*\\d+\\s*,\\s*[A-Za-z_(]")
    val allowed: Map[String, String] = Map(
      // "<filename>" -> "<justification>"  (none today)
    )
    val walk = java.nio.file.Files.walk(root)
    val offenders =
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .filterNot(_.getFileName.toString == "Ngrams.scala")
        .filterNot(p => allowed.contains(p.getFileName.toString))
        .filter { p =>
          // strip only WHOLE-LINE comments: '//' also appears inside
          // oracle SQL strings as DuckDB's integer division, so trailing
          // truncation would let a sequence() on the same line escape
          // the lint (r19 review finding). An inline Scala comment that
          // mentions sequence(<digit>, <col>) will false-positive — fix
          // by rewording the comment, never by weakening the lint.
          val noComments = java.nio.file.Files.readAllLines(p).asScala
            .filterNot(_.trim.startsWith("//"))
            .mkString("\n")
          pat.matcher(noComments).find()
        }.map(_.toString).toList
      finally walk.close()
    assert(offenders.isEmpty,
      s"\ndata-dependent sequence() bound(s) — route through " +
        s"Ngrams.seqAsc or allowlist with justification: $offenders")
  }

  // r18 verdict item 2 (done-criterion): drive one of the repetition
  // folds (the m17/m18 offset-walk shape) with cnt = 0 — the guarded
  // domain must yield the fold's zero value (empty entry list), not a
  // descending [1, 0] walk over garbage offsets.
  test("seqAsc-guarded aggregate fold is the zero value at cnt = 0") {
    val got = spark.sql(
      s"""SELECT cnt,
            aggregate(${Ngrams.seqAsc("1", "cnt")},
              struct(1 AS p, cast(array() AS array<int>) AS es),
              (acc, i) -> struct(acc.p + i AS p,
                concat(acc.es, array(acc.p)) AS es)) AS walk
          FROM VALUES (0), (1), (3) AS t(cnt) ORDER BY cnt""").collect()
    assert(got(0).getStruct(1).getSeq[Int](1).isEmpty, "cnt=0 must fold to zero value")
    assert(got(0).getStruct(1).getInt(0) == 1)
    assert(got(1).getStruct(1).getSeq[Int](1) == Seq(1))
    assert(got(2).getStruct(1).getSeq[Int](1) == Seq(1, 2, 4))
  }

  test("Ngrams builders are empty (not descending) on short inputs") {
    val df = spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(0L, ""), org.apache.spark.sql.Row(1L, "a"),
        org.apache.spark.sql.Row(2L, "a b"), org.apache.spark.sql.Row(3L, "a b c"),
        org.apache.spark.sql.Row(4L, "a b c d")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .select(col("id"), col("text"), split(col("text"), " ").as("toks"))

    val got = df.select(col("id"),
        expr(s"size(${Ngrams.starts("toks", 3)})").as("s3"),
        expr(s"size(${Ngrams.starts0("toks", 2)})").as("z2"),
        expr(s"size(${Ngrams.charStarts("text", 3)})").as("c3"),
        expr(Ngrams.grams("toks", 2)).as("g2"),
        expr(s"size(${Ngrams.pairs("toks", "j -> array(i, j)")})").as("np"))
      .orderBy("id").collect()

    // "" splits to [""] (size 1) — still must emit zero 3-gram windows
    assert(got.map(_.getInt(1)).toSeq == Seq(0, 0, 0, 1, 2), "starts n=3")
    assert(got.map(_.getInt(2)).toSeq == Seq(0, 0, 1, 2, 3), "starts0 k=2")
    // char trigrams need length>=3 characters
    assert(got.map(_.getInt(3)).toSeq == Seq(0, 0, 1, 3, 5), "charStarts q=3")
    assert(got.map(_.getSeq[String](4).toList).toSeq ==
      Seq(Nil, Nil, List("a b"), List("a b", "b c"), List("a b", "b c", "c d")))
    // C(size,2) index pairs, zero (no self/negative pairs) below 2 elems
    assert(got.map(_.getInt(5)).toSeq == Seq(0, 0, 1, 3, 6), "pairs")
    assert(spark.sql(s"SELECT size(${Ngrams.seqAsc("1", "0")}) s").head.getInt(0) == 0)
  }

  test("every documents-reading registry key survives a 0/1/2/3-token corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shortdoc").toString
    // other tables: symlink the real sf0.001 fixtures (keys must see a
    // fully-populated SF dir); documents: the adversarial corpus
    for (tbl <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings")) {
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(dir, s"$tbl.parquet"),
        java.nio.file.Paths.get(TestSpark.sf, s"$tbl.parquet"))
    }
    val prefix = (1 to 16).map(i => s"tok$i").mkString(" ")
    val texts = Seq(
      "",                       // splits to [""] — size 1, empty token
      "one",
      "two words",
      "three word doc",
      "four word doc here",
      s"$prefix alpha beta gamma delta epsilon zeta eta theta",
      s"$prefix iota kappa lambda mu nu xi omicron pi",
      "the exact duplicate body repeated verbatim for dedup keys to chew on here",
      "the exact duplicate body repeated verbatim for dedup keys to chew on here",
      (1 to 30).map(i => s"w${i % 7} v$i").mkString(" "),
      (1 to 40).map(i => s"q$i").mkString(" "),
      "short",
      "a b",
      "x y z")
    val langs = Seq("en", "es", "de", "fr", "zh", "ja")
    val rows = texts.zipWithIndex.map { case (t, i) =>
      org.apache.spark.sql.Row(i.toLong, t, langs(i % langs.size),
        s"src${i % 4}", t.length.toLong)
    } ++ Seq(
      // an ALL-empty-text source: per-source character ratios (j109) see
      // sum(length(text)) = 0 for this group — the r19 ADVICE divide-by-
      // zero class the mixed-per-source fixture above cannot reach
      org.apache.spark.sql.Row(100L, "", "en", "srcempty", 0L),
      org.apache.spark.sql.Row(101L, "", "es", "srcempty", 0L))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lang",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.LongType))))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    // Build EVERY registry key against the shortdoc dir (eager keys run
    // here), then execute those whose analyzed plan scans it: documents
    // readers get the adversarial corpus end-to-end.
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var executed = 0
    SparkEntry.registry.foreach { q =>
      try {
        val df = q.fn(spark, dir)
        val readsDocs = df.queryExecution.analyzed.collectLeaves().exists {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.exists(_.toString.contains("shortdoc")) &&
                  fs.location.rootPaths.exists(_.toString.contains("documents"))
              case _ => false
            }
          case _ => false
        }
        if (readsDocs) { df.collect(); executed += 1 }
      } catch {
        case e: Throwable =>
          failures += s"${q.key}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}"
      }
    }
    spark.catalog.clearCache()
    assert(failures.isEmpty, s"\nshort-doc corpus broke:\n  ${failures.mkString("\n  ")}")
    // sanity: the sweep actually exercised the text keys
    assert(executed >= 80, s"only $executed documents-reading keys executed")
  }
}
