package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 batch: PSI snapshot drift + epoch/repeat schedule. Each key
  * is pinned by an INDEPENDENT recompute from its own integer inputs
  * (plain Scala arithmetic over the collected relation — a different
  * code path from the Column expressions under test), on top of the
  * DuckDB hash gate the driver runs.
  */
class Round19Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private val sf = TestSpark.sf

  test("j116: per-bin counts partition the corpus; PSI equals the recompute") {
    val out = SparkEntry.queries("j116_psi_drift")(spark, sf)
      .collect().sortBy(_.getInt(0))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == nDocs,
      "bins must partition the corpus across both snapshots")
    val totRef = out.map(_.getLong(1)).sum.toDouble
    val totCur = out.map(_.getLong(2)).sum.toDouble
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    var psi = BigDecimal(0)
    out.foreach { r =>
      val pRef = r.getLong(1) / totRef
      val pCur = r.getLong(2) / totCur
      val term = if (pRef > 0 && pCur > 0)
        r6((pCur - pRef) * math.log(pCur / pRef)) else 0.0
      assert(r.getDouble(5) == term, s"psi_term bin ${r.getInt(0)}")
      assert(r.getDouble(3) == r6(pRef) && r.getDouble(4) == r6(pCur),
        s"shares bin ${r.getInt(0)}")
      psi += BigDecimal(term)
    }
    out.foreach(r => assert(r.getDouble(6) == psi.toDouble, "psi total"))
    // both snapshots non-empty at sf0.001 and the split is ~half/half
    assert(totRef > 0 && totCur > 0)
  }

  test("j116: identical snapshots read PSI = 0") {
    // doubling every doc id*2 / id*2+1 puts the SAME text in both
    // snapshots -> every bin's shares match -> every term is exactly 0
    val dir = java.nio.file.Files.createTempDirectory("graft_psi0").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("k", explode(array(lit(0L), lit(1L))))
      .select((col("doc_id") * 2 + col("k")).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("j116_psi_drift")(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "mirrored bins")
      assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0, "psi must be 0")
    }
  }

  test("j117: schedule identities hold against an independent recompute") {
    val out = SparkEntry.queries("j117_epoch_schedule")(spark, sf).collect()
    val masses = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(_.getString(0)).toSet == masses.keySet)
    val target = 3000000L / masses.size
    out.foreach { r =>
      val (src, n) = (r.getString(0), r.getLong(1))
      assert(n == masses(src), s"token mass $src")
      assert(r.getLong(2) == target, s"target $src")
      val served = math.min(4L * n, target)
      assert(r.getLong(3) == served, s"served $src")
      assert(r.getLong(5) == target - served, s"unmet $src")
      val epochs = if (n == 0) 0.0
        else math.round(served.toDouble / n * 1e6) / 1e6
      assert(r.getDouble(4) == epochs, s"epochs $src")
    }
    // the budget is never exceeded
    assert(out.map(_.getLong(3)).sum <= 3000000L)
  }

  test("j118: structure audit equals a from-scratch Scala recompute") {
    val out = SparkEntry.queries("j118_chat_turns")(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      val toks = text.replace('\n', ' ').replace('\r', ' ').split(" ", -1)
      val nSyn = (2 + id % 5).toInt
      val roles = (1 to nSyn).map { i =>
        if (i == 1 && id % 4 == 0) "system"
        else if (id % 7 == 0 && i == 2) "user"
        else if (i % 2 == 1) "user" else "assistant"
      }
      val ntoks = (1 to nSyn).map { i =>
        toks.slice((i - 1) * 4, (i - 1) * 4 + 4).count(_.nonEmpty).toLong
      }
      val viols = roles.sliding(2).count(p => p.size == 2 && p(0) == p(1))
      val asst = roles.zip(ntoks).collect { case ("assistant", n) => n }.sum
      val tot = ntoks.sum
      val r = out(id)
      assert(r.getLong(1) == nSyn.toLong, s"n_turns doc $id")
      assert(r.getLong(2) == viols.toLong, s"violations doc $id")
      assert(r.getLong(3) == asst, s"assistant_tokens doc $id")
      assert(r.getLong(4) == tot, s"total_tokens doc $id")
      val share = if (tot == 0) 0.0
        else math.round(asst.toDouble / tot * 1e6) / 1e6
      assert(r.getDouble(5) == share, s"share doc $id")
    }
    // the planted defect classes are present in the fixture
    assert(out.exists(_._2.getLong(2) > 0), "planted violations must appear")
    assert(out.values.map(_.getLong(1)).toSet.size > 1, "turn counts vary")
  }
}
