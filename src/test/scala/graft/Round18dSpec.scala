package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 batch-4 pins: j112/j114 are re-derived from the j39 edge
  * relation driver-side (mass-balance identities), and j113's whole
  * greedy path is recomputed from the raw embeddings in plain Scala —
  * same array-order cosine, same 6-dp HALF_UP rounding, same
  * (score, vec_id) argmax — so a divergence anywhere in the unrolled
  * pipeline fails the exact row compare. */
class Round18dSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  private val sf = TestSpark.sf

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val edges: Array[(Long, Long)] =
    SparkEntry.queries("j39_knn_graph")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))

  private def labels(): Map[Long, Int] =
    spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap

  test("j112: per-label noise audit equals an edge-set recount") {
    val lab = labels()
    val per = edges.groupBy(_._1).map { case (i, es) =>
      (lab(i), es.length.toLong,
        es.count { case (_, j) => lab(j) != lab(i) }.toLong)
    }.toSeq
    val want = per.groupBy(_._1).map { case (l, g) =>
      val k = g.map(_._2).sum
      val dis = g.map(_._3).sum
      (l, g.size.toLong, r6(dis.toDouble / k),
        g.count { case (_, kk, dd) => dd * 3 >= kk * 2 }.toLong)
    }
    val got = SparkEntry.queries("j112_knn_label_noise")(spark, sf)
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Long]("n_vecs"),
        r.getAs[Double]("disagree_rate"), r.getAs[Long]("n_flagged")))
    assert(got.toSet == want.toSet)
    assert(got.map(_._2).sum == edges.map(_._1).distinct.length.toLong)
  }

  test("j114: in-degree histogram mass-balances edges and corpus") {
    val rows = SparkEntry.queries("j114_hubness_audit")(spark, sf)
      .collect()
    val totEdges = rows.map(r =>
      r.getAs[Long]("in_deg") * r.getAs[Long]("n_vectors")).sum
    assert(totEdges == edges.length.toLong,
      "Σ in_deg × n_vectors must equal the edge count")
    val totVecs = rows.map(_.getAs[Long]("n_vectors")).sum
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(totVecs == corpus, "every vector lands in exactly one bucket")
    val degs = rows.map(_.getAs[Long]("in_deg"))
    assert(degs.sorted.sameElements(degs), "histogram ordered by in-degree")
  }

  test("j113: the emitted selection IS the greedy MMR path (full recompute)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      r6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    val e0 = emb(0L)
    val short = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, e0)) }
      .sortBy { case (id, rel) => (-rel, id) }.take(20)
    val sims = (for {
      (a, _) <- short; (b, _) <- short if a != b
    } yield (a, b) -> cos(emb(a), emb(b))).toMap
    var selected = Vector.empty[(Long, Long, Double, Double)] // step,id,rel,score
    for (step <- 1 to 5) {
      val cand = short.filterNot(c => selected.exists(_._2 == c._1))
      val scored = cand.map { case (id, rel) =>
        val score =
          if (step == 1) r6(0.7 * rel)
          else r6(0.7 * rel - 0.3 *
            selected.map(s => sims((id, s._2))).max)
        (id, rel, score)
      }
      val pick = scored.minBy { case (id, _, sc) => (-sc, id) }
      selected :+= ((step.toLong, pick._1, pick._2, pick._3))
    }
    val got = SparkEntry.queries("j113_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("rel"), r.getAs[Double]("mmr_score"))).toVector
    assert(got == selected, s"greedy path diverged:\n got=$got\nwant=$selected")
    // MMR scores are non-increasing FROM STEP 2 ON: each candidate's
    // penalized score only decays as the selected set grows and the
    // argmax ranges over a shrinking subset. Step 1→2 is exempt — a
    // negative sim to the first pick can legitimately RAISE a step-2
    // score above 0.7·rel1 (r18-s3 review)
    val scores = got.map(_._4).drop(1)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(got.map(_._2).distinct.length == 5)
  }

  test("j115: the sample IS the k smallest exponential clocks (recompute)") {
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 16777216L
    }
    val want = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .filter(_.getAs[Long]("n_chars") > 0)
      .map { r =>
        val (id, w) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"))
        val u = r6x(bucket(id).toDouble.+(1) / 16777217.0, 9)
        (id, w, u, r6x(-math.log(u) / w, 9))
      }
      .sortBy { case (id, _, _, pri) => (pri, id) }.take(20)
      .zipWithIndex
      .map { case ((id, w, u, pri), i) => (i + 1L, id, w, u, pri) }
      .toVector
    val got = SparkEntry.queries("j115_weighted_sample_es")(spark, sf)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("w"), r.getAs[Double]("u"), r.getAs[Double]("pri")))
      .toVector
    assert(got == want, s"clock race diverged:\n got=$got\nwant=$want")
  }

  private def r6x(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
}
