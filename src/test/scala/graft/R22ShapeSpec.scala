package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Knobs

/** Pins the r22 physical-shape devices: each knob selects between two
  * spellings of one operator stage that MUST be bit-identical in results
  * (the optimization is purely physical — plan shape, shuffle bytes,
  * micro-batch count). Every test runs the touched key under both knob
  * settings on the shared fixture and asserts row-for-row equality, the
  * same contract SpreadSpec pins for Tables.spread.
  *
  *  - StreamFusedAddsKey:  i7/i8/i10/i21/i22/i23/i26 fused vs two-half adds
  *  - WPrefixInArrayKey:   j60b weighted prefix, in-array vs window
  *  - J51InArrayKey:       j51 rarest-7 prefix, in-array vs window
  *  - J51SlimCandKey:      j51 candidate dedup on ids vs carrying txts
  *  - PqAssignInArrayKey:  j53/j54 Lloyd assign, in-expression vs groupBy
  */
class R22ShapeSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def release(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Run `key` with the knob on and off; rows must match exactly (the
    * queries end in a canonical orderBy, so Seq equality is the strongest
    * available check). */
  private def pinEqual(key: String, knob: String): Unit = {
    def run(v: Boolean): Seq[String] =
      try {
        spark.conf.set(knob, v.toString)
        SparkEntry.queries(key)(spark, TestSpark.sf)
          .collect().map(_.toString).toSeq
      } finally { spark.conf.unset(knob); release() }
    val on = run(true)
    val off = run(false)
    assert(on.nonEmpty, s"$key produced no rows — equality check is vacuous")
    assert(on == off, s"$key diverged under $knob")
  }

  private val FusedKey = graft.streaming.Streams.StreamFusedAddsKey

  test("streaming fused adds: stream-stream joins are batching-invariant") {
    pinEqual("i8_stream_stream_join", FusedKey)
    pinEqual("i26_stream_full_outer_join", FusedKey)
  }

  test("streaming fused adds: keyed-state folds are batching-invariant") {
    pinEqual("i10_transform_with_state", FusedKey)
    pinEqual("i23_stream_map_state", FusedKey)
  }

  test("j60b weighted prefix: in-array == window") {
    pinEqual("j60b_dedup_weighted_prefix", Knobs.WPrefixInArrayKey)
  }

  test("j51 prefix and candidate shapes: slim == wide") {
    pinEqual("j51_dedup_editdist", Knobs.J51InArrayKey)
    pinEqual("j51_dedup_editdist", Knobs.J51SlimCandKey)
  }

  test("j53/j54 Lloyd assign: in-expression argmin == groupBy-min") {
    pinEqual("j53_pq_ann", Knobs.PqAssignInArrayKey)
    pinEqual("j54_ivfpq_ann", Knobs.PqAssignInArrayKey)
  }
}
