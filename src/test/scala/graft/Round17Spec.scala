package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins.
  *
  * Session-state concurrency (r16 verdict item 6): the Spark-4 SQL
  * surface keys mutate session state — k19 DECLAREs a session variable,
  * k22 flips the scripting conf (in a child session) and registers temp
  * views. Their discipline is per-invocation unique names + finally-drops
  * (k22 additionally isolates its conf in `newSession()`), which is what
  * the dual-SF Verify regime relies on when two Verify drivers hit the
  * SAME shared SparkSession from different threads. This spec pins the
  * no-interference claim directly: run the state-mutating keys
  * concurrently against one session, several iterations per thread, and
  * require every interleaved result to equal the serial baseline.
  */
class Round17Spec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  private def rows(key: String): Seq[String] =
    SparkEntry.queries(key)(spark, TestSpark.sf)
      .collect().map(_.toString).toSeq

  test("k19 + k22 session-state keys are interference-free under concurrency") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global

    val keys = Seq("k19_session_vars", "k22_sql_script",
      "k20_execute_immediate")
    val baseline: Map[String, Seq[String]] =
      keys.map(k => k -> rows(k)).toMap

    // 2 threads per key × 3 iterations each, all in flight at once
    // against the SHARED session — the same shape as the driver's
    // dual-SF Verify regime.
    val futs = for {
      k <- keys; _ <- 1 to 2
    } yield Future((1 to 3).map { _ => k -> rows(k) })

    val outcomes = Await.result(Future.sequence(futs), 10.minutes).flatten
    outcomes.foreach { case (k, got) =>
      assert(got == baseline(k),
        s"$k produced a different result under concurrent session mutation")
    }
  }

  test("j79 stage-cache knob changes the plan, never the result") {
    val cached = rows("j79_data_recipe")
    spark.conf.set(ops.Knobs.RecipeStageCacheKey, "false")
    try {
      val lazyRows = rows("j79_data_recipe")
      assert(lazyRows == cached,
        "recipe output must be knob-invariant (KnobsSpec contract)")
    } finally spark.conf.unset(ops.Knobs.RecipeStageCacheKey)
  }
}
