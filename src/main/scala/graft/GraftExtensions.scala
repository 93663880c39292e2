package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CosineSimilarity, TdTimeRange}

/** Session-extension packaging: ship the engine's SQL functions to every
  * session cluster-wide via `spark.sql.extensions=graft.GraftExtensions`
  * (no per-session registration code), or call
  * `GraftExtensions.registerAll(spark)` on an existing session.
  *
  * Registered surface:
  *   - the whole TD UDF tier (functions/Td.scala, 12 names: td_time_range
  *     … td_url_decode) — parse-time expansions into pushable native
  *     expressions
  *   - `cosine_similarity(a, b)` — native codegen'd float-vector cosine
  *     (see expressions/CosineSimilarity.scala)
  *   - `char_ngrams(text, n)` — custom Generator UDTF (LATERAL VIEW)
  *   - the whole Presto dialect (functions/Presto.scala, ~50 names:
  *     approx_distinct … normalize) — TD's query language resolves
  *     verbatim in any session built with the extension
  *   - the as-of join's planner strategy + `PruneAsOfJoin` optimizer rule,
  *     so `AsOf.join` plans work in any session built with the extension
  *     (AsOf.join also self-registers via `experimental` for ad-hoc use)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the whole TD UDF tier (functions/Td.scala builders: td_time_range,
    // td_time_string, td_time_format, td_time_parse, td_time_add,
    // td_date_trunc, td_scheduled_time, td_interval, td_first, td_last,
    // td_md5, td_url_decode, td_sessionize_window, td_approx_most_frequent,
    // td_parse_agent) — same session-free builders readTdQuery registers
    // at runtime
    graft.functions.Td.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[TdTimeRange].getName, name),
        builder))
    }
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[graft.expressions.CharNGrams].getName, "char_ngrams"),
      (exprs: Seq[Expression]) => graft.expressions.CharNGrams(exprs.head, exprs(1))))
    // the whole Presto dialect (functions/Presto.scala): same session-free
    // builders readTdQuery registers at runtime, here shipped at session
    // build — a cluster sets spark.sql.extensions and every session
    // resolves TD's Presto SQL verbatim with zero per-session code
    graft.functions.Presto.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Presto", name),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsOfJoin)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PruneIntervalJoin)
  }
}

object GraftExtensions {
  /** Register the same functions on an already-built session. */
  def registerAll(spark: SparkSession): Unit = {
    functions.Td.register(spark)
    expressions.CosineSimilarity.register(spark)
    expressions.CharNGrams.register(spark)
    functions.HeavyHitters.register(spark)
    functions.Presto.register(spark)
  }
}
