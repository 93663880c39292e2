package graft.functions

import org.apache.spark.sql.SparkSession

/** TD-Hive-dialect passthrough for `readTdQuery` on a `hive:<db>` engine.
  *
  * The reference's second engine type hands query TEXT verbatim to TD's
  * hosted Hive (`pandas_td/td.py :: create_engine('hive:db')` — SURVEY.md
  * §0-caveated anchor). Unlike Presto, the Hive dialect needs almost no
  * shimming here: Spark SQL is HiveQL-derived, so the idioms a TD-Hive
  * notebook actually contains — `LATERAL VIEW explode/posexplode`,
  * `get_json_object`, `named_struct`, `str_to_map`, `parse_url`,
  * `DISTRIBUTE BY`/`SORT BY`, backtick identifiers, regex `split` — parse
  * and resolve natively with identical semantics. What Spark does NOT
  * ship are TD's own Hive UDFs (`TD_TIME_RANGE`, `TD_TIME_FORMAT`,
  * `TD_DATE_TRUNC`, `TD_FIRST`/`TD_LAST`, `TD_SESSIONIZE`, …): those are
  * [[Td.builders]], installed here STATEMENT-scoped through the same
  * [[DialectScope]] machinery as the Presto dialect — the dialect belongs
  * to the submitted text, not the session, and a user's own override of a
  * td_* name is prior state the scope hands back on exit.
  *
  * Equally important is what this path must NOT do: resolve the Presto
  * shims. Hive's `split` takes a REGEX (like Spark's, unlike Presto's
  * literal delimiter) and Hive's `regexp_extract` defaults to group 1
  * (unlike Presto's group 0), so Presto semantics under hive text would
  * silently flip both — the exact cross-contamination bug the statement
  * scoping exists to prevent, one dialect over. Two routes in:
  * `readTdQuery` dispatches on the engine type (hive text never enters
  * the Presto scope), AND this scope actively PINS the Spark-native
  * builtin for every Presto-shadowable name — a session that installed
  * the Presto dialect permanently (GraftExtensions) still reads hive
  * text with Hive semantics, and gets its resident dialect back on exit
  * (the snapshot covers the pinned names too).
  */
object Hive {

  /** Builtin names the Presto dialect shadows with different semantics —
    * computed against the builtin registry (not hand-listed), the same
    * device Presto uses, so a Spark upgrade that adds a colliding builtin
    * moves the name into the pinned set automatically. */
  private lazy val builtinPinned: Seq[String] =
    Presto.builders.map(_._1).filter { n =>
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n))
    }

  private def install(spark: SparkSession): Unit = {
    Td.register(spark)
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
    val reg = spark.sessionState.functionRegistry
    builtinPinned.foreach { n =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(n)
      for (info <- builtin.lookupFunction(id);
           b <- builtin.lookupFunctionBuilder(id))
        reg.registerFunction(id, info, b)
    }
  }

  private lazy val dialectScope =
    new DialectScope(() => Td.builders.map(_._1) ++ builtinPinned, install)

  /** Run `body` with the TD-Hive UDF tier resolving on `spark`, restoring
    * each td_* name's PRIOR resolution afterwards (refcounted, nestable —
    * see [[DialectScope]]). */
  def statementScoped[T](spark: SparkSession)(body: => T): T =
    dialectScope.scoped(spark)(body)

  /** `spark.sql` with the TD-Hive dialect statement-scoped. The text is
    * passed VERBATIM — no rewrite pass: HiveQL's call shapes all parse
    * under Spark's grammar (there is no `date_diff('day', …)`-style
    * grammar collision to shim, Hive has no such form). */
  def sql(spark: SparkSession, text: String): org.apache.spark.sql.DataFrame =
    statementScoped(spark) {
      spark.sql(text) // analysis (and so resolution) is eager
    }
}
