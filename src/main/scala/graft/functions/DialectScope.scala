package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Statement-scoped installation of a FUNCTION DIALECT on a session: the
  * dialect's names resolve for the duration of `scoped`'s body (where the
  * submitted text is eagerly analyzed), then whatever each name resolved
  * to BEFORE the first enter is restored — a user override, a permanently
  * installed dialect (GraftExtensions), or nothing (name dropped).
  *
  * One instance per dialect (Presto, Hive/TD), each with its own
  * per-session refcount, so the two dialects nest independently on one
  * session: a Hive-scoped TD_TIME_RANGE inside a Presto-scoped statement
  * restores in LIFO order without either clobbering the other's snapshot.
  *
  * Mechanics (hoisted verbatim from the round-14 Presto implementation so
  * both dialects inherit its hardening):
  *   - the snapshot covers EVERY dialect name, not just builtin-shadowing
  *     ones — an additive name can carry a user's own temp override,
  *     which is prior state to restore too;
  *   - the snapshot publishes only AFTER `install` succeeds; a throw
  *     mid-install rolls the registry back and leaves the scope
  *     unentered, so the next enter cannot snapshot a half-dialected
  *     registry as "prior" and leak shadows permanently;
  *   - re-entrancy is refcounted per session (concurrent statements on
  *     one session nest; shadows drop only when the LAST exits);
  *   - sessions are held weakly so a closed session's scope is
  *     collectable.
  */
private[graft] final class DialectScope(
    names: () => Seq[String],
    install: SparkSession => Unit) {

  private final class Scope {
    var depth = 0
    var saved: Seq[(FunctionIdentifier,
      Option[(ExpressionInfo, Seq[Expression] => Expression)])] = Nil
  }

  private val scopes = new java.util.WeakHashMap[SparkSession, Scope]()

  private def scopeOf(spark: SparkSession): Scope = scopes.synchronized {
    var sc = scopes.get(spark)
    if (sc == null) { sc = new Scope; scopes.put(spark, sc) }
    sc
  }

  def scoped[T](spark: SparkSession)(body: => T): T = {
    val scope = scopeOf(spark)
    scope.synchronized {
      if (scope.depth == 0) {
        val reg = spark.sessionState.functionRegistry
        val snapshot = names().map { n =>
          val id = FunctionIdentifier(n)
          id -> (for (info <- reg.lookupFunction(id);
                      b <- reg.lookupFunctionBuilder(id)) yield (info, b))
        }
        try install(spark)
        catch {
          case t: Throwable =>
            snapshot.foreach {
              case (id, Some((info, b))) => reg.registerFunction(id, info, b)
              case (id, None)            => reg.dropFunction(id)
            }
            throw t
        }
        scope.saved = snapshot
      }
      scope.depth += 1
    }
    try body
    finally scope.synchronized {
      scope.depth -= 1
      if (scope.depth == 0) {
        val reg = spark.sessionState.functionRegistry
        scope.saved.foreach {
          case (id, Some((info, b))) => reg.registerFunction(id, info, b)
          case (id, None)            => reg.dropFunction(id)
        }
        scope.saved = Nil
      }
    }
  }
}
