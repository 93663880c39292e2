package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §5 scale notes; build brief:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handling (on by default) splits oversized shuffle
  * partitions at runtime; these helpers are the *plan-level* form for the
  * cases AQE can't fix — a skewed AGGREGATION key, and broadcast-averse
  * skewed joins — expressed so results are bit-identical to the unsalted
  * plan (asserted in SkewSpec).
  */
object Skew {

  /** Deterministic salt in [0, n): hashes the given column (pick one that
    * varies within the hot key, e.g. the row's id). Never `rand()` — a
    * nondeterministic salt breaks retry/speculative-execution semantics at
    * scale (a re-run task would re-salt differently). */
  def salt(of: Column, n: Int): Column = pmod(xxhash64(of), lit(n))

  /** Two-stage salted aggregation: stage 1 aggregates on (key, salt) —
    * spreading a hot key over `n` reducers — stage 2 merges the partials.
    * `partials` must be mergeable (sum/count/min/max/...); pass the merge
    * step in `finals` over the stage-1 column names. */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      saltSource: Column,
      n: Int,
      partials: Seq[Column],
      finals: Seq[Column]): DataFrame =
    df.groupBy(key.as("__k"), salt(saltSource, n).as("__s"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("__k"))
      .agg(finals.head, finals.tail: _*)

  /** Salted join for a skewed left (fact) side against a non-broadcastable
    * right side: the fact's hot keys spread over `n` sub-keys; the right
    * side is replicated n× via an explode — right must be the (much)
    * smaller side for the n× replication to be cheap. */
  def saltedJoin(
      fact: DataFrame,
      right: DataFrame,
      factKey: String,
      rightKey: String,
      saltSource: Column,
      n: Int): DataFrame = {
    val saltedFact = fact.withColumn("__s", salt(saltSource, n))
    val replicatedRight = right.withColumn("__s",
      explode(sequence(lit(0), lit(n - 1))))
    saltedFact.join(replicatedRight,
        saltedFact(factKey) === replicatedRight(rightKey)
          && saltedFact("__s") === replicatedRight("__s"))
      .drop("__s")
  }
}
