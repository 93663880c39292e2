package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 verdict item 6: the 74 SURVEY-contract keys were correctness-
  * pinned but only sampled for plan shape. This sweep makes the headline
  * plan property per family a mechanical gate — PlanContract holds the
  * key → property map (main source, so PlanLint can report coverage);
  * this spec (a) pins that the asserted key set IS exactly the contract
  * set and (b) runs every check. */
class ContractPlanSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("PlanContract covers exactly the 74 SURVEY contract keys") {
    val expected = (
      (1 to 10).map(i => s"a$i") ++ (1 to 4).map(i => s"b$i") ++
      (1 to 10).map(i => s"c$i") ++ (1 to 11).map(i => s"d$i") ++
      (1 to 7).map(i => s"e$i") ++ (1 to 2).map(i => s"f$i") ++
      (1 to 4).map(i => s"g$i") ++ (1 to 10).map(i => s"h$i") ++
      (1 to 6).map(i => s"i$i") ++ (1 to 7).map(i => s"j$i") ++
      (1 to 3).map(i => s"k$i")).toSet
    val asserted = PlanContract.contractKeys
      .map(k => k.takeWhile(_ != '_')).toSet
    assert(asserted == expected,
      s"missing=${(expected -- asserted).toSeq.sorted} " +
        s"extra=${(asserted -- expected).toSeq.sorted}")
    assert(PlanContract.contractKeys.size == 74)
    val unknown = PlanContract.contractKeys
      .filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"contract keys not in registry: $unknown")
  }

  test("every contract key's headline plan property holds") {
    val failures = PlanContract.evaluate(spark, TestSpark.sf)
    assert(failures.isEmpty, failures.map { case (k, cs) =>
      s"$k -> ${cs.mkString(",")}" }.mkString("\n"))
  }
}
