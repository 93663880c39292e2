package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The embeddings-side sibling of NgramGuardSpec's short-doc sweep
  * (which caught a real ANSI divide-by-zero in j115): production
  * embedding dumps carry ZERO vectors (failed encoder calls, padded
  * rows), EXACT duplicates (content dedup upstream missed), lone
  * labels, and shards far smaller than a probe set. Under Spark 4's
  * default ANSI mode a cosine denominator of 0 is a thrown
  * SparkArithmeticException, not a quiet NULL — so every
  * embeddings-reading registry key must build and execute over a
  * corpus dominated by those degeneracies without throwing. */
class EmbeddingGuardSpec extends AnyFunSuite {
  lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark

  test("every embeddings-reading registry key survives a degenerate corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zeroemb").toString
    for (tbl <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents")) {
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(dir, s"$tbl.parquet"),
        java.nio.file.Paths.get(TestSpark.sf, s"$tbl.parquet"))
    }
    // 12 vectors (FEWER than the 20-probe eval sweep), 64-dim:
    //  - id 3 all-zero (cosine denominator 0 against anything)
    //  - ids 5 and 6 bit-identical (rank ties, zero distance)
    //  - id 7 the only label-9 vector (n_rel = 0 for eval keys)
    //  - id 11 a second zero vector so zero×zero pairs exist too
    val df = spark.range(12).toDF("vec_id")
      .select(col("vec_id"),
        expr("""transform(sequence(0, 63), i ->
            CASE WHEN vec_id IN (3, 11) THEN cast(0.0 as float)
                 WHEN vec_id = 6 THEN
                   cast((pmod(hash(5, i), 1000) - 500) / 500.0 as float)
                 ELSE cast((pmod(hash(vec_id, i), 1000) - 500) / 500.0 as float)
            END)""").as("embedding"),
        when(col("vec_id") === 7, 9)
          .otherwise(pmod(col("vec_id"), lit(3))).cast("int").as("label"))
    df.coalesce(1).write.parquet(s"$dir/embeddings.parquet")

    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var executed = 0
    SparkEntry.registry.foreach { q =>
      try {
        val built = q.fn(spark, dir)
        val readsEmb = built.queryExecution.analyzed.collectLeaves().exists {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.exists(_.toString.contains("zeroemb")) &&
                  fs.location.rootPaths.exists(_.toString.contains("embeddings"))
              case _ => false
            }
          case _ => false
        }
        if (readsEmb) { built.collect(); executed += 1 }
      } catch {
        case e: Throwable =>
          failures += s"${q.key}: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}"
      }
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    assert(failures.isEmpty,
      s"\ndegenerate embeddings broke:\n  ${failures.mkString("\n  ")}")
    assert(executed >= 25, s"only $executed embeddings-reading keys executed")
  }
}
