package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.functions._

/** Manual runtime Bloom-filter join pruning (the DIY form of Spark's own
  * `InjectRuntimeFilter`, which builds a `BloomFilterAggregate` on the
  * creation side of a selective join and stitches a
  * `BloomFilterMightContain` onto the application side's scan).
  *
  * Spark's automatic rule only fires past size thresholds
  * (`spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`
  * defaults to 10 GB — exactly the 100 TB regime this engine targets, where
  * the filter prunes shuffle input BEFORE the join pays for it). At bench
  * SF those thresholds never trigger, so `c13_join_bloom` builds the filter
  * explicitly with the PUBLIC `df.stat.bloomFilter` (a distributed
  * treeAggregate — the driver only ever holds the fixed-size bitset, same
  * as the broadcast Spark's rule ships) and applies Spark's own codegen'd
  * `BloomFilterMightContain` expression, so the pruning predicate is the
  * identical physical machinery the automatic rule would deploy.
  *
  * Consistency contract: values are inserted AND probed as `xxhash64`
  * longs — the same convention `InjectRuntimeFilter` uses (it wraps both
  * sides in `XxHash64`). False positives are removed by the join that
  * follows; output is therefore exact and oracle-able.
  */
object Bloom {

  /** Distributed build: Bloom filter over `xxhash64(cols…)` of `df`.
    * `expected` sizes the bitset (n·ln(1/fpp)/ln²2 bits ≈ 7.3 KB per 10k
    * items at 3% fpp — broadcast-safe at any corpus size because it is
    * sized by the SELECTIVE side's cardinality, not the probe side's). */
  def build(df: DataFrame, expected: Long, fpp: Double, cols: Column*): Array[Byte] = {
    // stat.bloomFilter runs a BloomFilterAggregate, and like any aggregate
    // it yields NULL over ZERO rows — the deserializer then NPEs on the
    // null buffer. An empty build side means "nothing might be contained":
    // a fresh no-puts filter preserves exactly that semantics. Branch on
    // the caller-supplied cardinality (both call sites already pay that
    // count to SIZE the filter) rather than df.isEmpty, which would run
    // the build-side plan one extra time on every call.
    val bf =
      if (expected <= 0L)
        org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
      else df.stat.bloomFilter(xxhash64(cols: _*), expected, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Register `bloom_might_contain(filterBytes, value)` — Spark's native
    * codegen'd probe expression, reachable from `call_function`/SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs.head, exprs(1)),
      "built-in")

  /** Column-level probe: true iff `xxhash64(cols…)` might be in `bytes`. */
  def mightContain(spark: SparkSession, bytes: Array[Byte], cols: Column*): Column = {
    register(spark)
    call_function("bloom_might_contain", lit(bytes), xxhash64(cols: _*))
  }
}
