package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** k2 — the custom typed-UDAF surface (SURVEY.md §3.K): exact weighted mean
  * via `Aggregator[IN, BUF, OUT]` + `functions.udaf`.
  *
  * The buffer carries exact decimal partial sums (inputs snapped to scale 4,
  * products at scale 8), so partition merge order cannot perturb the result
  * — a distributed-determinism requirement the plain double-sum UDAF
  * would violate. `finish` mirrors the oracle's emission arithmetic
  * (round sums to 4 → exact double cast → divide → round 4).
  */
case class WBuf(sumPQ: BigDecimal, sumW: BigDecimal)

object WeightedMean extends Aggregator[(Double, Double), WBuf, Double] {
  private def d4(x: Double): BigDecimal =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)

  def zero: WBuf = WBuf(BigDecimal(0), BigDecimal(0))

  def reduce(b: WBuf, a: (Double, Double)): WBuf =
    WBuf(b.sumPQ + d4(a._1) * d4(a._2), b.sumW + d4(a._2))

  def merge(x: WBuf, y: WBuf): WBuf =
    WBuf(x.sumPQ + y.sumPQ, x.sumW + y.sumW)

  def finish(b: WBuf): Double = {
    if (b.sumW.signum == 0) return Double.NaN
    val num = b.sumPQ.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val den = b.sumW.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // same rounding as Spark's round(double, 4)
    BigDecimal(java.math.BigDecimal.valueOf(num / den))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
