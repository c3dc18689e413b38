package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A8 — custom typed UDAF (SURVEY §2.4, §4.3): weighted mean with an
  * exact-decimal numerator so the result is independent of partial-
  * aggregation order (same determinism policy as [[graft.Det]]).
  *
  * Input: (value: Double, weight: Long). The numerator accumulates
  * value*weight rounded to DECIMAL(·,4) — matching the oracle spelling
  * `SUM(CAST(value*w AS DECIMAL(18,4)))` — and the output is
  * numerator.toDouble / weightSum, the same double division DuckDB
  * performs.
  */
object WeightedMean extends Aggregator[(Double, Long), (BigDecimal, Long), Double] {
  override def zero: (BigDecimal, Long) = (BigDecimal(0).setScale(4), 0L)

  override def reduce(b: (BigDecimal, Long), in: (Double, Long)): (BigDecimal, Long) = {
    val term = BigDecimal(in._1 * in._2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    (b._1 + term, b._2 + in._2)
  }

  override def merge(a: (BigDecimal, Long), b: (BigDecimal, Long)): (BigDecimal, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (BigDecimal, Long)): Double =
    if (r._2 == 0L) Double.NaN else r._1.toDouble / r._2

  override def bufferEncoder: Encoder[(BigDecimal, Long)] =
    Encoders.product[(BigDecimal, Long)]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
