package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class DecimalStatsBuf(n: Long, sum: BigDecimal, sumSq: BigDecimal)
case class DecimalStats(n: Long, sum: BigDecimal, mean: Double, stddev: Double)

/** Typed `Aggregator` computing exact decimal moments (count, sum,
  * sum-of-squares) in one pass — the SURVEY.md §2.1.J "typed UDAF"
  * surface. BigDecimal accumulation is exact and order-independent, so
  * merges across partitions are associative/commutative by construction:
  * the same guarantee the declared `agg_stats_decimal` gets from
  * DecimalType columns, here available to Dataset[T] pipelines as
  * `ds.select(DecimalStatsAggregator.toColumn)`.
  *
  * Mean/stddev are derived from the exact moments at the end (one
  * double computation per group, not per row), matching the §2.0 rule-1
  * discipline.
  */
object DecimalStatsAggregator
    extends Aggregator[Double, DecimalStatsBuf, DecimalStats] {

  private val S = 12 // accumulation scale; inputs are 2-dp business values

  override def zero: DecimalStatsBuf =
    DecimalStatsBuf(0L, BigDecimal(0).setScale(S), BigDecimal(0).setScale(S))

  override def reduce(b: DecimalStatsBuf, x: Double): DecimalStatsBuf = {
    val d = BigDecimal(x).setScale(S, BigDecimal.RoundingMode.HALF_UP)
    DecimalStatsBuf(b.n + 1, b.sum + d, b.sumSq + d * d)
  }

  override def merge(a: DecimalStatsBuf, b: DecimalStatsBuf): DecimalStatsBuf =
    DecimalStatsBuf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)

  override def finish(b: DecimalStatsBuf): DecimalStats = {
    if (b.n == 0) DecimalStats(0L, BigDecimal(0), Double.NaN, Double.NaN)
    else {
      val mean = (b.sum / b.n).toDouble
      // (n·sumSq − sum²) / (n·(n−1)) evaluated in BigDecimal: the naive
      // sumSq − sum²/n form in double cancels catastrophically for large
      // near-constant data and can go slightly negative → NaN stddev.
      // The exact numerator is ≥ 0 mathematically; clamp only against the
      // final toDouble rounding.
      val variance =
        if (b.n < 2) 0.0
        else math.max(
          ((b.sumSq * b.n - b.sum * b.sum) /
            (BigDecimal(b.n) * (b.n - 1))).toDouble,
          0.0)
      DecimalStats(b.n, b.sum, mean, math.sqrt(variance))
    }
  }

  override def bufferEncoder: Encoder[DecimalStatsBuf] = Encoders.product[DecimalStatsBuf]
  override def outputEncoder: Encoder[DecimalStats] = Encoders.product[DecimalStats]
}
