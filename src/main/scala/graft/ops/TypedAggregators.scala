package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed `Aggregator` UDAFs — the Dataset-API face of §2.9's UDAF surface
 * (the geometry union aggregate covers the untyped `TypedImperativeAggregate`
 * side): case-class buffers with product encoders, registered through
 * `functions.udaf`, fully map-side combinable (`reduce` is the partial,
 * `merge` the combiner — exactly Spark's two-phase hash aggregation).
 */
object TypedAggregators {

  /** Exact running moments of an integer column. All-integer buffer, so
    * the result is engine-portable with no float anywhere; variance etc.
    * derive downstream as rationals from (n, Σx, Σx²). */
  final case class Moments(n: Long, sum: Long, sumSq: Long)

  /** Σ over longs of (1, x, x²) — associative + commutative, the
    * textbook mergeable aggregate. Null inputs are skipped by Spark's
    * typed-aggregator input encoder contract upstream (filter first).
    * CONTRACT: |x| must stay ≤ ~3·10⁹ and group sizes within ~10⁵ of
    * that scale so x² and Σx² fit a long — quantized/centi values, not
    * raw magnitudes (the q56 rational-OLS bound, same reasoning). */
  object ExactMoments extends Aggregator[Long, Moments, Moments] {
    override def zero: Moments = Moments(0L, 0L, 0L)
    override def reduce(b: Moments, x: Long): Moments =
      Moments(b.n + 1, b.sum + x, b.sumSq + x * x)
    override def merge(a: Moments, b: Moments): Moments =
      Moments(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)
    override def finish(b: Moments): Moments = b
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }
}
