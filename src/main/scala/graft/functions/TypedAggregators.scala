package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoders

/** Typed `Aggregator` surface — the user-defined aggregation path the
  * reference lacks entirely (SURVEY.md §2.5 "UDF/UDAF: absent"). A typed
  * Aggregator is the scale-correct way to extend aggregation: it gets
  * map-side partial aggregation (reduce) and a commutative merge, so
  * state flows through the same two-level shuffle as built-in aggregates
  * — unlike a collect-then-fold, which would centralize data.
  *
  * The buffer is tiny and fixed-size (two doubles + a long), so at 100 TB
  * the shuffle carries one 24-byte record per (group × partition).
  */
object TypedAggregators {

  /** (min, max, n) of a double column in one pass. All three are
    * order-insensitive, so results are bit-identical across engines —
    * oracle-checkable, unlike naive floating sums. */
  final case class Span(min: Double, max: Double, n: Long)

  object SpanAgg extends Aggregator[Double, Span, Span] {
    override def zero: Span = Span(Double.PositiveInfinity, Double.NegativeInfinity, 0L)
    override def reduce(b: Span, x: Double): Span =
      Span(math.min(b.min, x), math.max(b.max, x), b.n + 1)
    override def merge(a: Span, b: Span): Span =
      Span(math.min(a.min, b.min), math.max(a.max, b.max), a.n + b.n)
    override def finish(r: Span): Span = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Span] = Encoders.product[Span]
    override def outputEncoder: org.apache.spark.sql.Encoder[Span] = Encoders.product[Span]
  }
}
