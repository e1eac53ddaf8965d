package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass pass/fail/zero census as a typed `Aggregator` — the user-facing
  * typed-API variant of [[Census.passFailZero]]'s `count(when)` composition
  * (SURVEY §2.11 noted it as the optional custom-aggregate candidate).
  *
  * Input rows are the per-child rollup (expected, actual, n_items); the
  * buffer is three longs, merged associatively — identical shuffle shape to
  * the untyped plan but with compile-time row typing for `Dataset` users.
  */
object CensusAggregator {

  /** (expected, actual, n_items) for one child entity. */
  final case class ChildRollup(expected: Double, actual: Double, nItems: Long)
  final case class Buckets(nPass: Long, nFail: Long, nZero: Long)

  def passFailZero(passRatio: Double): TypedColumn[ChildRollup, Buckets] =
    new Aggregator[ChildRollup, Buckets, Buckets] {
      override def zero: Buckets = Buckets(0, 0, 0)
      override def reduce(b: Buckets, r: ChildRollup): Buckets =
        if (r.nItems == 0) b.copy(nZero = b.nZero + 1)
        else if (r.actual >= r.expected * passRatio) b.copy(nPass = b.nPass + 1)
        else b.copy(nFail = b.nFail + 1)
      override def merge(a: Buckets, b: Buckets): Buckets =
        Buckets(a.nPass + b.nPass, a.nFail + b.nFail, a.nZero + b.nZero)
      override def finish(reduction: Buckets): Buckets = reduction
      override def bufferEncoder: Encoder[Buckets] = Encoders.product[Buckets]
      override def outputEncoder: Encoder[Buckets] = Encoders.product[Buckets]
    }.toColumn
}
