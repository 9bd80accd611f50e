package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass numeric column profile as a typed UDAF (SURVEY.md §2.3
  * "UDAF" row): count / nulls / min / max / mean in one buffer, the
  * `Aggregator` path the profiler would take if the multi-expression
  * formulation (Profile.typeTallies) ever became the bottleneck.
  * Buffer is tiny and merge is associative+commutative, so partial
  * aggregation map-side combines exactly like built-in aggregates.
  */
object ProfileAggregator {

  case class NumProfile(n: Long, nulls: Long, min: Double, max: Double, sum: Double) {
    def result: NumProfileResult = NumProfileResult(
      n, nulls,
      if (n - nulls == 0) None else Some(min),
      if (n - nulls == 0) None else Some(max),
      if (n - nulls == 0) None else Some(sum / (n - nulls)))
  }

  case class NumProfileResult(n: Long, nulls: Long,
      min: Option[Double], max: Option[Double], mean: Option[Double])

  val empty: NumProfile =
    NumProfile(0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity, 0.0)

  /** Aggregator over a nullable numeric column. */
  val numeric: Aggregator[java.lang.Double, NumProfile, NumProfileResult] =
    new Aggregator[java.lang.Double, NumProfile, NumProfileResult] {
      def zero: NumProfile = empty
      def reduce(b: NumProfile, x: java.lang.Double): NumProfile =
        if (x == null) b.copy(n = b.n + 1, nulls = b.nulls + 1)
        else NumProfile(b.n + 1, b.nulls,
          math.min(b.min, x), math.max(b.max, x), b.sum + x)
      def merge(a: NumProfile, b: NumProfile): NumProfile =
        NumProfile(a.n + b.n, a.nulls + b.nulls,
          math.min(a.min, b.min), math.max(a.max, b.max), a.sum + b.sum)
      def finish(b: NumProfile): NumProfileResult = b.result
      def bufferEncoder: Encoder[NumProfile] = Encoders.product[NumProfile]
      def outputEncoder: Encoder[NumProfileResult] = Encoders.product[NumProfileResult]
    }
}
