package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** §2.11 UDAF surface: a typed `Aggregator` re-implementing the
  * reference's qty × multiplier accumulation (Prensas.py:787-792) as a
  * distributed partial/final aggregate.
  *
  * Accumulates in exact centi-units (long) so results are
  * order-independent — the same decimal-exactness policy as the rest of
  * the oracle-checked queries.
  */
case class QtyW(q: Double, w: Long)

object WeightedSum extends Aggregator[QtyW, Long, Double] {
  override def zero: Long = 0L
  override def reduce(b: Long, a: QtyW): Long = b + math.round(a.q * 100) * a.w
  override def merge(b1: Long, b2: Long): Long = b1 + b2
  override def finish(b: Long): Double = b.toDouble / 100.0
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
