package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Mergeable Misra-Gries heavy-hitter sketch as a typed `Aggregator` —
  * the candidate-generation half of the two-pass heavy-hitters operator
  * (`TextOps.qt15_heavy_hitters`).
  *
  * Guarantee (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): with `capacity` counters, after any
  * sequence of reduces and merges over N items, every item's sketch
  * count underestimates its true count by at most N/(capacity+1) — so
  * every item with true frequency > N/(capacity+1) has a positive
  * counter and IS in the candidate set. The shrink step (subtract the
  * (capacity+1)-th largest counter from all, drop non-positives) is
  * exactly the merge rule from the mergeable-summaries paper; per-item
  * reduce is the classic decrement expressed as a merge with a
  * singleton.
  *
  * Scale shape: the buffer is a bounded map (≤ `capacity` entries), so
  * the partial/final aggregation shuffles a constant-sized sketch per
  * partition instead of the full token-frequency table — the point at
  * 100 TB, where the distinct-token space (n-grams, URLs, hashes) can
  * be billions of keys and a full groupBy is a corpus-sized shuffle.
  * Candidate counts are NOT exact (lower bounds); qt15's second pass
  * recounts the ≤`capacity` survivors exactly, so the sketch never
  * appears in the reported numbers — only in which keys get recounted,
  * where the MG bound makes the candidate set provably complete above
  * the threshold.
  *
  * Determinism note: which BELOW-threshold candidates survive depends
  * on partitioning/merge order, but the final operator output does not
  * — the exact recount keeps only keys above a threshold that the MG
  * bound guarantees are all present regardless of order.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(capacity > 0, "MisraGries capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    shrink(b.updated(tok, b.getOrElse(tok, 0L) + 1L))

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    shrink(small.foldLeft(large) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    })
  }

  /** Keep ≤ capacity entries: subtract the (capacity+1)-th largest
    * count from every counter and drop the non-positive remainder. */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      val cut = m.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse).apply(capacity)
      m.collect { case (k, v) if v > cut => k -> (v - cut) }
    }

  /** The candidate keys, sorted for a stable column value. */
  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

object MisraGries {
  /** Untyped column form for DataFrame use: `mgUdaf(cap)(col)`. */
  def udafFor(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGries(capacity), Encoders.STRING)
}
