package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming time-series pattern matching — the stateful twin of batch
  * `Relational.qst4_pattern_match`: slide a length-`P` window over each
  * key's value series as events arrive and emit every window whose
  * squared Euclidean distance to the query pattern is ≤ a threshold.
  *
  * State per key is the last `P-1` values (a few longs — bounded, no
  * watermark needed), so 10M live keys is still trivial state; matches
  * stream out incrementally instead of re-scanning history, which is
  * the point at a 1 Hz × fleet-sized ingest. Events must arrive
  * key-ordered within a micro-batch for window semantics to equal the
  * batch analog (sorted inside the group iterator below, so only
  * cross-batch disorder — bounded by the source's ordering guarantee —
  * can differ).
  */
object PatternMatch {

  /** One scored window ending at event time `us`. */
  case class Match(key: Long, us: Long, dist: Long)

  /** (key, us, iv) input; emits matches with dist ≤ `maxDist`. */
  def matches(in: Dataset[(Long, Long, Long)], pattern: Seq[Long],
              maxDist: Long): Dataset[Match] = {
    val s = in.sparkSession
    import s.implicits._
    val p = pattern.toArray
    in.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long)], st: GroupState[Seq[Long]]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          var buf = st.getOption.getOrElse(Seq.empty)
          val out = sorted.flatMap { case (_, us, iv) =>
            buf = (buf :+ iv).takeRight(p.length)
            if (buf.length == p.length) {
              var d = 0L
              var i = 0
              while (i < p.length) { val x = buf(i) - p(i); d += x * x; i += 1 }
              if (d <= maxDist) Some(Match(key, us, d)) else None
            } else None
          }
          st.update(buf.takeRight(p.length - 1))
          out.iterator
      }
  }
}
