package graft.batch

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass data-quality observation (`Dataset.observe`): the
  * metrics ride along with whatever action consumes the frame — no
  * second scan of 100 TB just to count nulls. For streaming queries the
  * same observation surfaces per-batch in
  * `StreamingQueryProgress.observedMetrics`.
  *
  * The reference logs counts imperatively as it processes
  * (Prensas.py print/logging sites); this is the declarative,
  * engine-integrated equivalent.
  */
object Quality {
  private def metricCols(cols: Seq[String]): Seq[Column] =
    count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))

  /** Attach standard quality counters (row count + per-column null
    * counts) to `df` under the given [[Observation]]; read
    * `obs.get` after any action on the returned frame. */
  def observed(df: DataFrame, obs: Observation, cols: String*): DataFrame = {
    val m = metricCols(cols)
    df.observe(obs, m.head, m.tail: _*)
  }

  /** Streaming variant: named observation, surfaced per micro-batch in
    * `StreamingQueryProgress.observedMetrics(name)`. */
  def observed(df: DataFrame, name: String, cols: String*): DataFrame = {
    val m = metricCols(cols)
    df.observe(name, m.head, m.tail: _*)
  }
}
