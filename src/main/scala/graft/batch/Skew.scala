package graft.batch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot join keys.
  *
  * AQE's skew-join split handles most runtime skew; `saltedJoin` is the
  * explicit variant for *known* hot keys (e.g. one station producing
  * 100× the events): the left (large, skewed) side gets a random salt
  * in [0, factor), the right side is replicated across all salts, and
  * the join key becomes (key, salt) — spreading each hot key over
  * `factor` reducers.
  */
object Skew {

  /** Inner equi-join `left ⋈ right` on `key`, salted `factor` ways.
    * `right` must be the smaller side (it is replicated × factor). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, factor: Int): DataFrame = {
    val salted = left.withColumn("__salt", (rand(42) * factor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
