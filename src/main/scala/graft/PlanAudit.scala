package graft

import org.apache.spark.sql.SparkSession

/** Prints `.explain("formatted")` for selected queries so the physical
  * plans can be audited for scale hazards: filter/projection pushdown
  * into the parquet scan, broadcast vs shuffle joins, whole-stage
  * codegen spans, exchange reuse.
  * `sbt "runMain graft.PlanAudit q3_join3 qd2_minhash_lsh"` (no args =
  * a default set).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_join3", "q4_semi", "q7_theta", "q8_asof",
        "q29_asof_native", "q12_window_frame", "qd2_minhash_lsh",
        "qs1_knn_bruteforce", "qst2_sessions")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (n <- names; fn <- SparkEntry.queries.get(n)) {
      println(s"\n=================== $n ===================")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
