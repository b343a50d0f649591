package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark 4's `InjectRuntimeFilter`):
  * when the creation side of a shuffle join carries a selective filter,
  * Catalyst builds a bloom filter over its join keys and applies it as
  * a `might_contain` predicate on the application side BEFORE the
  * shuffle — at 100 TB that drops most of the fact-side shuffle volume
  * for selective dim filters that are NOT broadcastable (the
  * broadcast-join case is covered by DPP in LakeSpec instead).
  *
  * The production thresholds (10 GB application-side scan) are sized
  * for clusters; the spec lowers them to fixture scale to pin that the
  * rewrite fires and preserves results.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("selective dim filter injects a bloom filter on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // forbid broadcast so the join actually shuffles (the case bloom
      // filters exist for; broadcast joins prune via DPP instead)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_totalprice"))
      val l = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"))
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(lit(1).as("one")).agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom filter in the optimized plan:\n$optimized")

      // rewrite is semantics-preserving
      val n = joined.collect().head.getAs[Long]("n")
      val expected = Tables.lineitem(spark, sf).join(
          Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n === expected)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
