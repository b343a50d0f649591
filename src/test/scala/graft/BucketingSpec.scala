package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.batch.Bucketing

/** Bucketed tables must co-locate equi-joins: the shuffle happens once
  * at write time, and the join plans with ZERO exchanges. */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  private val sf = "/root/testdata/sf0.001"

  test("bucketed lineitem ⋈ orders: sort-merge join with zero exchanges") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a real big⋈big plan — broadcast would trivially avoid shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
        "bkt_lineitem", "l_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
        "bkt_orders", "o_orderkey", 4)

      val joined = spark.table("bkt_lineitem")
        .join(spark.table("bkt_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))

      val plan = joined.queryExecution.executedPlan
      assert(collectWithSubqueries(plan) { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected sort-merge join, got:\n$plan")
      val exchanges = collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed join must not shuffle, found ${exchanges.size} exchange(s):\n$plan")

      // and the result is the same as the unbucketed computation
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
    }
  }
}
