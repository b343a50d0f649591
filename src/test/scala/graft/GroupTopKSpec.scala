package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{GroupTopK, GroupTopKExec, PartialGroupTopKExec}

/** The native group-wise top-k operator: equivalence with the window
  * formulation, the partial/final plan split, and the map-side
  * reduction that is its reason to exist. */
class GroupTopKSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("randomized: native top-k == window formulation, 20 rounds") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 20) {
      val nKeys = 1 + rnd.nextInt(6)
      val k = 1 + rnd.nextInt(4)
      val rows = Seq.fill(50 + rnd.nextInt(150))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(1000))).zipWithIndex
        .map { case ((key, v), i) => (key, v, i.toLong) }
      val df = rows.toDF("key", "v", "id").repartition(4)

      val got = GroupTopK.topK(df, Seq("key"), Seq($"v".desc, $"id".asc), k)
        .select($"key", $"id", $"rank").as[(Long, Long, Int)].collect().toSet

      val w = Window.partitionBy("key").orderBy($"v".desc, $"id".asc)
      val want = df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
        .select($"key", $"id", $"rank").as[(Long, Long, Int)].collect().toSet

      assert(got === want, s"round $round (nKeys=$nKeys, k=$k)")
    }
  }

  test("plans as partial -> exchange -> final, no sort, reduced shuffle") {
    val df = spark.range(0, 10000).select(
      (col("id") % 8).as("key"), col("id").as("v"), col("id").as("id2"))
      .repartition(4)
    val topk = GroupTopK.topK(df, Seq("key"), Seq(col("v").desc, col("id2").asc), 5)
    topk.collect()
    val plan = topk.queryExecution.executedPlan
    val finals = collectWithSubqueries(plan) { case e: GroupTopKExec => e }
    val partials = collectWithSubqueries(plan) { case e: PartialGroupTopKExec => e }
    assert(finals.size === 1 && partials.size === 1)
    // the partial must sit BELOW the exchange the final's distribution forces
    val exchange = collectWithSubqueries(plan) { case e: ShuffleExchangeExec => e }
    assert(exchange.nonEmpty)
    assert(exchange.head.collectFirst { case p: PartialGroupTopKExec => p }.isDefined,
      s"partial not below the exchange:\n$plan")
    // no full sort anywhere (the window formulation would have one)
    val sorts = collectWithSubqueries(plan) { case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.isEmpty, s"native top-k must not sort:\n$sorts")
    // map-side reduction: <= k * keys * inputPartitions rows crossed the wire
    val crossed = partials.head.metrics("numOutputRows").value
    assert(crossed <= 5L * 8 * 4, s"partial emitted $crossed rows")
    assert(crossed < 10000, "partial must reduce the shuffle volume")
    assert(finals.head.metrics("numOutputRows").value === 5L * 8)
  }

  test("rank column collision is rejected") {
    val df = Seq((1L, 2L)).toDF("key", "rank")
    val e = intercept[IllegalArgumentException] {
      GroupTopK.topK(df, Seq("key"), Seq(col("rank").desc), 1)
    }
    assert(e.getMessage.contains("rank"))
  }

  test("null keys form one group; null order values sort per SortOrder") {
    val df = Seq[(Option[Long], Option[Long], Long)](
      (None, Some(5L), 1L), (None, Some(9L), 2L), (None, None, 3L),
      (Some(1L), Some(2L), 4L)).toDF("key", "v", "id")
    val out = GroupTopK.topK(df, Seq("key"), Seq($"v".desc, $"id".asc), 2)
      .select($"id", $"rank").as[(Long, Int)].collect().toSet
    // null-key group: v desc ranks 9 (id=2) first, then 5 (id=1);
    // the null-v row (id=3) sorts last under DESC (nulls last) and is cut
    assert(out === Set((2L, 1), (1L, 2), (4L, 1)))
  }
}
