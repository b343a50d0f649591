package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.batch.PointerJump

/** The shared pointer-doubling engine: rank resolves a depth-D chain
  * in ceil(log2 D)+1 driver rounds (the whole point — the naive
  * recursion schedules D), hops are exact, cycles fail loudly, and
  * q37's rewrite is hash-identical to the row_number contract the
  * oracle pins. */
class PointerJumpSpec extends SparkSpec {
  import spark.implicits._

  private def log2ceil(d: Long): Int =
    (math.log(d.toDouble) / math.log(2.0)).ceil.toInt

  test("rank: depth-299 chain resolves in <= log2(depth)+1 rounds, hops exact") {
    val n = 300L
    val state = spark.range(n).select(
      lit(1).as("g"), col("id"),
      when(col("id") === 0, lit(null).cast("long"))
        .otherwise(col("id") - 1).as("ptr"),
      when(col("id") === 0, 0L).otherwise(1L).as("dist"))
    val (out, rounds) = PointerJump.rank(state, Seq("g"), "id", "ptr", "dist")
    assert(rounds <= log2ceil(n - 1) + 1, s"rounds=$rounds for depth ${n - 1}")
    val got = out.select(col("id"), col("dist")).as[(Long, Long)].collect().toMap
    (0L until n).foreach(i => assert(got(i) == i, s"node $i dist"))
    assert(out.filter(col("ptr").isNotNull).isEmpty, "all pointers resolved")
  }

  test("rank: a cycle fails loudly instead of spinning") {
    // 0 -> 1 -> 0: the non-null pointer set never drains
    val state = Seq((1, 0L, Some(1L), 1L), (1, 1L, Some(0L), 1L))
      .toDF("g", "id", "ptr", "dist")
    val e = intercept[IllegalArgumentException] {
      PointerJump.rank(state, Seq("g"), "id", "ptr", "dist", maxRounds = 8)
    }
    assert(e.getMessage.contains("converge"))
  }

  test("q37 rewrite: hash-identical to the row_number contract; rounds bounded") {
    val d = "/root/testdata/sf0.01"
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val base = Tables.orders(spark, d)
      .filter(pmod(col("o_custkey"), lit(50)) === 0)
      .select(col("o_custkey"), col("o_orderkey"))
    val expect = base.withColumn("hop", row_number().over(w))
      .select(col("o_custkey").as("custkey"), col("o_orderkey"), col("hop"))
      .as[(Long, Long, Int)].collect().sorted.toSeq
    val got = SparkEntry.queries("q37_recursive_chain")(spark, d)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(got == expect, "q37 must equal the oracle's row_number contract")

    // the round bound holds on the REAL chain state (depth = longest
    // per-customer chain), not just the synthetic one
    val depth = base.groupBy("o_custkey").count()
      .agg(max("count")).head.getLong(0)
    val state = base
      .withColumn("ptr", lag(col("o_orderkey"), 1).over(w))
      .withColumn("dist", when(col("ptr").isNull, 0L).otherwise(1L))
    val (_, rounds) = PointerJump.rank(state, Seq("o_custkey"),
      "o_orderkey", "ptr", "dist")
    assert(rounds <= log2ceil(depth - 1) + 1,
      s"rounds=$rounds for max chain depth ${depth - 1}")
  }
}
