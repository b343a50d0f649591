package graft

import org.apache.spark.sql.functions._

import graft.batch.Skew

/** saltedJoin matches a plain join and spreads hot keys over salts. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result == plain join result on skewed data") {
    // 90% of rows share one hot key
    val left = spark.range(10000)
      .select(when($"id" % 10 < 9, lit(1L)).otherwise($"id").as("k"), $"id".as("v"))
    val right = Seq((1L, "hot"), (42L, "cold"), (7777L, "x")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).groupBy("k", "name").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedJoin(left, right, "k", 8).groupBy("k", "name").agg(count(lit(1)).as("n"))
    val a = plain.orderBy("k").as[(Long, String, Long)].collect().toSeq
    val b = salted.orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
