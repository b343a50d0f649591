package graft

import org.apache.spark.sql.functions._

/** The HLL sketch STORE behaviors behind q41_hll_union: parquet
  * persistence of sketch blobs, incremental append of a new day, and
  * grouping-independence of the union — the properties that let a
  * 100 TB pipeline answer distinct-count rollups without re-scanning
  * raw data. */
class HllSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def daily = Tables.events(spark, sf)
    .select(to_date(col("ts")).as("day"), col("user_id"))
    .groupBy(col("day"))
    .agg(expr("hll_sketch_agg(user_id)").as("sk"))

  test("sketches survive parquet persistence; union estimate tracks exact") {
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    daily.write.mode("overwrite").parquet(dir)
    val est = spark.read.parquet(dir)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().head.getLong(0)
    val exact = Tables.events(spark, sf)
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.05,
      s"persisted-union estimate $est vs exact $exact")
  }

  test("incremental append: stored days + new day ≡ from-scratch union") {
    val days = daily.select(col("day")).orderBy(col("day")).collect().map(_.getDate(0))
    assert(days.length >= 2, "fixture must span multiple days")
    val last = days.last
    val stored = daily.filter(col("day") < lit(last))
    val fresh = daily.filter(col("day") === lit(last))
    // the store never re-reads old raw data: the new day's sketch is
    // unioned into the accumulated blobs
    val incremental = stored.select(col("sk")).union(fresh.select(col("sk")))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).collect().head.getLong(0)
    val scratch = Tables.events(spark, sf)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))")).collect().head.getLong(0)
    assert(incremental === scratch,
      "sketch union must be exactly the from-scratch sketch of the same set")
  }

  test("union is grouping-independent: day→week→total ≡ day→total") {
    val viaWeeks = daily
      .groupBy(date_trunc("week", col("day")).as("week"))
      .agg(expr("hll_union_agg(sk)").as("wsk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(wsk))")).collect().head.getLong(0)
    val direct = daily
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).collect().head.getLong(0)
    assert(viaWeeks === direct)
  }
}
