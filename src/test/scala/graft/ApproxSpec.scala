package graft

import graft.batch.Relational

/** q27 is the one rows-only query (HLL++ sketches can't hash-match a
  * different engine's sketch); this spec supplies the missing exactness
  * bound: the sketch must land within its advertised relative error of
  * the exact distinct count it is computed alongside. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on both fixtures") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Relational.q27_approx_distinct(spark, sf)
        .select($"approx_parts", $"exact_parts").as[(Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (approx, exact) =>
        val relErr = math.abs(approx - exact).toDouble / exact
        assert(relErr <= 0.05, s"sketch off by ${relErr * 100}% ($approx vs $exact) at $sf")
      }
    }
  }
}
