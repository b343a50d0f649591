package graft

import graft.batch.Relational

/** HLL++ sketches can't hash-match a different engine's sketch, so q27
  * oracle-checks the exact column plus the sketch's error-bound verdict;
  * this spec supplies the underlying exactness bound: the sketch must
  * land within its advertised relative error of the exact distinct
  * count it is computed alongside. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile tracks exact percentiles (the q30 scale path)") {
    // q30 computes exact per-group percentiles; at 100 TB the same
    // query swaps in the mergeable t-digest sketch — bound its error
    // here so the swap is a measured decision, not a hope
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val q = Tables.lineitem(spark, d).groupBy($"l_returnflag")
      .agg(
        percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("ap50"),
        percentile_approx($"l_quantity", lit(0.99), lit(1000)).as("ap99"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.99)").as("p99"),
        max($"l_quantity").as("hi"), min($"l_quantity").as("lo"))
      .collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val span = r.getDouble(5) - r.getDouble(6)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) <= 0.02 * span,
        s"p50 sketch drifted: $r")
      assert(math.abs(r.getDouble(2) - r.getDouble(4)) <= 0.02 * span,
        s"p99 sketch drifted: $r")
    }
  }

  test("approx_count_distinct within 5% of exact on both fixtures") {
    import org.apache.spark.sql.functions._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      // raw sketch-vs-exact bound (q27 only exports the verdict bit)
      val rows = Tables.lineitem(spark, sf).groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"))
        .select($"approx_parts", $"exact_parts").as[(Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (approx, exact) =>
        val relErr = math.abs(approx - exact).toDouble / exact
        assert(relErr <= 0.05, s"sketch off by ${relErr * 100}% ($approx vs $exact) at $sf")
      }
      // and the query's exported verdict agrees
      val verdicts = Relational.q27_approx_distinct(spark, sf)
        .select($"approx_within_5pct").as[Boolean].collect()
      assert(verdicts.nonEmpty && verdicts.forall(identity), s"q27 verdict false at $sf")
    }
  }
}
