package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.batch.Quality

/** Quality.observed must count rows and nulls in the SAME pass as the
  * consuming action — batch via Observation.get, streaming via
  * observedMetrics on the progress. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("batch observation: row count and null counts ride along") {
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), null), (None, null))
      .toDF("v", "s")
    val obs = Observation("q")
    val observed = Quality.observed(df, obs, "v", "s")
    assert(observed.count() === 4)
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("n_null_v") === 2L)
    assert(m("n_null_s") === 2L)
  }

  test("streaming observation: per-batch metrics in query progress") {
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val observed = Quality.observed(
      in.toDF().toDF("v", "s").withColumn("s", when($"s" === "x", null).otherwise($"s")),
      "ingest_quality", "s")
    val q = observed.writeStream.format("noop").start()
    try {
      in.addData((1L, "x"), (2L, "y"), (3L, "x"))
      q.processAllAvailable()
      val metrics = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("ingest_quality"))).lastOption
      assert(metrics.isDefined, "no observed metrics in progress")
      assert(metrics.get.getAs[Long]("n_rows") === 3L)
      assert(metrics.get.getAs[Long]("n_null_s") === 2L)
    } finally q.stop()
  }
}
