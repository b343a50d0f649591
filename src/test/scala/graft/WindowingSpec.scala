package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.PartObservation
import graft.stream.LatestValues

/** ST7 streaming surface: event-time windows with watermarks,
  * session windows, and the K7 latest-value view — all on real
  * streaming queries (the reference is processing-time only; these are
  * the event-time upgrades SURVEY ST7 calls for).
  */
class WindowingSpec extends SparkSpec {
  import spark.implicits._

  private def obs(parte: String, t: String, cnt: Long) =
    PartObservation("P1", parte, parte, cnt, 1.0, Timestamp.valueOf(t))

  test("watermarked tumbling window aggregation (append mode)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[PartObservation]
    val agg = in.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"parte")
      .agg(sum($"contador").as("total"))
      .select($"window.start".as("ws"), $"parte", $"total")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("tumbling").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(obs("A", "2024-03-05 09:01:00", 5), obs("A", "2024-03-05 09:03:00", 7))
      q.processAllAvailable()
      // advance watermark past the first window: 09:00-09:05 closes
      in.addData(obs("A", "2024-03-05 09:20:00", 1))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select($"ws".cast("string"), $"total").as[(String, Long)].collect().toSet
      assert(rows.contains(("2024-03-05 09:00:00", 12L)), s"got $rows")
    } finally q.stop()
  }

  test("session windows with 5-minute gap") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[PartObservation]
    val agg = in.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "5 minutes"), $"parte")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".cast("string").as("ss"), $"parte", $"n")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("sessions").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // two bursts separated by > 5 min → two sessions
      in.addData(obs("A", "2024-03-05 09:00:00", 1), obs("A", "2024-03-05 09:02:00", 1),
        obs("A", "2024-03-05 09:30:00", 1))
      q.processAllAvailable()
      in.addData(obs("A", "2024-03-05 10:00:00", 1)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sessions").as[(String, String, Long)].collect().toSet
      assert(rows.contains(("2024-03-05 09:00:00", "A", 2L)), s"got $rows")
      assert(rows.contains(("2024-03-05 09:30:00", "A", 1L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming dropDuplicates with watermark (K4/A6 analog)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[PartObservation]
    val dedup = in.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("station", "parte", "ts")
    val q = dedup.writeStream.outputMode("append").format("memory")
      .queryName("dedup_t").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(obs("A", "2024-03-05 09:00:00", 1), obs("A", "2024-03-05 09:00:00", 1),
        obs("B", "2024-03-05 09:00:00", 2))
      q.processAllAvailable()
      in.addData(obs("A", "2024-03-05 09:00:00", 1)) // dup across batches
      q.processAllAvailable()
      assert(spark.table("dedup_t").count() == 2)
    } finally q.stop()
  }

  test("stream-stream interval join: purchase joined to clicks within 10 min") {
    // two independent watermarked streams joined on key + event-time
    // range — the Structured Streaming as-of analog (state is bounded
    // by the watermark + interval, so it runs forever at scale)
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    def ts(s: String) = Timestamp.valueOf(s)
    val c = clicks.toDF().toDF("c_user", "c_ts").withWatermark("c_ts", "1 minute")
    val b = buys.toDF().toDF("b_user", "b_ts").withWatermark("b_ts", "1 minute")
    val joined = b.join(c,
      expr("b_user = c_user AND c_ts BETWEEN b_ts - INTERVAL 10 MINUTES AND b_ts"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin").trigger(Trigger.ProcessingTime(0)).start()
    try {
      clicks.addData((1L, ts("2024-03-05 09:00:00")), (1L, ts("2024-03-05 09:04:00")),
        (2L, ts("2024-03-05 08:40:00")))
      buys.addData((1L, ts("2024-03-05 09:05:00")), (2L, ts("2024-03-05 09:00:00")))
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select($"b_user", $"c_ts".cast("string")).as[(Long, String)].collect().toSet
      // user 1: both clicks are within [08:55, 09:05]; user 2's click
      // at 08:40 is outside the 10-minute window of its 09:00 purchase
      assert(rows == Set(
        (1L, "2024-03-05 09:00:00"), (1L, "2024-03-05 09:04:00")), s"got $rows")
    } finally q.stop()
  }

  test("K7 latest-value view tracks newest observation per key") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[PartObservation]
    val q = LatestValues.start(in.toDS(), "latest_t")
    try {
      in.addData(obs("A", "2024-03-05 09:00:00", 5), obs("A", "2024-03-05 09:00:02", 9),
        obs("B", "2024-03-05 09:00:01", 3))
      q.processAllAvailable()
      val rows = spark.table("latest_t")
        .select($"parte", $"contador").as[(String, Long)].collect().toSet
      assert(rows == Set(("A", 9L), ("B", 3L)))
      in.addData(obs("A", "2024-03-05 09:00:05", 11))
      q.processAllAvailable()
      val rows2 = spark.table("latest_t")
        .select($"parte", $"contador").as[(String, Long)].collect().toSet
      assert(rows2 == Set(("A", 11L), ("B", 3L)))
    } finally q.stop()
  }
}
