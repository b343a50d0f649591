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
