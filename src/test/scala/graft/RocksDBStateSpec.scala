package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model._
import graft.stream.{Sinks, StateMachine}

/** The streaming state machine on the RocksDB state store provider —
  * the 100 TB configuration, where per-station state exceeds executor
  * heap: RocksDB keeps it off-heap + on-disk with changelog
  * checkpointing, while semantics must stay identical to the default
  * HDFS-backed store.
  */
class RocksDBStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("state machine semantics are provider-independent (RocksDB)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val outDir = Files.createTempDirectory("graft_rocks_out").toString
      val ckpt = Files.createTempDirectory("graft_rocks_ckpt").toString
      val station = "PRENSA9"
      val machine = new StateMachine(
        knownParts = Map((station, "AAA") -> 1L),
        multipliers = Map("AAA" -> 2L),
        priorRecords = Map.empty,
        timeoutMs = 0)

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[PartObservation]
      input.addData(
        PartObservation(station, "AAA", "AAA", 10, 1.5, ts("2024-03-05 09:00:00")))
      val q1 = Sinks.startPipeline(input.toDS(), machine, outDir, ckpt,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      assert(q1.awaitTermination(120000), "first drain timed out")
      // the provider choice is pinned into the running query, not silent:
      // RocksDB-specific custom metrics must appear on the state operator
      val metrics = q1.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
        s"expected rocksdb state metrics, got ${metrics.keySet}")

      // counter increase across a checkpoint restart, same as the golden
      input.addData(
        PartObservation(station, "AAA", "AAA", 14, 1.6, ts("2024-03-05 09:00:05")))
      val q2 = Sinks.startPipeline(input.toDS(), machine, outDir, ckpt,
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      assert(q2.awaitTermination(120000), "second drain timed out")

      val records = spark.read.parquet(s"$outDir/production_records")
      val rid = StateMachine.recordId(station, "AAA", "2024-03-05", 1)
      val rec = records.filter(col("record_id") === rid).collect()
      assert(rec.length == 1)
      assert(rec.head.getAs[Long]("produced") == 28L)
      assert(rec.head.getAs[Int]("status_id") == StateMachine.StatusProducing)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
