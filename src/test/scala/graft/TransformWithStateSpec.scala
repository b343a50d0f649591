package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.model._
import graft.stream.StateMachine

/** The state machine on Spark 4's `transformWithState` must emit
  * exactly what the flatMapGroupsWithState host emits for the same
  * load — the Core transition is shared; this pins the two API
  * adapters (ValueState + explicit timers vs GroupState + timeout
  * conf) to each other. Runs on RocksDB, which transformWithState
  * requires and which is the 100 TB state configuration anyway. */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  private val station = "PRENSA1"
  private def ts(s: String) = Timestamp.valueOf(s)

  private val observations = Seq(
    PartObservation(station, "AAA", "AAA", 10, 1.5, ts("2024-03-05 15:59:00")),
    PartObservation(station, "AAA", "AAA", 15, 1.5, ts("2024-03-05 15:59:30")),
    // shift rollover inside the gate
    PartObservation(station, "AAA", "AAA", 18, 1.6, ts("2024-03-05 16:00:10")),
    PartObservation(station, "BBB", "BBB", 3, 0.9, ts("2024-03-05 09:00:02")),
    PartObservation(station, "ZZZ", "Z/ZZ", 1, 0.5, ts("2024-03-05 09:00:00")))

  private def dims = {
    val parts = Seq((station, "AAA", 1L), (station, "BBB", 2L))
      .toDF("station", "parte", "part_id")
    val mults = Seq(("AAA", 2L)).toDF("parte", "multiplier")
    val records = Seq.empty[(String, Long, Int, Long)]
      .toDF("record_id", "produced", "status_id", "planned")
    (parts, mults, records)
  }

  private def drain(name: String,
      wire: org.apache.spark.sql.Dataset[PartObservation] =>
        org.apache.spark.sql.Dataset[ActionRow]): Seq[ActionRow] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PartObservation]
    input.addData(observations: _*)
    val q = wire(input.toDS()).writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), s"$name drain timed out")
    spark.table(name).as[ActionRow].collect().toSeq
  }

  test("transformWithState emits the same actions as flatMapGroupsWithState") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val (parts, mults, records) = dims
      val key = (a: ActionRow) =>
        (a.action, a.parte, a.recordId, a.ts.getTime, a.quantity, a.produced)
      val viaTws = drain("tws_actions",
        ds => StateMachine.withDimTablesTws(ds, parts, mults, records, timeoutMs = 0))
        .sortBy(key)
      val viaFmgws = drain("fmgws_actions",
        ds => StateMachine.withDimTables(ds, parts, mults, records, timeoutMs = 0))
        .sortBy(key)
      assert(viaTws.nonEmpty, "transformWithState emitted nothing")
      assert(viaTws == viaFmgws,
        s"APIs diverged:\ntws:   ${viaTws.mkString("\n  ")}\nfmgws: ${viaFmgws.mkString("\n  ")}")
      // the rollover really happened: a create for shift 2 of 2024-03-05
      val rid2 = StateMachine.recordId(station, "AAA", "2024-03-05", 2)
      assert(viaTws.exists(a => a.action == ActionRow.Create && a.recordId == rid2))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
