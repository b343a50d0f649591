package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.model._
import graft.stream.StateMachine

/** The stream-static-join lookup path ([[StateMachine.withDimTables]])
  * must emit exactly the actions the map-resolved path emits: same
  * admission, gate, rollover, multiplier, and prior-record semantics —
  * only the mechanism that delivers the dimension lookups differs
  * (Catalyst joins, nothing collected to the driver, vs in-memory
  * snapshot maps). */
class DimJoinStateSpec extends SparkSpec {
  import spark.implicits._

  private val station = "PRENSA1"
  private def ts(s: String) = Timestamp.valueOf(s)

  private val observations = Seq(
    // known part with multiplier and a paused prior record
    PartObservation(station, "AAA", "AAA", 10, 1.5, ts("2024-03-05 09:00:00")),
    PartObservation(station, "AAA", "AAA", 14, 1.6, ts("2024-03-05 09:00:05")),
    // known part, no prior record, default multiplier
    PartObservation(station, "BBB", "BBB", 3, 0.9, ts("2024-03-05 09:00:02")),
    // unknown part → parts-not-found
    PartObservation(station, "ZZZ", "Z/ZZ", 1, 0.5, ts("2024-03-05 09:00:00")))

  private val ridAAA = StateMachine.recordId(station, "AAA", "2024-03-05", 1)

  private val knownParts = Map((station, "AAA") -> 1L, (station, "BBB") -> 2L)
  private val multipliers = Map("AAA" -> 2L)
  private val priorRecords = Map(ridAAA ->
    RecordSnapshot(ridAAA, produced = 40L, statusId = StateMachine.StatusPaused,
      plannedQty = 100L))

  private def runJoinPath(): Seq[ActionRow] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PartObservation]
    input.addData(observations: _*)
    val parts = knownParts.toSeq.map { case ((st, p), id) => (st, p, id) }
      .toDF("station", "parte", "part_id")
    val mult = multipliers.toSeq.toDF("parte", "multiplier")
    val records = priorRecords.values.toSeq
      .map(r => (r.recordId, r.produced, r.statusId, r.plannedQty))
      .toDF("record_id", "produced", "status_id", "planned")
    val actions = StateMachine.withDimTables(input.toDS(), parts, mult, records,
      timeoutMs = 0)
    val q = actions.writeStream.format("memory").queryName("dimjoin_actions")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "drain timed out")
    spark.table("dimjoin_actions").as[ActionRow].collect().toSeq
  }

  private def runMapPath(): Seq[ActionRow] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PartObservation]
    input.addData(observations: _*)
    val machine = new StateMachine(knownParts, multipliers, priorRecords, timeoutMs = 0)
    val q = machine(input.toDS()).writeStream.format("memory").queryName("dimmap_actions")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "drain timed out")
    spark.table("dimmap_actions").as[ActionRow].collect().toSeq
  }

  test("join-resolved lookups emit the same actions as map-resolved") {
    val key = (a: ActionRow) =>
      (a.action, a.station, a.parte, a.recordId, a.ts.getTime, a.quantity, a.produced)
    val joined = runJoinPath().sortBy(key)
    val mapped = runMapPath().sortBy(key)
    assert(joined.nonEmpty, "join path emitted nothing")
    assert(joined == mapped,
      s"paths diverged:\njoin: ${joined.mkString("\n  ")}\nmap:  ${mapped.mkString("\n  ")}")
    // spot semantics: paused prior → corrida 40, gate base 0, mult 2:
    // produced = (14 - 0 + 40) * 2 = 108 on the last AAA update
    val lastAAA = joined.filter(a => a.parte == "AAA" && a.action == ActionRow.Update)
      .maxBy(_.ts.getTime)
    assert(lastAAA.produced == 108L, s"got $lastAAA")
    assert(joined.exists(a => a.action == ActionRow.NotFound && a.parte == "ZZZ"))
    // BBB had no prior record → a create was emitted
    assert(joined.exists(a => a.action == ActionRow.Create && a.parte == "BBB"))
  }
}
