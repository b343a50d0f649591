package graft

import java.sql.Timestamp

import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, TestGroupState}

import graft.model._
import graft.stream.StateMachine

/** Scenario tests for the production state machine (FIXTURES.md §A6;
  * behaviors from Prensas.py:663-685, 703-815). Uses TestGroupState for
  * the unit scenarios and MemoryStream for the end-to-end streaming
  * test (StreamingSpec).
  */
class StateMachineSpec extends SparkSpec {

  private val station = "PRENSA1"
  private val parte = "ABC123"
  private def ts(s: String) = Timestamp.valueOf(s)
  private def obs(t: String, cnt: Long, tiempo: Double = 1.5) =
    PartObservation(station, parte, parte, cnt, tiempo, ts(t))

  private def machine(
      known: Map[(String, String), Long] = Map((station, parte) -> 1L),
      mult: Map[String, Long] = Map.empty,
      prior: Map[String, RecordSnapshot] = Map.empty) =
    new StateMachine(known, mult, prior)

  private def freshState = TestGroupState.create[ActiveRecord](
    org.apache.spark.api.java.Optional.empty[ActiveRecord](), GroupStateTimeout.ProcessingTimeTimeout,
    1000L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)

  test("scenario 1: monotone counter → create then one update per increase") {
    val m = machine()
    val st = freshState
    val day = Seq(obs("2024-03-05 09:00:00", 10), obs("2024-03-05 09:00:01", 12),
      obs("2024-03-05 09:00:02", 12), obs("2024-03-05 09:00:03", 15))
    val out = m.process((station, parte), day.iterator, st).toVector

    val rid = StateMachine.recordId(station, parte, "2024-03-05", 1)
    assert(out.count(_.action == ActionRow.Create) == 1)
    val updates = out.filter(_.action == ActionRow.Update)
    // base_ct = 0 until rollover: produced := raw counter (Prensas.py:788)
    assert(updates.map(_.produced) == Vector(10L, 12L, 15L))
    assert(updates.forall(_.recordId == rid))
    val hist = out.filter(_.action == ActionRow.History)
    assert(hist.map(_.quantity) == Vector(10L, 12L, 15L)) // raw counters (Prensas.py:802)
    assert(st.get.contadorRegistro == 15 && st.get.produced == 15)
  }

  test("multiplier scales quantities (AS400 J6, default 1 when absent)") {
    val m = machine(mult = Map(parte -> 4L))
    val st = freshState
    val out = m.process((station, parte),
      Seq(obs("2024-03-05 09:00:00", 10), obs("2024-03-05 09:00:05", 13)).iterator, st).toVector
    assert(out.filter(_.action == ActionRow.Update).map(_.produced) == Vector(40L, 52L))
  }

  test("scenario 2: shift boundary crossing 16:00 → new record, corrida carried") {
    val m = machine()
    val st = freshState
    // shift 1: counter reaches 15 → produced 15
    m.process((station, parte),
      Seq(obs("2024-03-05 15:59:00", 10), obs("2024-03-05 15:59:30", 15)).iterator, st)
      .toVector
    // crossing 16:00: rollover + counter keeps rising
    val out2 = m.process((station, parte),
      Seq(obs("2024-03-05 16:00:10", 18)).iterator, st).toVector
    val ridShift2 = StateMachine.recordId(station, parte, "2024-03-05", 2)
    val creates = out2.filter(_.action == ActionRow.Create)
    assert(creates.map(_.recordId) == Vector(ridShift2))
    // base_ct snapshots prev (15); corrida only from a PAUSED new-shift
    // record (none here) → qty = 18 - 15 + 0 = 3 (Prensas.py:762,783)
    assert(out2.filter(_.action == ActionRow.Update).map(_.produced) == Vector(3L))
    assert(st.get.baseCt == 15 && st.get.corridaPrevia == 0)
  }

  test("scenario 3: silence timeout → one-shot close 7→8 + state cleared") {
    val m = machine()
    val st = freshState
    m.process((station, parte), Seq(obs("2024-03-05 09:00:00", 10)).iterator, st).toVector
    assert(st.exists)
    val timedOut = TestGroupState.create[ActiveRecord](
      org.apache.spark.api.java.Optional.of(st.get), GroupStateTimeout.ProcessingTimeTimeout,
      2000L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = true)
    val out = m.process((station, parte), Iterator.empty, timedOut).toVector
    assert(out.map(_.action) == Vector(ActionRow.Close))
    assert(out.head.statusId == StateMachine.StatusPaused)
    assert(out.head.produced == 10L) // close keeps produced (K5 flips status only)
    // stamped AFTER the last update so the newest-wins upsert applies it
    assert(out.head.ts.getTime > ts("2024-03-05 09:00:00").getTime)
    assert(!timedOut.exists) // edge-trigger: state cleared, fires once
  }

  test("scenario 4: resume on status-8 record → corrida_previa = produced") {
    val rid = StateMachine.recordId(station, parte, "2024-03-05", 1)
    val m = machine(prior = Map(rid ->
      RecordSnapshot(rid, produced = 40L, statusId = StateMachine.StatusPaused, plannedQty = 100L)))
    val st = freshState
    val out = m.process((station, parte),
      Seq(obs("2024-03-05 09:00:00", 10), obs("2024-03-05 09:00:05", 12)).iterator, st).toVector
    // no create (record exists); gate baseline restarts at 0 and the
    // paused produced becomes corrida: qty = cnt + 40 (Prensas.py:723-731)
    assert(out.count(_.action == ActionRow.Create) == 0)
    assert(out.filter(_.action == ActionRow.Update).map(_.produced) == Vector(50L, 52L))
    assert(st.get.plannedQty == 100L)
  }

  test("reconnect onto a producing record never regresses produced") {
    val rid = StateMachine.recordId(station, parte, "2024-03-05", 1)
    val m = machine(prior = Map(rid ->
      RecordSnapshot(rid, produced = 500L, statusId = StateMachine.StatusProducing,
        plannedQty = 0L)))
    val st = freshState
    val out = m.process((station, parte),
      Seq(obs("2024-03-05 09:00:00", 120)).iterator, st).toVector
    // gate baseline = prior produced 500; 120 < 500 → no update emitted
    assert(out.isEmpty)
    assert(st.get.produced == 500L)
  }

  test("scenario 5: unknown part → parts-not-found action, no state") {
    val m = machine(known = Map.empty)
    val st = freshState
    val out = m.process((station, parte),
      Seq(obs("2024-03-05 09:00:00", 10)).iterator, st).toVector
    assert(out.map(_.action) == Vector(ActionRow.NotFound))
    assert(out.head.fecha == "2024-03-05")
    assert(!st.exists)
  }

  test("counter reset without shift change is ignored (P8 gate)") {
    val m = machine()
    val st = freshState
    val out = m.process((station, parte),
      Seq(obs("2024-03-05 09:00:00", 10), obs("2024-03-05 09:00:05", 3)).iterator, st).toVector
    // the admission tick itself updates (10 > 0); the reset does not
    assert(out.count(_.action == ActionRow.Update) == 1)
    assert(st.get.contadorRegistro == 10) // prev frozen until counter recovers (Prensas.py:811)
  }

  test("night shift spans midnight on one record (F7 date attribution)") {
    val m = machine()
    val st = freshState
    m.process((station, parte), Seq(obs("2024-03-05 23:50:00", 10)).iterator, st).toVector
    val out = m.process((station, parte), Seq(obs("2024-03-06 00:10:00", 12)).iterator, st).toVector
    // same shift 2 of plan date 2024-03-05: no new record
    assert(out.count(_.action == ActionRow.Create) == 0)
    assert(st.get.planDate == "2024-03-05" && st.get.shiftId == 2)
  }
}
