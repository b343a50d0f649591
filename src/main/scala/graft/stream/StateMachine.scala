package graft.stream

import java.sql.Timestamp
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model._

/** The per-(station, parte) production state machine — the reference's
  * `plc_processor` loop (Prensas.py:616-831) re-expressed as a
  * `flatMapGroupsWithState` function emitting typed [[ActionRow]]s.
  *
  * Semantics preserved (SURVEY ST2-ST5):
  *  - admission: unseen key resolves a prior record (resume with
  *    corrida_previa when status 8, Prensas.py:722-724) or creates one
  *    (status 3, Prensas.py:315-331); unknown parts go to the
  *    parts-not-found sink (Prensas.py:343-353)
  *  - counter-delta gate: `cnt > prev or (shift_changed and cnt >= prev)`
  *    (Prensas.py:756); qty = (cnt − base + corrida) × multiplier
  *    (Prensas.py:787-792)
  *  - shift rollover: snapshot contador_ct, open a record for the new
  *    shift, carry corrida (Prensas.py:757-785)
  *  - silence: ProcessingTimeTimeout closes the run 7→8 once and clears
  *    state (limpieza_ejecutada edge-trigger, Prensas.py:663-685)
  *
  * Departures from the reference (SURVEY §7.5, deliberate):
  *  - record ids are deterministic keys `station|parte|date|shift`
  *    (no SQL-Server OUTPUT clause; distributed-safe)
  *  - the per-part AS400/records lookups become pre-resolved broadcast
  *    maps instead of per-key round trips
  *  - event time comes from the observation's own timestamp, never the
  *    wall clock — the whole machine is deterministic and testable.
  */
class StateMachine(
    knownParts: Map[(String, String), Long],        // (station, parte) → part id
    multipliers: Map[String, Long],                 // parte → AS400 multiplier (default 1)
    priorRecords: Map[String, RecordSnapshot],      // recordId → snapshot (W1 lookup)
    timeoutMs: Long = 30000L  // ≤0 → NoTimeout (ST4 close disabled; drain-and-stop runs)
    ) extends Serializable {

  import StateMachine._

  def multiplierOf(parte: String): Long = multipliers.getOrElse(parte, 1L)

  /** The flatMapGroupsWithState function. */
  def process(key: (String, String), rows: Iterator[PartObservation],
      state: GroupState[ActiveRecord]): Iterator[ActionRow] = {
    val (station, parte) = key

    if (!state.exists && !rows.hasNext && state.hasTimedOut) return Iterator.empty
    if (state.hasTimedOut) {
      // ST4: silence → close the run once (status 7→8) + clear state
      val ar = state.get
      state.remove()
      return Iterator.single(ActionRow.closeShift(station, parte, ar.recordId,
        ar.planDate, ar.shiftId, Timestamp.valueOf(s"${ar.planDate} 00:00:00"))
        .copy(produced = ar.produced, plannedQty = ar.plannedQty))
    }

    val out = Vector.newBuilder[ActionRow]
    val sorted = combine(rows.toVector)

    for (obs <- sorted) {
      val (shiftId, planDate) = shiftAndDate(obs.ts)
      val sec = secondsOfDay(obs.ts)

      if (!state.exists) {
        admit(station, parte, obs, shiftId, planDate, out) match {
          case Some(ar) => state.update(ar)
          case None     => // unknown part: no state
        }
      } else {
        var ar = state.get
        val changed = shiftChanged(ar.lastSec, sec) || ar.planDate != planDate || ar.shiftId != shiftId
        if (changed) {
          // ST5: rollover — snapshot counter, open record for new shift
          val rid = recordId(station, parte, planDate, shiftId)
          out += ActionRow.create(station, parte, rid, planDate, shiftId, ar.plannedQty, obs.ts)
          ar = ar.copy(recordId = rid, planDate = planDate, shiftId = shiftId,
            contadorCt = ar.lastCount, baseCount = ar.lastCount,
            corridaPrevia = ar.produced)
        }
        // P8 gate (Prensas.py:756)
        if (obs.contador > ar.lastCount || (changed && obs.contador >= ar.lastCount)) {
          val qty = (obs.contador - ar.baseCount + ar.corridaPrevia) * ar.multiplier
          out += ActionRow.appendHistory(station, parte, ar.recordId,
            (obs.contador - ar.lastCount) * ar.multiplier, obs.tiempo, obs.ts)
          out += ActionRow.updateQty(station, parte, ar.recordId, qty, StatusProducing, obs.ts)
            .copy(planDate = ar.planDate, shiftId = ar.shiftId, plannedQty = ar.plannedQty)
          ar = ar.copy(produced = qty)
        }
        state.update(ar.copy(lastCount = obs.contador, lastSec = sec))
      }
    }
    if (timeoutMs > 0 && state.exists) state.setTimeoutDuration(timeoutMs)
    out.result().iterator
  }

  /** ST3 admission for an unseen key. */
  private def admit(station: String, parte: String, obs: PartObservation,
      shiftId: Int, planDate: String,
      out: collection.mutable.Builder[ActionRow, Vector[ActionRow]]): Option[ActiveRecord] = {
    if (!knownParts.contains((station, parte))) {
      // K4: unknown part number → dedup-append CSV sink (Prensas.py:343-353)
      out += ActionRow.partNotFound(station, parte, obs.original, planDate, obs.ts)
      return None
    }
    val rid = recordId(station, parte, planDate, shiftId)
    val mult = multiplierOf(parte)
    priorRecords.get(rid) match {
      case Some(snap) if snap.statusId == StatusPaused =>
        // resume: corrida_previa = produced, counter base = current
        // (Prensas.py:722-724)
        Some(ActiveRecord(rid, planDate, shiftId, baseCount = obs.contador,
          corridaPrevia = snap.produced, contadorCt = obs.contador, multiplier = mult,
          plannedQty = snap.plannedQty, lastCount = obs.contador,
          lastSec = secondsOfDay(obs.ts), produced = snap.produced))
      case Some(snap) =>
        Some(ActiveRecord(rid, planDate, shiftId, baseCount = obs.contador,
          corridaPrevia = 0L, contadorCt = obs.contador, multiplier = mult,
          plannedQty = snap.plannedQty, lastCount = obs.contador,
          lastSec = secondsOfDay(obs.ts), produced = snap.produced))
      case None =>
        out += ActionRow.create(station, parte, rid, planDate, shiftId, DefaultPlannedQty, obs.ts)
        Some(ActiveRecord(rid, planDate, shiftId, baseCount = obs.contador,
          corridaPrevia = 0L, contadorCt = obs.contador, multiplier = mult,
          plannedQty = DefaultPlannedQty, lastCount = obs.contador,
          lastSec = secondsOfDay(obs.ts), produced = 0L))
    }
  }

  /** Wire the machine onto a typed observation stream. */
  def apply(obs: Dataset[PartObservation]): Dataset[ActionRow] = {
    import obs.sparkSession.implicits._
    val conf = if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    obs.groupByKey(o => (o.station, o.parte))
      .flatMapGroupsWithState[ActiveRecord, ActionRow](OutputMode.Append, conf)(process)
  }
}

object StateMachine {

  /** Build a machine from dimension DataFrames — the J6/W1 lookups
    * (AS400 multipliers, part catalog, prior records) resolved ONCE as
    * small broadcast snapshots instead of the reference's per-part ODBC
    * round trips (Prensas.py:117-149, 281-313). These tables are tiny
    * relative to the stream (one row per part / record), so collecting
    * them to driver maps IS the broadcast; refresh on supervisor
    * reconcile when the config changes. Column contracts:
    * parts(station, parte, part_id), multipliers(parte, multiplier),
    * records(record_id, produced, status_id, planned). */
  def fromTables(parts: org.apache.spark.sql.DataFrame,
      multipliers: org.apache.spark.sql.DataFrame,
      records: org.apache.spark.sql.DataFrame,
      timeoutMs: Long = 30000L): StateMachine = {
    val known = parts.select("station", "parte", "part_id").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val mult = multipliers.select("parte", "multiplier").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val prior = records.select("record_id", "produced", "status_id", "planned").collect()
      .map(r => (r.getString(0),
        RecordSnapshot(r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))).toMap
    new StateMachine(known, mult, prior, timeoutMs)
  }

  val StatusCreated = 3   // Prensas.py:324
  val StatusProducing = 7 // Prensas.py:794
  val StatusPaused = 8    // Prensas.py:668,724
  val DefaultPlannedQty = 0L

  def recordId(station: String, parte: String, planDate: String, shiftId: Int): String =
    s"$station|$parte|$planDate|$shiftId"

  /** combinar_listas (A1, Prensas.py:399-440) folded into the state
    * function: same-part observations at the SAME tick (e.g. both LH
    * and RH sides) sum their counters; deterministic max tiempo / min
    * original replace the reference's order-dependent last/first.
    * Already-combined inputs (one row per ts) pass through unchanged. */
  def combine(rows: Vector[PartObservation]): Vector[PartObservation] =
    rows.groupBy(_.ts).toVector.sortBy(_._1.getTime).map { case (_, group) =>
      group.head.copy(
        contador = group.map(_.contador).sum,
        tiempo = group.map(_.tiempo).max,
        original = group.map(_.original).min)
    }

  def secondsOfDay(ts: Timestamp): Int = {
    val t = ts.toLocalDateTime
    t.getHour * 3600 + t.getMinute * 60 + t.getSecond
  }

  /** F7 (Prensas.py:653-659): shift 1 = 08:00-15:59 on today's date;
    * shift 2 otherwise, attributed to yesterday before 08:00. */
  def shiftAndDate(ts: Timestamp): (Int, String) = {
    val t = ts.toLocalDateTime
    val shift = if (t.getHour >= 8 && t.getHour < 16) 1 else 2
    val date = if (t.getHour >= 8) t.toLocalDate else t.toLocalDate.minusDays(1)
    (shift, date.toString)
  }

  /** F8 (Prensas.py:750-751). */
  def shiftChanged(prevSec: Int, curSec: Int): Boolean =
    (prevSec < 8 * 3600 && curSec >= 8 * 3600) ||
      (prevSec < 16 * 3600 && curSec >= 16 * 3600)
}
