package graft.stream

import java.sql.Timestamp
import java.time.ZoneOffset

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model._

/** The per-(station, parte) production state machine — the reference's
  * `plc_processor` loop (Prensas.py:616-831) re-expressed as a
  * `flatMapGroupsWithState` function emitting typed [[ActionRow]]s.
  *
  * Semantics mirrored from the reference (SURVEY ST2-ST5):
  *  - admission (Prensas.py:703-741): resolve the prior record for
  *    (station, date, shift, part) or create one (status 3); the gate
  *    baseline `contador_registro` starts at the record's produced
  *    quantity (zeroed on a paused record, whose produced becomes
  *    corrida_previa — Prensas.py:723-724); base_ct starts at 0, so
  *    produced := counter + corrida until the first shift change
  *    (Prensas.py:788-792)
  *  - counter gate (Prensas.py:756): `cnt > prev or (cambio and
  *    cnt >= prev)`; when the gate fails NOTHING updates — prev and
  *    hora_cambio only move on successful updates (Prensas.py:811-812)
  *  - shift rollover happens INSIDE the gate (Prensas.py:757-785):
  *    base_ct snapshots prev, the new shift's record is resolved or
  *    created, and corrida_previa comes from THAT record when paused,
  *    else 0 (Prensas.py:783)
  *  - history rows carry the RAW counter as quantity (Prensas.py:802)
  *  - silence: ProcessingTimeTimeout closes the run 7→8 once and clears
  *    state (limpieza edge-trigger, Prensas.py:663-685); the close is
  *    stamped after the last update so a newest-wins upsert applies it
  *
  * Departures from the reference (SURVEY §7.5, deliberate):
  *  - record ids are deterministic keys `station|parte|date|shift`
  *    (no SQL-Server OUTPUT clause; distributed-safe)
  *  - the per-part AS400/records lookups become pre-resolved broadcast
  *    maps instead of per-key round trips
  *  - cambio also fires when the observation's (planDate, shift)
  *    differs from the state's — equal to the reference's time-of-day
  *    predicate under continuous 1 Hz ticks, but correct across
  *    multi-day stream gaps where the reference silently reuses the
  *    old record
  *  - event time comes from the observation's own timestamp (UTC),
  *    never the wall clock — deterministic and testable.
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
      // ST4: silence → close the run once (status 7→8) + clear state.
      // Stamped after the last update so the newest-wins upsert applies
      // it (close rank also beats update at equal ts).
      val ar = state.get
      state.remove()
      return Iterator.single(ActionRow.closeShift(station, parte, ar.recordId,
        ar.planDate, ar.shiftId, new Timestamp(ar.lastTsMs + math.max(timeoutMs, 1L)))
        .copy(produced = ar.produced, plannedQty = ar.plannedQty))
    }

    val out = Vector.newBuilder[ActionRow]

    for (obs <- combine(rows.toVector)) {
      val (shiftId, planDate) = shiftAndDate(obs.ts)
      val sec = secondsOfDay(obs.ts)

      if (!state.exists) {
        admit(station, parte, obs, shiftId, planDate, out).foreach(state.update)
      }
      // the admission observation flows through the gate in the same
      // tick (the reference iterates `datos` twice, Prensas.py:703,744)
      if (state.exists) {
        var ar = state.get
        val cambio = shiftChanged(ar.lastUpdSec, sec) ||
          ar.planDate != planDate || ar.shiftId != shiftId
        val prev = ar.contadorRegistro
        // P8 gate (Prensas.py:756); on failure nothing moves
        if (obs.contador > prev || (cambio && obs.contador >= prev)) {
          if (cambio) {
            // ST5 rollover (Prensas.py:757-785): snapshot base, resolve
            // or create the NEW shift's record; corrida only from a
            // paused record of that new shift
            val rid = recordId(station, parte, planDate, shiftId)
            val (corrida, qPlan) = priorRecords.get(rid) match {
              case Some(snap) =>
                (if (snap.statusId == StatusPaused) snap.produced else 0L, snap.plannedQty)
              case None =>
                out += ActionRow.create(station, parte, rid, planDate, shiftId,
                  ar.plannedQty, obs.ts)
                (0L, ar.plannedQty)
            }
            ar = ar.copy(recordId = rid, planDate = planDate, shiftId = shiftId,
              baseCt = prev, corridaPrevia = corrida, plannedQty = qPlan)
          }
          val qty = (obs.contador - ar.baseCt + ar.corridaPrevia) * ar.multiplier
          // history carries the raw counter (Prensas.py:802)
          out += ActionRow.appendHistory(station, parte, ar.recordId,
            obs.contador, obs.tiempo, obs.ts)
          out += ActionRow.updateQty(station, parte, ar.recordId, qty, StatusProducing, obs.ts)
            .copy(planDate = ar.planDate, shiftId = ar.shiftId, plannedQty = ar.plannedQty)
          ar = ar.copy(contadorRegistro = obs.contador, lastUpdSec = sec,
            produced = qty, lastTsMs = obs.ts.getTime)
          state.update(ar)
        }
      }
    }
    if (timeoutMs > 0 && state.exists) state.setTimeoutDuration(timeoutMs)
    out.result().iterator
  }

  /** ST3 admission for an unseen key (Prensas.py:703-741). */
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
    val (qProd, status, qPlan) = priorRecords.get(rid) match {
      case Some(snap) => (snap.produced, snap.statusId, snap.plannedQty)
      case None =>
        out += ActionRow.create(station, parte, rid, planDate, shiftId,
          DefaultPlannedQty, obs.ts)
        (0L, StatusCreated, DefaultPlannedQty)
    }
    // paused record: its produced becomes corrida, the gate baseline
    // restarts at 0 (Prensas.py:723-724, 731)
    val corrida = if (status == StatusPaused) qProd else 0L
    val prevEff = if (status == StatusPaused) 0L else qProd
    Some(ActiveRecord(rid, planDate, shiftId,
      contadorRegistro = prevEff, baseCt = 0L, corridaPrevia = corrida,
      multiplier = mult, plannedQty = qPlan, lastUpdSec = secondsOfDay(obs.ts),
      produced = prevEff, lastTsMs = obs.ts.getTime))
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

  /** Seconds-of-day in UTC — explicitly NOT the executor JVM's default
    * timezone, so classification matches the batch-side shiftOf /
    * planDateOf under `spark.sql.session.timeZone=UTC`. */
  def secondsOfDay(ts: Timestamp): Int = {
    val t = ts.toInstant.atZone(ZoneOffset.UTC).toLocalDateTime
    t.getHour * 3600 + t.getMinute * 60 + t.getSecond
  }

  /** F7 (Prensas.py:653-659): shift 1 = 08:00-15:59 on today's date;
    * shift 2 otherwise, attributed to yesterday before 08:00. UTC. */
  def shiftAndDate(ts: Timestamp): (Int, String) = {
    val t = ts.toInstant.atZone(ZoneOffset.UTC).toLocalDateTime
    val shift = if (t.getHour >= 8 && t.getHour < 16) 1 else 2
    val date = if (t.getHour >= 8) t.toLocalDate else t.toLocalDate.minusDays(1)
    (shift, date.toString)
  }

  /** F8 (Prensas.py:750-751). */
  def shiftChanged(prevSec: Int, curSec: Int): Boolean =
    (prevSec < 8 * 3600 && curSec >= 8 * 3600) ||
      (prevSec < 16 * 3600 && curSec >= 16 * 3600)
}
