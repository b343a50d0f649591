package graft

import java.sql.Timestamp

/** Typed data model for the streaming pipeline (schemas derived from
  * the reference's dataflow; see FIXTURES.md §A and SURVEY.md §1).
  */
object model {

  /** One tag-config row (work_centers ⋈ tags ⋈ tag_types,
    * Prensas.py:155-165). `address` holds the register address — or the
    * port / PLC-series for the magic tags "puerto" / "serie plc"
    * (Prensas.py:187-194). */
  case class TagConfig(
      workCenter: String, ip: String, tag: String, address: String, blockLen: Int)

  /** Flat per-(station, side) register layout derived from TagConfig —
    * the engine's fixed decode schema (SURVEY §1.3: one counter word,
    * one cycle-time word, one multi-word part block per side). */
  case class StationSideConfig(
      ip: String, station: String, side: String,
      counterAddr: String, tiempoAddr: Option[String], partAddrs: Seq[String])

  /** One register reading: the long/narrow streaming schema
    * (Prensas.py:505-516 snapshot, unpivoted). */
  case class RegisterReading(ip: String, ts: Timestamp, address: String, value: Int)

  /** One PLC batch-read snapshot: what a DSv2 PLC source emits per tick
    * (the `dict(zip(addresses, values))` at Prensas.py:512). Using the
    * pre-pivoted shape keeps the streaming decode fully narrow — no
    * streaming aggregation before the state machine. */
  case class RegisterSnapshot(ip: String, ts: Timestamp, regs: Map[String, Int])

  /** Decoded per-(station, part) observation after the E2 pipeline
    * (decode + alternative-flatten + group-sum, Prensas.py:399-440). */
  case class PartObservation(
      station: String, parte: String, original: String,
      contador: Long, tiempo: Double, ts: Timestamp)

  /** [[PartObservation]] with its dimension lookups pre-resolved — the
    * shape the state machine actually consumes. Carrying the lookups on
    * the row lets them arrive via stream-static joins (Catalyst picks
    * broadcast vs shuffled from dim size; nothing is collected to the
    * driver), while the map-backed test path fills the same fields from
    * in-memory snapshots. `rid` is the record id for the observation's
    * own (planDate, shiftId) — the only id admission or rollover can
    * ever need, since both fire on the current observation's shift. */
  case class ObsEnriched(
      station: String, parte: String, original: String,
      contador: Long, tiempo: Double, ts: Timestamp,
      shiftId: Int, planDate: String, rid: String,
      partKnown: Boolean, multiplier: Long,
      hasPrior: Boolean, priorProduced: Long, priorStatus: Int, priorPlanned: Long)

  /** Keyed mutable state per (station, parte)
    * (active_records, Prensas.py:730-739). */
  case class ActiveRecord(
      recordId: String,         // deterministic key (station|parte|date|shift)
      planDate: String,         // yyyy-MM-dd
      shiftId: Int,
      contadorRegistro: Long,   // gate baseline `prev` (Prensas.py:731,811)
      baseCt: Long,             // contador_ct snapshot, 0 until rollover (Prensas.py:734,762)
      corridaPrevia: Long,      // resumed production carried into this run
      multiplier: Long,
      plannedQty: Long,
      lastUpdSec: Int,          // hora_cambio: seconds-of-day of last UPDATE (Prensas.py:812)
      produced: Long,
      lastTsMs: Long)           // event time of last update (close stamping)

  /** Prior production-record snapshot used for state admission
    * (W1 top-1 lookup, Prensas.py:285-302). Status: 3=created,
    * 7=producing, 8=paused/closed (Prensas.py:324,794,668). */
  case class RecordSnapshot(recordId: String, produced: Long, statusId: Int, plannedQty: Long)

  /** Typed action emitted by the state machine; a foreachBatch sink
    * applies them transactionally (E3 "Spark shape"). Flattened (one
    * case class with an `action` tag) because Spark has no Encoder for
    * sealed-trait hierarchies — and a flat row keeps the sink fully
    * declarative. Unused fields hold the type's zero value. */
  case class ActionRow(
      action: String,   // create | update | history | not_found | close
      station: String, parte: String, recordId: String,
      planDate: String, shiftId: Int, plannedQty: Long, produced: Long,
      statusId: Int, quantity: Long, perCycle: Double, original: String,
      fecha: String, ts: Timestamp)

  object ActionRow {
    val Create = "create"; val Update = "update"; val History = "history"
    val NotFound = "not_found"; val Close = "close"
    private def zero(action: String, station: String, parte: String, ts: Timestamp) =
      ActionRow(action, station, parte, "", "", 0, 0L, 0L, 0, 0L, 0.0, "", "", ts)

    def create(station: String, parte: String, recordId: String, planDate: String,
        shiftId: Int, plannedQty: Long, ts: Timestamp): ActionRow =
      zero(Create, station, parte, ts).copy(recordId = recordId, planDate = planDate,
        shiftId = shiftId, plannedQty = plannedQty, statusId = 3)
    def updateQty(station: String, parte: String, recordId: String, produced: Long,
        statusId: Int, ts: Timestamp): ActionRow =
      zero(Update, station, parte, ts).copy(recordId = recordId, produced = produced,
        statusId = statusId)
    def appendHistory(station: String, parte: String, recordId: String, quantity: Long,
        perCycle: Double, ts: Timestamp): ActionRow =
      zero(History, station, parte, ts).copy(recordId = recordId, quantity = quantity,
        perCycle = perCycle)
    def partNotFound(station: String, parte: String, original: String, fecha: String,
        ts: Timestamp): ActionRow =
      zero(NotFound, station, parte, ts).copy(original = original, fecha = fecha)
    def closeShift(station: String, parte: String, recordId: String, planDate: String,
        shiftId: Int, ts: Timestamp): ActionRow =
      zero(Close, station, parte, ts).copy(recordId = recordId, planDate = planDate,
        shiftId = shiftId, statusId = 8)
  }

  /** Media payload for the multimodal path: opaque bytes + typed
    * metadata (decode stubbed; plumbing real). */
  case class MediaBlob(mediaId: Long, kind: String, payload: Array[Byte])
  case class MediaMeta(mediaId: Long, kind: String, nBytes: Long,
      contentMd5: String, width: Int, height: Int, nFrames: Int)
}
