package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PLC decode / expand / shift functions re-expressed as pure Spark
  * `Column` expressions (whole-stage-codegen friendly; no UDFs in the
  * hot path).
  *
  * Semantics derived from the reference pipeline
  * (`/root/reference/Prensas.py`):
  *  - word→ASCII decode, little-endian, NULs stripped (Prensas.py:450-465)
  *  - `A/B`-alternative expansion via cartesian product (Prensas.py:442-448)
  *  - register block expansion `("D3100",3) → D3100..D3102` where the
  *    prefix is the non-digit chars and the base is the digit chars
  *    (Prensas.py:467-471)
  *  - shift (turno) classification: 08:00–15:59 → shift 1 on today's
  *    date; otherwise shift 2, attributed to today when hour ≥ 16 and to
  *    yesterday before 08:00 (Prensas.py:653-659)
  *  - cycle-time ms→s with 0.0 fallback on bad cast (Prensas.py:546-551)
  */
object PlcFunctions {

  /** Decode an array of 16-bit PLC words into an ASCII string.
    * Each word encodes two chars, LOW byte first; NUL bytes are removed
    * after concatenation (Prensas.py:459-462).
    */
  def decodePlcWords(words: Column): Column = {
    val chars = transform(words, w =>
      concat(call_function("char", pmod(w, lit(256))),
             call_function("char", pmod(floor(w / 256).cast("int"), lit(256)))))
    regexp_replace(array_join(chars, ""), "\u0000", "")
  }

  /** Inverse of [[decodePlcWords]] for tests/fixtures: string → words
    * (pads odd-length input with a NUL high byte). */
  def encodePlcWords(s: Column): Column = {
    val padded = concat(s, when(length(s) % 2 === 1, lit("\u0000")).otherwise(lit("")))
    // empty-input guard: sequence(0, -1) would auto-step DOWN to [0, -1]
    when(length(s) === 0, array().cast("array<int>")).otherwise(
      transform(
        sequence(lit(0), (length(padded) / 2).cast("int") - 1),
        i => (ascii(substring(padded, lit(1) + i * 2, lit(1))) +
              ascii(substring(padded, lit(2) + i * 2, lit(1))) * 256).cast("int")))
  }

  /** Expand a decoded part string with `/`-alternatives into all
    * candidate part numbers (Prensas.py:442-448): split on spaces, each
    * token may be `A/B/...`; result = concatenated cartesian product in
    * reference order (last token varies fastest). A string with no `/`
    * yields one candidate with spaces removed.
    */
  def expandAlternatives(s: Column): Column =
    aggregate(
      split(s, " "),
      array(lit("")),
      (acc, tok) => flatten(transform(acc, a => transform(split(tok, "/"), alt => concat(a, alt)))))

  /** Expand a register block: prefix = all non-digit chars, base = all
    * digit chars as int; n consecutive addresses (Prensas.py:467-471). */
  def expandBlock(address: Column, n: Column): Column = {
    val prefix = regexp_replace(address, "[0-9]", "")
    val base = regexp_replace(address, "[^0-9]", "").cast("long")
    transform(sequence(lit(0), n.cast("int") - 1), i => concat(prefix, (base + i).cast("string")))
  }

  /** Shift (turno) for a timestamp: 1 when 08:00 ≤ t < 16:00, else 2
    * (Prensas.py:653-659). */
  def shiftOf(ts: Column): Column =
    when(hour(ts).between(8, 15), lit(1)).otherwise(lit(2))

  /** Planned production date: today when hour ≥ 08:00, else the night
    * shift that started yesterday (Prensas.py:653-659). */
  def planDateOf(ts: Column): Column =
    when(hour(ts) >= 8, to_date(ts)).otherwise(date_sub(to_date(ts), 1))

  /** Shift-change predicate given previous/current seconds-since-midnight
    * (Prensas.py:750-751): crossed 08:00 or 16:00. */
  def shiftChanged(prevSec: Column, curSec: Column): Column = {
    val h8 = lit(8 * 3600); val h16 = lit(16 * 3600)
    (prevSec < h8 && curSec >= h8) || (prevSec < h16 && curSec >= h16)
  }

  /** Seconds since midnight for a timestamp (Spark has no TIME type). */
  def secondsOfDay(ts: Column): Column =
    hour(ts) * 3600 + minute(ts) * 60 + second(ts)

  /** Cycle-time decode: raw register value in ms → |seconds|, 0.0 when
    * the value is not castable (Prensas.py:546-551). */
  def msToSeconds(raw: Column): Column =
    abs(coalesce(raw.try_cast("double"), lit(0.0)) / 1000.0)

  /** Config-change fingerprint (Prensas.py:849): md5 of a canonical JSON
    * rendering of the given struct column. */
  def configHash(struct: Column): Column = md5(to_json(struct))
}
