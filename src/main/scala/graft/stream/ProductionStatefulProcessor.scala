package graft.stream

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model._

/** The production state machine on Spark 4's `transformWithState`
  * (arbitrary stateful processing v2) — the exact [[StateMachine.Core]]
  * transition, hosted behind the modern API: typed `ValueState` for the
  * active record and an explicit per-key timer for the ST4 silence
  * close (Prensas.py:663-685). One live timer per key: each successful
  * update replaces the pending timer, so the close fires `timeoutMs`
  * after the LAST update, once, and clears state — the same
  * edge-trigger the flatMapGroupsWithState adapter gets from
  * `setTimeoutDuration`/`hasTimedOut`.
  *
  * BOTH silence clocks ride the same processor — the host's `TimeMode`
  * (captured at `init`) picks the deadline arithmetic, mirroring the
  * `process`/`processEventTime` adapter pair on the legacy API:
  *   - `ProcessingTime`: deadline = executor now + timeoutMs;
  *   - `EventTime`: deadline = lastTs + timeoutMs, floored just above
  *     the current watermark (a deadline the watermark already passed
  *     must fire at the next opportunity, not sit forever below it) —
  *     replay/backfill-deterministic, and stamped in stream time by
  *     [[StateMachine.Core.closeRow]] exactly like the
  *     `withDimTablesEventTime` host.
  *
  * transformWithState requires the RocksDB state store provider, which
  * is also the 100 TB configuration (off-heap keyed state, changelog
  * checkpointing) — see RocksDBStateSpec / TransformWithStateSpec.
  */
class ProductionStatefulProcessor(timeoutMs: Long)
    extends StatefulProcessor[(String, String), ObsEnriched, ActionRow] {

  private val core = new StateMachine.Core(timeoutMs)
  @transient private var state: ValueState[ActiveRecord] = _
  @transient private var eventTime: Boolean = false

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    eventTime = timeMode == TimeMode.EventTime()
    state = getHandle.getValueState[ActiveRecord]("active",
      Encoders.product[ActiveRecord], TTLConfig.NONE)
  }

  override def handleInputRows(key: (String, String), rows: Iterator[ObsEnriched],
      timerValues: TimerValues): Iterator[ActionRow] = {
    val cur = if (state.exists()) Some(state.get()) else None
    val (next, out) = core.advance(key._1, key._2, cur, rows.toVector)
    next.foreach { ar =>
      state.update(ar)
      if (timeoutMs > 0) {
        // single silence timer per key: replace, don't accumulate
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        val deadline =
          if (eventTime)
            math.max(ar.lastTsMs + timeoutMs, timerValues.getCurrentWatermarkInMs() + 1)
          else timerValues.getCurrentProcessingTimeInMs() + timeoutMs
        getHandle.registerTimer(deadline)
      }
    }
    out.iterator
  }

  override def handleExpiredTimer(key: (String, String), timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ActionRow] = {
    if (!state.exists()) return Iterator.empty
    val ar = state.get()
    state.clear()
    Iterator.single(core.closeRow(key._1, key._2, ar))
  }
}
