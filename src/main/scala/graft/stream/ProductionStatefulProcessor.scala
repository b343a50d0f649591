package graft.stream

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model._

/** The production state machine on Spark 4's `transformWithState`
  * (arbitrary stateful processing v2) — the exact [[StateMachine.Core]]
  * transition, hosted behind the modern API: typed `ValueState` for the
  * active record and an explicit per-key processing-time timer for the
  * ST4 silence close (Prensas.py:663-685). One live timer per key: each
  * successful update replaces the pending timer, so the close fires
  * `timeoutMs` after the LAST update, once, and clears state — the same
  * edge-trigger the flatMapGroupsWithState adapter gets from
  * `setTimeoutDuration`/`hasTimedOut`.
  *
  * transformWithState requires the RocksDB state store provider, which
  * is also the 100 TB configuration (off-heap keyed state, changelog
  * checkpointing) — see RocksDBStateSpec / TransformWithStateSpec.
  */
class ProductionStatefulProcessor(timeoutMs: Long)
    extends StatefulProcessor[(String, String), ObsEnriched, ActionRow] {

  private val core = new StateMachine.Core(timeoutMs)
  @transient private var state: ValueState[ActiveRecord] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ActiveRecord]("active",
      Encoders.product[ActiveRecord], TTLConfig.NONE)

  override def handleInputRows(key: (String, String), rows: Iterator[ObsEnriched],
      timerValues: TimerValues): Iterator[ActionRow] = {
    val cur = if (state.exists()) Some(state.get()) else None
    val (next, out) = core.advance(key._1, key._2, cur, rows.toVector)
    next.foreach { ar =>
      state.update(ar)
      if (timeoutMs > 0) {
        // single silence timer per key: replace, don't accumulate
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + timeoutMs)
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
