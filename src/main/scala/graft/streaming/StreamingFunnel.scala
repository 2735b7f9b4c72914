package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Ingest-time twin of the batch `funnel_steps` query: per-user
  * ordered-step funnel progression (view → click → purchase, strictly
  * increasing event time) tracked live in the state store.
  *
  * STORED state is O(1) per user — the current stage index and the
  * timestamp of the step that reached it — NOT the user's event history:
  * a million-event user costs the same 12 bytes of state-store footprint
  * as a one-event user. Per-batch PROCESSING memory is a different
  * budget: the processor buffers the user's step-relevant events for the
  * batch (events whose type appears at-or-after the current stage and
  * whose time could still chain) to run the chained-min fold below —
  * O(relevant events per user per micro-batch), bounded by trigger
  * sizing, never by the user's lifetime history.
  *
  * Semantics vs batch (same policy note as [[StreamingDedup]] and
  * [[StreamingCuration.QuotaProcessor]]): within a micro-batch the
  * processor advances by CHAINED CONDITIONAL MINS — from stage s at time
  * t, the next step's time is min{ems : type = steps(s), ems > t},
  * repeated until no step advances. This is order-independent (no sort
  * needed) and equals the event-time-sorted greedy scan: the first
  * matching event in sorted order IS the minimal feasible timestamp. So
  * on a stream whose batches arrive in time order the final per-user
  * stage is IDENTICAL to the batch query's greedy scan. Late events that
  * time-travel behind an already-taken step are ignored (the step keeps
  * its first-reached timestamp), the arrival-order concession every
  * ingest-time operator here makes; the batch backfill is the
  * oracle-checked selection.
  */
object StreamingFunnel {

  case class Ev(user_id: Long, event_type: String, ems: Long)

  /** Live funnel position. `reached_ms` is the event time of the step
    * that reached `stage`; for stage-0 users (no step taken yet) it is
    * 0L — a documented placeholder, not the internal Long.MinValue
    * progression floor.
    */
  case class Reach(user_id: Long, stage: Int, reached_ms: Long)
  case class FunnelState(stage: Int, t: Long)

  val defaultSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Greedy per-user stage advance; emits the user's stage after each
    * batch touching the user (update-mode output).
    */
  class FunnelProcessor(steps: Seq[String])
      extends StatefulProcessor[Long, Ev, Reach] {
    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Reach] = {
      var s = if (st.exists()) st.get() else FunnelState(0, Long.MinValue)
      // buffer only events that could still advance the funnel: a step
      // at-or-after the current stage, strictly after the reached time
      val stepIdx = steps.zipWithIndex.toMap
      val buf = rows.filter { r =>
        r.ems > s.t && stepIdx.get(r.event_type).exists(_ >= s.stage)
      }.toArray
      // chained conditional mins, ≤ steps.length passes over the buffer;
      // no sort — order-independent and equal to the sorted greedy scan
      var advanced = s.stage < steps.length
      while (advanced && s.stage < steps.length) {
        val want = steps(s.stage)
        var best = Long.MaxValue
        var i = 0
        while (i < buf.length) {
          val r = buf(i)
          if (r.ems > s.t && r.ems < best && r.event_type == want) best = r.ems
          i += 1
        }
        if (best == Long.MaxValue) advanced = false
        else s = FunnelState(s.stage + 1, best)
      }
      st.update(s)
      Iterator.single(Reach(key, s.stage, if (s.stage == 0) 0L else s.t))
    }
  }

  /** Event stream → per-user funnel stage stream (one row per touched
    * user per batch; latest row per user is the live funnel position).
    */
  def funnelStream(events: Dataset[Ev],
                   steps: Seq[String] = defaultSteps): Dataset[Reach] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(steps),
        TimeMode.None(), OutputMode.Update())
  }
}
