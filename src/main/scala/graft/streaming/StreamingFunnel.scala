package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Ingest-time twin of the batch `funnel_steps` query: per-user
  * ordered-step funnel progression (view → click → purchase, strictly
  * increasing event time) tracked live in the state store.
  *
  * State is O(1) per user — the current stage index and the timestamp of
  * the step that reached it — NOT the user's event history: a
  * million-event user costs the same 12 bytes as a one-event user, which
  * is what makes live funnel tracking viable at 100 TB event volume.
  *
  * Semantics vs batch (same policy note as [[StreamingDedup]] and
  * [[StreamingCuration.QuotaProcessor]]): within a micro-batch, rows are
  * processed in event-time order (ties by event_type), so on a stream
  * whose batches arrive in time order the final per-user stage is
  * IDENTICAL to the batch query's greedy scan — which itself equals the
  * chained conditional-min formulation, since the earliest-feasible chain
  * is taken in both. Late events that time-travel behind an already-taken
  * step are ignored (the step keeps its first-reached timestamp), the
  * arrival-order concession every ingest-time operator here makes; the
  * batch backfill is the oracle-checked selection.
  */
object StreamingFunnel {

  case class Ev(user_id: Long, event_type: String, ems: Long)
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
      rows.toSeq.sortBy(r => (r.ems, r.event_type)).foreach { r =>
        if (s.stage < steps.length && r.event_type == steps(s.stage) &&
          r.ems > s.t) {
          s = FunnelState(s.stage + 1, r.ems)
        }
      }
      st.update(s)
      Iterator.single(Reach(key, s.stage, s.t))
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
