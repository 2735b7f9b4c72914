package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

import graft.streaming.StreamingFunnel.Ev

/** Ingest-time twins of the batch analytics rollups — the reference's
  * core pattern (gold aggregates maintained incrementally over the
  * change stream, `processing/gold.py:7-46`) applied to the analytics
  * family that round 6 added batch-only:
  *
  *   - [[retentionDeltas]]: per-user cohort assignment + new-active-day
  *     detection in the state store; emits one (cohort_day, day_offset)
  *     delta per newly observed user-day. Downstream, `count` per cell
  *     over the emitted deltas IS the retention activity table — each
  *     user-day is emitted exactly once, so the running count equals the
  *     batch `count_distinct(user_id)`.
  *   - [[dailyCounts]]: the (event_type, day) running count grid as a
  *     plain update-mode streaming aggregation — the same incremental
  *     fold shape as the gold stage.
  *
  * Both twins maintain the GRID — the part whose input is the 100 TB raw
  * event stream — and share the read-time rollup below it with the batch
  * queries via [[graft.ops.Analytics]] (`retentionFromActivity` /
  * `anomalyOf` over a snapshot that is tiny by construction: cohorts ×
  * offsets, types × days). StreamingAnalyticsSpec asserts the maintained
  * views equal the batch queries after N batches.
  *
  * Arrival-order concession (same policy as [[StreamingFunnel]] /
  * [[StreamingDedup]]): a user's cohort is their first SEEN day; a late
  * event time-traveling to before the assigned cohort is ignored rather
  * than re-cohorting the user (a retraction cascade). On in-order
  * streams the views are exact; the batch backfill is the oracle-checked
  * selection.
  */
object StreamingAnalytics {

  val msPerDay = 86400000L

  case class CohortDelta(cohort_day: Long, day_offset: Long)

  /** Stored per user: the assigned cohort day and the active days seen
    * so far — bounded by the calendar horizon (one entry per distinct
    * DAY the user was active, ≤365/year regardless of event volume).
    */
  case class RetState(cohort_day: Long, days: Seq[Long])

  /** Generic over the key and row type — the processor never looks at
    * the key, only at each row's event time (via `ems`), so the same
    * logic serves the Long-keyed event stream and the string-keyed
    * pipeline entity stream.
    */
  class RetentionProcessor[K, R](ems: R => Long)
      extends StatefulProcessor[K, R, CohortDelta] {
    @transient private var st: ValueState[RetState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[RetState]("cohort",
        Encoders.product[RetState], TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[R],
        timerValues: TimerValues): Iterator[CohortDelta] = {
      val batchDays = rows.map(r => Math.floorDiv(ems(r), msPerDay)).toSet
      if (batchDays.isEmpty) Iterator.empty
      else {
        val prev = if (st.exists()) st.get() else null
        val cohort = if (prev == null) batchDays.min else prev.cohort_day
        val seen = if (prev == null) Set.empty[Long] else prev.days.toSet
        val fresh = (batchDays -- seen).filter(_ >= cohort)
        st.update(RetState(cohort, (seen ++ fresh).toSeq.sorted))
        fresh.toSeq.sorted.iterator
          .map(d => CohortDelta(cohort, d - cohort))
      }
    }
  }

  /** Event stream → one (cohort_day, day_offset) delta per newly
    * observed user-day (update-mode output; each user-day exactly once).
    */
  def retentionDeltas(events: Dataset[Ev]): Dataset[CohortDelta] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RetentionProcessor[Long, Ev](_.ems),
        TimeMode.None(), OutputMode.Update())
  }

  /** (entity, ems) activity row — the pipeline-side input shape, keyed
    * by the silver stream's string `group_id`.
    */
  case class Activity(entity: String, ems: Long)

  /** [[retentionDeltas]] for the string-keyed pipeline entity stream. */
  def retentionDeltasByEntity(acts: Dataset[Activity]): Dataset[CohortDelta] = {
    import acts.sparkSession.implicits._
    acts.groupByKey(_.entity)
      .transformWithState(new RetentionProcessor[String, Activity](_.ems),
        TimeMode.None(), OutputMode.Update())
  }

  /** Event stream → running (event_type, day) counts, update mode: each
    * micro-batch emits the new TOTAL for every touched cell — the
    * incremental fold a foreachBatch sink upserts into its snapshot by
    * key, exactly the gold-stage pattern.
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
      floor(col("ems") / lit(msPerDay)).cast("long").as("day"))
      .agg(count(lit(1)).as("c"))
}
