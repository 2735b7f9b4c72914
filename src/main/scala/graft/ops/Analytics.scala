package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The analytics rollup tails shared by the batch queries
  * (`retention_cohorts`, `anomaly_daily` in SparkEntry) and their
  * incrementally-maintained streaming twins
  * ([[graft.streaming.StreamingAnalytics]]): the streaming side
  * maintains the SMALL intermediate grid (per-user cohort deltas / the
  * (event_type, day) count table) incrementally — the part whose input
  * is 100 TB of raw events — and both sides run the identical tiny
  * rollup below it, so "streamed view == batch query" is equality by
  * construction once the grids agree (StreamingAnalyticsSpec asserts
  * exactly that).
  */
object Analytics {

  /** Per-group winsorization — the outlier-clipping cleaning pass run
    * before value aggregation (a fat-fingered or corrupt `value` row
    * otherwise owns every mean/sum downstream): each row's value is
    * clipped to its group's [p05, p95], with the clipped flag kept for
    * audit. Quantiles are EXACT ORDER STATISTICS on round(value, 6) —
    * the position-ceil(q·n) value over cumulative counts of the
    * DISTINCT rounded values per group (the [[graft.ext.Similarity]]
    * ivfStats formulation), chosen over interpolated `percentile`
    * because interpolation arithmetic on arbitrary doubles carries no
    * cross-engine rounding guarantee and an exact percentile buffers
    * each group whole.
    *
    * Scale shape: the bounds pass shuffles the (group, rounded-value)
    * DISTINCT grid, not the events; the clip pass is a groups-sized
    * broadcast join + projection over one events scan.
    */
  def winsorize(events: DataFrame, group: String, idCol: String,
                lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val e = events.select(col(idCol), col(group),
      round(col("value"), 6).as("rv"))
    e.join(broadcast(winsorizeBounds(events, group, lo, hi)), Seq(group))
      .select(col(idCol), col(group), col("rv").as("value"),
        when(col("rv") < col("lo_v"), col("lo_v"))
          .when(col("rv") > col("hi_v"), col("hi_v"))
          .otherwise(col("rv")).as("value_w"),
        (col("rv") < col("lo_v") || col("rv") > col("hi_v")).as("clipped"))
      .orderBy(col(idCol))
  }

  /** The per-group [p05, p95] bounds table (group, lo_v, hi_v) the clip
    * pass consumes — exposed separately so the streaming twin
    * ([[graft.streaming.StreamingCuration.winsorizeStream]]) can freeze
    * batch-history bounds and broadcast them against the live stream,
    * the same frozen-statistics deployment as the classifier model.
    */
  def winsorizeBounds(events: DataFrame, group: String,
                      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val e = events.select(col(group), round(col("value"), 6).as("rv"))
    val byVal = e.groupBy(col(group), col("rv")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(group)).orderBy(col("rv"))))
    val tot = e.groupBy(col(group)).agg(count(lit(1)).as("n"))
    byVal.join(tot, Seq(group))
      .groupBy(col(group))
      .agg(
        min(when(col("cum") >= ceil(lit(lo) * col("n")), col("rv")))
          .as("lo_v"),
        min(when(col("cum") >= ceil(lit(hi) * col("n")), col("rv")))
          .as("hi_v"))
  }

  /** Cohort retention over the distinct (user_id, day) activity grid:
    * cohort = first active day; each (cohort, day-offset) cell counts
    * users still active that many days later.
    */
  def retentionOf(grid: DataFrame): DataFrame = {
    val cohorts = grid.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    val act = grid.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
    retentionFromActivity(act)
  }

  /** The tail below the (cohort_day, day_offset) → n_active activity
    * table — cohort sizes and retention fractions. The activity table is
    * tiny (cohorts × offsets), so the size frame broadcasts.
    */
  def retentionFromActivity(act: DataFrame): DataFrame = {
    val sizes = act.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_active").as("cohort_size"))
    act.join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Daily volume anomaly z-scores over the (`key`, day, c) count grid
    * (`key` is the series column — `event_type` for the batch query,
    * `group_id` for the pipeline view). Variance comes from EXACT
    * integer sums (n, Σc, Σc²) combined in one fixed IEEE expression —
    * deliberately NOT stddev_samp, whose Welford-style accumulation is
    * engine- and order-dependent and would break the hash-exact oracle.
    * n = 1 (single observed day) has no dispersion estimate: std := 0,
    * so z = 0 and is_anomaly = false.
    */
  def anomalyOf(daily: DataFrame, key: String = "event_type"): DataFrame = {
    val stats = daily.groupBy(col(key))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("sq"))
      .select(col(key),
        (col("s").cast("double") / col("n")).as("mean"),
        when(col("n") > 1,
          sqrt((col("sq").cast("double") -
            col("s").cast("double") * col("s").cast("double") / col("n")) /
            (col("n") - 1))).otherwise(lit(0.0)).as("std"))
    daily.join(broadcast(stats), Seq(key))
      .select(col(key), col("day"), col("c").as("n_events"),
        when(col("std") === 0.0, lit(0.0))
          .otherwise(round((col("c") - col("mean")) / col("std"), 6))
          .as("z"),
        (col("std") > 0.0 &&
          abs((col("c") - col("mean")) / col("std")) > 2.0)
          .as("is_anomaly"))
      .orderBy(col(key), col("day"))
  }
}
