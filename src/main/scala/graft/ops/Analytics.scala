package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Exact.round6

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
    * audit. Quantiles are EXACT ORDER STATISTICS on round6(value) —
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
      round6(col("value")).as("rv"))
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
    *
    * Scale shape: the cumulative count over the per-group DISTINCT
    * rounded-value grid rides [[blockedCumCount]] — a distributed block
    * prefix sum, never a per-group single-reducer window. A continuous
    * `value` column makes the grid near event-sized, so a hot group's
    * grid must NOT serialize through one task.
    */
  def winsorizeBounds(events: DataFrame, group: String,
                      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val e = events.select(col(group), round6(col("value")).as("rv"))
    val byVal = e.groupBy(col(group), col("rv")).agg(count(lit(1)).as("c"))
    val cum = blockedCumCount(byVal, Seq(group), "rv", "c")
    val tot = e.groupBy(col(group)).agg(count(lit(1)).as("n"))
    cum.join(tot, Seq(group))
      .groupBy(col(group))
      .agg(
        min(when(col("cum") >= ceil(lit(lo) * col("n")), col("rv")))
          .as("lo_v"),
        min(when(col("cum") >= ceil(lit(hi) * col("n")), col("rv")))
          .as("hi_v"))
  }

  /** Realized clip rate of `events` under a FROZEN bounds table — the
    * health metric behind the bounds re-freeze rule
    * ([[graft.streaming.StreamingCuration.refreezeBoundsIfNeeded]]):
    * bounds frozen from batch history clip EXACTLY `lo + (1 − hi)` of
    * that history by construction, so the realized clip fraction of the
    * CURRENT data drifting away from that expectation is the signal
    * that the value distribution moved and the frozen clip is silently
    * degrading (the winsorize twin of `frac_drifted` in
    * [[graft.ext.Similarity.ivfStats]]). One row per group: row count,
    * clipped count/fraction under the frozen bounds, and whether the
    * group is UNCOVERED (absent from the bounds table — a new group
    * passes through the stream unclipped, drift by definition).
    *
    * Scale shape: one events scan against the broadcast bounds table,
    * folded map-side onto groups-sized rows.
    */
  def clipDrift(events: DataFrame, group: String, bounds: DataFrame,
                lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    // the theoretical quantile mass, rounded like every displayed
    // double: DuckDB folds the literals in DECIMAL (exactly 0.10), IEEE
    // double addition gives 0.10000000000000005 — the 6-digit display
    // grid unifies them
    val theoretical = round6(lit(lo + (1.0 - hi)))
    // a bounds frame carrying a freeze-time `expected_frac` column (the
    // standing-table form, [[ensureBoundsIndex]]) pins each group's
    // calm point to the REALIZED clip rate at freeze — exact for
    // discrete/tied/small groups where the theoretical mass never
    // realizes (a frozen [v, v] window clips 0%, not 10%, and the
    // deviation rule would otherwise fire forever on an unchanged
    // distribution); a plain bounds frame falls back to the theory
    val b = if (bounds.columns.contains("expected_frac"))
      bounds.select(col(group), col("lo_v"), col("hi_v"),
        col("expected_frac").as("__exp"))
    else bounds.select(col(group), col("lo_v"), col("hi_v"),
      theoretical.as("__exp"))
    events.select(col(group), round6(col("value")).as("__rv"))
      .join(broadcast(b), Seq(group), "left")
      .groupBy(col(group))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("lo_v").isNotNull &&
          (col("__rv") < col("lo_v") || col("__rv") > col("hi_v")), 1L)
          .otherwise(0L)).as("n_clipped"),
        max(col("lo_v").isNull).as("uncovered"),
        max(col("__exp")).as("__exp")) // constant within a group
      .select(col(group), col("n"), col("n_clipped"),
        round6(col("n_clipped").cast("double") / col("n"))
          .as("clip_frac"),
        coalesce(col("__exp"), theoretical).as("expected_frac"),
        col("uncovered"))
      .orderBy(col(group))
  }

  // ——————————— standing frozen-bounds table (the deployed freeze) ———————————

  /** Table key for the persisted bounds: every knob that determines the
    * frozen quantiles is part of the name — the
    * [[graft.ext.Similarity]] ivfKey staleness rule.
    */
  private[graft] def boundsTable(dir: String, group: String, lo: Double,
                                 hi: Double): String =
    s"graft_winsor_bounds_${graft.ext.IndexCatalog.indexKey(dir)}_" +
      s"${group}_l${(lo * 1000).round}_h${(hi * 1000).round}"

  /** Build (or reattach) the STANDING frozen-bounds table for `dir`'s
    * events — the persisted form of the freeze
    * [[graft.streaming.StreamingCuration.winsorizeStream]] consumes: a
    * restarted stream reads the SAME bounds it was clipping with
    * instead of silently re-freezing on whatever history exists at
    * restart, and the maintenance loop re-freezes out-of-band via
    * [[refreezeBoundsIndexIfNeeded]]. Same [[graft.ext.IndexCatalog]]
    * lifecycle as every standing index (external bucketed parquet,
    * catalog-loss reattach, purge+ensure rebuild).
    */
  def ensureBoundsIndex(spark: org.apache.spark.sql.SparkSession,
                        dir: String, group: String = "event_type",
                        lo: Double = 0.05, hi: Double = 0.95): Unit = {
    val t = boundsTable(dir, group, lo, hi)
    if (!spark.catalog.tableExists(t)) {
      if (!graft.ext.IndexCatalog.reattachIfPresent(spark, t, Seq(group))) {
        graft.ext.IndexCatalog.purge(spark, t)
        val ev = graft.ops.Ingest.events(spark, dir)
        val b = winsorizeBounds(ev, group, lo, hi).localCheckpoint(true)
        // store the freeze-time REALIZED clip fraction with the bounds:
        // the drift rule's calm point. For discrete/tied/small groups
        // the theoretical quantile mass lo + (1 − hi) never realizes
        // (a [v, v] window clips nothing), and a rule anchored to the
        // theory would re-freeze such groups on every maintenance tick
        // without ever converging.
        b.join(
          clipDrift(ev, group, b, lo, hi)
            .select(col(group), col("clip_frac").as("expected_frac")),
          Seq(group))
          .write.mode("overwrite")
          .bucketBy(8, group).sortBy(group)
          .option("path",
            graft.ext.IndexCatalog.tableLocation(spark, t).toString)
          .saveAsTable(t)
      }
    }
  }

  /** The persisted frozen bounds (built on first use, reattached across
    * sessions) — the frame [[graft.streaming.StreamingCuration.winsorizeStream]]
    * binds against.
    */
  def frozenBounds(spark: org.apache.spark.sql.SparkSession, dir: String,
                   group: String = "event_type", lo: Double = 0.05,
                   hi: Double = 0.95): DataFrame = {
    ensureBoundsIndex(spark, dir, group, lo, hi)
    spark.table(boundsTable(dir, group, lo, hi))
  }

  /** True when the standing bounds table EXISTS (catalog entry or
    * committed data) — the fail-fast guard the maintenance hook checks
    * before monitoring, like every other standing index.
    */
  private[graft] def boundsIndexExists(spark: org.apache.spark.sql.SparkSession,
                                       dir: String, group: String,
                                       lo: Double = 0.05,
                                       hi: Double = 0.95): Boolean = {
    graft.ext.IndexCatalog.hasCommittedData(spark,
      boundsTable(dir, group, lo, hi))
  }

  /** Drop the standing bounds table and its data. */
  def purgeBoundsIndex(spark: org.apache.spark.sql.SparkSession,
                       dir: String, group: String = "event_type",
                       lo: Double = 0.05, hi: Double = 0.95): Unit =
    graft.ext.IndexCatalog.purge(spark, boundsTable(dir, group, lo, hi))

  /** The maintenance-loop face of the PERSISTED freeze: evaluate the
    * drift rule ([[graft.streaming.StreamingCuration.shouldRefreezeBounds]])
    * over the current events history against the standing bounds table
    * and, when it fires, rebuild the table from history (purge +
    * ensure — the [[graft.streaming.StreamingSimilarity.retrainIfNeeded]]
    * contract: run quiesced, the consuming stream restarts against the
    * refreshed table). Fails fast when no standing table exists for the
    * configured shape — monitoring would otherwise silently BUILD a
    * fresh table and forever read it as calm.
    */
  def refreezeBoundsIndexIfNeeded(spark: org.apache.spark.sql.SparkSession,
                                  dir: String, group: String = "event_type",
                                  lo: Double = 0.05, hi: Double = 0.95,
                                  tol: Double = 0.05): Boolean = {
    require(boundsIndexExists(spark, dir, group, lo, hi),
      s"refreezeBoundsIndexIfNeeded: no standing bounds table for " +
        s"dir=$dir, group=$group, lo=$lo, hi=$hi (check " +
        "SPARK_GRAFT_WINSOR_DIR/_GROUP against the built table's shape) " +
        "— the rule monitors an existing freeze, it does not build one")
    val fire = graft.streaming.StreamingCuration.shouldRefreezeBounds(
      graft.ops.Ingest.events(spark, dir), group,
      frozenBounds(spark, dir, group, lo, hi), lo, hi, tol)
    if (fire) {
      purgeBoundsIndex(spark, dir, group, lo, hi)
      ensureBoundsIndex(spark, dir, group, lo, hi)
    }
    fire
  }

  /** Distributed prefix-sum cumulative counts over a
    * (groupCols…, valCol, cntCol) DISTINCT grid — the
    * [[graft.ext.Curation.packGreedy]] block pattern generalized to
    * value-ordered grids with no dense id. Returns the grid plus a `cum`
    * column equal to `sum(cntCol) OVER (PARTITION BY groupCols ORDER BY
    * valCol)` — bit-identical to the single-reducer window, but no
    * group's grid ever passes through one task:
    *
    *  1. per-group approximate splitters (`percentile_approx` over the
    *     grid — the splitters only BALANCE the blocking; the exact
    *     integer sums below are independent of where the cuts land, so
    *     sketch approximation never touches the result);
    *  2. block id = number of splitters ≤ value (monotone in value ⇒
    *     blocks are value-contiguous — the prefix-sum prerequisite);
    *  3. block-local running sums in parallel (window keyed by
    *     (group, block));
    *  4. block TOTALS — ≤ nBlocks rows per group — through a tiny
    *     per-group rollup, offsets broadcast-joined back.
    *
    * groupCols may be empty (global cumulative count — the
    * [[graft.ext.Similarity.embStats]] norm-quantile grid); a constant
    * group key is synthesized internally.
    */
  private[graft] def blockedCumCount(grid0: DataFrame,
                                     groupCols0: Seq[String],
                                     valCol: String, cntCol: String,
                                     nBlocks: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBlocks >= 2, s"nBlocks must be >= 2, got $nBlocks")
    val synthetic = groupCols0.isEmpty
    val grid = if (synthetic) grid0.withColumn("_g", lit(0)) else grid0
    val groupCols = if (synthetic) Seq("_g") else groupCols0
    val gc = groupCols.map(col)
    val pcts = array((1 until nBlocks).map(i => lit(i.toDouble / nBlocks)): _*)
    val splits = grid.groupBy(gc: _*)
      .agg(percentile_approx(col(valCol), pcts, lit(1000)).as("_splits"))
    // coalesce (ADVICE r11): a group whose grid values are ALL null has
    // a null _splits row (percentile_approx ignores nulls), so the raw
    // size(filter(...)) is null and the equi-join below would silently
    // DROP the whole group — the window form emits it. Null-splitter
    // groups collapse into block 0 instead (their null values also sort
    // first there, matching the window's nulls-first order).
    val blocked = grid.join(broadcast(splits), groupCols)
      .withColumn("_blk",
        coalesce(size(filter(col("_splits"), s => s <= col(valCol))),
          lit(0)))
      .drop("_splits")
    val wLocal = Window.partitionBy((gc :+ col("_blk")): _*)
      .orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = blocked.withColumn("_local_cum", sum(col(cntCol)).over(wLocal))
    // one row per (group, block) — the only data through the rollup.
    // (r17 note: computing the block totals from `local` instead — max
    // of the running sum, reusing the window's partitioning — was tried
    // and measured SLOWER: the window subtree then executes in both
    // branches, and re-sorting the grid costs more than the grid-sized
    // exchange it saves. The `blocked`-sourced aggregate stands.)
    val wBlk = Window.partitionBy(gc: _*).orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val blkOff = blocked.groupBy((gc :+ col("_blk")): _*)
      .agg(sum(col(cntCol)).as("_blk_c"))
      .withColumn("_blk_off", coalesce(sum(col("_blk_c")).over(wBlk), lit(0L)))
      .select((gc :+ col("_blk") :+ col("_blk_off")): _*)
    val out = local.join(broadcast(blkOff), groupCols :+ "_blk")
      .withColumn("cum", col("_blk_off") + col("_local_cum"))
      .drop("_blk", "_local_cum", "_blk_off")
    if (synthetic) out.drop("_g") else out
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
        round6(col("n_active").cast("double") / col("cohort_size"))
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
          .otherwise(round6((col("c") - col("mean")) / col("std")))
          .as("z"),
        (col("std") > 0.0 &&
          abs((col("c") - col("mean")) / col("std")) > 2.0)
          .as("is_anomaly"))
      .orderBy(col(key), col("day"))
  }
}
