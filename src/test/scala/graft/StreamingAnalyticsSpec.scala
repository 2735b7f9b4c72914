package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Analytics
import graft.streaming.StreamingAnalytics
import graft.streaming.StreamingFunnel.Ev

/** VERDICT r6 next-round #3: the retention / anomaly views maintained
  * incrementally over the event stream must equal the batch queries
  * after N in-order batches. Both sides share the rollup tail in
  * ops/Analytics — the test pins that the incrementally-maintained GRID
  * converges to the batch grid.
  */
class StreamingAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private val D = StreamingAnalytics.msPerDay

  // three batches, arriving in time order: multi-day users, a user
  // active twice on one day (must count once), single-day users, and a
  // second event type with its own daily profile
  private val batches = Seq(
    Seq(Ev(1, "view", 0 * D + 10), Ev(2, "view", 0 * D + 20),
      Ev(1, "click", 0 * D + 30), Ev(3, "view", 1 * D + 5)),
    Seq(Ev(1, "view", 1 * D + 40), Ev(1, "view", 1 * D + 50),
      Ev(2, "click", 2 * D + 7), Ev(4, "view", 2 * D + 9)),
    Seq(Ev(1, "purchase", 3 * D + 1), Ev(3, "view", 3 * D + 2),
      Ev(2, "view", 3 * D + 3), Ev(5, "click", 3 * D + 4)))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq

  test("winsorize clips to the group's own order-statistic bounds and " +
    "matches a naive driver reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b",
        math.floor(rnd.nextDouble() * 1e6) / 1e6 * 100))
    val df = rows.toDF("event_id", "event_type", "value")
    val got = Analytics.winsorize(df, "event_type", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    def boundsOf(vs: Seq[Double], q: Double): Double = {
      val sorted = vs.map(v => BigDecimal(v).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble).sorted
      sorted(math.ceil(q * sorted.length).toInt - 1)
    }
    rows.groupBy(_._2).foreach { case (ty, grp) =>
      val vs = grp.map(_._3)
      val (lo, hi) = (boundsOf(vs, 0.05), boundsOf(vs, 0.95))
      got.filter(_._2 == ty).foreach { case (_, _, v, w, clipped) =>
        assert(w >= lo && w <= hi)
        assert(clipped == (v < lo || v > hi))
        if (!clipped) assert(w == v)
        else assert(w == lo || w == hi)
      }
    }
    // unclipped mass dominates at 5/95
    assert(got.count(!_._5) > got.length * 8 / 10)
  }

  test("blockedCumCount equals the single-reducer window formulation, " +
    "grouped and global") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // skewed grid: group "a" owns most of the distinct values, plus ties
    // in counts and a null value row — every branch the blocking touches
    val rows = Seq.tabulate(500)(i =>
      (if (i % 5 == 0) "b" else "a",
        math.floor(rnd.nextDouble() * 1e4) / 1e4,
        (i % 3 + 1).toLong)) :+ (("a", Double.NaN, 2L))
    val grid = rows.toDF("g", "v", "c")
      .select(col("g"), when(isnan(col("v")), lit(null)).otherwise(col("v")).as("v"), col("c"))
      .groupBy("g", "v").agg(sum("c").as("c"))
    val windowed = grid.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("g")).orderBy(col("v"))))
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(3)))
      .toSet
    val blocked = Analytics.blockedCumCount(grid, Seq("g"), "v", "c")
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(3)))
      .toSet
    assert(blocked == windowed)
    // global (empty groupCols) — the embStats shape
    val gGrid = grid.filter(col("v").isNotNull).groupBy("v")
      .agg(sum("c").as("c"))
    val gWindowed = gGrid.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("v"))))
      .collect().map(r => (r.getDouble(0), r.getLong(2))).toSet
    val gBlocked = Analytics.blockedCumCount(gGrid, Seq.empty, "v", "c")
      .collect().map(r => (r.getDouble(0), r.getLong(2))).toSet
    assert(gBlocked == gWindowed)
    // a group whose grid is ALL null (percentile_approx yields a null
    // splitter array) must still be EMITTED, matching the window form —
    // ADVICE r11: the raw size(filter(null,...)) block id was null and
    // the offsets equi-join silently dropped the whole group
    val withNullGroup = grid.unionByName(
      Seq(("z", 3L), ("z", 4L)).toDF("g", "c")
        .select(col("g"), lit(null).cast("double").as("v"), col("c"))
        .groupBy("g", "v").agg(sum("c").as("c")))
    val nWindowed = withNullGroup.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("g")).orderBy(col("v"))))
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(3)))
      .toSet
    val nBlocked = Analytics.blockedCumCount(withNullGroup, Seq("g"), "v", "c")
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(3)))
      .toSet
    assert(nBlocked.exists(_._1 == "z"),
      "all-null group dropped by the blocked formulation")
    assert(nBlocked == nWindowed)
  }

  test("property (seeded): blockedCumCount equals the window form over " +
    "random grid shapes — varied nBlocks, group counts, duplicate-heavy " +
    "values, all-null and singleton groups") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    (1 to 8).foreach { iter =>
      val nGroups = 1 + rnd.nextInt(4)
      val nBlocks = 2 + rnd.nextInt(100)
      val valuePool = 1 + rnd.nextInt(30) // small pool → heavy ties
      val rows = (0 until 200).map { _ =>
        val g = s"g${rnd.nextInt(nGroups)}"
        val v: java.lang.Double =
          if (rnd.nextInt(10) == 0) null
          else rnd.nextInt(valuePool).toDouble / 7.0
        (g, v, (1 + rnd.nextInt(3)).toLong)
      } ++ Seq(("only_null", null: java.lang.Double, 5L),
        ("single", 1.25: java.lang.Double, 1L))
      val grid = rows.toDF("g", "v", "c").groupBy("g", "v")
        .agg(sum("c").as("c"))
      val windowed = grid.withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("g")).orderBy(col("v"))))
        .collect()
        .map(r => (r.getString(0), Option(r.get(1)), r.getLong(3))).toSet
      val blocked = Analytics.blockedCumCount(grid, Seq("g"), "v", "c",
        nBlocks)
        .collect()
        .map(r => (r.getString(0), Option(r.get(1)), r.getLong(3))).toSet
      assert(blocked == windowed, s"iter $iter (nBlocks=$nBlocks)")
    }
  }

  test("incrementally maintained retention equals the batch query after " +
    "N batches") {
    val input = MemoryStream[Ev](41, spark, None)
    val q = StreamingAnalytics.retentionDeltas(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_stream_retention").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }

      // each user-day is emitted exactly once, so counting delta rows
      // per cell reproduces the batch count_distinct activity table
      // localCheckpoint: retentionFromActivity joins act against its own
      // offset-0 slice, and a memory-table view can't be self-joined
      // lazily (conflicting-reference resolution error)
      val act = spark.table("graft_stream_retention")
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .localCheckpoint(true)
      val streamed = rows(Analytics.retentionFromActivity(act))

      val grid = batches.flatten.toDF()
        .select(col("user_id"),
          floor(col("ems") / lit(D)).cast("long").as("day"))
        .distinct()
      val batch = rows(Analytics.retentionOf(grid))
      assert(streamed.nonEmpty && streamed == batch,
        s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("late-event policy: a time-traveling event before the assigned " +
    "cohort is ignored, and the divergence vs batch is exactly that set") {
    val input = MemoryStream[Ev](43, spark, None)
    val q = StreamingAnalytics.retentionDeltas(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_stream_retention_late").start()
    try {
      // user 7 arrives OUT OF ORDER: first seen on day 2 (cohort := 2);
      // later batches time-travel to days 0 and 1 (< cohort → ignored,
      // never re-cohorted) and to day 3 (late but >= cohort → counted).
      // user 8 is fully in-order: days 0 then 1.
      val waves = Seq(
        Seq(Ev(7, "view", 2 * D + 10), Ev(8, "view", 0 * D + 10)),
        Seq(Ev(7, "view", 0 * D + 20), // time-travel below cohort: dropped
          Ev(7, "view", 3 * D + 30), // late arrival, new day >= cohort
          Ev(8, "view", 1 * D + 40)),
        Seq(Ev(7, "view", 1 * D + 50), // below cohort again: dropped
          Ev(7, "view", 2 * D + 60))) // already-seen day: no re-emit
      waves.foreach { b => input.addData(b); q.processAllAvailable() }

      val streamed = spark.table("graft_stream_retention_late")
        .collect().toSeq
        .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")))
        .sorted
      // documented arrival-order semantics: user 7 cohort 2, days {2, 3};
      // user 8 cohort 0, days {0, 1} — each user-day exactly once
      val expected = Seq((0L, 0L), (0L, 1L), (2L, 0L), (2L, 1L)).sorted
      assert(streamed == expected, s"streamed $streamed vs $expected")

      // batch over the same events re-cohorts user 7 to day 0 with days
      // {0, 1, 2, 3} — the divergence is exactly user 7's view, nothing
      // else (user 8's in-order cells match bit-for-bit)
      val batchCells = waves.flatten.toDF()
        .select(col("user_id"), floor(col("ems") / lit(D)).cast("long").as("day"))
        .distinct().collect().toSeq
        .groupBy(_.getLong(0)).values.toSeq
        .flatMap { rs =>
          val days = rs.map(_.getLong(1)); val c = days.min
          days.map(d => (c, d - c))
        }.sorted
      assert(batchCells == Seq((0L, 0L), (0L, 1L), (0L, 2L), (0L, 3L),
        (0L, 0L), (0L, 1L)).sorted)
      val inOrderCells = Seq((0L, 0L), (0L, 1L)) // user 8's cells
      assert(inOrderCells.forall(streamed.contains(_)) &&
        inOrderCells.forall(batchCells.contains(_)),
        "in-order user's cells must agree between stream and batch")
    } finally q.stop()
  }

  test("incrementally maintained daily counts feed the same anomaly view " +
    "as the batch query") {
    val input = MemoryStream[Ev](42, spark, None)
    // the gold-stage pattern: update-mode fold emits new totals per
    // touched (event_type, day); the sink upserts them by key
    val snapshot = scala.collection.mutable.Map[(String, Long), Long]()
    val q = StreamingAnalytics.dailyCounts(input.toDF())
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          snapshot((r.getString(0), r.getLong(1))) = r.getLong(2)
        }
      }.start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }

      val daily = snapshot.toSeq
        .map { case ((et, day), c) => (et, day, c) }
        .toDF("event_type", "day", "c")
      val streamed = rows(Analytics.anomalyOf(daily))

      val batchDaily = batches.flatten.toDF()
        .groupBy(col("event_type"),
          floor(col("ems") / lit(D)).cast("long").as("day"))
        .agg(count(lit(1)).as("c"))
      val batch = rows(Analytics.anomalyOf(batchDaily))
      assert(streamed.nonEmpty && streamed == batch,
        s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }
}
