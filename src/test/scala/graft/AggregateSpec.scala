package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.ops.Aggregate

/** Fold-equivalence property (SURVEY §5.4): incremental per-batch
  * partial+fold == one-shot aggregation, for cumulative totals; and the
  * faithful batch-overwrite semantics for first/last (SURVEY §7.5-3).
  * Properties run over seeded random inputs (scalatestplus isn't in the
  * offline cache, so the property loop is hand-rolled).
  */
class AggregateSpec extends SparkTestBase {
  import spark.implicits._

  private def randomEvents(rnd: Random, n: Int): Seq[(String, Double, Long)] =
    Seq.fill(n)((s"g${rnd.nextInt(4)}",
      math.rint(rnd.nextDouble() * 10000) / 100,
      1000L + rnd.nextInt(9000)))

  test("fold of batch partials equals one-shot aggregation (totals)") {
    val rnd = new Random(42)
    for (trial <- 1 to 10) {
      val events = randomEvents(rnd, 40 + rnd.nextInt(40))
      val cutN = 1 + rnd.nextInt(events.size - 1)
      val (b1, b2) = events.splitAt(cutN)
      val df1 = b1.toDF("group_id", "score", "event_timestamp")
      val df2 = b2.toDF("group_id", "score", "event_timestamp")
      val all = events.toDF("group_id", "score", "event_timestamp")

      val gold1 = Aggregate.partial(df1, "group_id", "score", "event_timestamp")
        .select(col("group_id"),
          col("batch_score").as("cumulative_score"),
          col("batch_events").as("event_count"),
          lit(0.0).as("avg_score"),
          col("batch_first").as("first_event_timestamp"),
          col("batch_last").as("last_event_timestamp"))
      val folded = Aggregate.fold(gold1,
        Aggregate.partial(df2, "group_id", "score", "event_timestamp"),
        "group_id")
        .select(col("group_id"),
          col("cumulative_score").cast("double").as("cum"),
          col("event_count"), col("avg_score"))
        .collect().map(r => (r.getString(0),
          (r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap

      val oneShot = Aggregate.oneShotGold(all, "group_id", "score",
        "event_timestamp")
        .collect().map(r => (r.getString(0),
          (r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap

      assert(folded.keySet == oneShot.keySet, s"trial $trial key sets")
      folded.foreach { case (g, (cum, cnt, avg)) =>
        val (c2, n2, a2) = oneShot(g)
        assert(math.abs(cum - c2) < 1e-9, s"trial $trial cumulative for $g")
        assert(cnt == n2, s"trial $trial count for $g")
        assert(math.abs(avg - a2) < 1e-9, s"trial $trial avg for $g")
      }
    }
  }

  test("approx_count_distinct stays within its error bound vs exact") {
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.ops.Ingest.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(approx(t) - n).toDouble / n < 0.1,
        s"$t: approx ${approx(t)} vs exact $n")
    }
  }

  test("HLL sketch rollup: unioned bucket partials land within the bound") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.ops.Ingest.events(spark, dir)
      .withColumn("minute",
        graft.ops.Ingest.minuteBucket(unix_millis(col("ts"))))
    // the raw unioned estimate (the query itself only emits the boolean)
    val est = ev.groupBy(col("event_type"), col("minute"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      val (buckets, e) = est(t)
      // the rollup genuinely merged partials, not a single-sketch rename
      assert(buckets > 1, s"$t rolled up only $buckets bucket(s)")
      assert(math.abs(e - n).toDouble / n < 0.1, s"$t: union $e vs exact $n")
    }
    // and the registered query's booleans agree
    val q = SparkEntry.queries("agg_sketch_rollup")(spark, dir).collect()
    assert(q.nonEmpty && q.forall(_.getAs[Boolean]("union_within_10pct")))
  }

  test("histogram quantile rollup lands within two bin widths of exact") {
    val dir = "/root/testdata/sf0.001"
    val mm = graft.ops.Ingest.events(spark, dir)
      .agg(min(col("value")).as("mn"), max(col("value")).as("mx")).head
    val bw = (mm.getAs[Double]("mx") - mm.getAs[Double]("mn")) / 64.0
    val rows = SparkEntry.queries("agg_percentile_rollup")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(math.abs(r.getAs[Double]("hist_p50") -
        r.getAs[Double]("exact_p50")) <= 2 * bw, s"$t p50")
      assert(math.abs(r.getAs[Double]("hist_p90") -
        r.getAs[Double]("exact_p90")) <= 2 * bw, s"$t p90")
    }
  }

  test("processing the same batch through fold twice double-counts (why the pipeline guards batch ids)") {
    val b = Seq(("g", 1.0, 100L)).toDF("group_id", "score", "event_timestamp")
    val gold1 = Aggregate.partial(b, "group_id", "score", "event_timestamp")
      .select(col("group_id"),
        col("batch_score").as("cumulative_score"),
        col("batch_events").as("event_count"),
        lit(0.0).as("avg_score"),
        col("batch_first").as("first_event_timestamp"),
        col("batch_last").as("last_event_timestamp"))
    val twice = Aggregate.fold(gold1,
      Aggregate.partial(b, "group_id", "score", "event_timestamp"), "group_id")
      .collect().head
    assert(twice.getAs[Long]("event_count") == 2L)
  }

  test("fold keeps faithful batch-overwrite first/last semantics") {
    // group g: batch1 ts in [100, 200], batch2 ts in [50, 60] (late data).
    // Faithful semantics: batch2 overwrites → first=50, last=60 (NOT 200).
    val b1 = Seq(("g", 1.0, 100L), ("g", 1.0, 200L))
      .toDF("group_id", "score", "event_timestamp")
    val b2 = Seq(("g", 1.0, 50L), ("g", 1.0, 60L))
      .toDF("group_id", "score", "event_timestamp")
    val gold1 = Aggregate.partial(b1, "group_id", "score", "event_timestamp")
      .select(col("group_id"),
        col("batch_score").as("cumulative_score"),
        col("batch_events").as("event_count"),
        lit(0.0).as("avg_score"),
        col("batch_first").as("first_event_timestamp"),
        col("batch_last").as("last_event_timestamp"))
    val row = Aggregate.fold(gold1,
      Aggregate.partial(b2, "group_id", "score", "event_timestamp"), "group_id")
      .collect().head
    assert(row.getAs[Long]("first_event_timestamp") == 50L)
    assert(row.getAs[Long]("last_event_timestamp") == 60L)
    assert(row.getAs[Long]("event_count") == 4L)

    // untouched group keeps its gold values
    val gold2 = gold1.withColumn("group_id", lit("other"))
    val rows = Aggregate.fold(gold2,
      Aggregate.partial(b2, "group_id", "score", "event_timestamp"), "group_id")
      .orderBy("group_id").collect()
    val other = rows.find(_.getString(0) == "other").get
    assert(other.getAs[Long]("first_event_timestamp") == 100L)
    assert(other.getAs[Long]("last_event_timestamp") == 200L)
  }
}
