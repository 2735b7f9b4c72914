package graft

import java.nio.file.Files
import java.util.UUID

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Event
import graft.streaming.Pipeline

/** End-to-end golden test (SURVEY §5.5) with a seeded generator mirroring
  * the reference's producer semantics (publish_daemon.rs:78-147): N
  * workers, one deterministic seeded group_id each, uniform [0,1) scores,
  * monotone timestamps — streamed through silver→gold in several
  * micro-batches with injected duplicates, then compared against the
  * one-shot batch aggregation of the same (unique) events. Also restarts
  * the silver query from its checkpoint mid-stream to exercise recovery.
  */
class GoldenPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def generate(seed: Long, workers: Int, perWorker: Int): Seq[Event] = {
    val rnd = new Random(seed)
    val t0 = 1700000000000L
    (0 until workers).flatMap { w =>
      val groupId = new UUID(seed, w.toLong).toString // seeded, per-worker
      (0 until perWorker).map { k =>
        Event(UUID.nameUUIDFromBytes(s"$seed:$w:$k".getBytes).toString,
          groupId, rnd.nextFloat(), t0 + k * 1000L + w)
      }
    }.sortBy(_.event_timestamp) // stream arrives in event-time order
  }

  test("seeded generator → silver → gold equals one-shot batch aggregation, across a checkpoint restart") {
    val cfg = Pipeline.Config(Files.createTempDirectory("graft_golden").toString)
    val events = generate(seed = 42L, workers = 5, perWorker = 40)
    val (half1, half2) = events.splitAt(events.size / 2)
    // inject duplicates: re-send a recent slice of half1 (within the 30 s
    // watermark horizon, so lateness doesn't mask the dedup path) inside
    // and across batches
    val dupes = half1.takeRight(15)

    val input = MemoryStream[Event](10, spark, None)
    val q1 = Pipeline.startSilver(spark, input.toDF(), cfg)
    input.addData(half1 ++ dupes.take(7))
    q1.processAllAvailable()
    q1.stop()

    // restart on the same source from the same checkpoint — offsets and
    // dedup state must recover
    input.addData(dupes ++ half2) // cross-restart duplicates + the rest
    val q2 = Pipeline.startSilver(spark, input.toDF(), cfg)
    q2.processAllAvailable()
    q2.stop()

    val goldQ = Pipeline.startGold(spark, cfg)
    goldQ.processAllAvailable()
    goldQ.stop()

    val got = Pipeline.serveProjection(spark, cfg)
      .select(col("group_id"), col("cumulative_score"), col("event_count"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

    // mirror the engine's exact-decimal sum semantics
    val expected = events.toDF()
      .groupBy(col("group_id"))
      .agg(sum(col("score").cast(
          org.apache.spark.sql.types.DecimalType(27, 4)))
        .cast("double").as("cum"),
        count(lit(1)).as("cnt"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

    assert(got.keySet == expected.keySet)
    expected.foreach { case (g, (cum, cnt)) =>
      assert(got(g)._2 == cnt, s"event_count for $g")
      assert(math.abs(got(g)._1 - cum) < 1e-9, s"cumulative_score for $g")
    }
  }
}
