package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Event
import graft.streaming.Pipeline

/** Streaming-semantics tests (SURVEY §5.3): MemoryStream[Event] through
  * the watermark + dropDuplicatesWithinWatermark silver stage, the J1
  * cross-batch guard, and the chained gold fold. RocksDB state store is
  * configured session-wide in SparkTestBase.
  */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def freshCfg(): Pipeline.Config =
    Pipeline.Config(Files.createTempDirectory("graft_pipe").toString)

  private def ev(id: String, group: String, score: Float, tsMs: Long) =
    Event(id, group, score, tsMs)

  test("silver stage dedups within a batch and across batches") {
    val cfg = freshCfg()
    val input = MemoryStream[Event](1, spark, None)
    val q = Pipeline.startSilver(spark, input.toDF(), cfg)
    try {
      val t0 = 1700000000000L
      // batch 1: duplicate id within the batch
      input.addData(
        ev("a", "g1", 1.0f, t0),
        ev("a", "g1", 1.0f, t0 + 10),
        ev("b", "g1", 2.0f, t0 + 20))
      q.processAllAvailable()
      // batch 2: id "a" again (beyond state or not — the J1 anti-join must
      // catch it), plus a new id
      input.addData(
        ev("a", "g1", 1.0f, t0 + 30),
        ev("c", "g2", 3.0f, t0 + 40))
      q.processAllAvailable()

      val silver = spark.read.parquet(cfg.silverPath)
      val ids = silver.select("id").as[String].collect().sorted.toSeq
      assert(ids == Seq("a", "b", "c"), s"got $ids")
    } finally q.stop()
  }

  test("late events past the watermark are dropped by the dedup stage state, " +
    "but the merge guard still blocks re-inserts") {
    val cfg = freshCfg()
    val input = MemoryStream[Event](2, spark, None)
    val q = Pipeline.startSilver(spark, input.toDF(), cfg)
    try {
      val t0 = 1700000000000L
      input.addData(ev("x", "g1", 1.0f, t0))
      q.processAllAvailable()
      // advance event time far beyond the 30 s watermark
      input.addData(ev("y", "g1", 1.0f, t0 + 600000))
      q.processAllAvailable()
      // replay "x" way late: dedup state for it may be expired, but the
      // cross-batch anti-join (J1) must still reject it
      input.addData(ev("x", "g1", 1.0f, t0))
      q.processAllAvailable()

      val silver = spark.read.parquet(cfg.silverPath)
      assert(silver.filter(col("id") === "x").count() == 1)
    } finally q.stop()
  }

  test("silver→gold chain: gold equals one-shot aggregate of unique events") {
    val cfg = freshCfg()
    val input = MemoryStream[Event](3, spark, None)
    val silverQ = Pipeline.startSilver(spark, input.toDF(), cfg)
    try {
      val t0 = 1700000000000L
      input.addData(
        ev("e1", "g1", 1.5f, t0),
        ev("e2", "g1", 2.5f, t0 + 1000),
        ev("e3", "g2", 4.0f, t0 + 2000),
        ev("e1", "g1", 1.5f, t0)) // duplicate
      silverQ.processAllAvailable()
      input.addData(
        ev("e4", "g2", 1.0f, t0 + 3000),
        ev("e2", "g1", 2.5f, t0 + 1000)) // cross-batch duplicate
      silverQ.processAllAvailable()

      val goldQ = Pipeline.startGold(spark, cfg)
      try goldQ.processAllAvailable() finally goldQ.stop()

      val gold = Pipeline.serveProjection(spark, cfg)
        .orderBy("group_id")
        .collect()
      val byGroup = gold.map(r => r.getAs[String]("group_id") ->
        (r.getAs[Double]("cumulative_score"), r.getAs[Long]("event_count"))).toMap
      assert(byGroup("g1")._2 == 2L)
      assert(math.abs(byGroup("g1")._1 - 4.0) < 1e-6)
      assert(byGroup("g2")._2 == 2L)
      assert(math.abs(byGroup("g2")._1 - 5.0) < 1e-6)
      assert(gold.forall(r => r.getAs[String]("_id") == r.getAs[String]("group_id")))
    } finally silverQ.stop()
  }

  test("gold fold is replay-safe via the batch-id marker") {
    val cfg = freshCfg()
    val batch = Seq(("g1", 1.0f, 100L)).toDF("group_id", "score", "event_timestamp")
    Pipeline.foldToGold(spark, batch, 0L, cfg)
    Pipeline.foldToGold(spark, batch, 0L, cfg) // replay of the same batch id
    val gold = spark.read.parquet(cfg.goldPath).collect().head
    assert(gold.getAs[Long]("event_count") == 1L)
    Pipeline.foldToGold(spark, batch, 1L, cfg) // genuinely new batch
    val gold2 = spark.read.parquet(cfg.goldPath).collect().head
    assert(gold2.getAs[Long]("event_count") == 2L)
  }
}
