package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.Event
import graft.storage.{ParquetTableFormat, TableFormat}
import graft.streaming.Pipeline

/** The format-adapter boundary (SURVEY §7.7-4) is live, not decorative:
  * a delegating spy format sees every stage-level primitive invoked when
  * the three-stage chain runs, and the chain's results are identical to
  * the direct parquet path — so a Delta implementation of the trait
  * would slot in with no pipeline edits.
  */
class TableFormatSpec extends SparkTestBase {
  import spark.implicits._

  private class SpyFormat extends TableFormat {
    val calls = new ConcurrentHashMap[String, Integer]()
    private def hit(name: String): Unit = calls.merge(name, 1, _ + _)

    override def mergeInsertOnly(s: SparkSession, b: DataFrame,
                                 c: Pipeline.Config,
                                 batchUnique: Boolean): Unit = {
      hit("mergeInsertOnly")
      ParquetTableFormat.mergeInsertOnly(s, b, c, batchUnique)
    }
    override def upsertFold(s: SparkSession, b: DataFrame, id: Long,
                            c: Pipeline.Config): Unit = {
      hit("upsertFold"); ParquetTableFormat.upsertFold(s, b, id, c)
    }
    override def streamInserts(s: SparkSession,
                               c: Pipeline.Config): DataFrame = {
      hit("streamInserts"); ParquetTableFormat.streamInserts(s, c)
    }
    override def streamChangeFeed(s: SparkSession,
                                  c: Pipeline.Config): DataFrame = {
      hit("streamChangeFeed"); ParquetTableFormat.streamChangeFeed(s, c)
    }
    override def optimize(s: SparkSession, c: Pipeline.Config): Unit = {
      hit("optimize"); ParquetTableFormat.optimize(s, c)
    }
    override def optimizeServe(s: SparkSession, c: Pipeline.Config): Unit = {
      hit("optimizeServe"); ParquetTableFormat.optimizeServe(s, c)
    }
    override def vacuumChangeFeed(s: SparkSession, c: Pipeline.Config,
                                  keep: Int): Unit = {
      hit("vacuumChangeFeed"); ParquetTableFormat.vacuumChangeFeed(s, c, keep)
    }
  }

  test("three-stage chain dispatches every storage primitive through the " +
    "TableFormat boundary and matches the direct parquet path") {
    val cfg = Pipeline.Config(
      Files.createTempDirectory("graft_fmt").toString,
      goldBuckets = 4, compactEvery = 2)
    val spy = new SpyFormat
    val input = MemoryStream[Event](41, spark, None)
    val queries = Pipeline.startAll(spark, input.toDF(), cfg, spy)
    try {
      val t0 = 1700000000000L
      (0 until 3).foreach { b =>
        input.addData((0 until 50).map(k =>
          Event(s"e$b-$k", s"g${k % 5}", 1.0f, t0 + b * 1000 + k)))
        queries.foreach(_.processAllAvailable())
      }
      spy.optimizeServe(spark, cfg)
      spy.vacuumChangeFeed(spark, cfg, 168)

      // every primitive crossed the boundary
      val expected = Seq("mergeInsertOnly", "upsertFold", "streamInserts",
        "streamChangeFeed", "optimize", "optimizeServe", "vacuumChangeFeed")
      expected.foreach(p =>
        assert(spy.calls.containsKey(p), s"$p never dispatched: ${spy.calls}"))
      // ... and the chain's output is the same gold the parquet path builds
      val gold = spark.read.parquet(cfg.goldPath)
      assert(gold.select("group_id").distinct().count() == 5)
      val total = gold.agg(org.apache.spark.sql.functions.sum("event_count"))
        .head.getLong(0)
      assert(total == 150, s"expected 150 folded events, got $total")
      val serve = Pipeline.serveSnapshot(spark, cfg)
      assert(serve.count() == 5)
    } finally queries.foreach(_.stop())
  }
}
