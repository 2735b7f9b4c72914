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

  test("kafka-shaped binary payloads parse into the event schema") {
    import org.apache.spark.sql.functions.encode
    val raw = Seq(("k1", """{"id":"a","group_id":"g","score":0.5,"event_timestamp":1700000000000}"""))
      .toDF("key", "v")
      .select(encode(col("key"), "UTF-8").as("key"),
        encode(col("v"), "UTF-8").as("value"))
    val parsed = Pipeline.parseKafkaShaped(raw).collect().head
    assert(parsed.getAs[String]("id") == "a")
    assert(parsed.getAs[String]("group_id") == "g")
    assert(math.abs(parsed.getAs[Float]("score") - 0.5f) < 1e-6)
    assert(parsed.getAs[Long]("event_timestamp") == 1700000000000L)
  }

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

  test("streaming tumbling-window aggregation emits finalized windows (append mode)") {
    val input = MemoryStream[Event](4, spark, None)
    val t0 = 1700000000000L // aligned to epoch minutes
    val windowed = Pipeline.withDerived(input.toDF())
      .withWatermark("timestamp", "30 seconds")
      .groupBy(window(col("timestamp"), "1 minute").as("w"), col("group_id"))
      .agg(count(lit(1)).as("n"), sum(col("score").cast("double")).as("total"))
      .select(unix_millis(col("w.start")).as("win_start"), col("group_id"),
        col("n"), col("total"))
    val q = windowed.writeStream.outputMode("append")
      .format("memory").queryName("graft_windows").start()
    try {
      input.addData(
        ev("w1", "g1", 1.0f, t0 + 1000),
        ev("w2", "g1", 2.0f, t0 + 2000),
        ev("w3", "g2", 5.0f, t0 + 3000))
      q.processAllAvailable()
      // advance event time far enough to close the first window
      input.addData(ev("w4", "g1", 1.0f, t0 + 300000))
      q.processAllAvailable()
      val rows = spark.table("graft_windows")
        .orderBy("win_start", "group_id").collect()
      val winStart = (t0 + 1000) - ((t0 + 1000) % 60000) // minute floor
      val first = rows.filter(_.getAs[Long]("win_start") == winStart)
      assert(first.length == 2)
      val g1 = first.find(_.getAs[String]("group_id") == "g1").get
      assert(g1.getAs[Long]("n") == 2 && math.abs(g1.getAs[Double]("total") - 3.0) < 1e-9)
      val g2 = first.find(_.getAs[String]("group_id") == "g2").get
      assert(g2.getAs[Long]("n") == 1)
    } finally q.stop()
  }

  test("stateful gold via mapGroupsWithState folds across micro-batches") {
    val input = MemoryStream[graft.model.SilverRow](5, spark, None)
    val q = Pipeline.statefulGold(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_stateful_gold").start()
    try {
      input.addData(
        graft.model.SilverRow("a1", "g1", 1.0f, 100L, 0L, 0L),
        graft.model.SilverRow("a2", "g1", 2.0f, 200L, 0L, 0L))
      q.processAllAvailable()
      input.addData(
        graft.model.SilverRow("a3", "g1", 3.0f, 300L, 0L, 0L),
        graft.model.SilverRow("b1", "g2", 5.0f, 400L, 0L, 0L))
      q.processAllAvailable()
      // memory sink in update mode appends each emission; the emission
      // with the highest event_count per group is the latest state
      val rows = spark.table("graft_stateful_gold")
      val latest = rows.orderBy(col("event_count"))
        .collect().map(r => r.getAs[String]("group_id") -> r).toMap
      val g1 = latest("g1")
      assert(g1.getAs[Long]("event_count") == 3L)
      assert(math.abs(g1.getAs[Float]("cumulative_score") - 6.0f) < 1e-5)
      // faithful batch-overwrite semantics: first reflects batch 2 only
      assert(g1.getAs[Long]("first_event_timestamp") == 300L)
      assert(latest("g2").getAs[Long]("event_count") == 1L)
    } finally q.stop()
  }

  test("stream-stream interval join matches events within the time bound") {
    val t0 = 1700000000000L
    val clicks = MemoryStream[Event](6, spark, None)
    val buys = MemoryStream[Event](7, spark, None)
    val c = Pipeline.withDerived(clicks.toDF())
      .select(col("id").as("click_id"), col("group_id"),
        col("timestamp").as("click_ts"))
      .withWatermark("click_ts", "1 minute")
    val b = Pipeline.withDerived(buys.toDF())
      .select(col("id").as("buy_id"), col("group_id").as("b_group"),
        col("timestamp").as("buy_ts"))
      .withWatermark("buy_ts", "1 minute")
    val joined = c.join(b,
      col("group_id") === col("b_group") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 5 MINUTES"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_ssjoin").start()
    try {
      clicks.addData(ev("c1", "g1", 1f, t0), ev("c2", "g2", 1f, t0))
      buys.addData(
        ev("b1", "g1", 1f, t0 + 60000), // within 5 min of c1 → match
        ev("b2", "g2", 1f, t0 + 600000), // 10 min later → no match
        ev("b3", "g3", 1f, t0 + 30000)) // no click for g3 → no match
      q.processAllAvailable()
      // push watermarks forward so joins finalize
      clicks.addData(ev("c9", "g9", 1f, t0 + 1200000))
      buys.addData(ev("b9", "g8", 1f, t0 + 1200000))
      q.processAllAvailable()
      val pairs = spark.table("graft_ssjoin")
        .select(col("click_id"), col("buy_id")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(pairs == Set(("c1", "b1")))
    } finally q.stop()
  }

  test("stateful seen-set dedup processor keeps first-seen across batches") {
    val input = MemoryStream[Event](9, spark, None)
    val q = Pipeline.ttlDedup(input.toDS(), ttlMillis = 0L)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_ttl_dedup").start()
    try {
      val t0 = 1700000000000L
      input.addData(ev("d1", "g1", 1f, t0), ev("d1", "g1", 2f, t0 + 1),
        ev("d2", "g1", 3f, t0 + 2))
      q.processAllAvailable()
      input.addData(ev("d1", "g1", 4f, t0 + 3), ev("d3", "g2", 5f, t0 + 4))
      q.processAllAvailable()
      val ids = spark.table("graft_ttl_dedup")
        .select("id").as[String].collect().sorted.toSeq
      assert(ids == Seq("d1", "d2", "d3"))
    } finally q.stop()
  }

  test("transformWithState gold processor folds across micro-batches") {
    val input = MemoryStream[graft.model.SilverRow](8, spark, None)
    val q = Pipeline.statefulGoldTws(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_tws_gold").start()
    try {
      input.addData(
        graft.model.SilverRow("a1", "g1", 1.0f, 100L, 0L, 0L),
        graft.model.SilverRow("a2", "g1", 2.0f, 200L, 0L, 0L))
      q.processAllAvailable()
      input.addData(graft.model.SilverRow("a3", "g1", 3.0f, 300L, 0L, 0L))
      q.processAllAvailable()
      val latest = spark.table("graft_tws_gold").orderBy(col("event_count"))
        .collect().map(r => r.getAs[String]("group_id") -> r).toMap
      val g1 = latest("g1")
      assert(g1.getAs[Long]("event_count") == 3L)
      assert(math.abs(g1.getAs[Float]("cumulative_score") - 6.0f) < 1e-5)
    } finally q.stop()
  }

  test("compactSilver coalesces files per bucket and preserves the data") {
    val cfg = freshCfg()
    val input = MemoryStream[Event](12, spark, None)
    val q = Pipeline.startSilver(spark, input.toDF(), cfg)
    try {
      val t0 = 1700000000000L
      (1 to 3).foreach { b =>
        input.addData((1 to 20).map(k => ev(s"c$b-$k", s"g${k % 3}", 1f,
          t0 + b * 1000 + k)))
        q.processAllAvailable()
      }
    } finally q.stop()
    def files() = new java.io.File(cfg.silverPath).listFiles()
      .filter(_.getName.startsWith("minute_timestamp="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val before = spark.read.parquet(cfg.silverPath)
      .orderBy("id").collect().map(_.toString).toSeq
    val filesBefore = files()
    Pipeline.compactSilver(spark, cfg)
    val after = spark.read.parquet(cfg.silverPath)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(after == before)
    assert(files() <= filesBefore)
    assert(files() == 1) // single bucket here → exactly one file
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
