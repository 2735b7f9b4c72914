package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Schemas
import graft.ops.{Aggregate, Dedup}

/** The reference's medallion streaming pipeline, rebuilt on Structured
  * Streaming without Delta (SURVEY §2.9, §7.4):
  *
  *   raw event stream (Kafka / MemoryStream / file)
  *     → parse + derived cols (P1-P4)
  *     → watermark + dropDuplicatesWithinWatermark (T1/T2, reference
  *       silver.py:62-66)
  *     → foreachBatch insert-only MERGE into partitioned silver parquet
  *       (J1 left-anti on (minute_timestamp, id) with the dynamic IN-list
  *       bucket prune — reference silver.py:10-40)
  *   silver parquet dir
  *     → file-source stream (the Delta-CDF-insert analog: silver is
  *       insert-only, so new files ARE the inserts — SURVEY §7.4)
  *     → per-batch partial aggregate (A1) + full-outer fold into gold
  *       (A2/J2, reference gold.py:7-46)
  *   gold snapshot
  *     → serving projection with `_id` (S7/P9, reference tomongo.py:6-17)
  *
  * Exactly-once notes: silver is idempotent under micro-batch replay (the
  * MERGE key guard absorbs reprocessing — T5). The gold fold, like the
  * reference's, is at-least-once across driver crashes inside foreachBatch;
  * the checkpointed file-source offsets make replays rare, and the
  * batch-id guard [[GoldState.lastBatchId]] skips folds already applied.
  *
  * Scale notes: dedup state lives in RocksDB with changelog checkpointing
  * (reference utils.py:41-42) so the hot set stays off-heap and restarts
  * replay only the changelog tail. Silver is partitioned by
  * minute_timestamp (the liquid-clustering fallback, SURVEY §7.4) so the
  * MERGE's bucket IN-list becomes real partition pruning on the target
  * scan. The fold shuffles only per-group partials (≤ one row per
  * group_id per batch), never raw events.
  */
object Pipeline {

  final case class Config(
      baseDir: String,
      watermarkDelay: String = "30 seconds",
      triggerMs: Long = 0L) {
    def silverPath: String = s"$baseDir/silver"
    def goldPath: String = s"$baseDir/gold"
    def servePath: String = s"$baseDir/serve"
    def checkpoint(name: String): String = s"$baseDir/checkpoints/$name"
  }

  /** Session configs mirroring the reference's state-store tuning. */
  def rocksDbConfigs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true")

  /** Kafka source wiring mirroring the reference's options
    * (silver.py:45-51): subscribe + earliest offsets + per-trigger cap.
    * The spark-sql-kafka connector jar resolves at runtime (`format` is a
    * string lookup), so this compiles and ships without it; the test
    * environment drives the identical downstream pipeline from
    * MemoryStream instead (SURVEY §2.1 S1/S11).
    */
  def fromKafka(spark: SparkSession, bootstrapServers: String, topic: String,
                maxOffsetsPerTrigger: Long = 10000L): DataFrame =
    parseKafkaShaped(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
        .load())

  /** P1-P4 over a raw Kafka-shaped stream: binary key/value → parsed
    * struct → flat columns + ingest/bucket/watermark columns.
    * (reference silver.py:54-62)
    */
  def parseKafkaShaped(raw: DataFrame): DataFrame =
    raw.select(col("value").cast("string").as("value"))
      .withColumn("json", from_json(col("value"), Schemas.eventSchema))
      .select("json.*") // flat Event columns; startSilver derives the rest

  /** Same derivations when the stream is already typed (MemoryStream). */
  def withDerived(events: DataFrame): DataFrame =
    events
      .withColumn("ingest_timestamp", unix_timestamp(current_timestamp()))
      .withColumn("minute_timestamp",
        (col("event_timestamp") / lit(1000) / lit(180)).cast("long"))
      .withColumn("timestamp",
        (col("event_timestamp") / lit(1000)).cast("timestamp"))

  /** Stage 1: raw → watermark dedup → insert-only MERGE into silver. */
  def startSilver(spark: SparkSession, raw: DataFrame, cfg: Config): StreamingQuery = {
    val deduped = withDerived(raw)
      .withWatermark("timestamp", cfg.watermarkDelay)
      .dropDuplicatesWithinWatermark("id")
      .drop("timestamp")
    deduped.writeStream
      .queryName("graft_silver")
      .option("checkpointLocation", cfg.checkpoint("silver"))
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(cfg.triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeToSilver(spark, batch, cfg)
      }
      .start()
  }

  /** J1: anti-join the batch against the already-written buckets only
    * (dynamic IN-list prune → parquet partition pruning), then append.
    * Idempotent per (minute_timestamp, id).
    */
  def mergeToSilver(spark: SparkSession, batch: DataFrame, cfg: Config): Unit = {
    val out = new Path(cfg.silverPath)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // within-batch uniqueness: hash-dedup suffices (and costs no sort) —
    // the upstream dropDuplicatesWithinWatermark already guarantees it in
    // the streaming path; duplicate-id rows are identical payloads. For a
    // deterministic tie-break on conflicting payloads use
    // Dedup.latestPerKey at the call site instead.
    val batchDedup = batch.dropDuplicates("minute_timestamp", "id")
    val fresh =
      if (!fs.exists(out)) batchDedup
      else {
        // P10: collect the touched buckets, prune the target scan to them
        val buckets = batchDedup.select("minute_timestamp").distinct()
          .collect().map(_.getLong(0)).toSeq
        val existing = spark.read
          .schema(Schemas.silverSchema)
          .parquet(cfg.silverPath)
          .filter(col("minute_timestamp").isin(buckets: _*))
        Dedup.insertOnlyMerge(batchDedup, existing, "minute_timestamp", "id",
          Some(buckets))
      }
    // cluster the append by bucket so each micro-batch lands ~one file
    // per bucket instead of shuffle-partitions × buckets small files —
    // keeps the per-batch target re-scan (and 100 TB compaction debt) flat
    fresh.select(Schemas.silverSchema.fieldNames.map(col): _*)
      .repartition(col("minute_timestamp"))
      .write.mode("append").partitionBy("minute_timestamp")
      .parquet(cfg.silverPath)
  }

  /** Compaction (the OPTIMIZE analog, reference utils.py:111-124): each
    * silver bucket's accumulated micro-batch files rewritten as one, via
    * an atomic directory swap. The 1M-event soak shows why: the MERGE's
    * target re-scan decays as small files accumulate. Run out-of-band
    * (between or alongside batches — the swap is a rename).
    */
  def compactSilver(spark: SparkSession, cfg: Config): Unit = {
    val dir = new Path(cfg.silverPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    val tmp = new Path(cfg.silverPath + "_compacting")
    spark.read.schema(Schemas.silverSchema).parquet(cfg.silverPath)
      .repartition(col("minute_timestamp"))
      .write.mode("overwrite").partitionBy("minute_timestamp")
      .parquet(tmp.toString)
    fs.delete(dir, true)
    fs.rename(tmp, dir)
  }

  /** Stage 2: silver files as a stream (insert-only ⇒ new files are the
    * change feed) → per-batch partial agg → fold into the gold snapshot.
    */
  def startGold(spark: SparkSession, cfg: Config): StreamingQuery = {
    val silver = spark.readStream
      .schema(Schemas.silverSchema)
      .option("maxFilesPerTrigger", 50)
      .parquet(cfg.silverPath)
    silver.writeStream
      .queryName("graft_gold")
      .option("checkpointLocation", cfg.checkpoint("gold"))
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(cfg.triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldToGold(spark, batch, batchId, cfg)
      }
      .start()
  }

  /** A2/J2 with the faithful batch-overwrite first/last semantics, plus
    * `updated_at` (excluded from any oracle compare). The snapshot swap is
    * write-new → atomic rename, and a batch-id marker makes replays no-ops.
    */
  def foldToGold(spark: SparkSession, batch: DataFrame, batchId: Long,
                 cfg: Config): Unit = {
    val goldDir = new Path(cfg.goldPath)
    val fs = goldDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (GoldState.lastBatchId(fs, cfg) >= batchId) return // replayed batch
    val partial = Aggregate.partial(batch, "group_id", "score", "event_timestamp")
    val folded =
      if (!fs.exists(goldDir)) {
        partial.select(col("group_id"),
          col("batch_score").as("cumulative_score"),
          col("batch_events").as("event_count"),
          (col("batch_score").cast("double") / col("batch_events")).as("avg_score"),
          col("batch_first").as("first_event_timestamp"),
          col("batch_last").as("last_event_timestamp"))
      } else {
        val gold = spark.read.parquet(cfg.goldPath)
          .drop("updated_at")
        Aggregate.fold(gold, partial, "group_id")
      }
    val out = folded
      .withColumn("cumulative_score", col("cumulative_score").cast("double"))
      .withColumn("updated_at",
        (unix_timestamp(current_timestamp()) * 1000).cast("long"))
    val tmp = new Path(cfg.goldPath + s"_tmp_$batchId")
    out.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(goldDir)) fs.delete(goldDir, true)
    fs.rename(tmp, goldDir)
    GoldState.writeBatchId(fs, cfg, batchId)
  }

  /** Alternative gold path: per-group running aggregates held in the
    * state store via mapGroupsWithState — no snapshot rewrite per batch,
    * update-mode emission of exactly the touched groups. This is the
    * pure-streaming formulation of the reference's MERGE fold (state =
    * the gold row; the fold arithmetic is identical to [[Aggregate.fold]],
    * including the faithful batch-overwrite first/last semantics).
    *
    * Scale notes: state is one small row per group_id in RocksDB,
    * partitioned by the shuffle on group_id; a 100 TB keyspace shards
    * across executors with no global rewrite — the trade against
    * [[startGold]] is that serving reads need a changelog sink (update
    * stream) instead of a self-contained snapshot directory.
    */
  def statefulGold(events: org.apache.spark.sql.Dataset[graft.model.SilverRow])
      : org.apache.spark.sql.Dataset[graft.model.GoldRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._
    events.groupByKey(_.group_id)
      .mapGroupsWithState[graft.model.GoldRow, graft.model.GoldRow](
        GroupStateTimeout.NoTimeout()) {
        case (gid, rows, state: GroupState[graft.model.GoldRow]) =>
          var cum = 0.0
          var cnt = 0L
          var first = Long.MaxValue
          var last = Long.MinValue
          rows.foreach { r =>
            cum += r.score.toDouble
            cnt += 1
            if (r.event_timestamp < first) first = r.event_timestamp
            if (r.event_timestamp > last) last = r.event_timestamp
          }
          val prev = state.getOption
          val newCum = prev.map(_.cumulative_score.toDouble).getOrElse(0.0) + cum
          val newCnt = prev.map(_.event_count).getOrElse(0L) + cnt
          val row = graft.model.GoldRow(gid,
            newCum.toFloat, newCnt, (newCum / newCnt).toFloat,
            first, last, System.currentTimeMillis())
          state.update(row)
          row
      }
  }

  /** The same running-gold fold on Spark 4's transformWithState API — a
    * [[org.apache.spark.sql.streaming.StatefulProcessor]] with explicit
    * ValueState (RocksDB-only, composable with TTL/timers for state
    * hygiene at scale; mapGroupsWithState offers neither).
    */
  class GoldProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, graft.model.SilverRow, graft.model.GoldRow] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[graft.model.GoldRow] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[graft.model.GoldRow]("gold",
        org.apache.spark.sql.Encoders.product[graft.model.GoldRow],
        TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[graft.model.SilverRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[graft.model.GoldRow] = {
      var cum = 0.0
      var cnt = 0L
      var first = Long.MaxValue
      var last = Long.MinValue
      rows.foreach { r =>
        cum += r.score.toDouble
        cnt += 1
        if (r.event_timestamp < first) first = r.event_timestamp
        if (r.event_timestamp > last) last = r.event_timestamp
      }
      if (cnt == 0) Iterator.empty
      else {
        val prev = Option(state.get())
        val newCum = prev.map(_.cumulative_score.toDouble).getOrElse(0.0) + cum
        val newCnt = prev.map(_.event_count).getOrElse(0L) + cnt
        val row = graft.model.GoldRow(key, newCum.toFloat, newCnt,
          (newCum / newCnt).toFloat, first, last, System.currentTimeMillis())
        state.update(row)
        Iterator.single(row)
      }
    }
  }

  /** First-seen-wins dedup with an explicit processing-time TTL on the
    * seen-set — the transformWithState alternative to
    * dropDuplicatesWithinWatermark when the horizon should be operational
    * (state budget) rather than event-time. State is one boolean per id in
    * RocksDB, expired by TTL without any watermark coupling.
    */
  class SeenDedupProcessor(ttlMillis: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, graft.model.Event, graft.model.Event] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        org.apache.spark.sql.Encoders.scalaBoolean,
        if (ttlMillis > 0) new TTLConfig(java.time.Duration.ofMillis(ttlMillis))
        else TTLConfig.NONE)

    override def handleInputRows(id: String,
        rows: Iterator[graft.model.Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[graft.model.Event] = {
      if (seen.exists() || rows.isEmpty) Iterator.empty
      else {
        seen.update(true)
        Iterator.single(rows.next())
      }
    }
  }

  /** Dedup a typed event stream by id. `ttlMillis > 0` bounds the
    * seen-set with a processing-time TTL (the engine then schedules
    * batches continuously to advance TTL time — fine under a real
    * trigger, but synchronous processAllAvailable-style tests should use
    * `ttlMillis = 0`, unbounded state).
    */
  def ttlDedup(events: org.apache.spark.sql.Dataset[graft.model.Event],
               ttlMillis: Long): org.apache.spark.sql.Dataset[graft.model.Event] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    val mode = if (ttlMillis > 0)
      org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
    else org.apache.spark.sql.streaming.TimeMode.None()
    events.groupByKey(_.id)
      .transformWithState(new SeenDedupProcessor(ttlMillis),
        mode, OutputMode.Append())
  }

  /** [[statefulGold]] on the transformWithState API. */
  def statefulGoldTws(events: org.apache.spark.sql.Dataset[graft.model.SilverRow])
      : org.apache.spark.sql.Dataset[graft.model.GoldRow] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.group_id)
      .transformWithState(new GoldProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Stage 3: gold snapshot → serving shape (`_id` = group key), the
    * Mongo-sink analog (S7/P9). Batch projection over the snapshot.
    */
  def serveProjection(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(cfg.goldPath)
      .withColumn("_id", col("group_id"))

  /** Tiny marker for gold-fold replay protection. */
  private object GoldState {
    def markerPath(cfg: Config) = new Path(cfg.baseDir + "/gold_batch_id")
    def lastBatchId(fs: org.apache.hadoop.fs.FileSystem, cfg: Config): Long = {
      val p = markerPath(cfg)
      if (!fs.exists(p)) -1L
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in).mkString.trim.toLong
        finally in.close()
      }
    }
    def writeBatchId(fs: org.apache.hadoop.fs.FileSystem, cfg: Config,
                     id: Long): Unit = {
      val out = fs.create(markerPath(cfg), true)
      try out.write(id.toString.getBytes("UTF-8"))
      finally out.close()
    }
  }
}
