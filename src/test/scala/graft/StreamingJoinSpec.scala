package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Event
import graft.streaming.StreamingJoin

/** Stream-stream interval join (attribution shape): streamed results
  * must equal the batch twin on the same data, across micro-batch
  * boundaries; left-outer rows emit exactly once after the watermark
  * proves no match can arrive.
  */
class StreamingJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val horizon = 60000L // 1 minute attribution window
  private val t0 = 1700000000000L

  private def views(df: DataFrame): DataFrame =
    df.select(col("id").as("v_id"), col("group_id").as("v_group"),
      col("event_timestamp").as("v_ms"))

  private def purchases(df: DataFrame): DataFrame =
    df.select(col("id").as("p_id"), col("group_id").as("p_group"),
      col("event_timestamp").as("p_ms"))

  test("streamed interval join equals the batch twin across micro-batches") {
    val vIn = MemoryStream[Event](61, spark, None)
    val pIn = MemoryStream[Event](62, spark, None)
    val joined = StreamingJoin.intervalJoin(
      views(vIn.toDF()), purchases(pIn.toDF()),
      "v_group", "p_group", "v_ms", "p_ms", horizon)
    val q = joined.writeStream.format("memory")
      .queryName("ssj_inner").outputMode("append").start()
    try {
      // batch 1: views only
      vIn.addData(
        Event("v1", "g1", 0f, t0),
        Event("v2", "g2", 0f, t0 + 1000),
        Event("v3", "g1", 0f, t0 + 5000))
      q.processAllAvailable()
      // batch 2: purchases — p1 matches v1+v3 (in horizon), p2 matches
      // nothing (wrong group), p3 out of horizon for v2
      pIn.addData(
        Event("p1", "g1", 1f, t0 + 30000),
        Event("p2", "g9", 1f, t0 + 30000),
        Event("p3", "g2", 1f, t0 + horizon + 2000))
      q.processAllAvailable()
      // batch 3: late-ish view arriving AFTER its matching purchase —
      // the symmetric state must still match it
      vIn.addData(Event("v4", "g2", 0f, t0 + horizon + 1000))
      q.processAllAvailable()

      val streamed = spark.table("ssj_inner")
        .select("v_id", "p_id").as[(String, String)].collect().toSet
      val vAll = views(Seq(
        Event("v1", "g1", 0f, t0), Event("v2", "g2", 0f, t0 + 1000),
        Event("v3", "g1", 0f, t0 + 5000),
        Event("v4", "g2", 0f, t0 + horizon + 1000)).toDF())
      val pAll = purchases(Seq(
        Event("p1", "g1", 1f, t0 + 30000), Event("p2", "g9", 1f, t0 + 30000),
        Event("p3", "g2", 1f, t0 + horizon + 2000)).toDF())
      val batch = StreamingJoin.intervalJoinBatch(
          vAll, pAll, "v_group", "p_group", "v_ms", "p_ms", horizon)
        .select("v_id", "p_id").as[(String, String)].collect().toSet
      assert(batch == Set("v1" -> "p1", "v3" -> "p1", "v4" -> "p3"))
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched views once the watermark passes") {
    val vIn = MemoryStream[Event](63, spark, None)
    val pIn = MemoryStream[Event](64, spark, None)
    val joined = StreamingJoin.intervalJoin(
      views(vIn.toDF()), purchases(pIn.toDF()),
      "v_group", "p_group", "v_ms", "p_ms", horizon,
      watermarkDelay = "10 seconds", joinType = "left_outer")
    val q = joined.writeStream.format("memory")
      .queryName("ssj_outer").outputMode("append").start()
    try {
      vIn.addData(Event("v1", "g1", 0f, t0), Event("v2", "g2", 0f, t0))
      pIn.addData(Event("p1", "g1", 1f, t0 + 1000))
      q.processAllAvailable()
      // advance BOTH sides' watermarks far past t0 + horizon + delay so
      // v2 provably cannot match anymore (query watermark = min of sides)
      val far = t0 + horizon + 120000
      vIn.addData(Event("v9", "g9", 0f, far))
      pIn.addData(Event("p9", "g8", 1f, far))
      q.processAllAvailable()
      q.processAllAvailable() // outer rows flush on the following trigger

      val rows = spark.table("ssj_outer")
        .select(col("v_id"), col("p_id"))
        .as[(String, Option[String])].collect().toMap
      assert(rows.get("v1").contains(Some("p1")), s"got $rows")
      assert(rows.get("v2").contains(None), s"v2 should emit null-extended: $rows")
      assert(rows.size >= 2)
    } finally q.stop()
  }
}
