package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDedup

/** Incremental LSH dedup: near-identical docs arriving in DIFFERENT
  * micro-batches must still be flagged as a candidate pair (the batch LSH
  * would need a full re-sweep; the stream checks each arrival against
  * bucket state).
  */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("near-dup docs across micro-batches emit a candidate pair once per shared band") {
    val input = MemoryStream[(Long, String)](20, spark, None)
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.candidatePairs(docs)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_stream_dedup").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again today"
      input.addData((1L, base), (2L, "completely different words entirely here"))
      q.processAllAvailable()
      // batch 2: a near-copy of doc 1 (one word changed at the end)
      input.addData((3L, base.replace("today", "tonight")))
      q.processAllAvailable()
      // batch 3: an exact copy of doc 1
      input.addData((4L, base))
      q.processAllAvailable()

      val pairs = spark.table("graft_stream_dedup")
        .select("d1", "d2").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 3L)), s"near-dup pair missing: $pairs")
      assert(pairs.contains((1L, 4L)) && pairs.contains((3L, 4L)),
        s"exact-dup pairs missing: $pairs")
      assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
        s"unrelated doc flagged: $pairs")
    } finally q.stop()
  }
}
