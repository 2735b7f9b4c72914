package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the one Structured Streaming
  * operator family the pipeline did not yet exercise. The reference
  * joins only stream-to-static (silver MERGE target, gold fold target);
  * a production event pipeline also needs stream×stream correlation —
  * the classic shape is ATTRIBUTION: every `view` matched to the
  * `purchase`s of the same group that occur within a bounded horizon
  * after it.
  *
  * Why this exact formulation scales (Spark's stream-stream join
  * contract):
  *
  *   - Both sides carry an event-time watermark, and the join condition
  *     bounds each side's event time relative to the other
  *     (`r.t ∈ [l.t, l.t + horizon]`). Spark derives a state-eviction
  *     watermark PER SIDE from that constraint — a left row is held in
  *     the join state store only until `watermark > l.t + horizon`, a
  *     right row until `watermark > r.t` — so state is bounded by the
  *     horizon × arrival rate, not by the stream's history.
  *   - Without the time bound the state grows forever (Spark accepts the
  *     inner join but can never evict); this helper therefore REQUIRES
  *     the horizon.
  *   - The join itself is a keyed symmetric hash join: both sides
  *     shuffle on the join key into the same state-store partitions —
  *     one shuffle each, the minimum any stream×stream equi-join needs.
  *
  * Outer semantics: `leftOuter` emits unmatched left rows exactly once,
  * when the watermark passes `l.t + horizon` (i.e. the row provably can
  * no longer match) — the streaming analog of "views with no attributed
  * purchase".
  *
  * Column contract: the two inputs must have DISJOINT column names
  * (rename before calling — see StreamingJoinSpec); the event-time
  * columns are epoch-millis longs. The helper adds `_lts`/`_rts`
  * timestamp columns internally and drops them from the result.
  */
object StreamingJoin {

  /** `left ⋈ right ON leftKey = rightKey AND r.t ∈ [l.t, l.t + horizonMs]`
    * with watermarks on both sides. `joinType`: `inner` or `left_outer`
    * (outer rows emit once the watermark proves no match can arrive).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTsMs: String, rightTsMs: String,
                   horizonMs: Long,
                   watermarkDelay: String = "30 seconds",
                   joinType: String = "inner"): DataFrame = {
    // timestamp_millis is the exact long→timestamp conversion — the
    // (ms / 1000).cast round-trip goes through Double and can truncate a
    // microsecond, letting a pair exactly at the horizon boundary diverge
    // from the long-arithmetic batch twin. Likewise the horizon interval
    // is emitted in integral MILLISECONDS: a Double-formatted seconds
    // literal turns into scientific notation for horizonMs ≥ 1e10 and
    // fails to parse.
    val l = left
      .withColumn("_lts", timestamp_millis(col(leftTsMs)))
      .withWatermark("_lts", watermarkDelay)
    val r = right
      .withColumn("_rts", timestamp_millis(col(rightTsMs)))
      .withWatermark("_rts", watermarkDelay)
    l.join(r,
        col(leftKey) === col(rightKey) &&
          col("_rts") >= col("_lts") &&
          col("_rts") <= col("_lts") + expr(s"INTERVAL $horizonMs MILLISECONDS"),
        joinType)
      .drop("_lts", "_rts")
  }

  /** The batch twin over static frames — identical condition, no
    * watermarks. StreamingJoinSpec pins streamed == batch on the same
    * data (the oracle relationship every streaming twin in this repo
    * maintains).
    */
  def intervalJoinBatch(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        leftTsMs: String, rightTsMs: String,
                        horizonMs: Long,
                        joinType: String = "inner"): DataFrame =
    left.join(right,
      col(leftKey) === col(rightKey) &&
        col(rightTsMs) >= col(leftTsMs) &&
        col(rightTsMs) <= col(leftTsMs) + lit(horizonMs),
      joinType)
}
