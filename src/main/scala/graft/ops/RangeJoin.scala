package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second temporal-join operator Spark's
  * batch API lacks (the first, as-of, is [[AsOf]]). Naively a range
  * predicate forces BroadcastNestedLoopJoin (O(points × intervals) with no
  * partition parallelism on the streamed side) — the classic 100 TB
  * scale-killer for "events inside windows" queries.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder) with the standard binning technique: pick a bucket width,
  * assign each point its single bucket `floor(p / width)`, explode each
  * interval into the buckets it covers, equi-join on the bucket, and
  * re-check the exact range predicate. Because a point lives in exactly
  * ONE bucket, each matching (point, interval) pair joins exactly once —
  * no post-join dedup. The plan is a plain hash/broadcast equi-join:
  * shuffles only bucket ids + join keys, parallelizes on both sides, and
  * AQE handles a skewed (hot) bucket like any other skewed join key.
  *
  * Cost model: only the interval side expands, by `len/width + 1` rows per
  * interval — choose `width` near the typical interval length so the
  * expansion factor stays ~2. A degenerate month-long interval at a
  * 1-hour width costs 720 rows — linear, bounded, and visible, vs. the
  * nested-loop's O(n) work per such interval.
  *
  * Precondition: `lo <= hi` for every interval (callers filter or fix
  * inverted intervals first) and |values| < 2^53 (epoch-millis are < 2^41
  * for the next few millennia). Bucket ids come from an exact floor-div:
  * `(v - pmod(v, width)) / width` — the dividend is an exact multiple of
  * `width`, so the double division is exact and points and interval
  * endpoints can never disagree on a boundary bucket.
  */
object RangeJoin {

  /** Exact floor-division bucket id of a long-valued column. */
  private[graft] def bucketOf(c: Column, width: Long): Column = {
    val v = c.cast("long")
    ((v - pmod(v, lit(width))) / lit(width)).cast("long")
  }

  /** Inner-join `points` to every interval in `intervals` with
    * `lo <= point <= hi` (inclusive both ends, matching SQL BETWEEN).
    * Output columns = points' ++ intervals' (names must not collide —
    * alias beforehand). `bucketWidth` is in the value's own unit.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol), bucketWidth))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol), bucketWidth),
        bucketOf(col(hiCol), bucketWidth))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join (`a.lo <= b.hi AND b.lo <= a.hi`,
    * inclusive) — the shape [[pointInInterval]] cannot state, and the
    * third temporal join Spark's batch API lacks. Same binning technique,
    * both sides exploded into their covered buckets; an overlapping pair
    * shares every bucket between the later start and the earlier end, so
    * the join would emit it once per shared bucket — instead of a
    * pair-wide `distinct` (a full extra shuffle of the output), each pair
    * is ATTRIBUTED to exactly one bucket: the later interval's start
    * bucket, which overlap guarantees both sides cover. The plan stays a
    * plain equi-join plus two scan-local filters; expansion cost is
    * `len/width + 1` rows per interval per side.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val a = left.withColumn("__bucket",
      explode(sequence(bucketOf(col(lLo), bucketWidth),
        bucketOf(col(lHi), bucketWidth))))
    val b = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(rLo), bucketWidth),
        bucketOf(col(rHi), bucketWidth))))
    a.join(b, Seq("__bucket"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bucket") === greatest(
        bucketOf(col(lLo), bucketWidth), bucketOf(col(rLo), bucketWidth)))
      .drop("__bucket")
  }

  /** [[intervalOverlap]] with the per-left-row fan-out BOUNDED at
    * `cap` — the rank-capped form a real deployment runs at scale
    * (VERDICT r15 next #7): overlap joins multiply pairs with traffic
    * density (the ×10 run measured the uncapped family 10–12×, genuine
    * pair multiplication; at ×100 the same density math multiplies
    * another 10×), and the LSH-bucket move — cap membership before the
    * multiplication can run away — applies verbatim. Each LEFT interval
    * (identified by `leftKeys`) keeps its first `cap` matches that pass
    * `pairFilter`, ranked by `rightOrder` (pass a deterministic total
    * order — e.g. right start then right key — so the kept set is
    * stable across runs and engines). The rank is a row_number window
    * ≤ cap, so Spark inserts WindowGroupLimit(Partial) BEFORE the
    * exchange: each input partition forwards at most `cap` rows per
    * left key and the shuffle is bounded by cap × keys, never by the
    * raw pair count — the plan property that makes the cap a scale
    * guarantee rather than a post-hoc filter.
    */
  def intervalOverlapCapped(left: DataFrame, right: DataFrame,
                            lLo: String, lHi: String, rLo: String,
                            rHi: String, bucketWidth: Long,
                            leftKeys: Seq[String], rightOrder: Seq[String],
                            cap: Int,
                            pairFilter: Column = lit(true)): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(leftKeys.map(col): _*)
      .orderBy(rightOrder.map(col): _*)
    intervalOverlap(left, right, lLo, lHi, rLo, rHi, bucketWidth)
      .filter(pairFilter)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Parity oracle for tests: the same join as a cross-join + filter.
    * Never use outside tests — this is exactly the plan the bucketed form
    * exists to avoid.
    */
  private[graft] def pointInIntervalNaive(points: DataFrame, intervals: DataFrame,
                                          pointCol: String, loCol: String,
                                          hiCol: String): DataFrame =
    points.crossJoin(intervals)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))

  private[graft] def intervalOverlapNaive(left: DataFrame, right: DataFrame,
                                          lLo: String, lHi: String,
                                          rLo: String, rHi: String): DataFrame =
    left.crossJoin(right)
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
}
