package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's batch API lacks
  * (SURVEY §2.3 lists it as absent from the reference too; it's the
  * canonical enrichment step for event streams against slowly-changing
  * reference data).
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): union both sides tagged, sort within each key by (time, side)
  * and carry the latest right-side payload forward with
  * `last(ignoreNulls)` over an unbounded-preceding frame, then keep the
  * left rows. One shuffle on the key and one in-partition sort — no
  * range-condition row explosion, no per-row binary search; exactly the
  * plan a dedicated SortMergeAsOfJoinExec would produce, so a custom
  * physical operator buys nothing here.
  *
  * Ties: a right row at the same (key, time) as a left row sorts FIRST
  * (side desc), giving inclusive `leftTime >= rightTime` semantics,
  * matching DuckDB's ASOF JOIN. Right rows must be unique per
  * (key, time) — pre-reduce with [[Dedup.latestPerKey]] otherwise.
  */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame,
               keyL: String, keyR: String,
               timeL: String, timeR: String,
               payload: Seq[String]): DataFrame =
    asOfJoinImpl(left, right, keyL, keyR, timeL, timeR, payload,
      forward = false)

  /** Forward (look-ahead) as-of: each left row takes the EARLIEST right
    * payload at `rightTime >= leftTime` — the "next scheduled event"
    * enrichment. Same single-shuffle composition, with the carry frame
    * flipped to current-row..unbounded-following and `first(ignoreNulls)`;
    * a right row at the left row's exact time qualifies (inclusive),
    * mirroring DuckDB's `ASOF JOIN ... ON l.t <= r.t`.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame,
                      keyL: String, keyR: String,
                      timeL: String, timeR: String,
                      payload: Seq[String]): DataFrame =
    asOfJoinImpl(left, right, keyL, keyR, timeL, timeR, payload,
      forward = true)

  private def asOfJoinImpl(left: DataFrame, right: DataFrame,
                           keyL: String, keyR: String,
                           timeL: String, timeR: String,
                           payload: Seq[String],
                           forward: Boolean): DataFrame = {
    val lCols = left.columns.toSeq
    val lAug = payload.foldLeft(
      left.withColumn("__k", col(keyL))
        .withColumn("__t", col(timeL))
        .withColumn("__side", lit(0))) { (df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType))
    }
    val rAug = lCols.foldLeft(
      right.withColumn("__k", col(keyR))
        .withColumn("__t", col(timeR))
        .withColumn("__side", lit(1))) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (Seq("__k", "__t", "__side") ++ lCols ++
      payload.filterNot(lCols.contains)).distinct
    val unioned = lAug.select(cols.map(col): _*)
      .unionByName(rAug.select(cols.map(col): _*))
    // backward: right rows at equal time sort FIRST (side desc) and the
    // latest prior payload is carried forward over unbounded-preceding.
    // forward: right rows at equal time sort AFTER the left row (side
    // asc) and the earliest following payload is pulled back over
    // unbounded-following. Both give inclusive equal-time semantics.
    val filled =
      if (forward) {
        val w = Window.partitionBy(col("__k"))
          .orderBy(col("__t").asc, col("__side").asc)
          .rowsBetween(0, Window.unboundedFollowing)
        payload.foldLeft(unioned) { (df, p) =>
          df.withColumn(p, first(col(p), ignoreNulls = true).over(w))
        }
      } else {
        val w = Window.partitionBy(col("__k"))
          .orderBy(col("__t").asc, col("__side").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        payload.foldLeft(unioned) { (df, p) =>
          df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
        }
      }
    filled.filter(col("__side") === 0).drop("__k", "__t", "__side")
  }

  /** Staleness tolerance (pandas `merge_asof(tolerance=...)`): applied
    * AFTER the join, a match older than `tol` time units counts as NO
    * match — every payload column (which must include the matched right
    * time `timeR`) nulls out together. A pure projection over the
    * joined frame: the single-shuffle join plan is untouched, and the
    * one gap test is computed before any payload is overwritten so the
    * columns cannot null out inconsistently.
    */
  def withTolerance(joined: DataFrame, timeL: String, timeR: String,
                    payload: Seq[String], tol: Long): DataFrame = {
    require(payload.contains(timeR),
      s"withTolerance: payload must include the matched right time $timeR")
    val stale = col(timeR).isNull || (col(timeL) - col(timeR) > tol)
    payload.foldLeft(joined.withColumn("__stale", stale)) { (df, p) =>
      df.withColumn(p, when(col("__stale"),
        lit(null).cast(joined.schema(p).dataType)).otherwise(col(p)))
    }.drop("__stale")
  }
}
