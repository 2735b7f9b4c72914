package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule that rescues naive range-predicate joins — rung (c) of
  * the custom-operator ladder, automating what [[graft.ops.RangeJoin]]
  * does by hand.
  *
  * A user writing `points JOIN intervals ON p BETWEEN lo AND hi` (no
  * equality conjunct) gets BroadcastNestedLoopJoin from the stock
  * planner: O(points × intervals) with no partition parallelism on the
  * streamed side — unrunnable at 100 TB. This rule rewrites the logical
  * Join into the bucketed form *before* planning:
  *
  *   - point side gains `bucket(p) = floor(p / width)` (one bucket per
  *     point);
  *   - interval side is exploded over `sequence(bucket(lo), bucket(hi))`
  *     (~`len/width + 1` rows per interval);
  *   - the join becomes an EQUI-join on the bucket, keeping the original
  *     range predicate as a residual re-check, so the planner picks a
  *     hash/sort-merge/broadcast join and AQE treats a hot bucket like
  *     any other skewed key.
  *
  * A point lies in exactly one bucket, so each qualifying pair matches
  * exactly once — the rewrite is result-identical (the bucket arithmetic
  * is the exact floor-div of [[graft.ops.RangeJoin.bucketOf]]).
  *
  * Fires only when `spark.graft.rangeJoin.bucketWidth` (long, in the
  * join column's own unit; 0 = off, the default) is set — bucket width
  * is a data-dependent choice (pick it near the typical interval
  * length), not something the rule can infer. Scope guards: inner join,
  * long-typed point and bounds each referencing exactly one distinct
  * side, and no existing cross-side equality conjunct (those joins
  * already plan as equi-joins with a residual range filter, which is the
  * plan this rewrite would produce anyway).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val widthKey = "spark.graft.rangeJoin.bucketWidth"

  /** Enable the rule on a running session (idempotent). For config-time
    * wiring use `spark.sql.extensions=graft.catalyst.GraftExtensions`.
    */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(this))
      exp.extraOptimizations = exp.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(widthKey, "0").toLong
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond, width).getOrElse(j)
    }
  }

  /** `floor(v / width)` exactly as [[graft.ops.RangeJoin.bucketOf]]:
    * v - pmod(v, w) is an exact multiple of w, so the double division is
    * exact for |v| < 2^53 and boundary buckets can never disagree.
    */
  private def bucketOf(v: Expression, width: Long): Expression =
    Cast(Divide(Cast(Subtract(v, Pmod(v, Literal(width))), DoubleType),
      Literal(width.toDouble)), LongType)

  /** Expression belongs wholly to one side (any type — used to detect
    * existing cross-side equality conjuncts, which disable the rewrite
    * regardless of the key's type).
    */
  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic

  /** [[refsOnly]] plus long-typed — required of the point and both bound
    * expressions, whose bucket arithmetic assumes longs.
    */
  private def refsOnlyLong(e: Expression, side: LogicalPlan): Boolean =
    refsOnly(e, side) && e.dataType == LongType

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // already an equi-join across the sides → stock planner handles it
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (refsOnly(a, left) && refsOnly(b, right)) ||
          (refsOnly(a, right) && refsOnly(b, left))
      case _ => false
    }
    if (hasEqui) return None

    // normalize `x >= y` / `y <= x` into (point-candidate, bound) pairs
    val lowers = conjuncts.collect { // p >= lo
      case GreaterThanOrEqual(p, lo) => (p, lo)
      case LessThanOrEqual(lo, p) => (p, lo)
    }
    val uppers = conjuncts.collect { // p <= hi
      case LessThanOrEqual(p, hi) => (p, hi)
      case GreaterThanOrEqual(hi, p) => (p, hi)
    }
    val band = (for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers
      if p1.semanticEquals(p2)
      sides <- sideOf(p1, lo, hi, left, right)
    } yield (p1, lo, hi, sides._1, sides._2)).headOption

    bandRewrite(j, left, right, cond, width, band)
      .orElse(overlapRewrite(j, left, right, cond, width, conjuncts))
  }

  private def bandRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                          cond: Expression, width: Long,
                          band: Option[(Expression, Expression, Expression,
                            LogicalPlan, LogicalPlan)]): Option[LogicalPlan] = {
    band.map { case (p, lo, hi, points, intervals) =>
      val bucketAlias =
        Alias(bucketOf(p, width), "__graft_bucket_p")()
      val newPoints = Project(points.output :+ bucketAlias, points)
      val ivBucket = AttributeReference("__graft_bucket_i", LongType,
        nullable = false)()
      val gen = Generate(
        Explode(Sequence(bucketOf(lo, width), bucketOf(hi, width), None,
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(ivBucket), child = intervals)
      val newCond = And(EqualTo(bucketAlias.toAttribute, ivBucket), cond)
      val (newLeft, newRight) =
        if (points eq left) (newPoints, gen) else (gen, newPoints)
      logInfo(s"rewrote range join (width=$width) to bucketed equi-join")
      // bucket columns are internal: restore the join's original schema
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }

  /** (points side, intervals side) if p lives on one side and both
    * bounds on the other.
    */
  private def sideOf(p: Expression, lo: Expression, hi: Expression,
                     left: LogicalPlan, right: LogicalPlan):
      Option[(LogicalPlan, LogicalPlan)] =
    if (refsOnlyLong(p, left) && refsOnlyLong(lo, right) && refsOnlyLong(hi, right))
      Some((left, right))
    else if (refsOnlyLong(p, right) && refsOnlyLong(lo, left) && refsOnlyLong(hi, left))
      Some((right, left))
    else None

  /** The interval-OVERLAP pattern (`l.lo <= r.hi AND r.lo <= l.hi`, each
    * bound long-typed and wholly one side's): rewrite mirrors
    * [[graft.ops.RangeJoin.intervalOverlap]] — BOTH sides exploded over
    * their covered buckets, equi-join on the two generated buckets, the
    * original predicate kept as the residual, and each qualifying pair
    * ATTRIBUTED to the later start's bucket (which overlap guarantees
    * both sides cover) so it emerges exactly once without a distinct.
    */
  private def overlapRewrite(j: Join, left: LogicalPlan,
                             right: LogicalPlan, cond: Expression,
                             width: Long,
                             conjuncts: Seq[Expression]): Option[LogicalPlan] = {
    val le = conjuncts.collect { // x <= y, either spelling
      case LessThanOrEqual(x, y) => (x, y)
      case GreaterThanOrEqual(y, x) => (x, y)
    }
    val overlap = (for {
      (lLo, rHi) <- le // l.lo <= r.hi
      (rLo, lHi) <- le // r.lo <= l.hi
      if !(lLo.semanticEquals(rLo) && rHi.semanticEquals(lHi))
      if refsOnlyLong(lLo, left) && refsOnlyLong(rHi, right) &&
        refsOnlyLong(rLo, right) && refsOnlyLong(lHi, left)
    } yield (lLo, lHi, rLo, rHi)).headOption

    overlap.map { case (lLo, lHi, rLo, rHi) =>
      val tz = Some(conf.sessionLocalTimeZone)
      val lb = AttributeReference("__graft_bucket_l", LongType,
        nullable = false)()
      val rb = AttributeReference("__graft_bucket_r", LongType,
        nullable = false)()
      val genL = Generate(
        Explode(Sequence(bucketOf(lLo, width), bucketOf(lHi, width), None, tz)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(lb), child = left)
      val genR = Generate(
        Explode(Sequence(bucketOf(rLo, width), bucketOf(rHi, width), None, tz)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rb), child = right)
      val attribution = EqualTo(lb,
        Greatest(Seq(bucketOf(lLo, width), bucketOf(rLo, width))))
      val newCond = And(And(EqualTo(lb, rb), attribution), cond)
      logInfo(s"rewrote interval-overlap join (width=$width) to " +
        "bucketed equi-join")
      Project(j.output, Join(genL, genR, Inner, Some(newCond), j.hint))
    }
  }
}
