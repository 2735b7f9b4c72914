package graft

import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite

/** The automatic range-join rewrite (plans.RangeJoinRewrite): a naive
  * BETWEEN join must plan as a bucketed equi-join when the rule is
  * installed and the width conf is set, with results identical to both
  * the naive nested-loop join and the hand-bucketed ops.RangeJoin.
  */
class RangeJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  RangeJoinRewrite.install(spark)

  private def withWidth[A](w: Long)(body: => A): A = {
    spark.conf.set(RangeJoinRewrite.widthKey, w.toString)
    try body finally spark.conf.unset(RangeJoinRewrite.widthKey)
  }

  // points 0..999 at step 7; intervals of assorted lengths incl. boundary
  // endpoints and an empty-range guard (lo == hi)
  private lazy val pts = (0L until 1000L by 7L).toDF("p")
  private lazy val ivs = Seq(
    (1L, 0L, 100L), (2L, 95L, 105L), (3L, 700L, 700L),
    (4L, 650L, 980L), (5L, 981L, 999L))
    .toDF("iv_id", "lo", "hi")

  private def naive = pts.crossJoin(ivs)
    .filter(col("p") >= col("lo") && col("p") <= col("hi"))
    .select("p", "iv_id").orderBy("p", "iv_id")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("rewrite fires: plan is an equi-join, not a nested loop") {
    withWidth(64L) {
      val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      val phys = joined.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") &&
        !phys.contains("CartesianProduct"), phys)
      assert(phys.contains("HashJoin") || phys.contains("SortMergeJoin"), phys)
    }
  }

  test("rewritten results equal the naive join, each pair exactly once") {
    val expected = naive
    assert(expected.nonEmpty)
    withWidth(64L) {
      val got = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("p", "iv_id").orderBy("p", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected)
    }
  }

  test("BETWEEN syntax and reversed operand order both match") {
    val expected = naive
    withWidth(100L) {
      pts.createOrReplaceTempView("pts_v")
      ivs.createOrReplaceTempView("ivs_v")
      val sql = spark.sql(
        "SELECT p, iv_id FROM pts_v JOIN ivs_v ON p BETWEEN lo AND hi")
      assert(!sql.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(sql.orderBy("p", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == expected)
      val rev = pts.join(ivs, col("lo") <= col("p") && col("hi") >= col("p"))
        .select("p", "iv_id").orderBy("p", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rev == expected)
    }
  }

  // intervals for the OVERLAP pattern: assorted lengths, touching
  // endpoints, containment, disjoint
  private lazy val ivsB = Seq(
    (11L, 50L, 150L), (12L, 100L, 100L), (13L, 990L, 1200L),
    (14L, 0L, 49L), (15L, 600L, 1000L))
    .toDF("b_id", "b_lo", "b_hi")

  test("overlap pattern: naive interval-overlap join rewrites to a " +
    "bucketed equi-join, each pair exactly once, results equal naive") {
    withWidth(64L) {
      val a = ivs.select(col("iv_id").as("a_id"), col("lo").as("a_lo"),
        col("hi").as("a_hi"))
      val joined = a.join(ivsB,
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      val phys = joined.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") &&
        !phys.contains("CartesianProduct"), phys)
      val got = joined.select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size == got.distinct.size, "a pair was emitted twice")
      val expected = a.crossJoin(ivsB)
        .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.toSet == expected)
      // agrees with the hand-bucketed form
      val hand = graft.ops.RangeJoin.intervalOverlap(a, ivsB,
          "a_lo", "a_hi", "b_lo", "b_hi", 64L)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.toSet == hand)
    }
  }

  test("off by default; equi-join conjunct disables the rewrite") {
    // width unset → naive plan survives (rule is a no-op)
    val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    withWidth(64L) {
      // a cross-side equality key → stock equi-join planning, no Generate
      val eq = pts.join(ivs,
        col("p") === col("iv_id") && col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!eq.queryExecution.optimizedPlan.toString.contains("Generate"))
    }
  }

  test("a NON-long equi conjunct also disables the rewrite") {
    withWidth(64L) {
      // string equality key + range band: the stock planner already makes
      // this an equi-join with a residual filter — the rewrite would only
      // add an interval explode and a second join key for nothing
      val ptsK = pts.withColumn("k", concat(lit("g"), (col("p") % 3).cast("string")))
      val ivsK = ivs.withColumn("k2", concat(lit("g"), (col("iv_id") % 3).cast("string")))
      val eq = ptsK.join(ivsK,
        col("k") === col("k2") && col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!eq.queryExecution.optimizedPlan.toString.contains("Generate"),
        eq.queryExecution.optimizedPlan.toString)
      // and it still plans as a hash/sort-merge equi-join on the string key
      val phys = eq.queryExecution.executedPlan.toString
      assert(phys.contains("HashJoin") || phys.contains("SortMergeJoin"), phys)
    }
  }

  test("outer range joins are left untouched (inner-only rewrite)") {
    withWidth(64L) {
      val outer = pts.join(ivs,
        col("p") >= col("lo") && col("p") <= col("hi"), "left_outer")
      // no Generate = no rewrite; and the outer semantics stay correct
      assert(!outer.queryExecution.optimizedPlan.toString.contains("Generate"))
      val unmatched = outer.filter(col("iv_id").isNull).count()
      val expectedUnmatched = pts.count() -
        naive.map(_._1).distinct.size
      assert(unmatched == expectedUnmatched)
    }
  }

  test("agrees with the hand-bucketed ops.RangeJoin") {
    withWidth(50L) {
      val auto = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("p", "iv_id").orderBy("p", "iv_id").collect().toSeq
      val hand = graft.ops.RangeJoin
        .pointInInterval(pts, ivs, "p", "lo", "hi", 50L)
        .select("p", "iv_id").orderBy("p", "iv_id").collect().toSeq
      assert(auto == hand)
    }
  }
}
