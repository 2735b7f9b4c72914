package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join strategy for repeated large joins at
  * 100 TB: both sides pre-hashed into the same bucket count on the join
  * key, so the join runs with ZERO shuffle exchanges (SURVEY §7.6 scale
  * map). This spec proves the plan shape, not just the results.
  */
class BucketingSpec extends SparkTestBase {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val ev = graft.ops.Ingest.events(spark, "/root/testdata/sf0.001")
    ev.select(col("user_id"), col("event_id"), col("value"))
      .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("graft_b1")
    ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("graft_b2")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_b1").join(spark.table("graft_b2"), "user_id")
      val n = j.count()
      assert(n == 1000) // every event row finds its per-user count
      j.collect()
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
