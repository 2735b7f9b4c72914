package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-mitigation and runtime-filter join forms.
  *
  * Spark's first-line answers to join skew and oversized shuffles are
  * configuration, not code: AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`) repartitions oversized
  * shuffle blocks at runtime, and the injected bloom runtime filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) prunes the probe
  * side before its shuffle. The two operators here are the DECLARATIVE
  * twins for the cases conf can't reach:
  *
  *   - [[saltedJoin]] — when one build-side key is hot enough that a
  *     single reducer would own it even after AQE splitting (AQE splits
  *     the probe side's blocks, but every split still joins against the
  *     whole hot build partition), salt the probe side and replicate
  *     the build side across salts: the hot key's work spreads over
  *     `salts` reducers by construction.
  *   - [[bloomPrunedJoin]] — when the dim-side filter is selective but
  *     the fact side still shuffles in full, build a bloom filter of
  *     the surviving keys (one tiny aggregate), and prune fact rows
  *     map-side BEFORE the join shuffle via a scalar-subquery bloom
  *     probe. False positives only cost shuffle bytes — the exact join
  *     afterwards removes them, so the result is bit-identical to the
  *     plain join (which is exactly what the oracle checks).
  */
object SkewJoin {

  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(27, 4))).cast("double")

  /** Salted orders⋈lineitem: lineitem (the probe/fact side) gets a
    * deterministic per-row salt (`l_linenumber % salts` — any
    * key-independent row attribute works); orders (the build side)
    * replicates each row across all `salts` values via one explode.
    * The join key becomes (orderkey, salt), so a key that would land on
    * one reducer now lands on `salts` of them. The final aggregate is
    * key-insensitive, so the salted plan's result is identical to the
    * unsalted join — the property the oracle pins.
    *
    * Cost model at 100 TB: replication multiplies the BUILD side by
    * `salts` — cheap when dims are small relative to the fact (the only
    * situation where skew hurts); the fact side's shuffle volume is
    * unchanged, just spread evenly. Keep `salts` at the small end that
    * flattens the hot key (8–16): oversalting only burns build-side IO.
    */
  def saltedJoin(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val li = Ingest.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        (col("l_linenumber") % salts).as("salt"))
    val ord = Ingest.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("salt").cast("integer").as("salt"))
    li.join(ord,
        li("l_orderkey") === ord("o_orderkey") && li("salt") === ord("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Bloom-pruned fact⋈dim: the selective dim predicate
    * (`o_orderpriority = '1-URGENT'`) survives ~20% of orders; a bloom
    * filter over their hashed keys is built by ONE tiny aggregation
    * (the scalar subquery), broadcast as a literal, and probed map-side
    * on every lineitem row before the join shuffle — rows that fail the
    * bloom never pay shuffle IO. The exact join then discards bloom
    * false positives, so the output equals the plain join's.
    *
    * This is precisely the plan Spark's own
    * `spark.sql.optimizer.runtime.bloomFilter.enabled` injects when its
    * size thresholds (10 GB probe-side scan) trigger — expressed
    * declaratively so it applies at ANY size and stays visible in the
    * plan. The bloom expressions are Spark's native codegen'd
    * `BloomFilterAggregate` / `BloomFilterMightContain`, surfaced as
    * `graft_bloom_agg` / `graft_bloom_contains`
    * ([[graft.catalyst.Functions]]) — the engine adds no sketch code of
    * its own.
    */
  def bloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.catalyst.Functions.register(spark)
    Ingest.table(spark, dir, "lineitem").createOrReplaceTempView("g_bloom_li")
    Ingest.table(spark, dir, "orders").createOrReplaceTempView("g_bloom_ord")
    spark.sql(
      """WITH dim AS (
        |  SELECT o_orderkey, o_orderpriority FROM g_bloom_ord
        |  WHERE o_orderpriority = '1-URGENT')
        |SELECT l.l_returnflag,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
        |FROM g_bloom_li l
        |JOIN dim d ON l.l_orderkey = d.o_orderkey
        |WHERE graft_bloom_contains(
        |  (SELECT graft_bloom_agg(xxhash64(o_orderkey)) FROM dim),
        |  xxhash64(l.l_orderkey))
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""".stripMargin)
  }
}
