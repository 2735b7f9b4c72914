package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup surface of the reference (SURVEY §2.3 J1, §2.5 W1, §2.9 T2):
  *   - W1 latest/first-per-key window dedup (silver.py:13-18, disabled
  *     upstream but declared intent);
  *   - J1 insert-only MERGE = left-anti join on (minute_timestamp, id)
  *     with bucket pruning pushed on the target scan (silver.py:21-40);
  *   - exact whole-row dedup for the LLM-pipeline extension set.
  *
  * Scale notes: the anti-join shuffles both sides on the join keys; the
  * target side is pruned FIRST by the batch's bucket range so a 100 TB
  * target reads only the touched partitions (the reference's "Prune IN
  * List" trick, README.md:12 — here a pushed-down min/max or isin predicate
  * on the bucket column, which Catalyst turns into partition/file pruning).
  */
object Dedup {

  /** W1: keep one row per key, ordered by `order` (desc => latest-wins).
    * row_number (not rank) guarantees exactly one survivor per key.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W1 without the sort: a single hash-aggregate shuffle that keeps, per
    * key, the full row carrying the extremal `ord` value (max_by/min_by
    * with a struct ordering = lexicographic on the ordering columns).
    * Identical results to [[latestPerKey]] whenever the ordering columns
    * are unique per key — but no per-partition sort and no row_number
    * materialization, so at 100× the data this is one map-side-combined
    * exchange instead of a full sort-shuffle on a near-unique key.
    * Restriction vs the window form: the ordering columns must be all-asc
    * (`latest = false`) or all-desc (`latest = true`).
    */
  def latestPerKeyAgg(df: DataFrame, keys: Seq[String], ord: Column,
                      latest: Boolean = true): DataFrame = {
    val row = struct(df.columns.map(col): _*)
    val pick = if (latest) max_by(row, ord) else min_by(row, ord)
    df.groupBy(keys.map(col): _*).agg(pick.as("__r")).select(col("__r.*"))
  }

  /** J1: insert-only MERGE emulation. Rows of `batch` whose
    * (bucketCol, idCol) already exist in `target` are discarded; the
    * survivors are the rows a Delta MERGE whenNotMatchedInsertAll would
    * append. `target` is pruned with the batch's bucket values before the
    * join — on a partitioned/clustered table this becomes partition
    * pruning, the plain-Spark equivalent of silver.py:21-28.
    */
  def insertOnlyMerge(batch: DataFrame, target: DataFrame,
                      bucketCol: String, idCol: String,
                      bucketValues: Option[Seq[Any]] = None): DataFrame = {
    val pruned = bucketValues match {
      case Some(vs) => target.filter(col(bucketCol).isin(vs: _*))
      case None     => target // Catalyst DPP handles pruning via the join
    }
    batch.join(pruned.select(bucketCol, idCol),
      Seq(bucketCol, idCol), "left_anti")
  }

  /** [[insertOnlyMerge]] restructured for the streaming hot path, where
    * the BATCH is the bounded side (a micro-batch of ~10⁴ rows) and the
    * target bucket can be arbitrarily large. The single left-anti above
    * can only broadcast its build side — the TARGET — so at scale it
    * degrades to a shuffle of both sides. This two-phase form broadcasts
    * the batch twice instead:
    *
    *   1. semi-probe: target buckets × broadcast(batch keys) → the keys
    *      that already exist (≤ batch size). The huge side is only
    *      STREAMED, map-side, partition-pruned — never shuffled.
    *   2. anti: batch × broadcast(dup keys) → the insertable rows.
    *
    * Identical result to [[insertOnlyMerge]] (anti vs target ≡ anti vs
    * batch∩target); zero exchanges at ANY target size.
    */
  def insertOnlyMergeSmallBatch(batch: DataFrame, target: DataFrame,
                                bucketCol: String, idCol: String,
                                bucketValues: Option[Seq[Any]] = None): DataFrame = {
    val pruned = bucketValues match {
      case Some(vs) => target.filter(col(bucketCol).isin(vs: _*))
      case None     => target
    }
    val dupKeys = pruned.select(bucketCol, idCol)
      .join(broadcast(batch.select(bucketCol, idCol)),
        Seq(bucketCol, idCol), "left_semi")
    batch.join(broadcast(dupKeys), Seq(bucketCol, idCol), "left_anti")
  }

  /** Exact dedup: one survivor per distinct value of `keyCols` —
    * hash-groupBy keeping the minimum `tieBreak` (deterministic).
    * Single shuffle on the dedup key; at 100 TB this is the canonical
    * map-side-combine groupBy, no row explosion.
    */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreak: String): DataFrame =
    latestPerKey(df, keyCols, Seq(col(tieBreak).asc))
}
