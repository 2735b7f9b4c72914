package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Serving surface (SURVEY §2.6, S12): deterministic pagination and top-k
  * over the gold output, plus the Mongo-shaped `_id` projection (P9,
  * tomongo.py:10).
  *
  * Scale notes: `ORDER BY … LIMIT k` is planned by Spark as TakeOrderedAndProject
  * — per-partition top-k then a single driver merge of k×partitions rows; no
  * global sort. offset+limit pagination performs a global sort only of the
  * first offset+limit rows per partition — fine for serving pages, not for
  * deep offsets (at deep offsets use keyset pagination: filter key > last).
  */
object Serve {

  /** S12: paginated scan — made deterministic with an explicit total order
    * (the reference paginates Mongo natural order, route.ts:9-15; we order
    * explicitly, SURVEY §2.6).
    */
  def page(df: DataFrame, order: Seq[Column], pageNo: Int, pageSize: Int): DataFrame =
    df.orderBy(order: _*).offset((pageNo - 1) * pageSize).limit(pageSize)

  /** Top-k — planned as TakeOrderedAndProject, no full sort. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** P9: the Mongo document projection — `_id` = group key. */
  def withDocId(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("_id", col(keyCol))
}
