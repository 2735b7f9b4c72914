package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the LLM-data-pipeline extension queries (SURVEY §7.6):
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
  * similarity search, text analysis, multimodal plumbing. Split from
  * SparkEntry to keep the driver contract file readable.
  */
object ExtEntry {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
