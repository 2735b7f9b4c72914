package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Ingest

/** Embedding similarity search over `embeddings.parquet`
  * (vec_id, embedding: array<float>, label) — SURVEY §7.6.
  *
  * Baseline: brute-force cosine top-k with a broadcast query set — the
  * exact-answer path. The candidate side streams through a codegen'd
  * projection; the only shuffle is the per-query top-k (row_number over a
  * window partitioned by query), which at scale is a partial top-k per
  * partition followed by a k-sized merge. For a 100 TB corpus the scale
  * path is LSH/IVF bucketing (same bucket-join shape as
  * [[TextDedup.candidatePairs]]) — planned as the next increment.
  *
  * Float arithmetic: embeddings are float32; both engines up-cast each
  * element to double and fold left-to-right, so dot products and norms are
  * bit-identical with the DuckDB oracle; displayed similarity is rounded
  * to 6 digits.
  */
object Similarity {

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    Ingest.table(spark, dir, "embeddings")

  /** Left-to-right double dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors of each query vector (vec_id < nQueries)
    * among the rest of the table.
    */
  def bruteForceTopK(spark: SparkSession, dir: String, nQueries: Int,
                     k: Int): DataFrame = {
    val emb = embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val sims = c.crossJoin(broadcast(q))
      .select(col("qid"), col("cid"),
        cosine(col("qe"), col("ce")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank").cast("long").as("rank"),
        round(col("sim"), 6).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }
}
