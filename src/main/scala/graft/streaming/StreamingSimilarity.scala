package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Similarity

/** Ingest-time admission into the STANDING IVF index — the embedding
  * sibling of [[StreamingDedup.startIndexedAdmission]]: each micro-batch
  * of newly embedded vectors is assigned against the frozen centroid
  * table and appended to the persisted cell table, so interleaved batch
  * searches ([[Similarity.ivfIndexedTopK]]) see stream-admitted vectors
  * and vice versa — one index, not a state-store copy.
  *
  * No verdict marker is needed here, unlike the dedup loops: admission
  * emits no per-doc decision that later appends would corrupt, and
  * [[Similarity.appendToIvfIndex]] is idempotent at vector granularity
  * (in-place anti-join on the touched buckets), so a replayed batch is
  * simply a no-op.
  */
object StreamingSimilarity {

  def startIvfAdmission(spark: SparkSession, dir: String,
                        vecs: DataFrame, checkpoint: String,
                        nQueries: Int, nCentroids: Int): StreamingQuery = {
    Similarity.ensureIvfIndex(spark, dir, nQueries, nCentroids)
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.appendToIvfIndex(spark, dir, batch, nQueries, nCentroids)
        ()
      }
      .start()
  }
}
