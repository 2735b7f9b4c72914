package graft

import graft.ext.Similarity

/** [[Similarity.AutoShape]] — corpus-size-driven blocking geometry for
  * the corpus-pair operators (the ×10 scale bench's fix: fixed shapes
  * ran dedup_embedding_lsh at 21× on 10× data and, past the maxBucket
  * cap, silently stop emitting candidates for most of a block).
  *
  * Two contracts pinned here:
  *  1. The auto rules resolve to the HISTORICAL constants (16 cells /
  *     4 planes) at every oracle-checked corpus size (sf0.001 = 20,
  *     sf0.01 = 200, sf0.1 = 2000 embeddings), so every registered
  *     query's DuckDB oracle stays shape-identical where it runs.
  *  2. Auto-shaped operator output IS the fixed-shape output at a
  *     registry SF — the sentinel changes resolution, not semantics.
  */
class AutoShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("autoCells: historical constant at oracle SFs, ~n/128 past them, " +
    "capped at sampleCap/2") {
    assert(Similarity.autoCells(20) === 16)
    assert(Similarity.autoCells(200) === 16)
    assert(Similarity.autoCells(2000) === 16)
    assert(Similarity.autoCells(2048) === 16)
    assert(Similarity.autoCells(20000) === 157)
    assert(Similarity.autoCells(200000) === 1563)
    assert(Similarity.autoCells(10000000) === 2048)
  }

  test("autoPlanes: historical constant at oracle SFs, bucket ≤ ~125 " +
    "past them") {
    assert(Similarity.autoPlanes(20) === 4)
    assert(Similarity.autoPlanes(200) === 4)
    assert(Similarity.autoPlanes(2000) === 4)
    assert(Similarity.autoPlanes(20000) === 8)
    assert(Similarity.autoPlanes(200000) === 11)
    // expected bucket population stays bounded at every size
    for (n <- Seq(2000L, 20000L, 200000L, 2000000L)) {
      val p = Similarity.autoPlanes(n)
      assert((n + (1L << p) - 1) / (1L << p) <= 125, s"n=$n p=$p")
    }
  }

  test("AutoShape output is the fixed-shape output at a registry SF") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    assert(rows(Similarity.lshNearDupPairs(spark, dir, 0.4,
        nPlanes = Similarity.AutoShape)) ===
      rows(Similarity.lshNearDupPairs(spark, dir, 0.4)))
    assert(rows(Similarity.knnGraph(spark, dir, m = 3,
        nCentroids = Similarity.AutoShape)) ===
      rows(Similarity.knnGraph(spark, dir, m = 3)))
    assert(rows(Similarity.semanticDedup(spark, dir, 0.4,
        Similarity.AutoShape)) ===
      rows(Similarity.semanticDedup(spark, dir, 0.4, 16)))
    assert(rows(Similarity.semanticClusters(spark, dir, 0.4,
        Similarity.AutoShape)) ===
      rows(Similarity.semanticClusters(spark, dir, 0.4, 16)))
    assert(rows(Similarity.clusterBalancedSample(spark, dir, nQueries = 10,
        nCentroids = Similarity.AutoShape, cap = 20)) ===
      rows(Similarity.clusterBalancedSample(spark, dir, nQueries = 10,
        nCentroids = 16, cap = 20)))
    assert(rows(Similarity.semanticThresholdSweep(spark, dir,
        nCentroids = Similarity.AutoShape)) ===
      rows(Similarity.semanticThresholdSweep(spark, dir)))
  }
}
