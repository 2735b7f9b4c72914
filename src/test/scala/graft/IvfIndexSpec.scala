package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** The standing IVF index behind `ann_ivf_indexed`: probing the
  * persisted centroid + cell tables must return exactly what the
  * per-query-assignment form computes, and a session that lost its
  * catalog entries must reattach the surviving data instead of
  * retraining/reassigning.
  */
class IvfIndexSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def purge(): Unit = Similarity.purgeIvfIndex(spark, dir)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("indexed IVF top-k equals the per-query-assignment form") {
    purge()
    try {
      val indexed = rows(Similarity.ivfIndexedTopK(spark, dir,
        nQueries = 10, nCentroids = 16, nProbe = 2, k = 3))
      val direct = rows(Similarity.ivfTopK(spark, dir,
        nQueries = 10, nCentroids = 16, nProbe = 2, k = 3))
      assert(indexed.nonEmpty && indexed == direct)
    } finally purge()
  }

  test("catalog loss reattaches the surviving IVF tables; results " +
    "unchanged") {
    purge()
    try {
      val before = rows(Similarity.ivfIndexedTopK(spark, dir,
        nQueries = 10, nCentroids = 16, nProbe = 2, k = 3))
      val cellsBefore = spark.table(Similarity.ivfCellsTable(dir)).count()
      // external tables: DROP keeps the files, like a died JVM would
      spark.sql(s"DROP TABLE ${Similarity.ivfCentsTable(dir)}")
      spark.sql(s"DROP TABLE ${Similarity.ivfCellsTable(dir)}")
      val after = rows(Similarity.ivfIndexedTopK(spark, dir,
        nQueries = 10, nCentroids = 16, nProbe = 2, k = 3))
      assert(after == before)
      assert(spark.table(Similarity.ivfCellsTable(dir)).count() == cellsBefore)
    } finally purge()
  }

  test("the probed plan searches only the probed cells — the cell table " +
    "is filtered by the probe join, never scanned into a corpus-wide " +
    "reassignment") {
    purge()
    try {
      val df = Similarity.ivfIndexedTopK(spark, dir,
        nQueries = 10, nCentroids = 16, nProbe = 2, k = 3)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // the indexed path must not contain the corpus-wide assignment's
      // per-candidate window (partitionBy cid); its only windows are the
      // per-query probe and rank
      assert(!plan.contains("windowspecdefinition(cid"),
        s"indexed query re-ran the corpus assignment:\n$plan")
    } finally purge()
  }
}
