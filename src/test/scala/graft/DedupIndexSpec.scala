package graft

import org.apache.spark.sql.functions._

import graft.ext.TextDedup

/** The standing corpus dedup index (VERDICT r6 next-round #2): admission
  * against the persisted band/shingle tables must equal the recompute
  * form, and the append path must keep that equality as admitted waves
  * join the corpus.
  */
class DedupIndexSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def dropIndex(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${TextDedup.bandsTable(dir)}")
    spark.sql(s"DROP TABLE IF EXISTS ${TextDedup.shinglesTable(dir)}")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("indexed admission equals the recompute form") {
    dropIndex()
    try {
      val recomputed = rows(TextDedup.incrementalDedup(spark, dir, 0.5))
      val indexed = rows(TextDedup.incrementalDedupIndexed(spark, dir, 0.5))
      assert(indexed.nonEmpty && indexed == recomputed)
    } finally dropIndex()
  }

  test("append path: wave-2 admission against the appended index equals " +
    "recompute over the enlarged corpus") {
    dropIndex()
    try {
      val docs = TextDedup.documents(spark, dir)
      val corpus = docs.filter(col("doc_id") % 10 < 8)
      val wave1 = docs.filter(col("doc_id") % 10 === 8)
      val wave2 = docs.filter(col("doc_id") % 10 === 9)

      // admit wave 1 against the standing corpus, append its keepers —
      // MATERIALIZED before the append: the verdict frame is lazy, and
      // re-evaluating it after wave 1 joins the index would have every
      // wave-1 doc match itself (keep = false across the board)
      val v1 = TextDedup.admitIndexed(spark, dir, wave1, 0.5)
      val kept1 = wave1.join(
        v1.filter(col("keep")).select(col("doc_id")), Seq("doc_id"))
        .localCheckpoint(true)
      TextDedup.appendToDedupIndex(spark, dir, kept1)

      // wave 2 against the appended index == recompute where the corpus
      // is (standing corpus ∪ wave-1 keepers); buckets at this SF sit far
      // below maxBucket, so the append cap policy cannot diverge
      val viaIndex = rows(TextDedup.admitIndexed(spark, dir, wave2, 0.5))
      val viaRecompute = rows(
        TextDedup.admit(corpus.unionByName(kept1), wave2, 0.5))
      assert(viaIndex.nonEmpty && viaIndex == viaRecompute)

      // and the appended shingle store really carries the wave-1 keepers
      val stored = spark.table(TextDedup.shinglesTable(dir))
        .filter(col("doc_id") % 10 === 8).count()
      assert(stored == kept1.count())
    } finally dropIndex()
  }

  test("index build streams the corpus through the saved shingle table — " +
    "band-build plan is scan-rooted, no checkpoint/ExistingRDD node") {
    dropIndex()
    try {
      TextDedup.ensureDedupIndex(spark, dir)
      val build = TextDedup.cappedBandRows(
        spark.table(TextDedup.shinglesTable(dir)))
      val plan = build.queryExecution.executedPlan.toString
      assert(!plan.contains("ExistingRDD") && !plan.contains("Scan rdd"),
        s"band build must read the saved table, not a checkpointed corpus:\n$plan")
      assert(plan.contains("FileScan") || plan.contains("Scan parquet"),
        s"band build must scan the bucketed shingle table:\n$plan")
      // and the built band table is exactly the capped recompute over
      // the stored shingles — write-through changed the plan, not rows
      val built = rows(spark.table(TextDedup.bandsTable(dir))
        .orderBy(col("band"), col("band_hash"), col("doc_id")))
      val recomputed = rows(
        build.orderBy(col("band"), col("band_hash"), col("doc_id")))
      assert(built.nonEmpty && built == recomputed)
    } finally dropIndex()
  }
}
