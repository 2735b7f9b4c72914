package graft

import org.apache.spark.sql.functions._

import graft.ext.TextDedup

/** The standing gram-frequency index behind `dedup_substring_admit`:
  * indexed admission must equal the recompute over (corpus ∪ batch)
  * restricted to the batch, appends must make earlier waves visible to
  * later ones (with replay a no-op), and a session that lost its
  * catalog entry must reattach the surviving data.
  */
class SubstringIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def purge(): Unit = TextDedup.purgeSubstringIndex(spark, dir)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("indexed admission equals the recompute over corpus ∪ batch, " +
    "restricted to the batch") {
    purge()
    try {
      val docs = TextDedup.documents(spark, dir)
      val batch = docs.filter(col("doc_id") % 10 >= 8)
      val indexed = rows(
        TextDedup.admitSubstringIndexed(spark, dir, batch, 5, 2)
          .orderBy(col("doc_id")))
      val recomputed = rows(TextDedup.substringDedupOf(docs, 5, 2)
        .filter(col("doc_id") % 10 >= 8).orderBy(col("doc_id")))
      assert(indexed.nonEmpty && indexed == recomputed)
    } finally purge()
  }

  test("append path: wave-2 admission sees wave-1's cleaned text; a " +
    "replayed append is a no-op") {
    purge()
    try {
      val novel = "granite lighthouses archive the comet schedules " +
        "while distant ferries rehearse their winter routes" // 13 tokens
      val w1 = Seq((90001L, novel)).toDF("doc_id", "text")
      val v1 = TextDedup.admitSubstringIndexed(spark, dir, w1, 5, 2)
        .collect().head
      assert(v1.getAs[Long]("n_removed") == 0L &&
        v1.getAs[String]("clean_text") == novel,
        s"novel wave-1 doc must admit verbatim: $v1")

      TextDedup.appendToSubstringIndex(spark, dir,
        Seq((90001L, novel)).toDF("doc_id", "clean_text"), "wave1")
      val n = spark.table(TextDedup.gramsTable(dir, 5)).count()
      TextDedup.appendToSubstringIndex(spark, dir,
        Seq((90001L, novel)).toDF("doc_id", "clean_text"), "wave1")
      assert(spark.table(TextDedup.gramsTable(dir, 5)).count() == n,
        "replayed append added contribution rows")

      // a wave-2 copy of the admitted text is now fully covered
      val v2 = TextDedup.admitSubstringIndexed(spark, dir,
          Seq((90002L, novel)).toDF("doc_id", "text"), 5, 2)
        .collect().head
      assert(v2.getAs[Long]("n_removed") == v2.getAs[Long]("n_tokens") &&
        v2.getAs[String]("clean_text") == "",
        s"wave-2 copy must vanish wholesale: $v2")
    } finally purge()
  }

  test("compaction folds the contribution log without changing any gram " +
    "total, and compacted-away tags stay replay-proof") {
    import spark.implicits._
    purge()
    try {
      val novel = "porcelain satellites monitor the orchard frequencies " +
        "beyond the ninth meridian every sidereal week"
      TextDedup.ensureSubstringIndex(spark, dir)
      TextDedup.appendToSubstringIndex(spark, dir,
        Seq((91001L, novel)).toDF("doc_id", "clean_text"), "waveA")
      val totalsBefore = spark.table(TextDedup.gramsTable(dir, 5))
        .groupBy("g").agg(sum("n_docs").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rowsBefore = spark.table(TextDedup.gramsTable(dir, 5)).count()

      TextDedup.compactSubstringIndex(spark, dir)

      val after = spark.table(TextDedup.gramsTable(dir, 5))
      val totalsAfter = after.groupBy("g").agg(sum("n_docs").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(totalsAfter == totalsBefore,
        "compaction changed a gram total")
      assert(after.count() < rowsBefore || rowsBefore == after.count(),
        "row count sanity")
      assert(after.filter(col("src") =!= "corpus").count() == 0,
        "compaction left non-corpus contribution rows")

      // the folded-away tag must still be replay-proof (marker survives)
      TextDedup.appendToSubstringIndex(spark, dir,
        Seq((91001L, novel)).toDF("doc_id", "clean_text"), "waveA")
      val replayTotals = spark.table(TextDedup.gramsTable(dir, 5))
        .groupBy("g").agg(sum("n_docs").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(replayTotals == totalsBefore,
        "replayed compacted tag double-counted")

      // and admission still sees the folded contributions
      val v = TextDedup.admitSubstringIndexed(spark, dir,
          Seq((91002L, novel)).toDF("doc_id", "text"), 5, 2)
        .collect().head
      assert(v.getAs[String]("clean_text") == "",
        s"post-compaction admission missed folded contributions: $v")
    } finally purge()
  }

  test("a session that lost its catalog entry reattaches the surviving " +
    "gram data instead of rebuilding") {
    purge()
    try {
      TextDedup.ensureSubstringIndex(spark, dir)
      val before = spark.table(TextDedup.gramsTable(dir, 5)).count()
      // external table: DROP keeps the files, like a died JVM would
      spark.sql(s"DROP TABLE ${TextDedup.gramsTable(dir, 5)}")
      TextDedup.ensureSubstringIndex(spark, dir)
      assert(spark.table(TextDedup.gramsTable(dir, 5)).count() == before)
    } finally purge()
  }

  test("compaction fails fast on a gram width with no built index " +
    "instead of building a spurious corpus index") {
    purge()
    try {
      TextDedup.ensureSubstringIndex(spark, dir, n = 5)
      // wrong width: no n=7 index exists — must refuse, not build
      val err = intercept[IllegalArgumentException](
        TextDedup.compactSubstringIndex(spark, dir, n = 7))
      assert(err.getMessage.contains("no standing gram index") &&
        err.getMessage.contains("n=7"), err.getMessage)
      assert(!spark.catalog.tableExists(TextDedup.gramsTable(dir, 7)),
        "refusal must not leave an n=7 table behind")
      // the right width still compacts
      TextDedup.compactSubstringIndex(spark, dir, n = 5)
    } finally purge()
  }

  test("the admission probe prunes the gram-table scan to the batch's " +
    "touched grams (pushed IN predicate, never a full-log sum)") {
    purge()
    try {
      val batch = TextDedup.documents(spark, dir)
        .filter(col("doc_id") % 10 >= 8).limit(10)
      val df = TextDedup.admitSubstringIndexed(spark, dir, batch, 5, 2)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [In(g,"),
        s"gram-table scan not pruned to the batch's grams:\n$plan")
    } finally purge()
  }
}
