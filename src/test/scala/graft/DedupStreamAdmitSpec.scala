package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.TextDedup
import graft.streaming.StreamingDedup

/** VERDICT r7 #1 — the streaming admit loop and the batch index are ONE
  * standing corpus: docs admitted through the stream land in the
  * persisted band/shingle tables and subsequent BATCH admission sees
  * them; docs appended by the batch path are visible to later STREAM
  * batches. Isolated on a copied documents table so the sf0.001 index
  * used by DedupIndexSpec is untouched.
  */
class DedupStreamAdmitSpec extends SparkTestBase {
  import spark.implicits._

  // a private dir keyed copy of the documents table → private index tables
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_stream_admit").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def dropIndex(): Unit = TextDedup.purgeDedupIndex(spark, dir)

  test("stream-admitted docs land in the batch index, and batch-appended " +
    "docs are visible to later stream batches") {
    dropIndex()
    try {
      val corpusText = TextDedup.documents(spark, dir)
        .filter(col("doc_id") % 10 < 8)
        .orderBy(col("doc_id")).select(col("text")).head().getString(0)
      val novelA = "zebra quilt harbors seventeen lanterns under the " +
        "copper bridge while gulls argue about tide tables all afternoon"
      val novelB = "mossy turbines hum beside the glass orchard where " +
        "nine cartographers trade rumors of an unmapped inland sea"

      val outDir = Files.createTempDirectory("graft_admit_out").toString
      val ckpt = Files.createTempDirectory("graft_admit_ckpt").toString
      val input = MemoryStream[(Long, String)](91, spark, None)
      val q = StreamingDedup.startIndexedAdmission(spark, dir,
        input.toDF().toDF("doc_id", "text"), 0.5, outDir, ckpt)
      try {
        // wave 1 through the STREAM: one novel doc, one copy of a corpus doc
        input.addData((10001L, novelA), (10002L, corpusText))
        q.processAllAvailable()
        val v1 = spark.read.parquet(s"$outDir/v=0")
          .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
        assert(v1 == Map(10001L -> true, 10002L -> false), s"wave-1 verdicts: $v1")

        // stream → batch: batch admission of a copy of the stream keeper
        // must reject it, best_match = the doc the STREAM admitted
        val vBatch = TextDedup.admitIndexed(spark, dir,
          Seq((20001L, novelA)).toDF("doc_id", "text"), 0.5).collect().head
        assert(!vBatch.getAs[Boolean]("keep") &&
          vBatch.getAs[Long]("best_match") == 10001L,
          s"batch admission missed the stream keeper: $vBatch")

        // batch → stream: append a novel doc via the BATCH half…
        TextDedup.appendToDedupIndex(spark, dir,
          Seq((20002L, novelB)).toDF("doc_id", "text"))
        // …then a stream copy of it must be rejected with that best_match
        input.addData((30001L, novelB))
        q.processAllAvailable()
        val v2 = spark.read.parquet(s"$outDir/v=1").collect().head
        assert(!v2.getAs[Boolean]("keep") &&
          v2.getAs[Long]("best_match") == 20002L,
          s"stream admission missed the batch-appended doc: $v2")

        // the index carries exactly the two keepers beyond the corpus
        val extra = spark.table(TextDedup.shinglesTable(dir))
          .filter(col("doc_id") >= 10000L)
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet
        assert(extra == Set(10001L, 20002L), s"index extras: $extra")
      } finally q.stop()
    } finally dropIndex()
  }

  test("admissionOrderStats reads cross-batch order violations out of " +
    "the verdict markers — no new state, nonzero ooo_docs flags the " +
    "batches where arrival and backfill order could diverge") {
    dropIndex()
    try {
      val novelA = "quartz pelicans rehearse a thunderstorm over the " +
        "abandoned funicular while two librarians inventory the fog"
      val novelB = "eleven kettles of borrowed starlight simmer behind " +
        "the dune observatory awaiting the cartwheel comet's rsvp"
      val novelC = "a brass tortoise files a complaint about the " +
        "metronome factory's irregular tides every second thursday"
      val outDir = Files.createTempDirectory("graft_ooo_out").toString
      val ckpt = Files.createTempDirectory("graft_ooo_ckpt").toString
      val input = MemoryStream[(Long, String)](95, spark, None)
      val q = StreamingDedup.startIndexedAdmission(spark, dir,
        input.toDF().toDF("doc_id", "text"), 0.5, outDir, ckpt)
      try {
        input.addData((40100L, novelA), (40200L, novelB))
        q.processAllAvailable()
        // 40150 arrives AFTER 40200 was recorded — late by doc_id,
        // still legitimately admitted (arrival-order semantics), but
        // the stats must flag it
        input.addData((40150L, novelC), (40300L, novelA))
        q.processAllAvailable()
        val stats = StreamingDedup.admissionOrderStats(spark, outDir)
          .collect().map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
          .toMap
        // batch 0: 2 docs, both novel → admitted, hw 40200, no prior
        assert(stats(0L) == ((2L, 2L, 40200L, 0L)), s"b0: ${stats.get(0L)}")
        // batch 1: 2 docs, 40150 below the prior hw → ooo 1; 40300 is
        // a copy of the admitted novelA → rejected, so 1 admitted
        assert(stats(1L) == ((2L, 1L, 40300L, 1L)), s"b1: ${stats.get(1L)}")
      } finally q.stop()
      // a marker dir with no recorded batches fails with the probe's
      // contract, not a raw path-glob error
      val empty = Files.createTempDirectory("graft_ooo_empty").toString
      val e = intercept[IllegalArgumentException] {
        StreamingDedup.admissionOrderStats(spark, empty)
      }
      assert(e.getMessage.contains("no recorded verdict markers"))
    } finally dropIndex()
  }

  test("indexed admission survives a checkpoint restart: committed " +
    "batches are not re-admitted, new batches admit against the same " +
    "standing index") {
    dropIndex()
    try {
      val novelC = "ivory pendulums chart the monsoon ledger across " +
        "fourteen basalt terraces while cartwheels idle in the harbor"
      val novelD = "gossamer flywheels tally the eclipse rosters under " +
        "seven lacquered bridges each solstice evening"
      val outDir = Files.createTempDirectory("graft_restart_out").toString
      val ckpt = Files.createTempDirectory("graft_restart_ckpt").toString
      val input = MemoryStream[(Long, String)](94, spark, None)
      val stream = input.toDF().toDF("doc_id", "text")
      val q1 = StreamingDedup.startIndexedAdmission(spark, dir,
        stream, 0.5, outDir, ckpt)
      try {
        input.addData((80001L, novelC))
        q1.processAllAvailable()
      } finally q1.stop()
      val shinglesAfterB0 = spark.table(TextDedup.shinglesTable(dir))
        .filter(col("doc_id") >= 80000L).count()

      // restart from the same checkpoint; the committed batch must not
      // re-run (its verdict marker + the idempotent append both guard),
      // and a post-restart batch admits against the SAME index
      val q2 = StreamingDedup.startIndexedAdmission(spark, dir,
        stream, 0.5, outDir, ckpt)
      try {
        input.addData((80002L, novelC), (80003L, novelD))
        q2.processAllAvailable()
        assert(spark.read.parquet(s"$outDir/v=0").count() == 1,
          "restart rewrote batch 0's verdicts")
        val v1 = spark.read.parquet(s"$outDir/v=1")
          .collect().map(r => r.getAs[Long]("doc_id") ->
            r.getAs[Boolean]("keep")).toMap
        assert(v1 == Map(80002L -> false, 80003L -> true),
          s"post-restart batch verdicts: $v1")
        val extras = spark.table(TextDedup.shinglesTable(dir))
          .filter(col("doc_id") >= 80000L)
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet
        assert(extras == Set(80001L, 80003L),
          s"index extras after restart: $extras (batch-0 keeper count " +
            s"before restart: $shinglesAfterB0)")
      } finally q2.stop()
    } finally dropIndex()
  }

  test("substring admission stream and batch share ONE standing gram " +
    "index, both directions") {
    TextDedup.purgeSubstringIndex(spark, dir)
    try {
      val novelA = "seven turquoise observatories exchange tide " +
        "forecasts with the northern lighthouse keepers every dawn"
      val novelB = "clockwork meadows rehearse the thunder canon " +
        "beneath eleven woven aqueducts of amber glass"
      val outDir = Files.createTempDirectory("graft_substr_out").toString
      val ckpt = Files.createTempDirectory("graft_substr_ckpt").toString
      val input = MemoryStream[(Long, String)](92, spark, None)
      val q = StreamingDedup.startSubstringAdmission(spark, dir,
        input.toDF().toDF("doc_id", "text"), outDir, ckpt)
      try {
        // wave 1 through the STREAM: a novel doc admits verbatim
        input.addData((60001L, novelA))
        q.processAllAvailable()
        val v1 = spark.read.parquet(s"$outDir/v=0").collect().head
        assert(v1.getAs[Long]("n_removed") == 0L &&
          v1.getAs[String]("clean_text") == novelA, s"wave 1: $v1")

        // stream → batch: a batch copy of the stream-admitted text is
        // now fully covered by the stream's contributions
        val vb = TextDedup.admitSubstringIndexed(spark, dir,
          Seq((70001L, novelA)).toDF("doc_id", "text")).collect().head
        assert(vb.getAs[String]("clean_text") == "" &&
          vb.getAs[Long]("n_removed") == vb.getAs[Long]("n_tokens"),
          s"batch copy survived the stream contributions: $vb")

        // batch → stream: fold a novel doc in via the BATCH half...
        TextDedup.appendToSubstringIndex(spark, dir,
          Seq((70002L, novelB)).toDF("doc_id", "clean_text"), "batchX")
        // ...then a stream copy of it must vanish wholesale
        input.addData((60002L, novelB))
        q.processAllAvailable()
        val v2 = spark.read.parquet(s"$outDir/v=1").collect().head
        assert(v2.getAs[String]("clean_text") == "" &&
          v2.getAs[Long]("n_removed") == v2.getAs[Long]("n_tokens"),
          s"stream copy survived the batch contributions: $v2")
      } finally q.stop()
    } finally TextDedup.purgeSubstringIndex(spark, dir)
  }

  test("a torn verdict marker (no _SUCCESS) is recomputed, not trusted; " +
    "a marker dir bound to another checkpoint is refused") {
    dropIndex()
    try {
      val outDir = Files.createTempDirectory("graft_torn_out").toString
      val ckpt = Files.createTempDirectory("graft_torn_ckpt").toString
      // plant a torn batch-0 marker: dir exists, junk inside, no _SUCCESS
      val torn = new java.io.File(s"$outDir/v=0")
      torn.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/v=0/part-garbage"),
        Array[Byte](1, 2, 3))
      val input = MemoryStream[(Long, String)](96, spark, None)
      val q = StreamingDedup.startIndexedAdmission(spark, dir,
        input.toDF().toDF("doc_id", "text"), 0.5, outDir, ckpt)
      try {
        input.addData((86001L, "unglazed meridian flutes catalog the " +
          "autumn convoy schedules across nine tidal platforms"))
        q.processAllAvailable()
        val v0 = spark.read.parquet(s"$outDir/v=0").collect()
        assert(v0.length == 1 && v0.head.getAs[Boolean]("keep"),
          s"torn marker was not recomputed: ${v0.toSeq}")
      } finally q.stop()

      // the marker dir is bound to its checkpoint: a different
      // checkpoint must be refused loudly, not silently replay
      val otherCkpt = Files.createTempDirectory("graft_other_ckpt").toString
      val err = intercept[IllegalArgumentException] {
        StreamingDedup.startIndexedAdmission(spark, dir,
          input.toDF().toDF("doc_id", "text"), 0.5, outDir, otherCkpt)
      }
      assert(err.getMessage.contains("bound to checkpoint"))

      // a LEGACY binding (pre-identity format: the file holds the
      // checkpoint PATH) is accepted under the old guarantee and
      // upgraded in place to the identity format. Drop the Hadoop
      // checksum sidecar too — a raw-nio rewrite under a stale .crc
      // reads back as a ChecksumException, not as legacy content.
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$outDir/._bound_checkpoint.crc"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/_bound_checkpoint"),
        ckpt.getBytes("UTF-8"))
      val q2 = StreamingDedup.startIndexedAdmission(spark, dir,
        input.toDF().toDF("doc_id", "text"), 0.5, outDir, ckpt)
      q2.stop()
      val upgraded = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$outDir/_bound_checkpoint")), "UTF-8")
      assert(upgraded != ckpt && upgraded.nonEmpty,
        "legacy path binding must upgrade to the checkpoint identity")

      // ADVICE r9: the SAME path, deleted and recreated, is another
      // lineage too — batch ids restart at 0 and the stale v=0 marker
      // would be replayed as its verdicts. The binding is to the
      // checkpoint's identity (metadata id), so same-path recreation is
      // refused just as loudly.
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(ckpt))
      val err2 = intercept[IllegalArgumentException] {
        StreamingDedup.startIndexedAdmission(spark, dir,
          input.toDF().toDF("doc_id", "text"), 0.5, outDir, ckpt)
      }
      assert(err2.getMessage.contains("bound to checkpoint identity"),
        err2.getMessage)
    } finally dropIndex()
  }

  test("substring admission survives a checkpoint restart without " +
    "re-folding committed batches") {
    TextDedup.purgeSubstringIndex(spark, dir)
    try {
      val novelE = "copper weathervanes rehearse the auroral census " +
        "over twelve shale amphitheaters at every perihelion"
      val outDir = Files.createTempDirectory("graft_substr_rs_out").toString
      val ckpt = Files.createTempDirectory("graft_substr_rs_ckpt").toString
      val input = MemoryStream[(Long, String)](95, spark, None)
      val stream = input.toDF().toDF("doc_id", "text")
      val q1 = StreamingDedup.startSubstringAdmission(spark, dir,
        stream, outDir, ckpt)
      try {
        input.addData((85001L, novelE))
        q1.processAllAvailable()
      } finally q1.stop()
      val totals = spark.table(TextDedup.gramsTable(dir, 5))
        .groupBy("g").agg(sum("n_docs").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

      val q2 = StreamingDedup.startSubstringAdmission(spark, dir,
        stream, outDir, ckpt)
      try {
        input.addData((85002L, novelE)) // duplicate of the committed keeper
        q2.processAllAvailable()
        val v1 = spark.read.parquet(s"$outDir/v=1").collect().head
        assert(v1.getAs[String]("clean_text") == "",
          s"post-restart duplicate survived: $v1")
        // batch 0's contributions must appear exactly once; batch 1's
        // cleaned text is empty so it contributes nothing
        val totalsAfter = spark.table(TextDedup.gramsTable(dir, 5))
          .groupBy("g").agg(sum("n_docs").as("n")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(totalsAfter == totals,
          "restart re-folded a committed batch's contributions")
      } finally q2.stop()
    } finally TextDedup.purgeSubstringIndex(spark, dir)
  }

  test("torn append — bands committed, shingles lost — replays without " +
    "duplicate band rows and completes the shingle half") {
    dropIndex()
    try {
      TextDedup.ensureDedupIndex(spark, dir)
      val doc = Seq((50001L,
        "fourteen amber beacons relay the harvest ledger across the " +
          "salt flats before the winter caravan departs")).toDF("doc_id", "text")
      // simulate the crash window: the band half committed, the shingle
      // half (and the verdict marker) never did
      TextDedup.appendBandRows(spark, dir,
        TextDedup.shinglesFor(doc).localCheckpoint(true))
      val bandsAfterCrash = spark.table(TextDedup.bandsTable(dir))
        .filter(col("doc_id") === 50001L).count()
      assert(bandsAfterCrash > 0, "precondition: crash left band rows behind")

      // the replayed full append must not double the band rows, and must
      // land the missing shingle rows
      TextDedup.appendToDedupIndex(spark, dir, doc)
      assert(spark.table(TextDedup.bandsTable(dir))
        .filter(col("doc_id") === 50001L).count() == bandsAfterCrash,
        "replay duplicated band rows")
      assert(spark.table(TextDedup.shinglesTable(dir))
        .filter(col("doc_id") === 50001L).count() == 1L,
        "replay failed to complete the shingle half")
    } finally dropIndex()
  }

  test("appendToDedupIndex is idempotent at doc granularity (replay-safe)") {
    dropIndex()
    try {
      TextDedup.ensureDedupIndex(spark, dir)
      val doc = Seq((40001L,
        "eleven quiet observatories catalog the violet meteor stream " +
          "above a frozen caldera every second equinox")).toDF("doc_id", "text")
      TextDedup.appendToDedupIndex(spark, dir, doc)
      val sh1 = spark.table(TextDedup.shinglesTable(dir)).count()
      val b1 = spark.table(TextDedup.bandsTable(dir)).count()
      TextDedup.appendToDedupIndex(spark, dir, doc) // replayed batch
      assert(spark.table(TextDedup.shinglesTable(dir)).count() == sh1,
        "replayed append duplicated shingle rows")
      assert(spark.table(TextDedup.bandsTable(dir)).count() == b1,
        "replayed append duplicated band rows")
    } finally dropIndex()
  }

  test("standing-index probes PRUNE: admission and append scans push the " +
    "batch's touched keys as IN predicates (never a full index read)") {
    dropIndex()
    try {
      TextDedup.ensureDedupIndex(spark, dir)
      val batch = TextDedup.documents(spark, dir)
        .filter(col("doc_id") % 10 >= 8).limit(20)
      // 1. admission: band table pruned by band_hash, shingle store by
      // the candidate d_old set
      val verdicts = TextDedup.admitIndexed(spark, dir, batch, 0.6)
      verdicts.collect()
      val admitPlan = verdicts.queryExecution.executedPlan.toString
      assert(admitPlan.contains("PushedFilters: [In(band_hash,"),
        s"band-table scan not pruned:\n$admitPlan")
      assert(admitPlan.contains("PushedFilters: [In(doc_id,"),
        s"shingle-store scan not pruned:\n$admitPlan")
      // 2. band append: occupancy + idempotency anti-join read only the
      // touched buckets
      val doc = Seq((41001L,
        "fourteen amber lighthouses rotate their prisms toward the " +
          "winter archipelago at dusk")).toDF("doc_id", "text")
      val bandFrame = TextDedup.bandAppendFrame(spark, dir,
        TextDedup.shinglesFor(doc))
      assert(bandFrame.queryExecution.executedPlan.toString
          .contains("PushedFilters: [In(band_hash,"),
        "bandAppendFrame band-table scans not pruned")
      // 3. shingle-store replay probe: pruned to the batch's ids (a
      // single-doc batch's IN-list folds to EqualTo — same pushed prune)
      val freshPlan = TextDedup.freshAgainstShingleStore(spark, dir, doc)
        .queryExecution.executedPlan.toString
      assert(freshPlan.contains("In(doc_id,") ||
          freshPlan.contains("EqualTo(doc_id,"),
        s"freshAgainstShingleStore probe not pruned:\n$freshPlan")
    } finally dropIndex()
  }
}
