package graft

import org.apache.spark.sql.functions._

import graft.ext.{Pq, Similarity}

/** Product-Quantization kernels: encode/search determinism, exact
  * agreement between the engine's `‖a‖²−2a·b+‖b‖²` distance expansion
  * and the definitional Σ(aᵢ−bᵢ)², ADC-vs-reconstruction parity, and
  * the plan shape (broadcast codebook/query sides, no cartesian).
  */
class PqSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def micro(fs: Seq[Float]): Array[Double] =
    fs.map(f => math.floor(f.toDouble * 1e6 + 0.5)).toArray

  test("pqTopK is deterministic and returns dense ranks 1..k per query") {
    val a = Pq.pqTopK(spark, dir, nQueries = 10, k = 3).collect().toSeq
    val b = Pq.pqTopK(spark, dir, nQueries = 10, k = 3).collect().toSeq
    assert(a == b)
    val byQ = a.map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    assert(byQ.size == 10)
    byQ.values.foreach(rs => assert(rs.map(_._2).sorted == Seq(1L, 2L, 3L)))
  }

  test("engine assignment distances equal the definitional Σ(aᵢ−bᵢ)² " +
    "exactly, and every candidate gets one code per subspace") {
    val (books, enc) = Pq.assignments(spark, dir, nQueries = 10, nSub = 8,
      kSub = 16, iters = 2, sampleMod = 3,
      sampleCap = Similarity.defaultIvfSampleCap)
    val rows = enc.collect()
    val cands = Similarity.embeddings(spark, dir)
      .filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> micro(r.getSeq[Float](1))).toMap
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      cands.size * 8)
    rows.foreach { r =>
      val (cid, sub, code, dist) =
        (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt, r.getDouble(3))
      val v = cands(cid)
      val c = books(sub)(code)
      val want = (0 until 8).map { i =>
        val d = v(sub * 8 + i) - c(i); d * d
      }.sum
      assert(dist == want, s"cid=$cid sub=$sub") // EXACT integer equality
      // and the chosen code is a true argmin (ties toward smaller code)
      val better = books(sub).indices.exists { c2 =>
        val d2 = (0 until 8).map { i =>
          val d = v(sub * 8 + i) - books(sub)(c2)(i); d * d
        }.sum
        d2 < want || (d2 == want && c2 < code)
      }
      assert(!better, s"cid=$cid sub=$sub code=$code is not the argmin")
    }
  }

  test("ADC score equals the query·reconstruction dot up to association " +
    "(per-sub partial sums), within 1e-9") {
    val nSub = 8; val kSub = 16
    val (books, enc) = Pq.assignments(spark, dir, nQueries = 10, nSub = nSub,
      kSub = kSub, iters = 2, sampleMod = 3,
      sampleCap = Similarity.defaultIvfSampleCap)
    val codes = enc.collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rs) =>
        cid -> rs.sortBy(_.getLong(1)).map(_.getLong(2).toInt).toSeq
      }
    val qs = Similarity.embeddings(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    // the engine's ADC pool scores, re-derived through the public query
    // (pool = rescoreFactor·k rows/query before exact rescore) are not
    // directly exposed; recompute the ADC formula and compare with the
    // mathematical identity adc = Σ_sub (q_sub · c_sub)
    qs.foreach { case (_, qe) =>
      codes.take(50).foreach { case (_, cs) =>
        val adc = (0 until nSub).map { s =>
          (0 until 8).map { i =>
            qe(s * 8 + i).toDouble * (books(s)(cs(s))(i) / 1e6)
          }.sum
        }.sum
        val recon = (0 until nSub).flatMap(s => books(s)(cs(s)).map(_ / 1e6))
        val full = (0 until 64).map(i => qe(i).toDouble * recon(i)).sum
        assert(math.abs(adc - full) <= 1e-9)
      }
    }
  }

  test("pqStats occupancies partition the candidate set; sse matches a " +
    "driver-side exact recompute") {
    val nCand = Similarity.embeddings(spark, dir)
      .filter(col("vec_id") >= 10).count()
    val stats = Pq.pqStats(spark, dir, nQueries = 10).collect()
    assert(stats.length == 8)
    val (books, enc) = Pq.assignments(spark, dir, nQueries = 10, nSub = 8,
      kSub = 16, iters = 2, sampleMod = 3,
      sampleCap = Similarity.defaultIvfSampleCap)
    val distBySub = enc.collect().groupBy(_.getLong(1))
    stats.foreach { r =>
      val sub = r.getLong(0)
      assert(r.getLong(1) <= 16) // n_codes_used
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(3))
      val subRows = distBySub(sub)
      assert(subRows.length.toLong == nCand)
      // exact integer sum of the min distances, then the same /1e12
      val sse = subRows.map(x => BigDecimal(x.getDouble(3))).sum
      val want = (sse / BigDecimal(1e12)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == want, s"sub=$sub")
    }
    assert(books.length == 8 && books.forall(_.length == 16))
  }

  test("pqTopK plans without CartesianProduct; codebook and pool joins " +
    "broadcast") {
    val df = Pq.pqTopK(spark, dir, nQueries = 10, k = 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("the encode argmin is a combinable aggregate, not a per-candidate " +
    "window — kSub rows collapse before the exchange") {
    val df = Pq.pqStats(spark, dir, nQueries = 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition(cid"),
      s"encode re-introduced the per-candidate window:\n$p")
    assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
  }

  test("property (seeded): the micro-unit L2 expansion ‖a‖²−2a·b+‖b‖² " +
    "equals Σ(aᵢ−bᵢ)² EXACTLY — the identity both engines rely on") {
    val rnd = new scala.util.Random(4242)
    (1 to 1000).foreach { _ =>
      // micro-quantized components of floats in [-4, 4] — wider than the
      // unit-ish embeddings to stress the exact-integer headroom
      def vec(): Array[Double] = Array.fill(8)(
        math.floor((rnd.nextDouble() * 8 - 4) * 1e6 + 0.5))
      val a = vec(); val b = vec()
      val direct = (0 until 8).map { i => val d = a(i) - b(i); d * d }.sum
      def dot(x: Array[Double], y: Array[Double]): Double =
        (0 until 8).map(i => x(i) * y(i)).sum
      val expanded = dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
      assert(direct == expanded) // bitwise, not approximate
    }
  }

  private def purgeIdx(): Unit = Pq.purgePqIndex(spark, dir, nQueries = 10)

  test("indexed PQ top-k equals the per-call train+encode form; its " +
    "ADC stage reads the codes table, not the vectors") {
    purgeIdx()
    try {
      val indexed = Pq.pqIndexedTopK(spark, dir, nQueries = 10, k = 3)
      val got = indexed.collect().toSeq
      val direct = Pq.pqTopK(spark, dir, nQueries = 10, k = 3).collect().toSeq
      assert(got.nonEmpty && got == direct)
      val p = indexed.queryExecution.executedPlan.toString
      assert(p.contains("graft_pq_codes_"), p) // stage 1 scans the index
    } finally purgeIdx()
  }

  test("external query vectors search the standing codes index: with " +
    "rescoreFactor·k covering the corpus the result equals the exact " +
    "scan (bruteForceOf), and the ADC stage reads the codes table") {
    purgeIdx()
    try {
      val queries = Similarity.externalQueryPanel(spark, dir, nPanel = 5)
      val cand = Similarity.embeddings(spark, dir)
        .filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          Similarity.norm(col("embedding")).as("cn"))
      val k = 3
      // pool covers every candidate → ADC ordering cannot drop a true
      // neighbor; the exact rescore then IS the brute-force answer
      val rf = (cand.count() / k + 1).toInt
      val indexed = Pq.pqIndexedTopK(spark, dir, queries, nQueries = 10,
        k = k, nSub = 8, kSub = 16, iters = 2, sampleMod = 3,
        sampleCap = Similarity.defaultIvfSampleCap, rescoreFactor = rf)
      val got = indexed.collect().toSeq.map(_.toSeq)
      val want = Similarity.bruteForceOf(
        Similarity.normQueries(queries), cand, k)
        .collect().toSeq.map(_.toSeq)
      assert(got.nonEmpty && got == want,
        "corpus-covering external ADC pool must equal the exact scan")
      val p = indexed.queryExecution.executedPlan.toString
      assert(p.contains("graft_pq_codes_"), p)
    } finally purgeIdx()
  }

  test("property (seeded): random hostile external panels with " +
    "corpus-covering rescore pools equal the exact scan across random " +
    "rescoreFactors and k; all-cells external IVF-PQ stays equal to " +
    "external PQ under the same panels") {
    // VERDICT r12 #7: same hardening as the IVF property spec — random
    // panels (with a duplicated vector) and a random rescoreFactor AT
    // or past the identity boundary rf·k >= |candidates|, where the
    // ADC pool covers the corpus and the exact rescore must reproduce
    // the brute-force answer bit-for-bit
    import spark.implicits._
    val rnd = new scala.util.Random(20260816)
    val dim = Similarity.embeddings(spark, dir)
      .select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val cand = Similarity.embeddings(spark, dir)
      .filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        Similarity.norm(col("embedding")).as("cn"))
    val nCand = cand.count()
    Pq.purgeIvfPqIndex(spark, dir, nQueries = 10)
    purgeIdx()
    try {
      (1 to 3).foreach { trial =>
        val k = 1 + rnd.nextInt(4)
        val rf = (nCand / k + 1).toInt + rnd.nextInt(40)
        def vec(): Seq[Double] = Seq.fill(dim)(
          math.floor((rnd.nextDouble() * 2 - 1) * 1e6) / 1e6)
        val base = (0 until (3 + rnd.nextInt(5))).map(q => (q.toLong, vec()))
        val panel = (base :+ ((base.length.toLong, base.head._2)))
          .toDF("qid", "qe")
        val got = Pq.pqIndexedTopK(spark, dir, panel, nQueries = 10,
          k = k, nSub = 8, kSub = 16, iters = 2, sampleMod = 3,
          sampleCap = Similarity.defaultIvfSampleCap, rescoreFactor = rf)
          .collect().toSeq.map(_.toSeq)
        val want = Similarity.bruteForceOf(
          Similarity.normQueries(panel), cand, k)
          .collect().toSeq.map(_.toSeq)
        assert(got.nonEmpty && got == want, s"trial $trial: k=$k rf=$rf")
        // the composed index under the same random panel: probing every
        // cell must restrict nothing
        val viaIvfpq = Pq.ivfpqTopK(spark, dir, panel, nQueries = 10,
          nProbe = 16, k = k, nCentroids = 16, nSub = 8, kSub = 16,
          iters = 2, sampleMod = 3,
          sampleCap = Similarity.defaultIvfSampleCap, rescoreFactor = rf)
          .collect().toSeq.map(_.toSeq)
        assert(viaIvfpq == got, s"trial $trial ivfpq: k=$k rf=$rf")
      }
    } finally {
      Pq.purgeIvfPqIndex(spark, dir, nQueries = 10)
      purgeIdx()
    }
  }

  test("streamed queries ADC-search the standing codes index and emit " +
    "exactly the batch external-form results") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    purgeIdx()
    try {
      val panel = Similarity.externalQueryPanel(spark, dir, nPanel = 4)
      val expected = Pq.pqIndexedTopK(spark, dir, panel, nQueries = 10,
        k = 3, nSub = 8, kSub = 16, iters = 2, sampleMod = 3,
        sampleCap = Similarity.defaultIvfSampleCap, rescoreFactor = 4)
        .collect().toSeq.map(_.toSeq)
      val panelRows = panel.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      val ckpt = Files.createTempDirectory("graft_pq_q_ckpt").toString
      val emitted = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      val input = MemoryStream[(Long, Seq[Double])](95, spark, None)
      val q = graft.streaming.StreamingSimilarity.startPqSearchStream(
        spark, dir, input.toDF().toDF("qid", "qe"), ckpt,
        nQueries = 10, k = 3) { res =>
        emitted.synchronized { emitted ++= res.collect().map(_.toSeq) }
      }
      try {
        input.addData(panelRows.take(2))
        q.processAllAvailable()
        input.addData(panelRows.drop(2))
        q.processAllAvailable()
        val ord = (r: Seq[Any]) =>
          (r(0).asInstanceOf[Long], r(2).asInstanceOf[Long])
        assert(emitted.synchronized(emitted.toSeq).sortBy(ord) ==
          expected.sortBy(ord))
      } finally q.stop()
    } finally purgeIdx()
  }

  test("catalog loss reattaches the surviving PQ tables; results " +
    "unchanged") {
    purgeIdx()
    try {
      val key = Pq.pqKey(10, 8, 16, 2, 3, Similarity.defaultIvfSampleCap)
      val before =
        Pq.pqIndexedTopK(spark, dir, nQueries = 10, k = 3).collect().toSeq
      val codesBefore = spark.table(Pq.pqCodesTable(dir, key)).count()
      // external tables: DROP keeps the files, like a died JVM would
      spark.sql(s"DROP TABLE ${Pq.pqBooksTable(dir, key)}")
      spark.sql(s"DROP TABLE ${Pq.pqCodesTable(dir, key)}")
      val after =
        Pq.pqIndexedTopK(spark, dir, nQueries = 10, k = 3).collect().toSeq
      assert(after == before)
      assert(spark.table(Pq.pqCodesTable(dir, key)).count() == codesBefore)
    } finally purgeIdx()
  }

  test("stream-admitted vectors land in the shared codes table and " +
    "batch ADC searches see them") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    purgeIdx()
    try {
      val q0 = Similarity.embeddings(spark, dir)
        .filter(col("vec_id") === 0L).select(col("embedding"))
        .collect().head.getSeq[Float](0)
      val ckpt = Files.createTempDirectory("graft_pq_ckpt").toString
      val input = MemoryStream[(Long, Seq[Float])](97, spark, None)
      val q = graft.streaming.StreamingSimilarity.startPqAdmission(
        spark, dir, input.toDF().toDF("vec_id", "embedding"), ckpt,
        nQueries = 10)
      try {
        input.addData((900001L, q0))
        q.processAllAvailable()
        val key = Pq.pqKey(10, 8, 16, 2, 3, Similarity.defaultIvfSampleCap)
        val books = Pq.assignments(spark, dir, nQueries = 10, nSub = 8,
          kSub = 16, iters = 2, sampleMod = 3,
          sampleCap = Similarity.defaultIvfSampleCap)._1
        val pool = Pq.adcPool(spark, dir,
          spark.table(Pq.pqCodesTable(dir, key)), books,
          nQueries = 10, poolK = 12)
          .filter(col("qid") === 0L).collect().map(_.getLong(1))
        assert(pool.contains(900001L),
          s"stream-admitted vector missing from q0's ADC pool: ${pool.toSeq}")
      } finally q.stop()
    } finally purgeIdx()
  }

  test("IVF-PQ: deterministic dense top-k; the plan probes the standing " +
    "cells table and never re-runs a corpus-wide assignment") {
    Pq.purgeIvfPqIndex(spark, dir, nQueries = 10)
    try {
      val df = Pq.ivfpqTopK(spark, dir, nQueries = 10, nProbe = 2, k = 3)
      val a = df.collect().toSeq
      val b = Pq.ivfpqTopK(spark, dir, nQueries = 10, nProbe = 2, k = 3)
        .collect().toSeq
      assert(a.nonEmpty && a == b)
      val byQ = a.map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      byQ.values.foreach(rs =>
        assert(rs.map(_._2).sorted == (1L to rs.length).toSeq))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("graft_ivfpq_cells_"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("windowspecdefinition(cid"),
        s"IVF-PQ query re-ran the corpus assignment:\n$p")
    } finally Pq.purgeIvfPqIndex(spark, dir, nQueries = 10)
  }

  test("external IVF-PQ with all cells probed equals the external " +
    "standing-codes PQ search — the probe only restricts the code rows") {
    Pq.purgeIvfPqIndex(spark, dir, nQueries = 10)
    purgeIdx()
    try {
      val queries = Similarity.externalQueryPanel(spark, dir, nPanel = 5)
      val viaIvfpq = Pq.ivfpqTopK(spark, dir, queries, nQueries = 10,
        nProbe = 16, k = 3, nCentroids = 16, nSub = 8, kSub = 16,
        iters = 2, sampleMod = 3,
        sampleCap = Similarity.defaultIvfSampleCap, rescoreFactor = 4)
        .collect().toSeq
      val viaPq = Pq.pqIndexedTopK(spark, dir, queries, nQueries = 10,
        k = 3, nSub = 8, kSub = 16, iters = 2, sampleMod = 3,
        sampleCap = Similarity.defaultIvfSampleCap, rescoreFactor = 4)
        .collect().toSeq
      assert(viaIvfpq.nonEmpty && viaIvfpq == viaPq)
    } finally {
      Pq.purgeIvfPqIndex(spark, dir, nQueries = 10)
      purgeIdx()
    }
  }

  test("IVF-PQ with all cells probed equals plain PQ ADC search — the " +
    "probe only restricts, never rescores differently") {
    Pq.purgeIvfPqIndex(spark, dir, nQueries = 10)
    try {
      val all = Pq.ivfpqTopK(spark, dir, nQueries = 10, nProbe = 16, k = 3)
        .collect().toSeq
      val pq = Pq.pqTopK(spark, dir, nQueries = 10, k = 3).collect().toSeq
      assert(all == pq)
    } finally Pq.purgeIvfPqIndex(spark, dir, nQueries = 10)
  }

  test("file-growth compaction: appends past the threshold trigger the " +
    "rebuild, a fresh index stays untouched, a missing index fails fast") {
    import spark.implicits._
    purgeIdx()
    try {
      intercept[IllegalArgumentException] {
        Pq.compactPqIndexIfNeeded(spark, dir, nQueries = 10)
      }
      Pq.ensurePqIndex(spark, dir, nQueries = 10)
      assert(!Pq.compactPqIndexIfNeeded(spark, dir, nQueries = 10,
        maxFiles = 64))
      val v0 = Similarity.embeddings(spark, dir)
        .filter(col("vec_id") === 0L).select(col("embedding"))
        .collect().head.getSeq[Float](0)
      // three admission batches = three appended bucketed file sets
      (1 to 3).foreach { i =>
        Pq.appendToPqIndex(spark, dir,
          Seq((910000L + i, v0)).toDF("vec_id", "embedding")
            .select(col("vec_id"),
              col("embedding").cast("array<float>").as("embedding")),
          nQueries = 10)
      }
      val key = Pq.pqKey(10, 8, 16, 2, 3, Similarity.defaultIvfSampleCap)
      val withAdmits = spark.table(Pq.pqCodesTable(dir, key)).count()
      // threshold 1 file: the grown table must fire the rebuild
      assert(Pq.compactPqIndexIfNeeded(spark, dir, nQueries = 10,
        maxFiles = 1))
      // rebuilt from the embeddings table (the source of truth): the
      // admitted-only vectors drop out — the documented derived-state
      // contract — and the table is back to one committed file set
      val after = spark.table(Pq.pqCodesTable(dir, key)).count()
      assert(after == withAdmits - 3)
      assert(!Pq.compactPqIndexIfNeeded(spark, dir, nQueries = 10,
        maxFiles = 64))
    } finally purgeIdx()
  }

  test("admitted vectors land in the codes table and surface in the ADC " +
    "pool; a replayed admission is a no-op") {
    import spark.implicits._
    purgeIdx()
    try {
      Pq.ensurePqIndex(spark, dir, nQueries = 10)
      val key = Pq.pqKey(10, 8, 16, 2, 3, Similarity.defaultIvfSampleCap)
      val kt = Pq.pqCodesTable(dir, key)
      val n0 = spark.table(kt).count()
      // a synthetic vector equal to query 0's embedding — its codes are
      // the codes of q0's nearest sub-centroids, so it must enter q0's
      // ADC pool at the top
      val q0 = Similarity.embeddings(spark, dir)
        .filter(col("vec_id") === 0L).select(col("embedding"))
        .collect().head.getSeq[Float](0)
      val newId = 900000L
      val batch = Seq((newId, q0)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>")
          .as("embedding"))
      Pq.appendToPqIndex(spark, dir, batch, nQueries = 10)
      assert(spark.table(kt).count() == n0 + 1)
      Pq.appendToPqIndex(spark, dir, batch, nQueries = 10) // replay
      assert(spark.table(kt).count() == n0 + 1)
      val books = Pq.assignments(spark, dir, nQueries = 10, nSub = 8,
        kSub = 16, iters = 2, sampleMod = 3,
        sampleCap = Similarity.defaultIvfSampleCap)._1
      val pool = Pq.adcPool(spark, dir, spark.table(kt), books,
        nQueries = 10, poolK = 12)
        .filter(col("qid") === 0L).collect().map(_.getLong(1))
      assert(pool.contains(newId),
        s"admitted vector missing from q0's ADC pool: ${pool.toSeq}")
    } finally purgeIdx()
  }
}
