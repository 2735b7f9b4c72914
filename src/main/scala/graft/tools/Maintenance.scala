package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.Pipeline

/** Out-of-band maintenance entry point — the scheduled OPTIMIZE+VACUUM
  * analog (reference utils.py:111-135, bootstrap.py:58-62) for when the
  * stream is NOT running:
  * `runMain graft.tools.Maintenance <pipelineBaseDir> [intervalSec]`.
  * With an interval it loops (cron-style service); without, it runs once
  * and exits. Each pass compacts silver (OPTIMIZE) and vacuums consumed
  * change-feed versions (VACUUM — cutoff derived from the serve
  * checkpoint's committed progress when present, else the 168-version
  * retention matching the reference's 168 h; the newest version is
  * always retained). While a silver stream IS running, use
  * [[Pipeline.Config.compactEvery]] instead — compaction must not race a
  * concurrent micro-batch append.
  *
  * Compaction variant is picked by [[Pipeline.compactSilverAuto]]:
  * silver-terminal deployments get the whole-directory swap; once a gold
  * stage has consumed the directory as a file stream, the manifest-based
  * [[Pipeline.compactSilverLive]] rewrites only gold-committed `part-*`
  * files into `compact-*` names gold's glob filter ignores — the
  * plain-parquet analog of Delta's dataChange=false OPTIMIZE, legal even
  * mid-stream. Vacuuming the change feed is safe in every deployment.
  */
object Maintenance {

  /** Whole-set manifest validation (VERDICT r10 #6): the per-pass
    * guards fail fast on a configured-but-absent index, but only when
    * their pass RUNS — after earlier passes already mutated state — and
    * nothing at all notices the inverse error, a standing index ON DISK
    * that the configured env manifest does not cover (it silently
    * grows/drifts forever while this loop reports success). Check both
    * directions up front, before any pass runs:
    *
    *   - every configured index must exist on disk with the configured
    *     shape (throws — a mis-set dir/shape must stop the loop before
    *     the first compaction, same contract as the per-pass guards);
    *   - every maintainable index family found under the warehouse
    *     (gram logs, IVF cells, PQ codes — the families this loop has a
    *     pass for) must be covered by the configured set; uncovered
    *     ones come back as warning lines the loop prints every pass.
    *
    * Dedup band/shingle and IVF-PQ indexes have no scheduled pass here
    * (append-capped at build; rebuilt via purge+ensure) and are listed
    * for visibility only, never warned.
    */
  private[graft] def manifestReport(spark: SparkSession,
      gramDir: Option[String], gramN: Int,
      ivfDir: Option[String], ivfNq: Int, ivfNc: Int,
      pqDir: Option[String], pqNq: Int,
      winsorDir: Option[String] = None,
      winsorGroup: String = "event_type"): Seq[String] = {
    import graft.ext.{IndexCatalog, Pq, Similarity, TextDedup}
    import graft.ops.Analytics
    gramDir.foreach { d =>
      require(TextDedup.substringIndexExists(spark, d, gramN),
        s"maintenance manifest: SPARK_GRAFT_GRAM_INDEX_DIR=$d but no " +
          s"standing gram index for n=$gramN exists — check " +
          "SPARK_GRAFT_GRAM_INDEX_N against the built index's width")
    }
    ivfDir.foreach { d =>
      require(Similarity.ivfIndexExists(spark, d, ivfNq, ivfNc),
        s"maintenance manifest: SPARK_GRAFT_IVF_DIR=$d but no standing " +
          s"IVF index for nQueries=$ivfNq, nCentroids=$ivfNc exists — " +
          "check SPARK_GRAFT_IVF_NQ/_NC against the built index's shape")
    }
    pqDir.foreach { d =>
      require(Pq.pqIndexExists(spark, d, pqNq),
        s"maintenance manifest: SPARK_GRAFT_PQ_DIR=$d but no standing " +
          s"PQ index for nQueries=$pqNq exists — check SPARK_GRAFT_PQ_NQ " +
          "against the built index's shape")
    }
    winsorDir.foreach { d =>
      require(Analytics.boundsIndexExists(spark, d, winsorGroup),
        s"maintenance manifest: SPARK_GRAFT_WINSOR_DIR=$d but no " +
          s"standing bounds table for group=$winsorGroup exists — check " +
          "SPARK_GRAFT_WINSOR_GROUP against the built table's shape")
    }
    val covered: Set[String] =
      gramDir.map(d => TextDedup.gramsTable(d, gramN)).toSet ++
        ivfDir.toSeq.flatMap { d =>
          val key = Similarity.ivfKey(ivfNq, ivfNc, 2, 3,
            Similarity.defaultIvfSampleCap)
          Seq(Similarity.ivfCentsTable(d, key),
            Similarity.ivfCellsTable(d, key))
        } ++
        pqDir.toSeq.flatMap { d =>
          val key = Pq.pqKey(pqNq, 8, 16, 2, 3,
            Similarity.defaultIvfSampleCap)
          Seq(Pq.pqBooksTable(d, key), Pq.pqCodesTable(d, key))
        } ++
        winsorDir.map(d => Analytics.boundsTable(d, winsorGroup, 0.05, 0.95))
    val maintainable = Set("grams", "ivf", "pq", "winsor")
    IndexCatalog.listIndexDirs(spark)
      .filter { case (fam, name) =>
        // exact name or a "_"-separated suffix of it (the gram log's
        // `_tags` sibling) — a bare prefix test would let `..._n42`
        // hide behind a covered `..._n4` (r12 review)
        maintainable(fam) &&
          !covered.exists(c => name == c || name.startsWith(c + "_"))
      }
      .map { case (fam, name) =>
        // ADVICE r12: the env manifest can only express DEFAULT-shape
        // IVF/PQ keys (iters=2, sampleMod=3, default sampleCap — the
        // same shapes the retrain/compaction passes themselves run
        // with), so a non-default-shape index is permanently
        // unmaintainable by this loop and the remedy is purge+rebuild,
        // not a config change; say so instead of pointing at env vars
        // that cannot cover it
        s"[maintenance] WARNING: standing $fam index '$name' is not " +
          "covered by this loop's configured manifest — it will grow " +
          "and drift unmaintained. If it has the default shape, set " +
          "the matching SPARK_GRAFT_* vars; a NON-default-shape " +
          "IVF/PQ index cannot be maintained by this loop at all " +
          "(its passes run default iters/sampleMod/sampleCap) — " +
          "purge and rebuild it at the default shape, or maintain " +
          "it out-of-band"
      }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Maintenance <pipelineBaseDir> [intervalSec]")
    val baseDir = args(0)
    val intervalSec = if (args.length > 1) args(1).toLong else 0L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = Pipeline.Config(baseDir)
    val format = graft.storage.TableFormat.parquet
    // Optional: also fold the substring gram index's per-batch
    // contribution log (round 9) — pass the indexed corpus dir as
    // SPARK_GRAFT_GRAM_INDEX_DIR and, if the index was built with a
    // non-default gram width, SPARK_GRAFT_GRAM_INDEX_N (the tables are
    // keyed by n; compactSubstringIndex FAILS FAST when no index exists
    // for the configured n, so a mis-set width cannot silently build a
    // spurious corpus index from inside this loop). Same
    // single-maintainer contract as silver compaction: run it quiesced.
    val gramDir = sys.env.get("SPARK_GRAFT_GRAM_INDEX_DIR")
    val gramN = sys.env.getOrElse("SPARK_GRAFT_GRAM_INDEX_N", "5").toInt
    // Optional: IVF index health check + conditional offline rebuild
    // (round 10) — pass the indexed corpus dir as SPARK_GRAFT_IVF_DIR
    // (+ _NQ/_NC when built with non-default shape). Runs
    // StreamingSimilarity.retrainIfNeeded: the drift/skew rule decides,
    // the rebuild retrains from the embeddings table. Quiesce admission
    // streams around the tick, like the other passes.
    val ivfDir = sys.env.get("SPARK_GRAFT_IVF_DIR")
    val ivfNq = sys.env.getOrElse("SPARK_GRAFT_IVF_NQ", "10").toInt
    val ivfNc = sys.env.getOrElse("SPARK_GRAFT_IVF_NC", "16").toInt
    // Optional: PQ codes-table file-growth compaction (round 10) — pass
    // the indexed corpus dir as SPARK_GRAFT_PQ_DIR (+ _NQ / _MAX_FILES).
    // Stream admission appends one file set per micro-batch; past the
    // threshold the offline purge+rebuild IS the compaction (codes are
    // derived state — rewriting from the embeddings table both compacts
    // and refreshes codebook drift). Fails fast when no index exists
    // for the configured shape, like the gram guard.
    val pqDir = sys.env.get("SPARK_GRAFT_PQ_DIR")
    val pqNq = sys.env.getOrElse("SPARK_GRAFT_PQ_NQ", "10").toInt
    val pqMaxFiles = sys.env.getOrElse("SPARK_GRAFT_PQ_MAX_FILES", "64").toInt
    // Optional: frozen winsorize-bounds drift check + conditional
    // re-freeze (round 12) — pass the events dir as
    // SPARK_GRAFT_WINSOR_DIR (+ _GROUP for a non-default group column).
    // Runs Analytics.refreezeBoundsIndexIfNeeded: the realized-clip
    // drift rule decides, the rebuild re-freezes from the events table.
    // Quiesce the consuming winsorize stream around the tick.
    val winsorDir = sys.env.get("SPARK_GRAFT_WINSOR_DIR")
    val winsorGroup = sys.env.getOrElse("SPARK_GRAFT_WINSOR_GROUP",
      "event_type")
    // both-ways manifest validation BEFORE the first pass mutates
    // anything: a configured-but-absent index throws here. The coverage
    // half re-runs EVERY pass (one cheap listStatus) — an index another
    // session builds mid-run must start warning on the next tick, not
    // after a restart
    def uncovered() = manifestReport(spark, gramDir, gramN, ivfDir, ivfNq,
      ivfNc, pqDir, pqNq, winsorDir, winsorGroup)
    uncovered()
    do {
      uncovered().foreach(println)
      val t0 = System.nanoTime()
      format.optimize(spark, cfg)
      format.optimizeServe(spark, cfg)
      format.vacuumChangeFeed(spark, cfg)
      gramDir.foreach(graft.ext.TextDedup.compactSubstringIndex(spark, _, gramN))
      val retrained = ivfDir.exists(d => graft.streaming.StreamingSimilarity
        .retrainIfNeeded(spark, d, ivfNq, ivfNc))
      val pqCompacted = pqDir.exists(d => graft.ext.Pq
        .compactPqIndexIfNeeded(spark, d, pqNq, pqMaxFiles))
      val refroze = winsorDir.exists(d => graft.ops.Analytics
        .refreezeBoundsIndexIfNeeded(spark, d, winsorGroup))
      println(s"[maintenance] compacted ${cfg.silverPath} + " +
        f"vacuumed ${cfg.goldChangesPath}" +
        gramDir.fold("")(d => s" + folded gram log for $d") +
        ivfDir.fold("")(d =>
          s" + ivf health for $d (retrained=$retrained)") +
        pqDir.fold("")(d =>
          s" + pq file growth for $d (compacted=$pqCompacted)") +
        winsorDir.fold("")(d =>
          s" + winsor bounds drift for $d (refroze=$refroze)") +
        f" in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (intervalSec > 0) Thread.sleep(intervalSec * 1000)
    } while (intervalSec > 0)
    spark.stop()
  }
}
