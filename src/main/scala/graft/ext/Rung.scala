package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalyst.HashExpressions
import graft.ext.Similarity.{dot, embeddings, norm, packSigns}
import graft.ops.Exact.round6

/** STANDING tables for the scan-based compression rungs (VERDICT r13
  * missing #1 / weak #1): the on-the-fly forms
  * ([[Similarity.binaryRescoreTopK]] / [[Similarity.matryoshkaRescoreTopK]]
  * / [[Similarity.int8RescoreTopK]]) re-derive the packed sign halves,
  * prefix slice, and int8 payload from the 256 B/row float table on
  * EVERY call — at 100 TB that stage-1 scan still reads the full float
  * bytes, the inverse of the rung's purpose. Here the chosen rung's
  * derived column is written ONCE as a bucketed standing table, exactly
  * the [[Pq.ensurePqIndex]] pattern, and the `*IndexedTopK` searches read
  * ONLY the rung table in stage 1 — the layout
  * [[Similarity.compressionRecall]]'s `stage1_bytes_per_vec` column
  * prices, now as running code:
  *
  *   - binary:     (cid, ch1, ch2)          — 16 B of payload per row;
  *   - matryoshka: (cid, cpe float[16], cpn) — 64 B prefix + its norm;
  *   - int8:       (cid, q8 binary, cscale, cn) — 64 B payload packed
  *     one signed byte per dim by the codegen'd
  *     [[HashExpressions.PackInt8]]; scored by
  *     [[HashExpressions.DotInt8]] without ever unpacking to floats.
  *
  * Output identity: each indexed search equals its on-the-fly form
  * row-for-row (the derivations are pure per-row functions and both
  * stage orderings tie-break on cid) — RungSpec pins all three, so the
  * registered `ann_*_indexed` queries reuse the `ann_*_topk` oracles
  * verbatim, the ann_ivf_indexed/ann_pq_indexed convention.
  *
  * Raw-store split (same caveat as [[Pq.appendToPqIndex]]): the rung
  * tables carry derived payloads only, so stream-admitted vectors
  * surface in stage 1; the exact stage-2 rescore fetches from the
  * caller's raw-vector store (here the embeddings table), which the
  * ingest must also feed. The contract is CODE, not a caveat:
  * [[graft.streaming.StreamingSimilarity.startEmbeddingIngest]] lands
  * raw + all derived rows in one idempotent batch body.
  */
object Rung {

  val dim = 64

  /** Every knob that determines the derived payload and the candidate
    * partition is part of the table key — the [[Similarity.ivfKey]]
    * staleness rule.
    */
  private[graft] def binKey(nQueries: Int): String = s"q${nQueries}_d$dim"
  private[graft] def mrlKey(nQueries: Int, dPrefix: Int): String =
    s"q${nQueries}_p$dPrefix"
  private[graft] def i8Key(nQueries: Int): String = s"q${nQueries}_d$dim"

  private[graft] def binTable(dir: String, key: String): String =
    s"graft_rung_bin_${IndexCatalog.indexKey(dir)}_$key"
  private[graft] def mrlTable(dir: String, key: String): String =
    s"graft_rung_mrl_${IndexCatalog.indexKey(dir)}_$key"
  private[graft] def i8Table(dir: String, key: String): String =
    s"graft_rung_i8_${IndexCatalog.indexKey(dir)}_$key"

  // ——————————— the ONE derivation each family's build AND admission run ———————————
  // (the Pq.encodeScored lesson: one definition, so build-time and
  // admitted rows can never diverge)

  /** (cid, ch1, ch2) — the two 32-bit MSB-first sign packs of
    * [[Similarity.binaryRescoreTopK]], 16 B of payload per vector.
    */
  private[graft] def binFrame(vecs: DataFrame): DataFrame =
    vecs.select(col("cid"),
      packSigns(col("embedding"), 1, 32).as("ch1"),
      packSigns(col("embedding"), 33, 64).as("ch2"))

  /** (cid, cpe, cpn) — the first `dPrefix` dims (float, zero
    * quantization error in the dims kept) plus their norm.
    */
  private[graft] def mrlFrame(vecs: DataFrame, dPrefix: Int): DataFrame =
    vecs.select(col("cid"),
      slice(col("embedding"), 1, dPrefix).as("cpe"))
      .withColumn("cpn", norm(col("cpe")))

  /** (cid, q8, cscale, cn) — the per-vector symmetric int8 quantization
    * of [[Similarity.int8RescoreTopK]] packed to one signed byte per
    * dim, plus the two doubles the de-quantized score needs. The scale
    * is hoisted to its own projection for the same reason as there (an
    * inlined array_max re-runs per element in interpreted HOF eval).
    */
  private[graft] def i8Frame(vecs: DataFrame): DataFrame =
    vecs
      .withColumn("scale",
        array_max(transform(col("embedding"), v => abs(v.cast("double")))))
      .withColumn("qi", transform(col("embedding"), v =>
        when(col("scale") === 0.0, lit(0.0))
          .otherwise(floor(v.cast("double") * 127.0 / col("scale") + 0.5))))
      .select(col("cid"),
        HashExpressions.packInt8(col("qi")).as("q8"),
        col("scale").as("cscale"),
        norm(col("embedding")).as("cn"))

  // ————————————————————— ensure / exists / purge / compact —————————————————————

  /** The shared ensure-if-absent lifecycle every standing index here
    * follows: reattach a prior session's committed data, else build
    * from the embeddings table (the source of truth), bucketed by cid.
    */
  private def ensureTable(spark: SparkSession, table: String,
                          build: => DataFrame): Unit = {
    if (!spark.catalog.tableExists(table)) {
      if (!IndexCatalog.reattachIfPresent(spark, table, Seq("cid"))) {
        IndexCatalog.purge(spark, table)
        build.write.mode("overwrite")
          .bucketBy(8, "cid").sortBy("cid")
          .option("path", IndexCatalog.tableLocation(spark, table).toString)
          .saveAsTable(table)
      }
    }
  }

  private def candidates(spark: SparkSession, dir: String,
                         nQueries: Int): DataFrame =
    embeddings(spark, dir).filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("cid"), col("embedding"))

  /** Build the standing binary-rung table for `dir` if absent. */
  def ensureBinaryIndex(spark: SparkSession, dir: String,
                        nQueries: Int): Unit =
    ensureTable(spark, binTable(dir, binKey(nQueries)),
      binFrame(candidates(spark, dir, nQueries)))

  /** Build the standing matryoshka-rung table for `dir` if absent. */
  def ensureMatryoshkaIndex(spark: SparkSession, dir: String, nQueries: Int,
                            dPrefix: Int = 16): Unit =
    ensureTable(spark, mrlTable(dir, mrlKey(nQueries, dPrefix)),
      mrlFrame(candidates(spark, dir, nQueries), dPrefix))

  /** Build the standing int8-rung table for `dir` if absent. */
  def ensureInt8Index(spark: SparkSession, dir: String,
                      nQueries: Int): Unit =
    ensureTable(spark, i8Table(dir, i8Key(nQueries)),
      i8Frame(candidates(spark, dir, nQueries)))

  /** The [[Pq.pqIndexExists]] fail-fast class, per rung table — the
    * shared [[IndexCatalog.hasCommittedData]] predicate.
    */
  private[graft] def binaryIndexExists(spark: SparkSession, dir: String,
                                       nQueries: Int): Boolean =
    IndexCatalog.hasCommittedData(spark, binTable(dir, binKey(nQueries)))
  private[graft] def matryoshkaIndexExists(spark: SparkSession, dir: String,
                                           nQueries: Int,
                                           dPrefix: Int = 16): Boolean =
    IndexCatalog.hasCommittedData(spark,
      mrlTable(dir, mrlKey(nQueries, dPrefix)))
  private[graft] def int8IndexExists(spark: SparkSession, dir: String,
                                     nQueries: Int): Boolean =
    IndexCatalog.hasCommittedData(spark, i8Table(dir, i8Key(nQueries)))

  /** Drop all three rung tables (catalog entries and data) — the
    * rebuild half of a re-derive.
    */
  def purgeRungIndexes(spark: SparkSession, dir: String, nQueries: Int = 10,
                       dPrefix: Int = 16): Unit = {
    IndexCatalog.purge(spark, binTable(dir, binKey(nQueries)))
    IndexCatalog.purge(spark, mrlTable(dir, mrlKey(nQueries, dPrefix)))
    IndexCatalog.purge(spark, i8Table(dir, i8Key(nQueries)))
  }

  /** File-growth maintenance for the rung tables — the
    * [[Pq.compactPqIndexIfNeeded]] rule verbatim: stream admission
    * appends one bucketed file set per micro-batch; past `maxFiles` on
    * ANY of the three tables, purge+ensure from the embeddings table IS
    * the compaction (rung payloads are derived state — nothing to
    * fold). Returns whether a rebuild ran. Single-maintainer contract:
    * run quiesced.
    */
  def compactRungIndexesIfNeeded(spark: SparkSession, dir: String,
                                 nQueries: Int, maxFiles: Int = 64,
                                 dPrefix: Int = 16): Boolean = {
    require(binaryIndexExists(spark, dir, nQueries) &&
      matryoshkaIndexExists(spark, dir, nQueries, dPrefix) &&
      int8IndexExists(spark, dir, nQueries),
      s"compactRungIndexesIfNeeded: no standing rung tables for dir=$dir, " +
        s"nQueries=$nQueries, dPrefix=$dPrefix (check SPARK_GRAFT_RUNG_* " +
        "against the built tables' shape) — the maintenance rule compacts " +
        "existing tables, it does not build them")
    val tables = Seq(binTable(dir, binKey(nQueries)),
      mrlTable(dir, mrlKey(nQueries, dPrefix)),
      i8Table(dir, i8Key(nQueries)))
    val fire = tables.exists { t =>
      val loc = IndexCatalog.tableLocation(spark, t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).count(_.getPath.getName.startsWith("part-")) > maxFiles
    }
    if (fire) rebuildRungIndexes(spark, dir, nQueries, dPrefix)
    fire
  }

  /** The HEAL half of [[rungConsistency]] — the maintenance pass that
    * turns the probe into a closed loop: when the three tables disagree
    * (an unreplayed crash window from a decommissioned stream, or an
    * out-of-band write), the rung payloads are DERIVED state, so the
    * purge+rebuild from the embeddings store IS the repair — exactly
    * the file-growth compaction's mechanism with a different trigger.
    * Returns whether a rebuild ran. Same guards and single-maintainer
    * contract as [[compactRungIndexesIfNeeded]]: run quiesced.
    */
  def repairRungIndexesIfNeeded(spark: SparkSession, dir: String,
                                nQueries: Int,
                                dPrefix: Int = 16): Boolean = {
    require(binaryIndexExists(spark, dir, nQueries) &&
      matryoshkaIndexExists(spark, dir, nQueries, dPrefix) &&
      int8IndexExists(spark, dir, nQueries),
      s"repairRungIndexesIfNeeded: no standing rung tables for dir=$dir, " +
        s"nQueries=$nQueries, dPrefix=$dPrefix (check SPARK_GRAFT_RUNG_* " +
        "against the built tables' shape) — the repair rule heals " +
        "existing tables, it does not build them")
    val fire = !rungConsistency(spark, dir, nQueries, dPrefix)
      .collect().head.getBoolean(5)
    if (fire) {
      rebuildRungIndexes(spark, dir, nQueries, dPrefix)
      // re-probe (review r15): a rebuild can only heal drift that
      // ORIGINATED in the derived tables. If the raw store itself is
      // inconsistent (duplicate vec_ids from a bad backfill), the
      // rebuild faithfully reproduces the inconsistency and a silent
      // `true` here would have every maintenance tick pay a full
      // purge+rebuild forever while logging successful healing.
      val healed = rungConsistency(spark, dir, nQueries, dPrefix)
        .collect().head.getBoolean(5)
      require(healed,
        s"repairRungIndexesIfNeeded: rebuild did NOT restore consistency " +
          s"for dir=$dir — the inconsistency originates in the raw " +
          "embeddings store (duplicate vec_ids?); repair the store, the " +
          "derived rung tables only mirror it")
    }
    fire
  }

  private def rebuildRungIndexes(spark: SparkSession, dir: String,
                                 nQueries: Int, dPrefix: Int): Unit = {
    purgeRungIndexes(spark, dir, nQueries, dPrefix)
    ensureBinaryIndex(spark, dir, nQueries)
    ensureMatryoshkaIndex(spark, dir, nQueries, dPrefix)
    ensureInt8Index(spark, dir, nQueries)
  }

  // ————————————————————————— streaming admission —————————————————————————

  /** Admit newly arrived vectors into ONE standing rung table: derive
    * the batch's payload rows through the SAME frame builder the
    * offline build ran, anti-join out already-present cids (probe
    * pruned to the batch's cids by a literal IN when small — the
    * adaptive [[TextDedup.indexPruneMaxKeys]] policy), append.
    * Idempotent at vector granularity, so a replayed batch is a no-op —
    * the [[Pq.appendToPqIndex]] contract.
    */
  private def appendToTable(spark: SparkSession, table: String,
                            batch: DataFrame, cids: Seq[Long]): Unit = {
    val appendRows = appendFrame(spark, table, batch, Some(cids))
    appendRows.write.mode("append")
      .bucketBy(8, "cid").sortBy("cid")
      .saveAsTable(table)
    spark.catalog.refreshTable(table)
  }

  /** The frame an admission appends — split out so the spec asserts the
    * executed plan (pruned idempotency probe), the [[Pq.pqAppendFrame]]
    * pattern. `cids` carries the batch's precollected key set when the
    * caller already has it (the three per-table appends share ONE
    * collect — review r15); without it the frame is checkpointed and
    * its keys collected here.
    */
  private[graft] def appendFrame(spark: SparkSession, table: String,
                                 batchRows: DataFrame,
                                 cids: Option[Seq[Long]] = None)
      : DataFrame = {
    val (b, keys) = cids match {
      // derived from an already-checkpointed deduped batch and read
      // exactly once below — no second checkpoint needed
      case Some(ks) => (batchRows, ks)
      case None =>
        val c = batchRows.localCheckpoint(true)
        (c, IndexCatalog.collectKeys(c, "cid"))
    }
    b.join(IndexCatalog.pruneToKeys(spark.table(table), "cid", keys)
      .select(col("cid")), Seq("cid"), "left_anti")
  }

  /** Admit a (vec_id, embedding) batch into ALL THREE standing rung
    * tables — the admission loop's per-batch body
    * ([[graft.streaming.StreamingSimilarity.startRungAdmission]]).
    * Fails fast on a shape mismatch rather than building a spurious
    * index under a different key, the [[Pq.appendToPqIndex]] guard.
    *
    * Admission is a SET operation per batch: the batch is deduped on
    * vec_id before the frame builders run (ADVICE r14), so an
    * at-least-once source redelivering a vector twice WITHIN one
    * micro-batch appends it once — the anti-join only guards against
    * rows already IN the table, not against siblings in the same
    * append. (PQ and IVF admission collapse in-batch duplicates
    * structurally — the per-(cid,sub) argmin and the rk=1 assignment
    * window each emit one row per cid — so only this family needs the
    * explicit dedup.)
    */
  def appendToRungIndexes(spark: SparkSession, dir: String,
                          newVecs: DataFrame, nQueries: Int,
                          dPrefix: Int = 16): Unit = {
    require(binaryIndexExists(spark, dir, nQueries) &&
      matryoshkaIndexExists(spark, dir, nQueries, dPrefix) &&
      int8IndexExists(spark, dir, nQueries),
      s"appendToRungIndexes: no standing rung tables for dir=$dir, " +
        s"nQueries=$nQueries, dPrefix=$dPrefix — build them with " +
        "ensure*Index (with the SAME parameters) before admitting")
    // catalog loss with surviving data: reattach via the ensure path
    ensureBinaryIndex(spark, dir, nQueries)
    ensureMatryoshkaIndex(spark, dir, nQueries, dPrefix)
    ensureInt8Index(spark, dir, nQueries)
    val rows = newVecs.select(col("vec_id").as("cid"), col("embedding"))
      .dropDuplicates("cid")
      .localCheckpoint(true)
    // the three tables share the batch's key set — collect it ONCE
    val cids = IndexCatalog.collectKeys(rows, "cid")
    appendToTable(spark, binTable(dir, binKey(nQueries)), binFrame(rows),
      cids)
    appendToTable(spark, mrlTable(dir, mrlKey(nQueries, dPrefix)),
      mrlFrame(rows, dPrefix), cids)
    appendToTable(spark, i8Table(dir, i8Key(nQueries)), i8Frame(rows),
      cids)
  }

  /** The admission stream's OBSERVABILITY face (VERDICT r14 next #5).
    *
    * Why no ORDER counters here, unlike
    * [[graft.streaming.StreamingDedup.admissionOrderStats]] /
    * [[graft.streaming.StreamingCuration.orderGuardStats]]: rung
    * admission is a SET UNION — each batch anti-joins out
    * already-present cids and appends pure per-row derivations, so the
    * final table state is the union of all admitted cids REGARDLESS of
    * arrival order, and no per-key decision (which dup survives, which
    * doc charges quota) ever depends on it. Order observability would
    * measure a quantity nothing downstream is sensitive to.
    *
    * What CAN diverge is the three tables drifting apart: a crash
    * window whose stream is decommissioned before replaying (the
    * binary append landed, the others never caught up), or an
    * out-of-band write. This probe makes that visible: one row with
    * each table's row count, the count of cids present EXACTLY ONCE in
    * all three, the max per-table multiplicity, and `consistent` —
    * true iff every cid appears exactly once in each table (so row
    * counts == n_common and multiplicity == 1). Scale shape: three
    * cid-only column-pruned scans unioned into ONE groupBy(cid) rollup
    * (the tables are cid-bucketed, so the agg is co-partitioned) and a
    * single-row reduce — no joins, no window.
    */
  def rungConsistency(spark: SparkSession, dir: String, nQueries: Int = 10,
                      dPrefix: Int = 16): DataFrame = {
    ensureBinaryIndex(spark, dir, nQueries)
    ensureMatryoshkaIndex(spark, dir, nQueries, dPrefix)
    ensureInt8Index(spark, dir, nQueries)
    def cids(table: String, tag: String) =
      spark.table(table).select(col("cid"), lit(tag).as("t"))
    val perCid = cids(binTable(dir, binKey(nQueries)), "b")
      .unionByName(cids(mrlTable(dir, mrlKey(nQueries, dPrefix)), "m"))
      .unionByName(cids(i8Table(dir, i8Key(nQueries)), "i"))
      .groupBy(col("cid"))
      .agg(sum(when(col("t") === "b", 1L).otherwise(0L)).as("nb"),
        sum(when(col("t") === "m", 1L).otherwise(0L)).as("nm"),
        sum(when(col("t") === "i", 1L).otherwise(0L)).as("ni"))
    // coalesce the empty-partition case (a corpus with no candidates
    // builds three empty tables): aggregates over zero groups are null,
    // which would diverge from the oracle's 0/0/0/0/1/TRUE row and NPE
    // a consumer reading `consistent` — vacuously consistent instead
    perCid.agg(
      coalesce(sum(col("nb")), lit(0L)).as("n_binary"),
      coalesce(sum(col("nm")), lit(0L)).as("n_matryoshka"),
      coalesce(sum(col("ni")), lit(0L)).as("n_int8"),
      coalesce(sum(when(col("nb") === 1L && col("nm") === 1L &&
        col("ni") === 1L, 1L).otherwise(0L)), lit(0L)).as("n_common"),
      coalesce(max(greatest(col("nb"), col("nm"), col("ni"))), lit(1L))
        .as("max_multiplicity"))
      .select(col("n_binary"), col("n_matryoshka"), col("n_int8"),
        col("n_common"), col("max_multiplicity"),
        (col("n_binary") === col("n_common") &&
          col("n_matryoshka") === col("n_common") &&
          col("n_int8") === col("n_common")).as("consistent"))
  }

  // ————————————————————————— the indexed searches —————————————————————————

  /** The head-rows query panel each indexed form scores against —
    * (qid, qe, qn) plus whatever stage-1 payload the rung derives
    * query-side (the panel is nQueries rows and broadcasts; deriving
    * its fingerprints per call is free, unlike the corpus side).
    */
  private[graft] def headQueries(spark: SparkSession, dir: String,
                                 nQueries: Int): DataFrame =
    embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        norm(col("embedding")).as("qn"))

  /** Per-query top `poolK` of a (qid, cid, score-col) stage-1 frame —
    * ascending or descending per the rung's score sense, ties toward
    * the smaller cid, exactly the on-the-fly forms' pool windows.
    */
  private def poolOf(scored: DataFrame, order: Column,
                     poolK: Int): DataFrame =
    scored.withColumn("ark",
      row_number().over(Window.partitionBy(col("qid"))
        .orderBy(order, col("cid").asc)))
      .filter(col("ark") <= poolK)
      .select(col("qid"), col("cid"))

  /** Exact float32-cosine rescore of a (qid, cid) pool against the raw
    * embeddings table, final top `k` — the stage-2 tail every rung
    * shares ([[Pq]]'s exactRescore shape), with one deployment upgrade:
    * the pool is CONSTANT-bounded (rescoreFactor·k per query over a
    * bounded panel), so its distinct cids are collected and pushed into
    * the float scan as a literal IN — at 100 TB the fetch reads only
    * the row groups containing pool members instead of scanning the
    * whole 256 B/row table to feed a broadcast join (the adaptive
    * [[TextDedup.indexPruneMaxKeys]] policy the standing-index probes
    * ride; an oversized pool falls back to the flat scan+join plan).
    * The pool frame is checkpointed once — read by the cid collect and
    * the join, never recomputed.
    */
  /** Prune `base` to a CHECKPOINTED pool's distinct cids via a literal
    * IN on `keyCol` — the fetch-only-pool-rows move every rung stage
    * past stage 1 rides: the pool is constant-bounded
    * (rescoreFactor·k·nQueries rows), so its cids collect cheaply and
    * push into the scan as row-group-prunable predicates; an oversized
    * pool (past [[TextDedup.indexPruneMaxKeys]]) falls back to the flat
    * scan+broadcast-join plan, which is then the right plan anyway.
    */
  private def poolPruned(base: DataFrame, keyCol: String,
                         pool: DataFrame): DataFrame =
    IndexCatalog.pruneToKeys(base, keyCol,
      IndexCatalog.collectKeys(pool, "cid"))

  private[graft] def exactRescore(spark: SparkSession, dir: String,
                                  pool: DataFrame, qf: DataFrame,
                                  nQueries: Int, k: Int): DataFrame = {
    val p = pool.localCheckpoint(true)
    val cf = poolPruned(
      embeddings(spark, dir).filter(col("vec_id") >= nQueries),
      "vec_id", p)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        norm(col("embedding")).as("cn"))
    val wExact = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid").asc)
    cf.join(broadcast(p), Seq("cid"))
      .join(broadcast(qf.select(col("qid"), col("qe"), col("qn"))),
        Seq("qid"))
      .select(col("qid"), col("cid"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("sim"))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank").cast("long").as("rank"),
        round6(col("sim")).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Stage-1 Hamming pool read from the STANDING binary table — split
    * out so the plan pin can assert it scans the 16 B rung rows and
    * never the embeddings parquet.
    */
  private[graft] def binaryPool(spark: SparkSession, dir: String,
                                nQueries: Int, qh: DataFrame,
                                poolK: Int): DataFrame =
    binaryPoolFrom(spark.table(binTable(dir, binKey(nQueries))), qh, poolK)

  /** [[binaryPool]] over a CALLER-SUPPLIED scan of the binary-rung
    * table — the seam [[Forget.binaryIndexedTopKLive]] threads its
    * tombstone anti-join through (the filter must precede the pool
    * window, so it composes on the scan, not the pool).
    */
  private[graft] def binaryPoolFrom(scan: DataFrame, qh: DataFrame,
                                    poolK: Int): DataFrame =
    poolOf(
      scan.crossJoin(broadcast(qh))
        .select(col("qid"), col("cid"),
          expr("bit_count(qh1 ^ ch1) + bit_count(qh2 ^ ch2)").as("hamm")),
      col("hamm").asc, poolK)

  /** [[Similarity.binaryRescoreTopK]] against the STANDING table:
    * identical output (RungSpec pins it), but stage 1 reads ONLY the
    * (cid, ch1, ch2) rows — at 100 TB, 16 payload bytes per row instead
    * of 256.
    */
  def binaryIndexedTopK(spark: SparkSession, dir: String, nQueries: Int,
                        k: Int, rescoreFactor: Int = 4): DataFrame = {
    ensureBinaryIndex(spark, dir, nQueries)
    val q = headQueries(spark, dir, nQueries)
      .withColumn("qh1", packSigns(col("qe"), 1, 32))
      .withColumn("qh2", packSigns(col("qe"), 33, 64))
    val pool = binaryPool(spark, dir, nQueries,
      q.select(col("qid"), col("qh1"), col("qh2")), rescoreFactor * k)
    exactRescore(spark, dir, pool, q, nQueries, k)
  }

  /** Stage-1 prefix-cosine pool from the STANDING matryoshka table. */
  private[graft] def matryoshkaPool(spark: SparkSession, dir: String,
                                    nQueries: Int, dPrefix: Int,
                                    qp: DataFrame, poolK: Int): DataFrame =
    matryoshkaPoolFrom(
      spark.table(mrlTable(dir, mrlKey(nQueries, dPrefix))), qp, poolK)

  /** [[matryoshkaPool]] over a caller-supplied scan — the
    * [[binaryPoolFrom]] seam for the prefix rung.
    */
  private[graft] def matryoshkaPoolFrom(scan: DataFrame, qp: DataFrame,
                                        poolK: Int): DataFrame =
    poolOf(
      scan.crossJoin(broadcast(qp))
        .select(col("qid"), col("cid"),
          (dot(col("qpe"), col("cpe")) / (col("qpn") * col("cpn")))
            .as("ascore")),
      col("ascore").desc, poolK)

  /** [[Similarity.matryoshkaRescoreTopK]] against the STANDING table:
    * stage 1 reads ONLY the (cid, cpe, cpn) rows — `dPrefix/dim` of the
    * float bytes, with the prefix norm precomputed at build.
    */
  def matryoshkaIndexedTopK(spark: SparkSession, dir: String, nQueries: Int,
                            k: Int, dPrefix: Int = 16,
                            rescoreFactor: Int = 4): DataFrame = {
    ensureMatryoshkaIndex(spark, dir, nQueries, dPrefix)
    val q = headQueries(spark, dir, nQueries)
      .withColumn("qpe", slice(col("qe"), 1, dPrefix))
      .withColumn("qpn", norm(col("qpe")))
    val pool = matryoshkaPool(spark, dir, nQueries, dPrefix,
      q.select(col("qid"), col("qpe"), col("qpn")), rescoreFactor * k)
    exactRescore(spark, dir, pool, q, nQueries, k)
  }

  /** Stage-1 de-quantized int8 pool from the STANDING int8 table — the
    * [[HashExpressions.DotInt8]] kernel over the packed payload, the
    * identical IEEE sequence as the on-the-fly array form (every
    * partial sum an exact integer, so packing cannot change a digit).
    */
  private[graft] def int8Pool(spark: SparkSession, dir: String,
                              nQueries: Int, q8: DataFrame,
                              poolK: Int): DataFrame =
    int8PoolFrom(spark.table(i8Table(dir, i8Key(nQueries))), q8, poolK)

  /** [[int8Pool]] over a caller-supplied scan — the [[binaryPoolFrom]]
    * seam for the int8 rung.
    */
  private[graft] def int8PoolFrom(scan: DataFrame, q8: DataFrame,
                                  poolK: Int): DataFrame =
    poolOf(
      scan.crossJoin(broadcast(q8))
        .select(col("qid"), col("cid"),
          (HashExpressions.dotInt8(col("qq8"), col("q8")) *
            col("qscale") * col("cscale") /
            lit(127.0 * 127.0) / (col("qn") * col("cn"))).as("ascore")),
      col("ascore").desc, poolK)

  /** The query panel's int8 side: packed payload + scale + norm,
    * derived on the fly (nQueries rows).
    */
  private[graft] def int8Queries(spark: SparkSession, dir: String,
                                 nQueries: Int): DataFrame =
    i8Frame(embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("cid"), col("embedding")))
      .select(col("cid").as("qid"), col("q8").as("qq8"),
        col("cscale").as("qscale"), col("cn").as("qn"))

  /** [[Similarity.int8RescoreTopK]] against the STANDING table: stage 1
    * reads ONLY the (cid, q8, cscale, cn) rows — a 64 B binary payload
    * plus two doubles per row instead of the 256 B float vector.
    */
  def int8IndexedTopK(spark: SparkSession, dir: String, nQueries: Int,
                      k: Int, rescoreFactor: Int = 4): DataFrame = {
    ensureInt8Index(spark, dir, nQueries)
    val pool = int8Pool(spark, dir, nQueries,
      int8Queries(spark, dir, nQueries), rescoreFactor * k)
    exactRescore(spark, dir, pool, headQueries(spark, dir, nQueries),
      nQueries, k)
  }

  // ——————— external query vectors against the standing rung tables ———————
  // (every search family carries the caller-supplied-panel surface —
  // the r12 contract; the standing tables cover vec_id >= nQueries, so
  // each external form equals its on-the-fly twin at minCid = nQueries)

  /** [[binaryIndexedTopK]] for a CALLER-SUPPLIED query frame (qid, qe):
    * the panel packs its sign halves query-side (tiny, broadcast); the
    * corpus side stays the standing 16 B rows.
    */
  def binaryIndexedTopK(spark: SparkSession, dir: String,
                        queries: DataFrame, nQueries: Int, k: Int,
                        rescoreFactor: Int): DataFrame = {
    ensureBinaryIndex(spark, dir, nQueries)
    val q = Similarity.normQueries(queries)
      .withColumn("qh1", packSigns(col("qe"), 1, 32))
      .withColumn("qh2", packSigns(col("qe"), 33, 64))
    val pool = binaryPool(spark, dir, nQueries,
      q.select(col("qid"), col("qh1"), col("qh2")), rescoreFactor * k)
    exactRescore(spark, dir, pool, q, nQueries, k)
  }

  /** [[matryoshkaIndexedTopK]] for a CALLER-SUPPLIED query frame. */
  def matryoshkaIndexedTopK(spark: SparkSession, dir: String,
                            queries: DataFrame, nQueries: Int, k: Int,
                            dPrefix: Int, rescoreFactor: Int): DataFrame = {
    ensureMatryoshkaIndex(spark, dir, nQueries, dPrefix)
    val q = Similarity.normQueries(queries)
      .withColumn("qpe", slice(col("qe"), 1, dPrefix))
      .withColumn("qpn", norm(col("qpe")))
    val pool = matryoshkaPool(spark, dir, nQueries, dPrefix,
      q.select(col("qid"), col("qpe"), col("qpn")), rescoreFactor * k)
    exactRescore(spark, dir, pool, q, nQueries, k)
  }

  /** [[int8IndexedTopK]] for a CALLER-SUPPLIED query frame — the panel
    * quantizes and packs query-side through the SAME [[i8Frame]] the
    * table build ran (float corpus rows and double caller panels both
    * pass: the quantized values are exact integers either way).
    */
  def int8IndexedTopK(spark: SparkSession, dir: String,
                      queries: DataFrame, nQueries: Int, k: Int,
                      rescoreFactor: Int): DataFrame = {
    ensureInt8Index(spark, dir, nQueries)
    val q = Similarity.normQueries(queries)
    val q8 = i8Frame(q.select(col("qid").as("cid"),
        col("qe").as("embedding")))
      .select(col("cid").as("qid"), col("q8").as("qq8"),
        col("cscale").as("qscale"), col("cn").as("qn"))
    val pool = int8Pool(spark, dir, nQueries, q8, rescoreFactor * k)
    exactRescore(spark, dir, pool, q, nQueries, k)
  }

  /** The COMPOSED rung (VERDICT r13 next #7) — IVF-PQ's scan-side
    * analog, a three-stage funnel over the standing tables: the 16 B
    * binary scan bounds the candidate set
    * (`rescoreBinary·rescoreInt8·k` per query by Hamming), the 64 B
    * int8 payload re-ranks ONLY those rows to `rescoreInt8·k`, and the
    * exact float tail reads 256 B rows for just that pool. Stage-1
    * bytes 16, stage-2 bytes 64, exact tail — each stage's read volume
    * shrinks as its per-row cost grows. With pools covering the corpus
    * the funnel passes everything through and the output equals exact
    * brute force (RungSpec pins it).
    */
  def cascadeTopK(spark: SparkSession, dir: String, nQueries: Int, k: Int,
                  rescoreInt8: Int = 4, rescoreBinary: Int = 2): DataFrame =
    cascadeSearch(spark, dir,
      headQueries(spark, dir, nQueries),
      int8Queries(spark, dir, nQueries), nQueries, k, rescoreInt8,
      rescoreBinary)

  /** [[cascadeTopK]] for a CALLER-SUPPLIED query frame (qid, qe) — the
    * external-panel surface the other rung searches carry; the panel
    * derives its sign halves AND its int8 side query-side.
    */
  def cascadeTopK(spark: SparkSession, dir: String, queries: DataFrame,
                  nQueries: Int, k: Int, rescoreInt8: Int,
                  rescoreBinary: Int): DataFrame = {
    val q = Similarity.normQueries(queries)
    cascadeSearch(spark, dir, q,
      i8Frame(q.select(col("qid").as("cid"), col("qe").as("embedding")))
        .select(col("cid").as("qid"), col("q8").as("qq8"),
          col("cscale").as("qscale"), col("cn").as("qn")),
      nQueries, k, rescoreInt8, rescoreBinary)
  }

  /** The cascade's stage-2 re-rank frame, split out so the spec pins
    * its executed plan: the int8-table FETCH is pruned to the binary
    * pool's cids by a literal IN (the [[exactRescore]] move one stage
    * earlier — VERDICT r14 weak #1: without it the mid-stage read the
    * FULL 64 B/row int8 table to probe a constant-bounded broadcast
    * pool, making the funnel's total scan bytes WORSE than the plain
    * int8 rung at scale). With the prune each stage's read volume
    * genuinely shrinks as its per-row cost grows: 16 B corpus-wide,
    * 64 B for pool1's rows only, 256 B for pool2's rows only.
    */
  private[graft] def cascadeStage2(spark: SparkSession, dir: String,
                                   pool1: DataFrame, q8: DataFrame,
                                   nQueries: Int, poolK: Int): DataFrame = {
    val p1 = pool1.localCheckpoint(true)
    poolOf(
      poolPruned(spark.table(i8Table(dir, i8Key(nQueries))), "cid", p1)
        .join(broadcast(p1), Seq("cid"))
        .join(broadcast(q8), Seq("qid"))
        .select(col("qid"), col("cid"),
          (HashExpressions.dotInt8(col("qq8"), col("q8")) *
            col("qscale") * col("cscale") /
            lit(127.0 * 127.0) / (col("qn") * col("cn"))).as("ascore")),
      col("ascore").desc, poolK)
  }

  /** The registered width grid [[cascadeSweep]] prices — ONE constant
    * so the engine rows and the DuckDB oracle's generated CTEs can
    * never drift apart.
    */
  val cascadeSweepWidths: Seq[(Int, Int)] =
    Seq((1, 2), (2, 2), (2, 4), (4, 4))

  /** Width-tuning artifact for the composed funnel — the
    * `ann_nprobe_sweep` sibling: recall@k of the binary→int8→float
    * cascade across a (rescoreBinary, rescoreInt8) width grid, next to
    * each width's per-query pool rows. Stage 2 reads 64 B for each of
    * `pool1_rows_per_query`, the exact tail 256 B for each of
    * `pool2_rows_per_query`, so the table IS the bytes-vs-recall
    * frontier a deployment picks its funnel widths from, the way
    * `ann_nprobe_sweep` picks the probe width.
    *
    * ONE scored pass feeds every width: the three standing payloads
    * join once per (qid, cid) — a TUNING artifact priced like
    * [[Similarity.compressionRecall]]'s truth pass (it reads the float
    * rows corpus-wide once; the production search path never does) —
    * then each width is a rank-filter cascade over the shared
    * checkpointed stage-1 frame, capped at the widest pool. Ranking
    * doubles are the identical IEEE sequences as the search operators,
    * so each width row equals what [[cascadeTopK]] at that width would
    * score (ties toward the smaller cid throughout).
    */
  def cascadeSweep(spark: SparkSession, dir: String, nQueries: Int, k: Int,
                   widths: Seq[(Int, Int)] = cascadeSweepWidths)
      : DataFrame = {
    ensureBinaryIndex(spark, dir, nQueries)
    ensureInt8Index(spark, dir, nQueries)
    val qSide = headQueries(spark, dir, nQueries)
      .select(col("qid"), col("qe"),
        packSigns(col("qe"), 1, 32).as("qh1"),
        packSigns(col("qe"), 33, 64).as("qh2"))
      .join(int8Queries(spark, dir, nQueries), Seq("qid"))
    val scored = spark.table(binTable(dir, binKey(nQueries)))
      .join(spark.table(i8Table(dir, i8Key(nQueries))), Seq("cid"))
      .join(embeddings(spark, dir).filter(col("vec_id") >= nQueries)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")),
        Seq("cid"))
      .crossJoin(broadcast(qSide))
      .select(col("qid"), col("cid"),
        expr("bit_count(qh1 ^ ch1) + bit_count(qh2 ^ ch2)").as("hamm"),
        (HashExpressions.dotInt8(col("qq8"), col("q8")) *
          col("qscale") * col("cscale") /
          lit(127.0 * 127.0) / (col("qn") * col("cn"))).as("ascore"),
        (dot(col("qe"), col("ce")) / (col("qn") * col("cn"))).as("sim"))
    val wHamm = Window.partitionBy(col("qid"))
      .orderBy(col("hamm").asc, col("cid").asc)
    val wSim = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("cid").asc)
    val wI8 = Window.partitionBy(col("qid"))
      .orderBy(col("ascore").desc, col("cid").asc)
    val maxPool1 = widths.map { case (b, i) => b * i * k }.max
    // the one scored pass, materialized ONCE — both the stage-1 pool
    // and the truth panel derive from the checkpoint (review r15: two
    // independent localCheckpoints re-ran the corpus-wide scoring join
    // twice, doubling the artifact's documented price)
    val sc = scored.localCheckpoint(true)
    // the stage-1 pool and the truth panel both derive from the shared
    // checkpoint but not from each other, and each width row is
    // independent of its siblings — materialize both layers
    // concurrently (r17, guide §2.6): pool/truth windows overlap, then
    // the four width cascades overlap (each collapses to one row)
    val Seq(pool1All, truth) = graft.ops.Concurrent.materialize(Seq(
      () => sc
        .withColumn("brk", row_number().over(wHamm))
        .filter(col("brk") <= maxPool1),
      () => sc.withColumn("rk", row_number().over(wSim))
        .filter(col("rk") <= k).select(col("qid"), col("cid"))))
    val totals = truth.agg(count(lit(1)).as("n_true"))
    graft.ops.Concurrent.materialize(widths.map { case (b, i) => () =>
      pool1All.filter(col("brk") <= b * i * k)
        .withColumn("irk", row_number().over(wI8))
        .filter(col("irk") <= i * k)
        .withColumn("rk", row_number().over(wSim))
        .filter(col("rk") <= k)
        .select(col("qid"), col("cid"))
        .join(broadcast(truth), Seq("qid", "cid"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(b).as("rescore_binary"), lit(i).as("rescore_int8"),
          lit(b.toLong * i * k).as("pool1_rows_per_query"),
          lit(i.toLong * k).as("pool2_rows_per_query"), col("n_hits"))
    }).reduce(_ unionByName _)
      .crossJoin(broadcast(totals))
      .select(col("rescore_binary"), col("rescore_int8"),
        col("pool1_rows_per_query"), col("pool2_rows_per_query"),
        col("n_hits"), col("n_true"),
        round6(col("n_hits").cast("double") / col("n_true")).as("recall"))
      .orderBy(col("rescore_binary"), col("rescore_int8"))
  }

  /** The binary→int8→float funnel both cascade forms share: `q` is the
    * normalized (qid, qe, qn) frame, `q8` its packed int8 side.
    */
  private def cascadeSearch(spark: SparkSession, dir: String, q: DataFrame,
                            q8: DataFrame, nQueries: Int, k: Int,
                            rescoreInt8: Int, rescoreBinary: Int)
      : DataFrame = {
    ensureBinaryIndex(spark, dir, nQueries)
    ensureInt8Index(spark, dir, nQueries)
    val qh = q
      .withColumn("qh1", packSigns(col("qe"), 1, 32))
      .withColumn("qh2", packSigns(col("qe"), 33, 64))
    val pool1 = binaryPool(spark, dir, nQueries,
      qh.select(col("qid"), col("qh1"), col("qh2")),
      rescoreBinary * rescoreInt8 * k)
    val pool2 = cascadeStage2(spark, dir, pool1, q8, nQueries,
      rescoreInt8 * k)
    exactRescore(spark, dir, pool2, q, nQueries, k)
  }
}
