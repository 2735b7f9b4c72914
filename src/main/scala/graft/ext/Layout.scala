package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Ingest
import graft.ops.Exact.round6

/** Data-layout operators: Z-order (Morton) interleaving and the min/max
  * pruning manifest that justifies it.
  *
  * Why this is an engine op and not a storage detail: at 100 TB the
  * dominant cost of most queries is the scan, and the scan is only
  * skippable if each file's min/max footer statistics cover a NARROW
  * range of the filtered column. A layout sorted by one key gives narrow
  * extents on that key and full-width extents on every other; Z-order
  * interleaves the bits of two keys so every file covers a small
  * rectangle in (a, b) space — predicates on EITHER column prune most
  * files (the technique behind Delta/Iceberg OPTIMIZE ZORDER; Morton
  * 1966). The engine expresses the z-value as pure bit arithmetic on
  * codegen'd built-ins — writers just `repartitionByRange(zval)` /
  * `sortWithinPartitions(zval)` before writing, and the cluster-side
  * cost is one range shuffle, the same as any global sort.
  *
  * [[zOrderManifest]] makes the claim checkable: it computes, for the
  * same rows, per-file extent manifests under a plain range layout
  * (sorted by `user_id` alone) and under the z-order layout, so the
  * b-dimension extent shrink — the pruning win — is a queryable number
  * rather than a doc claim.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of `a` (even
    * positions) and `b` (odd positions). Pure shift/and/or arithmetic —
    * codegen'd, scan-local, reproducible in any engine.
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The same interleave spelled as SQL, for the DuckDB oracle (and any
    * SQL-only consumer): `zValueSql("a", "b", 10)`.
    */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Per-file extent manifest under two layouts of the silver event
    * projection: `range` (files = contiguous `user_id` ranges — the
    * single-key sort layout) vs `zorder` (files = contiguous z-value
    * ranges over (user_id, time-slot)).
    *
    * Dimensions are wrapped to `bits`-bit non-negatives (`% 2^bits`) —
    * the standard trick when a dimension's raw range exceeds the
    * interleave width; wrapping costs locality only across wrap
    * boundaries. Each manifest row is one would-be file: its row count
    * and min/max of both dimensions — exactly the parquet footer stats a
    * reader prunes on. `tslot_span` is the pruning signal: under `range`
    * it stays ~full-width (every user is active at all times, so a
    * time-slot predicate prunes nothing); under `zorder` it shrinks
    * toward the rectangle edge, so the same predicate skips most files.
    *
    * Scale shape: one scan-local projection (the z-value is bit math),
    * one map-side-combined groupBy per layout over ≤ `files` keys —
    * costs at 100 TB exactly what two tiny aggregations cost. The layout
    * WRITE itself (not shown) is `repartitionByRange(files, zval)`: one
    * range shuffle, identical to any sorted-write path.
    */
  def zOrderManifest(spark: SparkSession, dir: String, bits: Int = 10,
                     files: Int = 64): DataFrame = {
    val wrap = 1L << bits
    val ev = Ingest.silverProjection(spark, dir)
      .select(pmod(col("user_id"), lit(wrap)).as("u"),
        pmod(col("minute_timestamp"), lit(wrap)).as("tslot"))
    // bucket = file id: top log2(files) bits of the layout key, so each
    // bucket is a contiguous key range = one written file
    val zShift = 2 * bits - (63 - java.lang.Long.numberOfLeadingZeros(files.toLong)).toInt
    val zOrd = ev.withColumn("zval", zValue(col("u"), col("tslot"), bits))
      .withColumn("file_id", shiftright(col("zval"), zShift))
      .withColumn("layout", lit("zorder"))
    val rShift = bits - (63 - java.lang.Long.numberOfLeadingZeros(files.toLong)).toInt
    val rng = ev.withColumn("file_id", shiftright(col("u"), rShift))
      .withColumn("layout", lit("range"))
    zOrd.select(col("layout"), col("file_id"), col("u"), col("tslot"))
      .unionByName(rng.select(col("layout"), col("file_id"), col("u"), col("tslot")))
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("u")).as("min_u"), max(col("u")).as("max_u"),
        min(col("tslot")).as("min_t"), max(col("tslot")).as("max_t"),
        (max(col("tslot")) - min(col("tslot"))).as("tslot_span"))
      .orderBy(col("layout"), col("file_id"))
  }

  /** Deterministic global training-order shuffle — the reproducible
    * permutation every pretraining run needs before sharding (the
    * "document-level shuffle" of the C4/Pile/Dolma builds): each doc's
    * order key is a pure hash of (`salt`, doc_id), so the permutation
    * is a function of the corpus and the salt alone — identical across
    * engines, retries, partitionings, and re-runs, which
    * `df.orderBy(rand())` is not. Emits (doc_id, shard, pos): `shard`
    * from two independent hash hex digits, `pos` = the doc's 1-based
    * rank within its shard in hash order — together the exact byte
    * layout a sharded writer produces.
    *
    * Scale shape: the order key and shard are scan-local codegen'd
    * projections (md5 + substring + base-16 parse). The within-shard
    * rank NEVER serializes a shard through one task — a naive
    * `row_number over (partition by shard)` would put 1/nShards of the
    * corpus in a single reducer at 100 TB — it rides
    * [[graft.ops.Analytics.blockedCumCount]]'s distributed block
    * prefix sum (approximate splitters balance hash-contiguous blocks;
    * block-local sums; ≤64 block totals per shard through the rollup).
    * Hash keys are unique per doc with overwhelming probability (52-bit
    * space), and the cumulative-count RANGE semantics make the
    * vanishing tie case identical in the DuckDB oracle.
    *
    * The physical write this frame prescribes (not run here) is
    * `repartitionByRange(col("shard"), col("hkey"))` +
    * `sortWithinPartitions` — one range shuffle, same cost class as
    * any sorted write.
    */
  def shuffleLayout(spark: SparkSession, dir: String, nShards: Int = 4,
                    salt: String = "s42"): DataFrame = {
    val h = md5(concat(lit(salt), lit(":"), col("doc_id").cast("string")))
    val keyed = Ingest.table(spark, dir, "documents")
      .select(col("doc_id"),
        conv(substring(h, 1, 13), 16, 10).cast("long").as("hkey"),
        pmod(conv(substring(h, 14, 2), 16, 10).cast("long"),
          lit(nShards.toLong)).as("shard"))
    val grid = keyed.groupBy(col("shard"), col("hkey"))
      .agg(count(lit(1)).as("c"))
    graft.ops.Analytics.blockedCumCount(grid, Seq("shard"), "hkey", "c")
      .join(keyed, Seq("shard", "hkey"))
      .select(col("doc_id"), col("shard"), col("cum").as("pos"))
      .orderBy(col("shard"), col("pos"), col("doc_id"))
  }

  /** Curriculum (annealing) training order — [[shuffleLayout]] with a
    * quality phase in front of the hash key: docs rank into `nPhases`
    * quality bands (exact cumulative-count tertiles by default) and
    * each shard reads its phases in ascending order, shuffled WITHIN a
    * phase — so the last tokens a training run sees are its highest
    * quality, the mid-training annealing recipe (the "high-quality
    * last" data schedule of the OLMo 2 / Llama 3 reports), while each
    * phase stays an unbiased hash shuffle. Emits (doc_id, phase,
    * shard, pos) with `pos` the 1-based within-shard read position.
    *
    * Scale shape: the quality score is a scan-local projection
    * ([[TextAnalysis.quality]]); its 6-digit-rounded grid has ≤ 1e6+1
    * distinct values BY CONSTRUCTION, so the phase boundary pass rides
    * [[graft.ops.Analytics.blockedCumCount]] over a bounded grid that
    * then BROADCASTS back onto the corpus — integer band arithmetic,
    * never a corpus-wide rank window. The within-shard position is the
    * [[shuffleLayout]] block prefix sum over the composite
    * (phase · 2^53 + hkey) key — exact BIGINT arithmetic in both
    * engines, no shard ever collapsing into one task. Ties on a
    * shared score land in the same band in both engines (cumulative
    * RANGE semantics), keeping the phase assignment deterministic.
    */
  def curriculumLayout(spark: SparkSession, dir: String, nShards: Int = 4,
                       nPhases: Int = 3, salt: String = "s42"): DataFrame = {
    val scored = TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("quality_score").as("qs"))
    val qGrid = scored.groupBy(col("qs")).agg(count(lit(1)).as("c"))
    // checkpointed: BOUNDED by construction (≤ 1e6+1 distinct rounded
    // scores) and read three times below (band join, corpus size, and
    // through the position pass's reuse of `keyed`) — materializing
    // collapses the repeated lineage the way [[graft.ext.Similarity]]
    // checkpoints its bounded assignment frames
    val qCum = graft.ops.Analytics.blockedCumCount(qGrid, Seq.empty,
      "qs", "c").localCheckpoint(true)
    // the corpus size is the grid's last cumulative count — one row off
    // the bounded frame, never a third corpus scan
    val total = qCum.agg(max(col("cum")).as("n_total"))
    val h = md5(concat(lit(salt), lit(":"), col("doc_id").cast("string")))
    val keyed = scored
      .join(broadcast(qCum.select(col("qs"), col("cum"))), Seq("qs"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        // band index as exact cross-multiplied comparisons — Spark's
        // `/` on longs is DOUBLE division, and a floor() of a near-
        // integer ratio can misround at scale; boolean sums cannot
        (1 until nPhases).map(b =>
          ((col("cum") - 1L) * nPhases.toLong >=
            lit(b.toLong) * col("n_total")).cast("long"))
          // foldLeft, not reduce: nPhases = 1 (plain shuffle, no
          // curriculum) has zero boundaries and must read phase 0
          .foldLeft(lit(0L))(_ + _).as("phase"),
        conv(substring(h, 1, 13), 16, 10).cast("long").as("hkey"),
        pmod(conv(substring(h, 14, 2), 16, 10).cast("long"),
          lit(nShards.toLong)).as("shard"))
      .withColumn("skey",
        col("phase") * lit(1L << 53) + col("hkey"))
    val grid = keyed.groupBy(col("shard"), col("skey"))
      .agg(count(lit(1)).as("c"))
    graft.ops.Analytics.blockedCumCount(grid, Seq("shard"), "skey", "c")
      .join(keyed, Seq("shard", "skey"))
      .select(col("doc_id"), col("phase"), col("shard"),
        col("cum").as("pos"))
      .orderBy(col("shard"), col("pos"), col("doc_id"))
  }

  /** Stratified source interleave — the training order in which a
    * reader sees every source at its corpus share THROUGHOUT the
    * epoch, not just in aggregate: source `s`'s `r`-th doc (in
    * deterministic hash order) lands at interleave position
    * `(2r−1)·N / n_s` — the classic stride placement, which keeps
    * every prefix of the stream within ±1 doc per source of exact
    * proportionality. [[shuffleLayout]] randomizes WHICH doc comes
    * next; this fixes HOW OFTEN each source comes up — the
    * "homogenized mixture" a loss curve wants when sources differ in
    * quality (no mid-epoch distribution shift).
    *
    * Determinism contract: the position is two exactly-rounded IEEE
    * ops on exact integers (`(2r−1) · (N/n_s)` in fixed order) — both
    * engines produce the identical double, and the output order
    * tie-breaks on doc_id, so the layout is reproducible across
    * engines, retries, and reshards like the rest of the family.
    *
    * Scale shape: per-source ranks ride the same
    * [[graft.ops.Analytics.blockedCumCount]] distributed prefix sum as
    * [[shuffleLayout]] (a hot source never serializes through one
    * task); source sizes are a sources-sized fold broadcast back. The
    * prescribed physical write is `repartitionByRange(ipos)` +
    * `sortWithinPartitions`, one range shuffle.
    */
  def interleaveLayout(spark: SparkSession, dir: String,
                       salt: String = "s42"): DataFrame =
    interleaveOf(Ingest.table(spark, dir, "documents"), salt)

  /** [[interleaveLayout]] over an arbitrary (doc_id, source) frame —
    * the form the seeded property spec drives with skewed synthetic
    * corpora.
    */
  private[graft] def interleaveOf(docs: DataFrame,
                                  salt: String): DataFrame = {
    val h = md5(concat(lit(salt), lit(":"), col("doc_id").cast("string")))
    val keyed = docs
      .select(col("doc_id"), col("source"),
        conv(substring(h, 1, 13), 16, 10).cast("long").as("hkey"))
    val grid = keyed.groupBy(col("source"), col("hkey"))
      .agg(count(lit(1)).as("c"))
    val ranks = graft.ops.Analytics.blockedCumCount(grid, Seq("source"),
      "hkey", "c")
    val sizes = ranks.groupBy(col("source")).agg(max(col("cum")).as("n_src"))
    val total = sizes.agg(sum(col("n_src")).as("n_total"))
    ranks.join(keyed, Seq("source", "hkey"))
      .join(broadcast(sizes), Seq("source"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("source"), col("cum").as("src_rank"),
        round6((col("cum") * 2L - 1L).cast("double") *
          (col("n_total").cast("double") / col("n_src").cast("double")))
          .as("ipos"))
      .orderBy(col("ipos"), col("doc_id"))
  }
}
