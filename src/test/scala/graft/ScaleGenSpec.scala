package graft

import org.apache.spark.sql.functions._
import graft.tools.ScaleGen

/** [[graft.tools.ScaleGen]] — the replica generator behind the measured
  * 10×/100× scale-up bench. The properties pinned here are exactly the
  * ones the bench's honesty rests on: schemas unchanged (Bench runs
  * against the scaled dir untouched), replica 0 byte-identical (fixed
  * query panels keep their meaning), FK joins closed within a replica
  * (TPC-H plans see a bigger SF, not orphaned keys), and the
  * perturbations decorrelating WITHOUT changing marginal distributions
  * (no ×factor² LSH-bucket blowup, no artificial duplicate mass).
  */
class ScaleGenSpec extends SparkTestBase {

  private val base = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_spec")
      .toString
    ScaleGen.generate(spark, base, dir, 3)
    dir
  }
  private def baseT(t: String) = spark.read.parquet(s"$base/$t.parquet")
  private def scaledT(t: String) = spark.read.parquet(s"$out/$t.parquet")

  test("schemas are unchanged and counts scale: dims ×1, facts ×factor") {
    for (t <- ScaleGen.tables) {
      assert(scaledT(t).schema === baseT(t).schema, s"schema drift: $t")
      val mult = if (t == "region" || t == "nation") 1 else 3
      assert(scaledT(t).count() === baseT(t).count() * mult, s"count: $t")
    }
  }

  test("replica 0 is the base data verbatim (fixed panels keep meaning)") {
    for (t <- Seq("documents", "embeddings", "lineitem")) {
      val rep0 = scaledT(t).filter(
        col(scaledT(t).columns.head) < 10000000L)
      assert(rep0.exceptAll(baseT(t)).isEmpty &&
        baseT(t).exceptAll(rep0).isEmpty, s"replica-0 drift: $t")
    }
  }

  test("FK joins are closed within a replica: no orphan lineitem keys") {
    val orphans = scaledT("lineitem")
      .join(scaledT("orders"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    assert(orphans.isEmpty)
    val partOrphans = scaledT("lineitem")
      .join(scaledT("part"),
        col("l_partkey") === col("p_partkey"), "left_anti")
    assert(partOrphans.isEmpty)
  }

  test("text permutation: non-base replicas decorrelate shingles but " +
    "keep the word multiset (length/vocab/lang marginals exact)") {
    val joined = scaledT("documents")
      .filter(col("doc_id") >= 10000000L)
      .withColumn("base_id", col("doc_id") % 10000000L)
      .withColumn("rep", (col("doc_id") / 10000000L).cast("long"))
      .select(col("base_id"), col("rep"), col("text").as("perm_text"))
      .join(baseT("documents").select(col("doc_id").as("base_id"),
        col("text")), "base_id")
    val multisetDrift = joined.filter(
      array_sort(split(col("text"), " ")) =!=
        array_sort(split(col("perm_text"), " "))).count()
    assert(multisetDrift === 0)
    // the honesty pin the r16 rotation lacked: replicas must NOT be
    // shingle near-dups of their base (rotation preserved interior
    // n-grams, J ≈ 0.75, and pair mass grew ×factor² — the r17 ×100
    // spot bench's pipeline_* super-linearity). Assert the 3-gram
    // Jaccard vs base is below the 0.5 verify threshold for every
    // replica of every doc long enough to have reorderable shingles.
    val sh = (c: org.apache.spark.sql.Column) =>
      graft.ext.TextDedup.shingles(split(c, " "), 3)
    val jac = joined
      .filter(size(split(col("text"), " ")) > 6)
      .select((size(array_intersect(sh(col("text")), sh(col("perm_text"))))
        .cast("double") /
        size(array_union(sh(col("text")), sh(col("perm_text")))))
        .as("j"))
      .agg(max(col("j")).as("mx"), avg(col("j")).as("mean")).head()
    assert(jac.getDouble(0) < 0.5,
      s"a replica is a verified near-dup of its base: max J = ${jac.getDouble(0)}")
    assert(jac.getDouble(1) < 0.1,
      s"replicas correlate with their base: mean J = ${jac.getDouble(1)}")
  }

  test("permutation creates no artificial within-replica near-dup mass " +
    "and planted base pairs recur once per replica") {
    // all-pairs exact Jaccard per replica (the spec corpus is small
    // enough): the permuted replicas must carry ~the base's pair count
    // — not the ×factor² clique blowup of the r16 rotation, and not the
    // bag-canonicalization explosion of a word-keyed sort (measured
    // 52,200 pairs per 2,000 docs vs 45 base before this pin existed).
    val sh = (c: org.apache.spark.sql.Column) =>
      graft.ext.TextDedup.shingles(split(c, " "), 3)
    def pairCount(rep: Long): Long = {
      val docs = scaledT("documents")
        .filter(col("doc_id") >= rep * 10000000L &&
          col("doc_id") < (rep + 1) * 10000000L)
        .select(col("doc_id"), sh(col("text")).as("s"))
      docs.alias("a").crossJoin(docs.alias("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .filter(size(array_intersect(col("a.s"), col("b.s")))
          .cast("double") /
          size(array_union(col("a.s"), col("b.s"))) >= 0.5)
        .count()
    }
    val base = pairCount(0)
    for (r <- 1L to 2L) {
      val c = pairCount(r)
      assert(c <= base * 2 && c >= base / 2,
        s"replica $r near-dup pair mass $c vs base $base")
    }
  }

  test("embedding perturbation: norms exactly preserved, cosine to the " +
    "base vector decorrelated (no artificial duplicate mass)") {
    val dot = (a: String, b: String) =>
      aggregate(zip_with(col(a), col(b), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
    val joined = scaledT("embeddings")
      .filter(col("vec_id") >= 10000000L)
      .withColumn("base_id", col("vec_id") % 10000000L)
      .select(col("base_id"), col("embedding").as("e2"))
      .join(baseT("embeddings").select(col("vec_id").as("base_id"),
        col("embedding").as("e1")), "base_id")
      .select(dot("e1", "e1").as("n1"), dot("e2", "e2").as("n2"),
        dot("e1", "e2").as("d12"))
      .withColumn("cos", col("d12") / sqrt(col("n1") * col("n2")))
    assert(joined.filter(abs(col("n1") - col("n2")) > 1e-4).count() === 0,
      "norm drift")
    val stats = joined.agg(max(abs(col("cos"))).as("mx")).head()
    assert(stats.getDouble(0) < 0.9,
      s"a replica vector is near-duplicate of its base: ${stats.getDouble(0)}")
  }
}
