package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  test("latestPerKey keeps exactly one row per key, ordered") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 3L, 30.0), ("a", 2L, 20.0),
      ("b", 5L, 50.0)).toDF("id", "ts", "v")
    val latest = Dedup.latestPerKey(df, Seq("id"), Seq(col("ts").desc))
      .orderBy("id").collect()
    assert(latest.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 5L)))
    val first = Dedup.latestPerKey(df, Seq("id"), Seq(col("ts").asc))
      .orderBy("id").collect()
    assert(first.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 5L)))
  }

  test("minhash estimator audit: every candidate matches >= 2 slots (a " +
    "band collision IS two matching slots), error on the 1/8 grid") {
    val rows = graft.ext.TextDedup
      .minhashEstimateError(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nMatch = r.getLong(r.fieldIndex("n_match"))
      // candidates exist because some band's 2 consecutive slots agreed
      assert(nMatch >= 2L && nMatch <= 8L)
      val est = r.getDouble(r.fieldIndex("est"))
      assert(est == nMatch / 8.0)
      val j = r.getDouble(r.fieldIndex("jaccard"))
      val err = r.getDouble(r.fieldIndex("abs_err"))
      assert(math.abs(err - math.abs(est - j)) < 2e-6)
    }
  }

  test("winnowing guarantee: every planted shared run of >= w+k-1 tokens " +
    "forces a shared fingerprint (seeded random docs)") {
    val k = 4; val w = 4
    val rnd = new scala.util.Random(1234)
    def word(): String = "w" + rnd.nextInt(5000)
    // 30 doc pairs, each sharing one random run of exactly w+k-1 tokens
    // embedded at random offsets inside otherwise-unrelated text
    val docs = (0 until 30).flatMap { i =>
      val run = Seq.fill(w + k - 1)(word())
      def doc(id: Long): (Long, String) = {
        val pre = Seq.fill(rnd.nextInt(20))(word())
        val post = Seq.fill(rnd.nextInt(20))(word())
        (id, (pre ++ run ++ post).mkString(" "))
      }
      Seq(doc(2L * i), doc(2L * i + 1))
    }.toDF("doc_id", "text")
    val fps = graft.ext.TextDedup.winnowFingerprints(docs, k, w)
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getString(1)).toSet }
    (0 until 30).foreach { i =>
      val a = fps(2L * i); val b = fps(2L * i + 1)
      assert(a.intersect(b).nonEmpty,
        s"pair $i shares a ${w + k - 1}-token run but no fingerprint")
    }
    // density: selection keeps far fewer fingerprints than grams
    val nGrams = docs.select(col("doc_id"),
        explode(sequence(lit(1), greatest(size(split(col("text"), " ")) -
          lit(k - 1), lit(0)))).as("p")).count()
    assert(fps.values.map(_.size).sum < nGrams)
  }

  test("winnowing short-doc edges: fewer than w grams still fingerprints " +
    "(one full-doc window); fewer than k tokens contributes nothing") {
    val k = 4; val w = 4
    val docs = Seq(
      (1L, "a b c d e"),   // 2 grams < w: one window over both
      (2L, "a b c")        // < k tokens: no grams
    ).toDF("doc_id", "text")
    val fps = graft.ext.TextDedup.winnowFingerprints(docs, k, w)
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.length }
    assert(fps(1L) == 1)
    assert(!fps.contains(2L))
  }

  test("CDC boundary-shift property: prepending tokens changes only the " +
    "prefix chunks — the suffix chunk sequence is preserved (seeded)") {
    val k = 4
    val rnd = new scala.util.Random(77)
    (0 until 10).foreach { trial =>
      val base = Seq.fill(120 + rnd.nextInt(80))("w" + rnd.nextInt(500))
      val prefix = Seq.fill(1 + rnd.nextInt(9))("p" + rnd.nextInt(500))
      val docs = Seq(
        (1L, base.mkString(" ")),
        (2L, (prefix ++ base).mkString(" "))).toDF("doc_id", "text")
      val ch = graft.ext.TextDedup.cdcChunksOf(docs, k).collect()
        .groupBy(_.getLong(0))
        .map { case (d, rs) =>
          d -> rs.sortBy(_.getLong(1)).map(_.getString(3)).toSeq
        }
      val orig = ch(1L).drop(1) // all but the first (prefix-region) chunk
      assert(orig.nonEmpty, s"trial $trial: doc produced a single chunk")
      assert(ch(2L).takeRight(orig.length) == orig,
        s"trial $trial: suffix chunks not preserved under prepend")
    }
  }

  test("insertOnlyMerge drops rows whose keys already exist in target") {
    val batch = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("bucket", "id")
    val target = Seq((1L, "x"), (9L, "z")).toDF("bucket", "id")
    val out = Dedup.insertOnlyMerge(batch, target, "bucket", "id")
      .orderBy("bucket", "id").collect()
    // (1,x) exists; (2,z) survives because bucket differs from (9,z)
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "y"), (2L, "z")))
  }

  test("insertOnlyMerge with bucket pruning only consults listed buckets") {
    val batch = Seq((1L, "x")).toDF("bucket", "id")
    val target = Seq((1L, "x"), (2L, "x")).toDF("bucket", "id")
    val out = Dedup.insertOnlyMerge(batch, target, "bucket", "id",
      Some(Seq(1L))).collect()
    assert(out.isEmpty) // the (1,x) duplicate is found within the pruned set
  }

  test("insertOnlyMergeSmallBatch matches the single-anti form and never " +
    "shuffles the target") {
    val batch = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("bucket", "id")
    val target = Seq((1L, "x"), (9L, "z"), (1L, "q")).toDF("bucket", "id")
    val plain = Dedup.insertOnlyMerge(batch, target, "bucket", "id")
      .orderBy("bucket", "id").collect().toSeq
    val small = Dedup.insertOnlyMergeSmallBatch(batch, target, "bucket", "id")
      .orderBy("bucket", "id").collect().toSeq
    assert(small == plain)
    // plan shape: both joins broadcast (the batch is the build side
    // everywhere); no shuffle exchange anywhere in the merge
    val df = Dedup.insertOnlyMergeSmallBatch(batch, target, "bucket", "id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("exact dedup keeps the minimum tie-break row") {
    val df = Seq(("t", 3L), ("t", 1L), ("u", 2L)).toDF("text", "doc")
    val out = Dedup.exact(df, Seq("text"), "doc").orderBy("doc").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("t", 1L), ("u", 2L)))
  }
}
