package graft

import org.apache.spark.sql.functions._

import graft.catalyst.HashExpressions
import graft.ext.TextAnalysis

/** The full BPE trainer behind `tokenizer_bpe_merges`: the merge order
  * must be deterministic (count desc, then (l, r) lexicographic — the
  * paper's Python `max` is dict-order-dependent, the engine's is
  * pinned), the merge step must be greedy left-to-right non-overlapping
  * on the ORIGINAL sequence, and iteration 1 must agree with the
  * standalone `tokenizer_pair_counts` statistics.
  */
class BpeMergeSpec extends SparkTestBase {
  import spark.implicits._

  test("merge step kernel: greedy left-to-right, non-overlapping, no " +
    "in-step re-matching") {
    val df = Seq(
      (1L, Seq("a", "a", "a", "a")),     // run of 3 candidates -> merge 1st, 3rd
      (2L, Seq("a", "a", "a")),          // -> ["aa", "a"]
      (3L, Seq("x", "a", "a", "y")),     // isolated pair
      (4L, Seq("a", "b"))                // no (a,a) at all
    ).toDF("id", "syms")
    val got = df.select(col("id"),
        HashExpressions.bpeMergePair(col("syms"), lit("a"), lit("a"))
          .as("m"))
      .orderBy(col("id")).collect().map(_.getSeq[String](1))
    assert(got(0) == Seq("aa", "aa"))
    assert(got(1) == Seq("aa", "a"))
    assert(got(2) == Seq("x", "aa", "y"))
    assert(got(3) == Seq("a", "b"))
    // a symbol formed by the step does not re-match within the step:
    // merging (a, aa) over [a, a, a] finds NO candidate pair until a
    // prior step has formed "aa"
    val chained = Seq(Seq("a", "aa", "x")).toDF("syms")
      .select(HashExpressions.bpeMergePair(col("syms"), lit("a"), lit("aa")))
      .collect().head.getSeq[String](0)
    assert(chained == Seq("aaa", "x"))
  }

  test("merge kernel equals a naive driver-side reference over seeded " +
    "random symbol sequences") {
    import scala.util.Random
    val rnd = new Random(41)
    def naiveMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val alphabet = Seq("a", "b", "ab", "ba", "</w>")
    val cases = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(12)
      val syms = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length)))
      val l = alphabet(rnd.nextInt(alphabet.length))
      val r = alphabet(rnd.nextInt(alphabet.length))
      (i.toLong, syms, l, r)
    }
    // one job: l/r bound as COLUMNS, exercising the non-literal children
    val got = cases.toDF("id", "syms", "l", "r")
      .select(col("id"),
        HashExpressions.bpeMergePair(col("syms"), col("l"), col("r"))
          .as("m"))
      .collect().map(row => row.getLong(0) -> row.getSeq[String](1)).toMap
    cases.foreach { case (id, syms, l, r) =>
      assert(got(id) == naiveMerge(syms, l, r),
        s"case $id: merge($syms, $l, $r) = ${got(id)}, " +
          s"expected ${naiveMerge(syms, l, r)}")
    }
  }

  test("trainer on a hand-computable corpus: counts, tie-break, and " +
    "merge order are exact") {
    // vocabulary: "low" x3, "lower" x1 => symbols l o w </w> (+ e r)
    val docs = Seq("low low lower low").toDF("text")
    val got = TextAnalysis.bpeMergesOf(spark, docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    // iteration 1: pairs (l,o)=4, (o,w)=4, (w,</w>)=3, (w,e)=1, (e,r)=1,
    // (r,</w>)=1 -> tie 4 vs 4 broken lexicographically: (l,o)
    assert(got(0) == ((1L, "l", "o", 4L)), s"got ${got.toSeq}")
    // iteration 2: (lo,w)=4 is now the unique max
    assert(got(1) == ((2L, "lo", "w", 4L)), s"got ${got.toSeq}")
    // iteration 3: (low,</w>)=3
    assert(got(2) == ((3L, "low", "</w>", 3L)), s"got ${got.toSeq}")
  }

  test("merge table is deterministic across runs and input partitioning") {
    val dir = "/root/testdata/sf0.001"
    val a = TextAnalysis.bpeMerges(spark, dir, 6).collect().toSeq
    val b = TextAnalysis.bpeMerges(spark, dir, 6).collect().toSeq
    assert(a == b && a.size == 6)
    val shuffled = graft.ops.Ingest.table(spark, dir, "documents")
      .repartition(7, col("lang"))
    val c = TextAnalysis.bpeMergesOf(spark, shuffled, 6).collect().toSeq
    assert(a == c, "merge order must not depend on input partitioning")
  }

  test("encode applies the trained merges via the dict: hand-computed " +
    "token counts and compression") {
    // after 3 merges ((l,o), (lo,w), (low,</w>)) on "low low lower
    // low": low -> [low</w>] (1 subword), lower -> [low, e, r, </w>]
    // (4). One doc, 4 words, 3*1 + 4 = 7 BPE tokens, 3+3+5+3 = 14 chars
    val docs = Seq((7L, "low low lower low")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncodeOf(spark, docs, 3).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L &&
      r.getLong(2) == 7L && r.getLong(3) == 14L &&
      r.getDouble(4) == 2.0, s"got ${r.toSeq}")
  }

  test("vocab rollup on the hand corpus: occurrence mass and word " +
    "coverage per subword") {
    // after 3 merges: low(x3) -> [low</w>], lower(x1) -> [low, e, r, </w>]
    val docs = Seq("low low lower low").toDF("text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_vocab")
    docs.withColumn("doc_id", lit(1L))
      .write.parquet(s"$dir/documents.parquet")
    val vocab = TextAnalysis.bpeVocab(spark, dir.toString, 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // low</w> occurs 3x in 1 word; low/e/r/</w> occur 1x in 1 word
    assert(vocab == Seq(("low</w>", 3L, 1L), ("</w>", 1L, 1L),
      ("e", 1L, 1L), ("low", 1L, 1L), ("r", 1L, 1L)), vocab.toString)
  }

  test("merge curve: zero-merge identity, monotone compression, and " +
    "agreement with the encode rollup") {
    val dir = "/root/testdata/sf0.001"
    val curve = TextAnalysis.bpeMergeCurve(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(curve.keySet == Set(0L, 5L, 10L))
    // at zero merges every word is chars + the </w> marker — exactly
    curve.values.foreach { r =>
      if (r.getLong(0) == 0L)
        assert(r.getLong(2) == r.getLong(3) + r.getLong(1),
          "n_bpe_tokens(0) must be n_chars + n_words")
    }
    // merging can only shrink the token stream; words/chars are fixed
    val ts = Seq(0L, 5L, 10L).map(m => curve(m).getLong(2))
    assert(ts.sliding(2).forall(w => w(0) >= w(1)), ts)
    assert(ts.head > ts.last, "ten merges must actually compress")
    assert(Seq(0L, 5L, 10L).map(m => curve(m).getLong(1)).distinct.size == 1)
    assert(Seq(0L, 5L, 10L).map(m => curve(m).getLong(3)).distinct.size == 1)
    // the 10-merge point is the per-doc encode rollup, summed
    val enc = TextAnalysis.bpeEncode(spark, dir, nMerges = 10)
      .agg(sum(col("n_bpe_tokens"))).head.getLong(0)
    assert(curve(10L).getLong(2) == enc)
  }

  test("iteration 1 agrees with tokenizer_pair_counts' top pair") {
    val dir = "/root/testdata/sf0.001"
    val top = TextAnalysis.bpePairCounts(spark, dir, k = 1).collect().head
    val first = TextAnalysis.bpeMerges(spark, dir, 1).collect().head
    assert(first.getString(3) == top.getString(0), // merged == pair
      s"trainer's first merge ${first.getString(3)} != pair_counts top ${top.getString(0)}")
    assert(first.getLong(4) == top.getLong(1))
  }
}
