package graft

import graft.ext.TextDedup

/** VERDICT r7 #7 — exact substring-level dedup semantics on synthetic
  * corpora: reconstruction identity where nothing repeats across
  * documents, wholesale removal of cross-document verbatim runs (every
  * occurrence — the Lee et al. 2021 policy), and within-document-only
  * repetition left untouched (the threshold counts DISTINCT documents).
  * The sf-corpus oracle row (`dedup_substring`) is the other half of the
  * gate; PlanAuditSpec pins the plan cartesian-free.
  */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val n = 5

  test("reconstruction identity: no cross-document repeats rebuild verbatim") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "short text")) // below n tokens: no grams, must survive intact
      .toDF("doc_id", "text")
    val out = TextDedup.substringDedupOf(docs, n, 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("clean_text")).toSeq == Seq(
      "alpha beta gamma delta epsilon zeta eta",
      "one two three four five six seven eight nine",
      "short text"))
    assert(out.forall(_.getAs[Long]("n_removed") == 0L))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(7L, 9L, 2L))
  }

  test("cross-document verbatim runs vanish from every occurrence; " +
    "the surrounding text survives in order") {
    val shared = "the quick brown fox jumps over the lazy dog tonight" // 10 toks
    val docs = Seq(
      (1L, shared),
      (2L, shared),
      (3L, s"intro words here $shared closing words now"))
      .toDF("doc_id", "text")
    val out = TextDedup.substringDedupOf(docs, n, 2)
      .orderBy("doc_id").collect()
    // docs 1 and 2: every position is covered by some shared 5-gram
    assert(out(0).getAs[String]("clean_text") == "" &&
      out(0).getAs[Long]("n_removed") == 10L)
    assert(out(1).getAs[String]("clean_text") == "" &&
      out(1).getAs[Long]("n_removed") == 10L)
    // doc 3: exactly the shared run is removed — no gram that straddles
    // the run boundary occurs elsewhere, so the frame text is untouched
    assert(out(2).getAs[String]("clean_text") ==
      "intro words here closing words now",
      s"doc 3 rebuilt as '${out(2).getAs[String]("clean_text")}'")
    assert(out(2).getAs[Long]("n_removed") == 10L)
  }

  test("run-length threshold: a short shared phrase survives, a long " +
    "shared run still vanishes") {
    val longRun = "the quick brown fox jumps over the lazy dog tonight" // 10
    val phrase = "as a matter of fact" // exactly 5 tokens → run of 5 < 8
    val docs = Seq(
      (1L, s"alpha beta $longRun gamma delta"),
      (2L, s"epsilon zeta $longRun eta theta"),
      (3L, s"iota kappa $phrase lambda mu nu"),
      (4L, s"xi omicron pi $phrase rho sigma"))
      .toDF("doc_id", "text")
    val out = TextDedup.substringDedupRunsOf(docs, n, 2, minRun = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == "alpha beta gamma delta" &&
      out(0).getAs[Long]("n_removed") == 10L)
    assert(out(1).getAs[String]("clean_text") == "epsilon zeta eta theta")
    // the 5-token phrase is covered (>= minDocs) but its run is < 8:
    // both docs rebuild verbatim
    assert(out(2).getAs[String]("clean_text") ==
      s"iota kappa $phrase lambda mu nu" &&
      out(2).getAs[Long]("n_removed") == 0L,
      s"short phrase was shredded: ${out(2)}")
    assert(out(3).getAs[String]("clean_text") ==
      s"xi omicron pi $phrase rho sigma")
  }

  test("property: engine output equals a driver-side brute-force " +
    "reference over seeded random corpora (base + run-length forms)") {
    import scala.util.Random
    val rnd = new Random(7)
    def reference(docs: Seq[(Long, String)], n: Int,
                  minRun: Int): Map[Long, (Long, Long, String)] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
      val gramDocs = scala.collection.mutable.Map[Seq[String], Set[Long]]()
      toks.foreach { case (id, w) =>
        w.sliding(n).filter(_.size == n)
          .foreach(g => gramDocs(g) = gramDocs.getOrElse(g, Set()) + id)
      }
      toks.map { case (id, w) =>
        val cov = Array.fill(w.size)(false)
        for (i <- 0 to w.size - n
             if w.size >= n && gramDocs(w.slice(i, i + n)).size >= 2;
             j <- i until i + n) cov(j) = true
        // keep only maximal covered runs of >= minRun
        val keep = Array.fill(w.size)(false)
        var i = 0
        while (i < w.size) {
          if (cov(i)) {
            var j = i
            while (j < w.size && cov(j)) j += 1
            if (j - i >= minRun) (i until j).foreach(keep(_) = true)
            i = j
          } else i += 1
        }
        val clean = w.zipWithIndex.collect {
          case (t, k) if !keep(k) => t
        }.mkString(" ")
        id -> ((w.size.toLong, keep.count(identity).toLong, clean))
      }.toMap
    }
    val vocab = (0 until 30).map(i => s"w$i")
    for (trial <- 1 to 5) {
      var docs = (0 until 6).map { d =>
        (d.toLong, Seq.fill(8 + rnd.nextInt(18))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      if (trial % 2 == 0) // force a long cross-doc run some trials
        docs = docs.updated(5, (5L, docs.head._2))
      val df = docs.toDF("doc_id", "text")
      for (minRun <- Seq(n, 8)) {
        val expected = reference(docs, n, minRun)
        val got = (if (minRun == n) TextDedup.substringDedupOf(df, n, 2)
                   else TextDedup.substringDedupRunsOf(df, n, 2, minRun))
          .collect().map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
              r.getAs[String]("clean_text")))).toMap
        assert(got == expected,
          s"trial $trial minRun $minRun:\n$got\nvs\n$expected")
      }
    }
  }

  test("within-document-only repetition is kept (threshold counts " +
    "distinct documents)") {
    val docs = Seq(
      (1L, "echo delta echo delta echo delta echo delta echo delta"),
      (2L, "completely different vocabulary with no overlap at all"))
      .toDF("doc_id", "text")
    val out = TextDedup.substringDedupOf(docs, n, 2)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("n_removed") == 0L))
  }
}
