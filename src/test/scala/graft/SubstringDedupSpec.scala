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
