package graft

import org.apache.spark.sql.functions._

import graft.catalyst.HashExpressions
import graft.ext.Classifier

/** The NB text classifier (ext.Classifier): kernel parity with the HOF
  * formulation, feature-space math against a naive driver reference,
  * model-mass invariants, the loud-failure contract of the scoring
  * kernel, and evidence the model actually learns on the test corpus.
  */
class ClassifierSpec extends SparkTestBase {

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  test("ClfBuckets kernel equals a naive driver-side 12-bit reference " +
    "over seeded random token arrays (multi-byte tokens, empty docs)") {
    import spark.implicits._
    import scala.util.Random
    val rnd = new Random(47)
    val alphabet = Seq("a", "bb", "λ", "Ωx", "", "mid word")
    val cases = (0 until 150).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(9))(alphabet(rnd.nextInt(alphabet.length))))
    }
    def bucket(g: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      ((d(0) & 0xff) << 4) | ((d(1) & 0xf0) >>> 4)
    }
    def naive(toks: Seq[String]): Seq[Long] = {
      val m = math.max(toks.length - 1, 1)
      (0 until m).map { i =>
        val parts = Seq(toks.lift(i), toks.lift(i + 1)).flatten
        bucket(parts.mkString(" ")).toLong
      }
    }
    val got = cases.toDF("id", "toks")
      .select(col("id"), HashExpressions.clfBuckets(col("toks")).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cases.foreach { case (id, toks) =>
      assert(got(id) == naive(toks), s"case $id: $toks")
      assert(got(id).forall(b => b >= 0L && b < 4096L))
    }
  }

  test("ClfScore folds the buckets against given count arrays exactly") {
    import spark.implicits._
    val docs = Seq((1L, Seq("a", "b", "c")), (2L, Seq("x")), (3L, Seq.empty[String]))
      .toDF("id", "toks")
    val hof = docs
      .select(col("id"), HashExpressions.clfBuckets(col("toks")).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val p = (0L until 4096L).toArray
    val n = (0L until 4096L).map(_ * 7 % 1000).toArray
    val scored = docs.select(col("id"), HashExpressions.clfScore(
      col("toks"), typedLit(p.toSeq), typedLit(n.toSeq)).as("sc"))
      .select(col("id"), col("sc.n_grams"), col("sc.num"), col("sc.den"))
      .collect()
    scored.foreach { row =>
      val bs = hof(row.getLong(0))
      assert(row.getLong(1) == bs.length)
      assert(row.getLong(2) == bs.map(b => p(b.toInt) + 1L).sum)
      assert(row.getLong(3) == bs.map(b => n(b.toInt) + 1L).sum)
    }
  }

  test("ClfScore refuses short and null-bearing count arrays loudly") {
    import spark.implicits._
    val docs = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    val short = (0L until 10L).toArray
    val ok = (0L until 4096L).toArray
    val ex = intercept[Exception] {
      docs.select(HashExpressions.clfScore(col("toks"),
        typedLit(short.toSeq), typedLit(ok.toSeq))).collect()
    }
    assert(ex.getMessage.contains("4096") ||
      ex.getCause != null && ex.getCause.getMessage.contains("4096"))
  }

  test("scoreAll kernel form is bit-for-bit with the HOF parity oracle") {
    val a = Classifier.scoreAll(spark, sf001).collect()
    val b = Classifier.scoreAllViaHof(spark, sf001).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("model counts partition the training sample's gram mass") {
    val model = Classifier.trainedModel(spark, sf001)
    val mass = model.agg(
      sum(col("pos_cnt")).as("p"), sum(col("neg_cnt")).as("n"))
      .collect().head
    val expected = spark.read
      .parquet(s"$sf001/documents.parquet")
      .filter(graft.ext.Curation.sampleKey < "8000")
      .select(greatest(size(split(col("text"), " ")) - 1, lit(1)).as("g"))
      .agg(sum(col("g"))).collect().head.getLong(0)
    assert(mass.getLong(0) + mass.getLong(1) == expected)
    // every bucket row carries at least one observation, ids in range
    val bad = model.filter(col("pos_cnt") + col("neg_cnt") === 0L ||
      col("feature_id") < 0L || col("feature_id") >= 4096L).count()
    assert(bad == 0L)
  }

  test("confusion matrix sums to the corpus and matches the scored frame") {
    val cm = Classifier.confusion(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(cm.values.sum == 500L)
    val recomputed = Classifier.scoreAll(spark, sf01)
      .select(when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
        col("pred"))
      .groupBy(col("y"), col("pred")).count().collect()
      .map(r => (r.getLong(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(cm == recomputed)
  }

  test("PR sweep: recall non-increasing in threshold, positives " +
    "conserved, threshold-1.0 row equals the confusion matrix") {
    val rows = Classifier.prSweep(spark, sf01).collect()
      .sortBy(_.getDouble(0))
    assert(rows.length == 5)
    val posTotals = rows.map(r =>
      r.getLong(r.fieldIndex("tp")) + r.getLong(r.fieldIndex("fn")))
    assert(posTotals.distinct.length == 1) // tp+fn = all positives, always
    val recalls = rows.map { r =>
      if (r.isNullAt(r.fieldIndex("recall"))) 0.0
      else r.getDouble(r.fieldIndex("recall"))
    }
    recalls.zip(recalls.tail).foreach { case (a, b) => assert(a >= b) }
    val at1 = rows.find(_.getDouble(0) == 1.0).get
    val cm = Classifier.confusion(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)) -> r.getLong(2)).toMap
      .withDefaultValue(0L)
    assert(at1.getLong(at1.fieldIndex("tp")) == cm((1L, true)))
    assert(at1.getLong(at1.fieldIndex("fp")) == cm((-1L, true)))
    assert(at1.getLong(at1.fieldIndex("fn")) == cm((1L, false)))
  }

  test("the model learns: accuracy beats the majority base rate on sf0.01") {
    val cm = Classifier.confusion(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)) -> r.getLong(2)).toMap
      .withDefaultValue(0L)
    val total = cm.values.sum.toDouble
    val acc = (cm((1L, true)) + cm((-1L, false))) / total
    val pos = (cm((1L, true)) + cm((1L, false))) / total
    val base = math.max(pos, 1 - pos)
    assert(acc > base + 0.05,
      s"accuracy $acc should clearly beat the majority base rate $base")
    assert(acc > 0.7, s"expected the bigram signal to yield > 0.7, got $acc")
  }

  test("scoreAgainstModel refuses an input frame carrying a reserved " +
    "column instead of silently clobbering it") {
    import spark.implicits._
    val model = Classifier.modelFor(spark, sf001)
    val clashing = Seq((1L, "the cat sat", 0.5))
      .toDF("doc_id", "text", "weight")
    val e = intercept[IllegalArgumentException] {
      Classifier.scoreAgainstModel(clashing, model)
    }
    assert(e.getMessage.contains("weight"))
    // a clean frame with extra NON-reserved columns passes them through
    val ok = Classifier.scoreAgainstModel(
      Seq((1L, "the cat sat", "keepme")).toDF("doc_id", "text", "extra"),
      model)
    assert(ok.columns.contains("extra") && ok.columns.contains("pred"))
    assert(ok.count() == 1)
  }
}
