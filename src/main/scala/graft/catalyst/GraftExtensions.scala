package graft.catalyst

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate

import graft.catalyst.HashExpressions.{ClfBuckets, ClfScore, DotDouble, DsirBuckets, DsirScore, HammingHex, MinHashChunks, SimHash64, WordShingles}

/** SQL-surface registration of the engine's custom expressions, so
  * `spark.sql("SELECT graft_simhash64(split(text, ' ')) ...")` works for
  * SQL users, not just the Column API.
  *
  * Two entry points:
  *   - [[GraftExtensions]] for config-time wiring
  *     (`spark.sql.extensions=graft.catalyst.GraftExtensions`);
  *   - [[Functions.register]] for an already-running session.
  */
object Functions {

  /** Arity check at builder time — a wrong argument count fails with the
    * function's signature instead of an IndexOutOfBoundsException from
    * `exprs(i)`. (Type mismatches fail later, at analysis, through each
    * expression's own `checkInputDataTypes`.)
    */
  private def arity(name: String, sig: String, n: Int)(
      exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name$sig expects $n argument(s), got ${exprs.length}")
    exprs
  }

  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash64" -> (exprs =>
      SimHash64(arity("graft_simhash64", "(tokens)", 1)(exprs).head)),
    "graft_minhash_chunks" -> (exprs =>
      MinHashChunks(arity("graft_minhash_chunks", "(shingles)", 1)(exprs).head)),
    "graft_hamming_hex" -> (exprs => {
      val Seq(a, b) = arity("graft_hamming_hex", "(a, b)", 2)(exprs)
      HammingHex(a, b)
    }),
    "graft_dot" -> (exprs => {
      val Seq(a, b) = arity("graft_dot", "(a, b)", 2)(exprs)
      DotDouble(a, b)
    }),
    "graft_dsir_buckets" -> (exprs =>
      DsirBuckets(arity("graft_dsir_buckets", "(tokens)", 1)(exprs).head)),
    "graft_dsir_score" -> (exprs => {
      val Seq(toks, t, s) =
        arity("graft_dsir_score", "(tokens, t_counts, s_counts)", 3)(exprs)
      DsirScore(toks, t, s)
    }),
    "graft_clf_buckets" -> (exprs =>
      ClfBuckets(arity("graft_clf_buckets", "(tokens)", 1)(exprs).head)),
    "graft_clf_score" -> (exprs => {
      val Seq(toks, p, n) =
        arity("graft_clf_score", "(tokens, pos_counts, neg_counts)", 3)(exprs)
      ClfScore(toks, p, n)
    }),
    "graft_word_shingles" -> (exprs =>
      arity("graft_word_shingles", "(tokens, n)", 2)(exprs)(1) match {
        case Literal(n: Int, _) => WordShingles(exprs.head, n)
        case other => throw new IllegalArgumentException(
          s"graft_word_shingles(tokens, n): n must be an integer literal, got $other")
      }),
    // Spark's native runtime-filter sketch pair (the expressions
    // InjectRuntimeFilter plants when its 10 GB thresholds trigger),
    // surfaced to SQL so [[graft.ops.SkewJoin.bloomPrunedJoin]] can
    // build the same map-side prune declaratively at any size. No graft
    // sketch code — these are org.apache.spark.util.sketch.BloomFilter
    // under the hood, aggregated distributively (one filter per
    // partition, OR-merged).
    "graft_bloom_agg" -> (exprs => exprs match {
      case Seq(v) => new aggregate.BloomFilterAggregate(v)
      case Seq(v, Literal(n: Long, _)) =>
        new aggregate.BloomFilterAggregate(v, n)
      case _ => throw new IllegalArgumentException(
        "graft_bloom_agg(xxhash64_value[, est_items]) expects 1 or 2 arguments")
    }),
    "graft_bloom_contains" -> (exprs => {
      val Seq(b, v) = arity("graft_bloom_contains", "(bloom, value)", 2)(exprs)
      BloomFilterMightContain(b, v)
    }),
    // round-14 rung kernels + the total double floor behind
    // graft.ops.Exact.round6/round9
    "graft_pack_int8" -> (exprs =>
      HashExpressions.PackInt8(
        arity("graft_pack_int8", "(quantized_array)", 1)(exprs).head)),
    "graft_dot_int8" -> (exprs => {
      val Seq(a, b) = arity("graft_dot_int8", "(a, b)", 2)(exprs)
      HashExpressions.DotInt8(a, b)
    }),
    "graft_floor_double" -> (exprs =>
      HashExpressions.FloorDouble(
        arity("graft_floor_double", "(x)", 1)(exprs).head))
  )

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  private[catalyst] def inject(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(HashExpressions.getClass.getName, name), b))
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    Functions.inject(e)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
