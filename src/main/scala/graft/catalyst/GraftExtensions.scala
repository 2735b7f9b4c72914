package graft.catalyst

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.catalyst.HashExpressions.{DotDouble, MinHashChunks, SimHash64, WordShingles}

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

  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash64" -> (exprs => SimHash64(exprs.head)),
    "graft_minhash_chunks" -> (exprs => MinHashChunks(exprs.head)),
    "graft_dot" -> (exprs => DotDouble(exprs(0), exprs(1))),
    "graft_word_shingles" -> (exprs => exprs(1) match {
      case Literal(n: Int, _) => WordShingles(exprs.head, n)
      case other => throw new IllegalArgumentException(
        s"graft_word_shingles(tokens, n): n must be an integer literal, got $other")
    })
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
