package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of one query (or a pushdown/
  * broadcast summary of all) — the plan-quality audit the 100 TB design
  * review needs. Usage:
  *   sbt "runMain graft.tools.Explain [queryName] [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the Verify/Bench fixture: audit the forget queries' plans with
    // the tombstone logs POPULATED (the production probe side). Guarded
    // like Verify/Bench (ADVICE r16): a corpus without the events/
    // documents tables must not kill the whole plan audit.
    try graft.SparkEntry.registerForgetFixtures(spark, dir)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[explain] forget fixture registration " +
          s"skipped: ${e.getMessage}")
    }
    if (args.nonEmpty && args(0) != "all") {
      graft.SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    } else {
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val df = fn(spark, dir)
        df.collect() // materialize so AQE settles on the final plan
        val plan = df.queryExecution.executedPlan.toString()
        def has(s: String) = if (plan.contains(s)) "Y" else "-"
        val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
        println(f"[explain] $name%-22s codegen=${has("*(")}" +
          f" bcastJoin=${has("BroadcastHashJoin")} smj=${has("SortMergeJoin")}" +
          f" pushedFilters=${if (pushed) "Y" else "-"}" +
          f" exchanges=${"Exchange".r.findAllIn(plan).size}%2d" +
          f" topK=${has("TakeOrderedAndProject")}")
      }
    }
    spark.stop()
  }
}
