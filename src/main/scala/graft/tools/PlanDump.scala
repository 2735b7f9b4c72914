package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of every registered query to
  * <outDir>/<name>.txt (the optimization round's before/after plan
  * evidence), plus a one-line-per-query audit on stdout flagging the
  * scale red flags the optimization guide names: single-partition
  * windows (WindowExec with an empty partitionSpec serializes the
  * whole input onto one task), exchange count, join strategies, and
  * whether filters reached the parquet scan. Usage:
  *   sbt "runMain graft.tools.PlanDump <outDir> [sfDir]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <outDir> [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    try graft.SparkEntry.registerForgetFixtures(spark, dir)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[plandump] forget fixture skipped: ${e.getMessage}")
    }

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(s) => graft.SparkEntry.queries.filter { case (n, _) => s(n) }
      case None    => graft.SparkEntry.queries
    }

    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.collect() // let AQE settle so the dumped plan is the executed one
        val qe = df.queryExecution
        val formatted = qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
          formatted.getBytes("UTF-8"))
        // count global (partitionless) windows in the executed plan
        var globalWindows = 0
        qe.executedPlan.foreach {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => globalWindows += 1
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => globalWindows += 1
          case _ => ()
        }
        val plan = qe.executedPlan.toString()
        def has(s: String) = if (plan.contains(s)) "Y" else "-"
        println(f"[plandump] $name%-28s exchanges=${"Exchange".r.findAllIn(plan).size}%2d" +
          f" globalWindow=$globalWindows%d smj=${has("SortMergeJoin")}" +
          f" bhj=${has("BroadcastHashJoin")} codegen=${has("*(")}")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
