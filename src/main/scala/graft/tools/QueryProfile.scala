package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Empirical per-query cost breakdown (optimization guide §1): runs one
  * registered query warm, then times it with a listener that accounts
  * wall into jobs/stages and sums task metrics — executor run time,
  * shuffle read/write bytes, input bytes, GC — so "where do the seconds
  * go" is measured, not guessed. Usage:
  *   sbt "runMain graft.tools.QueryProfile <query>[,<query>...] [sfDir] [cpus]"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <query>[,..] [sfDir] [cpus]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else
      Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.registerForgetFixtures(spark, dir)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[qprof] forget fixture skipped: ${e.getMessage}") }

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskRunMs = 0L
    @volatile var gcMs = 0L
    @volatile var shufReadB = 0L
    @volatile var shufWriteB = 0L
    @volatile var inputB = 0L
    @volatile var deserMs = 0L
    @volatile var resultSerMs = 0L
    @volatile var schedDelayProxyMs = 0L // task wall minus run/deser/ser
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          taskRunMs += m.executorRunTime
          gcMs += m.jvmGCTime
          shufReadB += m.shuffleReadMetrics.totalBytesRead
          shufWriteB += m.shuffleWriteMetrics.bytesWritten
          inputB += m.inputMetrics.bytesRead
          deserMs += m.executorDeserializeTime
          resultSerMs += m.resultSerializationTime
          val wall = t.taskInfo.duration
          schedDelayProxyMs += math.max(0L,
            wall - m.executorRunTime - m.executorDeserializeTime -
              m.resultSerializationTime)
        }
      }
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm pass (codegen compiled, file metadata cached)
      fn(spark, dir).count()
      jobs = 0; stages = 0; tasks = 0; taskRunMs = 0; gcMs = 0
      shufReadB = 0; shufWriteB = 0; inputB = 0; deserMs = 0
      resultSerMs = 0; schedDelayProxyMs = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wallSec = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"[qprof] $name wall=${wallSec}%.3f s jobs=$jobs stages=$stages" +
        f" tasks=$tasks taskRun=${taskRunMs / 1e3}%.2f s gc=${gcMs / 1e3}%.2f s" +
        f" deser=${deserMs / 1e3}%.2f s resultSer=${resultSerMs / 1e3}%.2f s" +
        f" schedGap=${schedDelayProxyMs / 1e3}%.2f s")
      println(f"[qprof] $name input=${inputB / 1e6}%.1f MB" +
        f" shufRead=${shufReadB / 1e6}%.1f MB shufWrite=${shufWriteB / 1e6}%.1f MB" +
        f" parallelEff=${taskRunMs / 1e3 / wallSec}%.1fx")
    }
    spark.stop()
  }
}
