package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.Pipeline

/** Out-of-band maintenance entry point — the scheduled OPTIMIZE+VACUUM
  * analog (reference utils.py:111-135, bootstrap.py:58-62) for when the
  * stream is NOT running:
  * `runMain graft.tools.Maintenance <pipelineBaseDir> [intervalSec]`.
  * With an interval it loops (cron-style service); without, it runs once
  * and exits. Each pass compacts silver (OPTIMIZE) and vacuums consumed
  * change-feed versions (VACUUM — cutoff derived from the serve
  * checkpoint's committed progress when present, else the 168-version
  * retention matching the reference's 168 h; the newest version is
  * always retained). While a silver stream IS running, use
  * [[Pipeline.Config.compactEvery]] instead — compaction swaps the
  * silver directory and must not race a concurrent micro-batch append.
  *
  * Compaction scope: silver-terminal deployments only (stage 1 as the
  * product, the shape the reference's published 4k events/s covers). If
  * a gold stage has EVER consumed this silver directory as a file
  * stream, compacting rewrites consumed rows into new file paths that
  * gold would re-fold as fresh inserts on restart — plain parquet has no
  * Delta dataChange=false to mark the rewrite as a no-op (see
  * [[Pipeline.compactSilver]]). Vacuuming the change feed is safe in
  * every deployment.
  */
object Maintenance {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Maintenance <pipelineBaseDir> [intervalSec]")
    val baseDir = args(0)
    val intervalSec = if (args.length > 1) args(1).toLong else 0L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = Pipeline.Config(baseDir)
    // a gold checkpoint means some stream has consumed silver as a file
    // source — compaction would re-feed rewritten rows (scaladoc above)
    val goldCkpt = new org.apache.hadoop.fs.Path(cfg.checkpoint("gold"))
    val silverTerminal = !goldCkpt
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(goldCkpt)
    do {
      val t0 = System.nanoTime()
      if (silverTerminal) Pipeline.compactSilver(spark, cfg)
      else println(s"[maintenance] skipping compaction: ${cfg.silverPath} " +
        "feeds a gold file stream (rewrites would re-fold; see scaladoc)")
      Pipeline.vacuumGoldChanges(spark, cfg)
      println(s"[maintenance] ${if (silverTerminal) "compacted " + cfg.silverPath + " + " else ""}" +
        f"vacuumed ${cfg.goldChangesPath} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (intervalSec > 0) Thread.sleep(intervalSec * 1000)
    } while (intervalSec > 0)
    spark.stop()
  }
}
