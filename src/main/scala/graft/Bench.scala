package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line.
  *
  * A warmup pass at sf0.001 runs first so the timed pass measures
  * steady-state execution (codegen classes compiled, JIT warm, file
  * metadata cached) rather than first-query JVM startup costs — the
  * number that actually projects to a long-running cluster.
  *
  * Each query is timed SPARK_GRAFT_BENCH_N times (default 3) and the
  * per-query MINIMUM is reported: this host's wall-clock swings up to 3×
  * under outside load, and the min over a few runs is the standard
  * low-noise estimator of the code's actual cost (round-2 bench showed
  * untouched queries "regressing" 9× at n=1). Runs round-robin the whole
  * query set (pass 1 of all queries, then pass 2, ...) so a transient
  * host stall inflates at most one pass of each query rather than all
  * repeats of the unlucky one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDirDefault = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional comma-separated subset for targeted perf iteration;
    // the driver's full run leaves this unset.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // fail fast on a typo'd name — a silent empty selection would emit an
    // empty benchmark that reads as "nothing regressed"
    only.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not registered: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val selected = only match {
      case Some(s) => SparkEntry.queries.filter { case (n, _) => s(n) }
      case None    => SparkEntry.queries
    }

    // the tombstone fixture (both dirs — warmup runs every query too):
    // registered once so the forget queries time the steady-state read
    // path, not per-rep registration probes
    Seq(warmDirDefault, sfDir).distinct.foreach { d =>
      try SparkEntry.registerForgetFixtures(spark, d)
      catch { case e: Throwable =>
        System.err.println(s"[bench] forget fixture failed for $d: ${e.getMessage}")
      }
    }
    selected.foreach { case (_, fn) =>
      try fn(spark, warmDirDefault).count() catch { case _: Throwable => () }
    }

    // per-query progress on stderr (NOT the driver-scraped stdout):
    // a hung query at a big SF is identifiable from the log tail
    // instead of a jstack guessing game
    val verbose = sys.env.get("SPARK_GRAFT_BENCH_VERBOSE").contains("1")
    val names = selected.toSeq.sortBy(_._1)
    val best = scala.collection.mutable.Map[String, Double]()
    // host-load provenance (r15 VERDICT next #2): the r15 driver bench
    // read 22% above the same-HEAD canonical run with the shift diffuse
    // across untouched plans — host noise, but nothing in the artifact
    // let a reader adjudicate that. Record the 1-minute loadavg at the
    // timed loop's start and end plus wall timestamps, so a hot-host
    // run is identifiable from the JSON alone.
    def loadavg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val wallStartMs = System.currentTimeMillis()
    val loadStart = loadavg()
    for (rep <- 1 to reps; (name, fn) <- names) {
      if (verbose) System.err.println(s"[bench] rep $rep start $name")
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      if (verbose) System.err.println(f"[bench] rep $rep done  $name $sec%.2f s")
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
    }
    val results = names.map { case (name, _) => name -> best(name) }
    val loadEnd = loadavg()
    val wallEndMs = System.currentTimeMillis()
    // Locale.ROOT: f"%.2f" under a comma-decimal default locale (de_DE)
    // would emit "1,23" — invalid JSON, recreating the parsed:null
    // failure this line exists to avoid. Double.toString is locale-safe.
    def fmt2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def toJson(rs: Seq[(String, Double)], round2: Boolean): String = {
      val qs = rs.map { case (k, v) =>
        val vv = if (round2) fmt2(v) else v.toString
        "\"" + k + "\":" + vv
      }.mkString("{", ",", "}")
      val total = results.map(_._2).sum
      val tv = if (round2) fmt2(total) else total.toString
      val prov = s""""loadavg_start":${fmt2(loadStart)},"loadavg_end":${fmt2(loadEnd)},""" +
        s""""wall_start_ms":$wallStartMs,"wall_sec":${fmt2((wallEndMs - wallStartMs) / 1e3)}"""
      s"""{"metric":"total","value":$tv,"unit":"sec","queries":$qs,"sf":"$sfDir","n":$reps,"n_queries":${results.size},$prov}"""
    }
    // The driver scrapes a SMALL tail of stdout (~500 bytes observed):
    // r6/r7 lost the full 115-query line, and r8's slowest-10 compact
    // line STILL lost its head to the window (parsed: null three rounds
    // running). The full map goes to BENCH_LOCAL.json; stdout's final
    // line is now slowest-5 at 2 decimals (≈200 bytes) and is printed
    // AFTER spark.stop() so no shutdown log line can land behind it.
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (toJson(results, round2 = false) + "\n").getBytes("UTF-8"))
    spark.stop()
    println(toJson(results.sortBy(-_._2).take(5).sortBy(_._1), round2 = true))
  }
}
