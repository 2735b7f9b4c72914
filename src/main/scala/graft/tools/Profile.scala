package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for the heavy extension queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    import graft.ext.TextDedup
    time("docShingles")(TextDedup.docShingles(spark, dir).count())
    time("signatures")(TextDedup.signatures(spark, dir).count())
    time("bands")(TextDedup.bands(TextDedup.signatures(spark, dir)).count())
    time("bands2")(TextDedup.bands(TextDedup.signatures(spark, dir)).count())
    time("groupOnly")(TextDedup.bands(TextDedup.signatures(spark, dir))
      .groupBy(org.apache.spark.sql.functions.col("band"),
        org.apache.spark.sql.functions.col("band_hash"))
      .count().count())
    time("candidatePairs")(TextDedup.candidatePairs(spark, dir).count())
    time("candidatePairs2")(TextDedup.candidatePairs(spark, dir).count())
    time("nearDupPairs")(TextDedup.nearDupPairs(spark, dir, 0.5).count())
    time("simhashPairs")(TextDedup.simhashPairs(spark, dir, 3).count())
    spark.stop()
  }
}
