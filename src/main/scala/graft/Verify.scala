package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-query wall-clock cap: one pathological hang must not consume
    // the whole verification run (failures are already isolated per
    // query; a timed-out job keeps its thread but later queries proceed).
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "600").toLong
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // Optional comma-separated subset for fast local iteration (the
    // driver's gate leaves this unset and dumps everything); the oracle
    // json below always carries the full map so a subset run still
    // composes with tools/check_oracle.py on just the dumped dirs.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(s) =>
        val unknown = s -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_VERIFY_ONLY names not registered: ${unknown.toSeq.sorted.mkString(", ")}")
        SparkEntry.queries.filter { case (n, _) => s(n) }
      case None => SparkEntry.queries
    }
    // the tombstone fixture: the deterministic deletion sets the forget
    // queries' oracles assume, registered once so the queries price the
    // read path (isolated like the per-query failures — a fixture error
    // must not zero the other 200+ queries)
    try SparkEntry.registerForgetFixtures(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] forget fixture failed: ${e.getMessage}")
    }
    selected.foreach { case (name, fn) =>
      // coalesce(1) is REQUIRED, not a convenience: the driver's compare
      // (tools/check_oracle.py mirrors it) reads rows in file order and
      // diffs positionally, so the single sorted file must carry the
      // query's total ORDER BY. It costs little — coalesce preserves the
      // sort and only serializes the final write, not the compute below
      // the last shuffle.
      try Await.result(Future {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }, timeoutSec.seconds)
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
