package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Event
import graft.streaming.{Pipeline, UserForget}

/** USER-level deletion through the event pipeline (round 15): the
  * read-path filter on the serving surfaces, the drain-guard deferral,
  * the full physical erase across silver/gold/change-feed/serve, the
  * serve stream's accounting surviving the in-place change scrub, and
  * the GDPR re-registration semantics (history gone, fresh rows
  * accumulate from zero).
  */
class UserForgetSpec extends SparkTestBase {

  private def freshCfg(): Pipeline.Config =
    Pipeline.Config(Files.createTempDirectory("graft_uforget").toString)

  private def ev(id: String, group: String, score: Float, tsMs: Long) =
    Event(id, group, score, tsMs)

  test("full pipeline erase: tombstoned user vanishes from the read path " +
    "immediately, the apply scrubs silver + gold + change feed + serve, " +
    "a restarted serve stream re-plans nothing, and the user's later " +
    "events accumulate from zero") {
    import spark.implicits._
    val cfg = freshCfg()
    val input = MemoryStream[Event](110, spark, None)
    val silverQ = Pipeline.startSilver(spark, input.toDF(), cfg)
    val t0 = 1700000000000L
    try {
      input.addData(
        ev("e1", "g1", 1.5f, t0), ev("e2", "g2", 2.0f, t0 + 1000),
        ev("e3", "g2", 3.0f, t0 + 2000), ev("e4", "g3", 4.0f, t0 + 3000))
      silverQ.processAllAvailable()
      input.addData(
        ev("e5", "g2", 5.0f, t0 + 4000), ev("e6", "g1", 6.0f, t0 + 5000))
      silverQ.processAllAvailable()
      val goldQ = Pipeline.startGold(spark, cfg)
      try goldQ.processAllAvailable() finally goldQ.stop()
      // a g2-ONLY batch makes one change-feed version whose rows all
      // belong to the deleted user — the scrub's empty-leaf path (the
      // staged rewrite has zero rows; the plan is pure deletion)
      input.addData(ev("e0", "g2", 7.0f, t0 + 5500))
      silverQ.processAllAvailable()
      val goldQb = Pipeline.startGold(spark, cfg)
      try goldQb.processAllAvailable() finally goldQb.stop()
      val serveQ = Pipeline.startServe(spark, cfg)
      try serveQ.processAllAvailable() finally serveQ.stop()

      UserForget.forgetUsers(spark, cfg.baseDir,
        Seq("g2").toDF("group_id"))
      // read path: the serving projection closes ranks immediately
      val live = UserForget.excludeForgottenUsers(spark, cfg.baseDir,
        Pipeline.serveProjection(spark, cfg), "group_id")
        .select(col("group_id")).collect().map(_.getString(0)).sorted
      assert(live.toSeq == Seq("g1", "g3"))

      val erased = UserForget.applyForgetUsersIfNeeded(spark, cfg)
      assert(erased == 4L, s"erased=$erased (g2 has 4 silver rows)")
      assert(!UserForget.forgetUsersTableExists(spark, cfg.baseDir))
      // every store scrubbed
      def g2In(path: String): Long =
        spark.read.option("basePath", path).parquet(path)
          .filter(col("group_id") === "g2").count()
      assert(g2In(cfg.silverPath) == 0L, "silver history not scrubbed")
      assert(g2In(cfg.goldPath) == 0L, "gold snapshot not scrubbed")
      assert(g2In(cfg.goldChangesPath) == 0L, "change feed not scrubbed")
      assert(g2In(cfg.servePath) == 0L, "serve store not scrubbed")
      // survivors intact end-to-end
      val gold = Pipeline.serveProjection(spark, cfg).collect()
        .map(r => r.getAs[String]("group_id") ->
          r.getAs[Long]("event_count")).toMap
      assert(gold == Map("g1" -> 2L, "g3" -> 1L), gold.toString)
      // re-apply after the clear is a no-op
      assert(UserForget.applyForgetUsersIfNeeded(spark, cfg) == -1L)

      // the in-place change scrub kept every surviving NAME: a restarted
      // serve stream plans nothing new (re-planned scrubbed history
      // would re-upsert stale postimages under a fresh _serve_batch)
      val serveRowsBefore = spark.read
        .option("basePath", cfg.servePath).parquet(cfg.servePath).count()
      val serveQ2 = Pipeline.startServe(spark, cfg)
      try serveQ2.processAllAvailable() finally serveQ2.stop()
      assert(spark.read.option("basePath", cfg.servePath)
        .parquet(cfg.servePath).count() == serveRowsBefore,
        "restarted serve stream re-planned scrubbed change files")

      // GDPR re-registration: g2's NEW events accumulate from zero
      input.addData(ev("e7", "g2", 9.0f, t0 + 600000))
      silverQ.processAllAvailable()
      val goldQ2 = Pipeline.startGold(spark, cfg)
      try goldQ2.processAllAvailable() finally goldQ2.stop()
      val g2row = Pipeline.serveProjection(spark, cfg)
        .filter(col("group_id") === "g2").collect()
      assert(g2row.length == 1 && g2row.head.getAs[Long]("event_count") == 1L,
        s"re-registered user must restart from zero: ${g2row.toSeq}")
    } finally {
      silverQ.stop()
      UserForget.purgeForgetUsersTable(spark, cfg.baseDir)
    }
  }

  test("drain guard: the apply HOLDS BACK (-2) while gold owes silver " +
    "files a fold — an unconsumed file would fold the user back into " +
    "gold after the scrub — and lands once drained") {
    import spark.implicits._
    val cfg = freshCfg()
    val input = MemoryStream[Event](111, spark, None)
    val silverQ = Pipeline.startSilver(spark, input.toDF(), cfg)
    val t0 = 1700000000000L
    try {
      input.addData(ev("e1", "u1", 1.0f, t0), ev("e2", "u2", 2.0f, t0 + 1000))
      silverQ.processAllAvailable()
      val goldQ = Pipeline.startGold(spark, cfg)
      try goldQ.processAllAvailable() finally goldQ.stop()
      // a second silver batch gold has NOT consumed
      input.addData(ev("e3", "u2", 3.0f, t0 + 2000))
      silverQ.processAllAvailable()
      UserForget.forgetUsers(spark, cfg.baseDir, Seq("u2").toDF("group_id"))
      assert(UserForget.applyForgetUsersIfNeeded(spark, cfg) == -2L)
      // tombstone survives the deferral — nothing was lost
      assert(UserForget.forgottenUserIds(spark, cfg.baseDir).count() == 1L)
      // drain gold, then the erase lands (u2 has 2 silver rows)
      val goldQ2 = Pipeline.startGold(spark, cfg)
      try goldQ2.processAllAvailable() finally goldQ2.stop()
      assert(UserForget.applyForgetUsersIfNeeded(spark, cfg) == 2L)
      assert(spark.read.option("basePath", cfg.silverPath)
        .parquet(cfg.silverPath).filter(col("group_id") === "u2")
        .count() == 0L)
      assert(spark.read.option("basePath", cfg.goldPath)
        .parquet(cfg.goldPath).filter(col("group_id") === "u2")
        .count() == 0L)
    } finally {
      silverQ.stop()
      UserForget.purgeForgetUsersTable(spark, cfg.baseDir)
    }
  }

  test("registration is idempotent across batches and in-batch " +
    "duplicates; an empty batch never creates the log") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_uforget_reg").toString
    try {
      UserForget.forgetUsers(spark, base,
        spark.range(0).select(col("id").cast("string").as("group_id")))
      assert(!UserForget.forgetUsersTableExists(spark, base))
      UserForget.forgetUsers(spark, base,
        Seq("a", "a", "b").toDF("group_id"))
      assert(UserForget.forgottenUserIds(spark, base).count() == 2L)
      UserForget.forgetUsers(spark, base, Seq("b", "c").toDF("group_id"))
      assert(UserForget.forgottenUserIds(spark, base)
        .collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"))
    } finally UserForget.purgeForgetUsersTable(spark, base)
  }
}
