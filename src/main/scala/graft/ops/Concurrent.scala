package graft.ops

import org.apache.spark.sql.DataFrame

/** Concurrent materialization of independent DataFrame branches
  * (optimization guide §2.6 "Overlap independent jobs"): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them
  * sequentially. A report query built as a union of independent
  * sub-computations (the compression-rung table, the cascade width
  * sweep) otherwise pays the SUM of its branches' walls while most of
  * the host sits idle in each branch's single-partition window tails;
  * materializing the branches from a small thread pool overlaps them so
  * the wall is the slowest branch. Each branch collapses to a bounded
  * frame (a one-row aggregate or a capped panel), so the checkpoints
  * hold nothing data-proportional.
  */
object Concurrent {
  /** Builds and eagerly materializes each branch on its own driver
    * thread (localCheckpoint — MEMORY_AND_DISK), returning the
    * checkpointed frames in input order. Exceptions propagate to the
    * caller exactly as sequential construction would throw them.
    */
  def materialize(branches: Seq[() => DataFrame]): Seq[DataFrame] = {
    if (branches.lengthCompare(1) <= 0)
      return branches.map(b => b().localCheckpoint(true))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(branches.size, 8))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futs = branches.map(b =>
        scala.concurrent.Future(b().localCheckpoint(true)))
      futs.map(scala.concurrent.Await.result(_,
        scala.concurrent.duration.Duration.Inf))
    } finally pool.shutdown()
  }
}
