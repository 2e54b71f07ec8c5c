package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-truncation seam for the iterative kernels (round-18 verdict
  * #2). Every loop round of the graph/CC/dedup family must truncate
  * lineage — otherwise the logical plan nests one level per iteration
  * and analysis/codegen costs explode — but HOW to truncate is a
  * deployment decision, not an algorithm one:
  *
  *   - `localCheckpoint(eager = true)` (the default, and the only mode
  *     the local[32] bench/CI tiers use): blocks live in executor
  *     storage — zero distributed-filesystem traffic, but an executor
  *     loss after truncation is unrecoverable because the lineage that
  *     could rebuild the blocks was just cut. Fine in a single-JVM
  *     local session where "executor loss" means the whole process
  *     died anyway.
  *   - reliable `checkpoint()` (when `graft.checkpoint.dir` is set):
  *     blocks persist to the configured fault-tolerant directory (HDFS/
  *     object store on a real cluster), so a 19-round star contraction
  *     over a web-scale graph survives executor preemption mid-run —
  *     hours of rounds are not lost to one lost container. Costs one
  *     write+read of the truncated relation per round; the Stress
  *     graph tier measures the overhead (PLANS.md round 19).
  *
  * The seam is one conf key so the SAME kernel code serves both: unset
  * (default) keeps today's local behavior bit-for-bit; a cluster job
  * sets `graft.checkpoint.dir` (e.g. `hdfs:///jobs/x/ckpt`) and every
  * kernel round becomes re-playable. GraphSpec pins the two paths
  * label-equal on the planted chain.
  */
object Ckpt {

  /** The session conf key naming the reliable checkpoint directory. */
  val DirKey = "graft.checkpoint.dir"

  // last directory pushed to SparkContext (setCheckpointDir qualifies
  // the path, so the raw conf value can't be compared against
  // sc.getCheckpointDir) — per-JVM, like the session itself
  @volatile private var lastDir: String = null

  /** Truncate `df`'s lineage: reliable `checkpoint()` under
    * [[DirKey]]'s directory when configured, `localCheckpoint(true)`
    * otherwise. Both are EAGER — callers count on the materialization
    * barrier (per-round driver decisions read counts off the result).
    */
  def truncate(df: DataFrame): DataFrame = {
    val cp = df.sparkSession.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (lastDir != dir) {
          sc.setCheckpointDir(dir)
          lastDir = dir
        }
        df.checkpoint()
      case None => df.localCheckpoint(true)
    }
    // drop the origin stats the checkpoint carries: self-join loop
    // rounds otherwise CUBE the sizeInBytes estimate per round across
    // checkpoint boundaries, and Catalyst's BigInt stats arithmetic
    // becomes the bottleneck (a measured 28-minute planning hang at
    // ~100 accumulated rounds — see GraftShim.dropStats)
    org.apache.spark.sql.GraftShim.dropStats(cp)
  }

  /** `.truncateLineage()` as a drop-in for `.localCheckpoint(true)` at
    * the iterative-kernel call sites.
    */
  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    def truncateLineage(): DataFrame = Ckpt.truncate(df)
  }
}
