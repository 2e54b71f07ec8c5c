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

  /** The session conf key naming the reliable checkpoint directory.
    *
    * RETENTION (round-19 ADVICE): every loop round writes a NEW
    * checkpoint directory and Spark never deletes superseded rounds on
    * its own — a ~100-phase coreness run would accumulate rounds ×
    * relation-size on the fault-tolerant store. Superseded rounds
    * cannot simply be deleted eagerly either: some kernels (coreness's
    * membership union, the warm-CC seed labels) legitimately hold
    * earlier checkpointed relations alive across later rounds. The
    * reference-safe reclaim is Spark's own ContextCleaner:
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` deletes a
    * checkpoint's files when its RDD is garbage-collected — i.e.
    * exactly when no kernel can still read it. [[graft.Sessions]]
    * sets it at context build; a cluster job bringing its own session
    * must set it alongside [[DirKey]] (it is a SparkConf read at
    * SparkContext creation, not a runtime SQL conf).
    */
  val DirKey = "graft.checkpoint.dir"

  // last directory pushed to SparkContext, as the (raw conf value,
  // qualified form setCheckpointDir produced) pair: the raw value
  // detects a DirKey change, the qualified form detects an EXTERNAL
  // sc.setCheckpointDir (getCheckpointDir returns the qualified path,
  // so the raw string alone can't be compared against it). Per-JVM,
  // like the shared SparkContext; writes and the paired checkpoint
  // happen under `lock` (below).
  @volatile private var lastRaw: String = null
  @volatile private var lastQualified: Option[String] = None
  private val lock = new Object

  /** Truncate `df`'s lineage: reliable `checkpoint()` under
    * [[DirKey]]'s directory when configured, `localCheckpoint(true)`
    * otherwise. Both are EAGER — callers count on the materialization
    * barrier (per-round driver decisions read counts off the result).
    */
  def truncate(df: DataFrame): DataFrame = {
    val cp = df.sparkSession.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // set-and-checkpoint under one lock (round-19 ADVICE): two
        // sessions on the shared SparkContext with DIFFERENT DirKey
        // values could otherwise interleave between the dir check and
        // df.checkpoint(), landing a checkpoint in the other session's
        // directory. The lock serializes reliable checkpoints only —
        // the kernels are driver-sequential per session, and the
        // default localCheckpoint path below is untouched. An
        // externally cleared/changed sc.setCheckpointDir is re-detected
        // by comparing getCheckpointDir against the cached qualified
        // path the last setCheckpointDir produced (exact Option
        // equality — setCheckpointDir appends a UUID subdir, so the
        // raw string alone can't be compared against it).
        lock.synchronized {
          if (lastRaw != dir || sc.getCheckpointDir != lastQualified) {
            sc.setCheckpointDir(dir)
            lastRaw = dir
            lastQualified = sc.getCheckpointDir
          }
          df.checkpoint()
        }
      case None => df.localCheckpoint(true)
    }
    // drop the origin stats the checkpoint carries: self-join loop
    // rounds otherwise CUBE the sizeInBytes estimate per round across
    // checkpoint boundaries, and Catalyst's BigInt stats arithmetic
    // becomes the bottleneck (a measured 28-minute planning hang at
    // ~100 accumulated rounds — see GraftShim.dropStats)
    org.apache.spark.sql.GraftShim.dropStats(cp)
  }

  /** Eager truncation that ALSO returns aggregate metrics computed
    * DURING the materialization job (`observe`/CollectMetrics): the
    * iterative kernels' per-round driver decisions (wave count,
    * survivor count, edge-set size) used to be a SECOND job reading the
    * fresh checkpoint — one bounded count per round, but a whole
    * scheduler round trip each (job + stage + task launch), and the
    * graph tier's cost is per-round fixed cost × rounds (round-21
    * verdict #2). The metric accumulators are filled by the checkpoint
    * job itself on BOTH truncation paths (localCheckpoint and reliable
    * checkpoint both execute the observed plan exactly once), so the
    * returned row reflects exactly the materialized rows, and each
    * kernel round is ONE job (guide §1.2, per-round fixed cost).
    * `metrics` must be aggregate expressions (observe's contract).
    */
  def truncateObserved(df: DataFrame, metrics: org.apache.spark.sql.Column*)
      : (DataFrame, org.apache.spark.sql.Row) = {
    val name = s"graft_ckpt_m${obsCounter.incrementAndGet()}"
    val observed = df.observe(name, metrics.head, metrics.tail: _*)
    val cp = truncate(observed)
    val row = org.apache.spark.sql.GraftShim.observedMetric(observed, name).getOrElse(
      throw new IllegalStateException(
        s"Ckpt.truncateObserved: metric $name missing after eager checkpoint " +
          "(the truncation action did not execute the observed plan?)"))
    (cp, row)
  }

  /** [[truncateObserved]] specialized to the commonest kernel decision:
    * rows satisfying `pred` (all rows when `pred` is `lit(true)`),
    * counted inside the checkpoint job.
    */
  def truncateCounted(df: DataFrame, pred: org.apache.spark.sql.Column): (DataFrame, Long) = {
    val (cp, row) = truncateObserved(
      df, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.when(pred, org.apache.spark.sql.functions.lit(1))))
    (cp, row.getLong(0))
  }

  private val obsCounter = new java.util.concurrent.atomic.AtomicLong()

  /** `.truncateLineage()` as a drop-in for `.localCheckpoint(true)` at
    * the iterative-kernel call sites.
    */
  implicit class TruncateOps(private val df: DataFrame) extends AnyVal {
    def truncateLineage(): DataFrame = Ckpt.truncate(df)
  }
}
