package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.Ckpt.TruncateOps

/** Streaming twin #15: connected-component labels maintained at INGEST —
  * the graph-maintenance lifecycle q_cc_incremental proves in batch,
  * run per arriving edge micro-batch: the stored labeling is REPAIRED
  * by the warm-start kernel ([[graft.queries.Graph.ccConvergedFrom]] —
  * shared code, so stream and batch repair cannot drift), with the
  * improvement wave seeded at exactly this batch's edge endpoints.
  * Per-batch work tracks the wave the new edges cause, never the
  * accumulated graph.
  *
  * Like [[GraphInsertStream]], the per-batch computation is a batch
  * plan (an iterated join loop), not a per-row map — so the honest
  * Spark shape is foreachBatch over two on-disk relations:
  *
  *  - `edges/batch_id=N` — the accumulated edge log, appended
  *    idempotently (a replayed batch overwrites its own directory with
  *    the same rows);
  *  - `labels/v=N` — versioned label snapshots; readers take the
  *    HIGHEST version. Repair is MONOTONE (labels only ever decrease
  *    toward component minima), so a replayed batch k < max rewrites
  *    v=k from newer state — harmless, the reader never looks at it.
  *
  * Equality contract (CcStreamSpec, across a restart): stream-end
  * labels equal the one-shot [[graft.queries.Graph.ccConverged]] over
  * the full edge set exactly — integer labels, so bit-equality, for
  * ANY micro-batch slicing. The node universe is every endpoint seen
  * (an edge stream carries no isolated nodes by construction).
  */
object CcStream {

  private def latestVersion(labelsRoot: String): Option[Long] = {
    val dirs = Option(new File(labelsRoot).listFiles()).getOrElse(Array.empty[File])
    val vs = dirs.filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** One micro-batch's repair — the foreachBatch body, exposed for
    * direct testing. Returns the rounds the warm wave ran.
    */
  def repairBatch(
      spark: SparkSession,
      batchEdges: DataFrame,
      edgesRoot: String,
      labelsRoot: String,
      batchId: Long): Int = {
    // idempotent edge append: per-batch-id overwrite
    batchEdges.select(col("src"), col("dst"))
      .write.mode("overwrite").parquet(s"$edgesRoot/batch_id=$batchId")
    val all = spark.read.parquet(edgesRoot).select(col("src"), col("dst"))
    val sym = all
      .unionByName(all.select(col("dst").as("src"), col("src").as("dst")))
      .truncateLineage()
    val nodes = sym.select(col("src").as("pk")).distinct()
    val stored = latestVersion(labelsRoot) match {
      case Some(v) => spark.read.parquet(s"$labelsRoot/v=$v")
      case None => spark.emptyDataFrame.sparkSession
        .range(0).select(col("id").as("pk"), col("id").as("label"))
    }
    // warm init: stored labels where they exist, self-labels for nodes
    // this batch introduced
    val init = nodes
      .join(stored.select(col("pk"), col("label").as("__st")), Seq("pk"), "left")
      .select(col("pk"), coalesce(col("__st"), col("pk")).as("label"))
    val seed = batchEdges.select(col("src").as("pk"))
      .unionByName(batchEdges.select(col("dst").as("pk")))
      .distinct()
    val (labels, rounds, _, converged) =
      graft.queries.Graph.ccConvergedFrom(init, sym, seed = Some(seed))
    // a capped (non-converged) repair would snapshot WRONG labels the
    // next batch warm-starts from — fail loudly instead
    if (!converged)
      throw new IllegalStateException(
        s"CC repair for batch $batchId hit the round cap without converging")
    labels.write.mode("overwrite").parquet(s"$labelsRoot/v=$batchId")
    rounds
  }

  /** Serve the CURRENT labeling (highest snapshot version). */
  def currentLabels(spark: SparkSession, labelsRoot: String): DataFrame =
    latestVersion(labelsRoot) match {
      case Some(v) => spark.read.parquet(s"$labelsRoot/v=$v")
      case None => spark.range(0).select(col("id").as("pk"), col("id").as("label"))
    }

  /** Run the ingest maintainer: stream of (src, dst) edges → per-batch
    * warm repair → versioned label snapshots.
    */
  def run(
      stream: DataFrame,
      edgesRoot: String,
      labelsRoot: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        repairBatch(batch.sparkSession, batch, edgesRoot, labelsRoot, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
