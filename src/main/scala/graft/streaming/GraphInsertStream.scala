package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.SimilarityQueries

/** Streaming twin #13: NSW graph-ANN insertion at ingest time — the
  * maintenance lifecycle every navigable-graph index (HNSW/NSW) runs in
  * production: the base graph is built offline; vectors arriving after
  * the build enter it INCREMENTALLY by routing themselves through the
  * frozen structure, each new node linking to its own walk's top-8
  * (Malkov & Yashunin 2018's insert step). No rebuild, no corpus scan —
  * per arrival, one bounded beam-search walk (≤ 872 scored candidates,
  * the same corpus-size-independent construction bound the serving walk
  * carries).
  *
  * Like [[SparseStream]], the per-arrival computation is a batch plan
  * (a multi-hop walk with per-hop joins), not a per-row map — so the
  * honest Spark shape is foreachBatch running the REGISTERED insert
  * chain ([[SimilarityQueries.nswInsertEdges]] — shared code, so stream
  * and batch insertion cannot drift) with the micro-batch as the delta
  * side and the frozen base graph as the other.
  *
  * Bit-equality contract: every join in the walk keys on q_id and the
  * frontier window partitions by q_id, so a delta vector's edges depend
  * ONLY on (its vector, the frozen base) — never on which micro-batch
  * carried it. The union of per-batch edge sets therefore equals the
  * one-shot batch insert's edge set exactly, (src, dst, cos) doubles
  * included; GraphInsertStreamSpec asserts it across a restart.
  *
  * Exactly-once: foreachBatch is at-least-once, so the sink is the
  * idempotent per-batch-id overwrite directory (the [[SparseStream]]
  * recipe) — a replayed batch rewrites the same directory with the same
  * rows. No processing-time timers anywhere, so Trigger.AvailableNow
  * terminates normally.
  */
object GraphInsertStream {

  /** Derive one arriving batch's insert edges over the frozen base —
    * the foreachBatch body, exposed for direct testing. `base` and
    * `baseGraph` are the frozen artifacts (registry-served in specs).
    */
  def insertBatch(
      batchVecs: DataFrame,
      base: DataFrame,
      baseGraph: DataFrame): DataFrame =
    SimilarityQueries.nswInsertEdges(base, batchVecs, baseGraph)

  /** Run the ingest inserter: stream of (vec_id, embedding) → per-batch
    * walk → idempotent per-batch parquet of (src, dst, cos) edges.
    */
  def run(
      stream: DataFrame,
      base: DataFrame,
      baseGraph: DataFrame,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        insertBatch(batch, base, baseGraph)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
