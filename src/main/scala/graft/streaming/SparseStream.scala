package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.SearchQueries

/** Streaming twin #10: sparse champion-list retrieval over a FROZEN
  * index (`q_sparse_cosine`'s serving chain at ingest time) — the
  * production lifecycle of every sparse IR system: the index
  * (signatures, champion lists, df/n statistics) is refreshed
  * periodically; documents arriving BETWEEN refreshes are scored
  * against the frozen artifact ([[SearchQueries.SparseIndex]], which
  * carries the frozen statistics for exactly this purpose).
  *
  * Unlike the transformWithState twins, the per-arrival computation is
  * not per-row (a signature needs the doc's term counts ranked under
  * frozen idf, then two re-aggregations around the candidate join), and
  * unlike [[DsirStream]] the frozen artifact is vocab-sized — far too
  * big for the literal-array trick and exactly right for stream-static
  * equi-joins. The honest Spark shape for "run a batch plan over each
  * arrival set" is foreachBatch: every micro-batch runs the REGISTERED
  * serving composition ([[SearchQueries.championServeAgainst]] — shared
  * code, so stream and batch cannot drift) with the batch's docs as the
  * probe side and the frozen index as the other, writing results to a
  * per-batch directory.
  *
  * Exactly-once: foreachBatch offers at-least-once delivery (a batch
  * can replay after a crash between sink write and commit), so the sink
  * write is made IDEMPOTENT by keying the output directory on the batch
  * id and overwriting — a replayed batch rewrites the same directory
  * with the same rows (the standard idempotent-foreachBatch recipe).
  * Readers see `<outDir>/batch_id=N/…`; the batch_id partition column
  * is bookkeeping, not data.
  *
  * Score contract: BIT-EQUALITY with the batch query for documents of
  * the index's own corpus — the signature recipe (sigThinOf/sigArrOf)
  * and the serve chain are the same code, the frozen (df, n) are the
  * batch plan's own statistics, and the dot/norm integers and IEEE
  * cosine chain are identical. SparseStreamSpec replays the corpus in
  * micro-batches across a restart and asserts row-set equality with
  * q_sparse_cosine including the cosine doubles. Terms a post-refresh
  * document introduces (absent from the frozen vocabulary) drop at the
  * signature join — stale-index semantics until the next refresh,
  * documented on [[SearchQueries.sigThinOf]].
  */
object SparseStream {

  /** Score one batch of arriving (doc_id, text) documents against the
    * frozen index — the foreachBatch body, exposed for direct testing.
    */
  def scoreBatch(batchDocs: DataFrame, ix: SearchQueries.SparseIndex): DataFrame = {
    // batch-scoped twice-consumed relation (probe rows + array build)
    val sigThin = SearchQueries.sigThinOf(batchDocs, ix.dfRel, ix.nDocs).localCheckpoint(true)
    SearchQueries.championServeAgainst(sigThin, SearchQueries.sigArrOf(sigThin), ix)
  }

  /** Run the ingest scorer: stream → per-batch serve → idempotent
    * per-batch parquet. Trigger.AvailableNow terminates normally (no
    * processing-time timers — contrast the TTL view's documented
    * hazard).
    */
  def run(
      stream: DataFrame,
      ix: SearchQueries.SparseIndex,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreBatch(batch, ix)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
