package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.QualityQueries

/** Streaming twin of the DSIR importance scorer (`q_dsir_weights`) — the
  * production shape of data selection AT INGEST: the bucket model is a
  * stored artifact (trained once over the curated pool,
  * [[QualityQueries.dsirModel]]), and every ARRIVING document is scored
  * against it as it lands, so the keep/drop decision happens in the
  * ingest path instead of a later batch sweep.
  *
  * Deliberately STATELESS — the ninth streaming twin, and the first that
  * needs no state at all: a document's score depends only on its own
  * features and the frozen model, so the whole computation is per-row
  * expressions (the feature array, the bucket hash, two literal-array
  * lookups, and a fixed-point fold that replays [[graft.core.Agg]]'s
  * dsum/davg arithmetic element-wise). No watermark, no shuffle, no
  * state store; exactly-once comes free from the file sink's metadata
  * log. Trigger.AvailableNow terminates normally (contrast the
  * TTL-timer view's documented hazard — no timers here).
  *
  * The score contract is BIT-EQUALITY with the batch chain: same
  * uni+bigram feature array and char-polynomial bucket (shared builders
  * in [[QualityQueries]] — the two cannot drift), same Laplace-smoothed
  * integer-ratio doubles, and the per-row fold performs the same IEEE
  * ops in the same order as Agg.davg (round(r·1e4) → exact integer sum
  * → one cast → /1e4 → /count). DsirStreamSpec streams the fixture
  * corpus in micro-batches across a restart and asserts row-set
  * equality with `q_dsir_weights` including the score doubles.
  *
  * Scale shape: the model is ≤ B = 1024 (cr, ct) pairs embedded as two
  * literal arrays — smaller than a broadcast join's hash relation; per
  * arrival the work is O(features · hash) with zero exchanges, so the
  * view runs at source parallelism on any cluster size.
  */
object DsirStream {

  /** Score a document stream (doc_id, source, text) against a frozen
    * bucket model. `model` maps bucket → (cr, ct); `sr`/`st` are the
    * raw/target feature totals (the [[QualityQueries.dsirModel]] triple).
    */
  def scoredView(
      docs: DataFrame,
      model: Map[Int, (Long, Long)],
      sr: Long,
      st: Long): DataFrame = {
    val crLit = array((0 until 1024).map(b => lit(model.get(b).map(_._1).getOrElse(0L))): _*)
    val ctLit = array((0 until 1024).map(b => lit(model.get(b).map(_._2).getOrElse(0L))): _*)
    def r(f: Column): Column = {
      val b = (QualityQueries.dsirBucket(f) + 1L).cast("int")
      ((element_at(ctLit, b) + 1L) * lit(sr + 1024L)).cast("double") /
        ((element_at(crLit, b) + 1L) * lit(st + 1024L)).cast("double")
    }
    val rs = transform(QualityQueries.dsirFeatureArr, f => r(f))
    docs
      // the batch chain (q_dsir_weights) DROPS a featureless doc at its
      // explode — an empty/whitespace-only text must not surface here as
      // an n_feat=0 row with a 0/0 = NaN score, or the bit-equality
      // contract breaks on that edge (round-15 advice)
      .filter(size(QualityQueries.dsirFeatureArr) > 0)
      .select(
      col("doc_id"),
      size(QualityQueries.dsirFeatureArr).cast("long").as("n_feat"),
      // Agg.davg replayed per row: round-to-1e4 integers, exact sum,
      // one cast, /1e4 then /count — same bits as the batch aggregate
      (aggregate(rs, lit(0L), (acc, x) => acc + round(x * 10000.0).cast("long"))
        .cast("double") / 10000.0 /
        size(QualityQueries.dsirFeatureArr).cast("double")).as("dsir_score"))
  }
}
