package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.QualityQueries

/** Streaming twin of the LangID scorer (`q_langid`) — language
  * identification AT INGEST, the stage CCNet-shaped pipelines run
  * before any quality filtering touches a document: the hashed
  * char-trigram model is a frozen artifact (trained once over the
  * labeled slice, [[QualityQueries.langModel]] — ≤ 4096 (c0, c1)
  * pairs), and every arriving document is scored and tagged with its
  * predicted language as it lands.
  *
  * STATELESS, like [[DsirStream]] (the same production shape): a
  * document's language depends only on its own trigrams and the frozen
  * model, so the whole computation is per-row expressions — the
  * trigram array, the char-polynomial bucket, two literal-array
  * lookups, and a fixed-point fold replaying [[graft.core.Agg]]'s
  * davg arithmetic element-wise. No state store, no shuffle;
  * exactly-once from the file sink's metadata log.
  *
  * Score contract: BIT-EQUALITY with the batch chain — shared plant
  * ([[QualityQueries.langPlant]]), shared trigram/bucket builders,
  * the same Laplace-smoothed integer-ratio doubles, and the same IEEE
  * fold order (round(r·1e4) → exact integer sum → one cast → /1e4 →
  * /count), so the streamed lr_score doubles and lang_pred strings
  * equal `q_langid`'s rows exactly (LangIdStreamSpec pins it across a
  * restart). Scale shape: the model ships as two 4096-long literal
  * arrays — smaller than any broadcast relation — and the view runs at
  * source parallelism with zero exchanges.
  */
object LangIdStream {

  /** Score a raw document stream (doc_id, source, text) against a
    * frozen LangID model (the [[QualityQueries.langModel]] triple).
    * Output: (doc_id, source, lang_true, n_feat, lr_score, lang_pred)
    * — the q_langid column set.
    */
  def scoredView(
      docs: DataFrame,
      model: Map[Int, (Long, Long)],
      s0: Long,
      s1: Long): DataFrame = {
    val b = graft.ext.QualityQueries.LangBPublic
    val c0Lit = array((0 until b).map(i => lit(model.get(i).map(_._1).getOrElse(0L))): _*)
    val c1Lit = array((0 until b).map(i => lit(model.get(i).map(_._2).getOrElse(0L))): _*)
    def r(f: Column): Column = {
      val idx = (QualityQueries.langBucket(f) + 1L).cast("int")
      ((element_at(c0Lit, idx) + 1L) * lit(s1 + b)).cast("double") /
        ((element_at(c1Lit, idx) + 1L) * lit(s0 + b)).cast("double")
    }
    val rs = transform(QualityQueries.langTrigrams, f => r(f))
    QualityQueries.langPlant(docs)
      .select(
        col("doc_id"), col("source"), col("lang_true"),
        size(QualityQueries.langTrigrams).cast("long").as("n_feat"),
        // Agg.davg replayed per row — same bits as the batch aggregate
        (aggregate(rs, lit(0L), (acc, x) => acc + round(x * 10000.0).cast("long"))
          .cast("double") / 10000.0 /
          size(QualityQueries.langTrigrams).cast("double")).as("lr_score"))
      .withColumn("lang_pred", when(col("lr_score") >= 1.0, "l0").otherwise("l1"))
  }
}
