package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.ext.Dedup

/** Streaming twin of the MinHash-LSH near-dup candidate join
  * ([[graft.ext.Dedup.minhashPairs]]): dedup-on-ingest, the third
  * streaming leg after the BM25 leaderboard ([[SearchStream]]) and the
  * incremental index ([[IndexStream]]). Arriving documents are
  * signature-hashed and banded by the SAME codegen expressions the batch
  * plan uses (bit-identical signatures), each band row keyed by
  * (band_idx, band_hash) — so the `transformWithState` state IS the
  * stored band index a production ingest pipeline maintains, and a new
  * doc pairs only against its bucket's members. Stream-end emissions,
  * deduplicated, equal the batch candidate set EXACTLY (same hash
  * family, same est-Jaccard arithmetic) — DedupStreamSpec streams the
  * fixture corpus in multiple micro-batches across a restart and
  * asserts set equality including the est_jaccard values.
  *
  * Emission semantics: a pair is emitted by EVERY band bucket it
  * collides in (buckets are independent keys and cannot see each
  * other's output — the per-band twin of the batch plan's pre-distinct
  * join output); consumers dedupe by (a_id, b_id), which is the
  * batch `.distinct()` moved to the sink side. Re-delivered (bucket,
  * doc) arrivals are skipped via the stored members (idempotent).
  *
  * Scale shape: state per bucket is its member list — Σ over buckets =
  * n·bands rows, exactly the stored band index's size, partitioned by
  * the same (band_idx, band_hash) key the batch join shuffles on. Work
  * per arrival is the bucket's member count — the LSH bucket-size law
  * (bounded buckets for non-pathological corpora; the exact-dedup-first
  * gate from the batch family is the guard for duplicated corpora).
  */
object DedupStream {

  /** One doc's presence in one band bucket (sig carried for the
    * est-Jaccard arithmetic against bucket peers).
    */
  final case class BandArrival(band_idx: Int, band_hash: Long, doc_id: Long, sig: Seq[Long])

  /** One candidate pair emission (a_id < b_id); est_jaccard is the
    * aligned-signature agreement rate, identical arithmetic to the
    * batch [[Dedup.estJaccard]] column.
    */
  final case class Pair(a_id: Long, b_id: Long, est_jaccard: Double)

  final case class BucketState(members: Map[Long, Seq[Long]])

  class BucketProcessor(nHashes: Int, minJaccard: Double)
      extends StatefulProcessor[(Int, Long), BandArrival, Pair] {
    @transient private var st: ValueState[BucketState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BucketState]("bucket", Encoders.kryo[BucketState], TTLConfig.NONE)

    override def handleInputRows(
        key: (Int, Long),
        rows: Iterator[BandArrival],
        timerValues: TimerValues): Iterator[Pair] = {
      var members = if (st.exists()) st.get().members else Map.empty[Long, Seq[Long]]
      val out = scala.collection.mutable.ArrayBuffer[Pair]()
      rows.foreach { r =>
        if (!members.contains(r.doc_id)) {
          members.foreach { case (otherId, otherSig) =>
            val eq = (0 until nHashes).count(i => r.sig(i) == otherSig(i))
            val est = eq.toDouble / nHashes
            if (est >= minJaccard)
              out += Pair(math.min(r.doc_id, otherId), math.max(r.doc_id, otherId), est)
          }
          members = members.updated(r.doc_id, r.sig)
        }
      }
      st.update(BucketState(members))
      out.iterator
    }
  }

  /** Band the (doc_id, text) stream with the batch expressions: one row
    * per (doc, band) carrying the full signature.
    */
  def arrivals(
      spark: SparkSession,
      docs: DataFrame,
      shingleK: Int,
      bands: Int,
      rowsPerBand: Int): Dataset[BandArrival] = {
    import spark.implicits._
    Dedup.minhashSignatures(docs, "doc_id", "text", shingleK, bands * rowsPerBand)
      .select(
        col("id").as("doc_id"), col("sig"),
        posexplode(Dedup.bandHashes(bands, rowsPerBand)).as(Seq("band_idx", "band_hash")))
      .as[BandArrival]
  }

  /** Candidate near-dup pairs over a document stream — emissions dedupe
    * to exactly [[Dedup.minhashPairs]] over the same corpus.
    */
  def pairs(
      spark: SparkSession,
      docs: DataFrame,
      shingleK: Int = 5,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.4): Dataset[Pair] = {
    import spark.implicits._
    arrivals(spark, docs, shingleK, bands, rowsPerBand)
      .groupByKey(r => (r.band_idx, r.band_hash))
      .transformWithState(
        new BucketProcessor(bands * rowsPerBand, minJaccard), TimeMode.None(), OutputMode.Append())
  }
}
