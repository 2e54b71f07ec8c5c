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
  * per arrival is the bucket's member count, which is CAPPED at
  * `maxBucket` (round-12 verdict #2 — the df-cap analogue of the batch
  * family's guards): once a bucket holds `maxBucket` members, further
  * arrivals neither pair nor join the bucket; instead each emits an
  * OVERFLOW MARKER row ([[Pair]] with a_id = [[OverflowId]], b_id = the
  * dropped doc, est_jaccard = -1) so the degradation is visible at the
  * sink, not silent. A tripped cap means the corpus needs the batch
  * family's exact-dedup-first pass (duplicated texts collapse to one
  * representative BEFORE LSH) — the marker rows are the signal to run
  * it; on non-pathological corpora the LSH bucket-size law keeps
  * buckets far below any reasonable cap and no marker ever emits
  * (DedupStreamSpec's fixture corpus asserts zero markers at the
  * default cap, and a duplicated corpus asserts cap + visibility).
  */
object DedupStream {

  /** Sentinel a_id for bucket-overflow marker rows (real doc ids are
    * non-negative).
    */
  val OverflowId: Long = -1L

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

  class BucketProcessor(nHashes: Int, minJaccard: Double, maxBucket: Int)
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
          if (members.size >= maxBucket) {
            // bucket at cap: per-arrival work stays O(maxBucket) — no
            // pairing, no membership; the marker makes the drop visible
            out += Pair(OverflowId, r.doc_id, -1.0)
          } else {
            members.foreach { case (otherId, otherSig) =>
              val eq = (0 until nHashes).count(i => r.sig(i) == otherSig(i))
              val est = eq.toDouble / nHashes
              if (est >= minJaccard)
                out += Pair(math.min(r.doc_id, otherId), math.max(r.doc_id, otherId), est)
            }
            members = members.updated(r.doc_id, r.sig)
          }
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
    * to exactly [[Dedup.minhashPairs]] over the same corpus as long as
    * no bucket trips `maxBucket` (marker rows with a_id=[[OverflowId]]
    * flag any that does; see object scaladoc for the cap contract).
    */
  def pairs(
      spark: SparkSession,
      docs: DataFrame,
      shingleK: Int = 5,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.4,
      maxBucket: Int = 64): Dataset[Pair] = {
    import spark.implicits._
    arrivals(spark, docs, shingleK, bands, rowsPerBand)
      .groupByKey(r => (r.band_idx, r.band_hash))
      .transformWithState(
        new BucketProcessor(bands * rowsPerBand, minJaccard, maxBucket),
        TimeMode.None(), OutputMode.Append())
  }
}
