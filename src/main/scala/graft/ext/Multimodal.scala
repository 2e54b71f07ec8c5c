package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SimHash

/** Multimodal column plumbing: media (image/audio/video) travels as an
  * opaque `binary` payload column with typed metadata alongside, and the
  * decode step parses REAL container formats in pure JVM — BMP for
  * images, RIFF/WAV for audio, YUV4MPEG2 for video (see [[MediaCodec]]).
  * [[mediaTable]] synthesizes spec-valid payload bytes per document with
  * geometry derived deterministically from doc_id, so the differential
  * oracle can verify the decoded features arithmetically while the Spark
  * side actually round-trips them through container headers. Payloads in
  * a format we don't parse fall back to `decodeStub` (hash-derived
  * features, clearly marked) instead of failing the batch — the behavior
  * an ingest pipeline wants for the long tail of containers.
  *
  * Scale design: decode runs via mapPartitions so a heavier decoder would
  * amortize per-batch init (model load, codec context) across each
  * partition's rows — the same shape `mapInPandas` gives Python.
  */
object Multimodal {

  /** An ingested media row: id + opaque payload + declared kind. */
  final case class MediaIn(doc_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (deterministic-fake under the stub). */
  final case class MediaFeat(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      content_hash: Long)

  /** Real decode: sniff the container magic and read geometry from the
    * actual header bytes ([[MediaCodec.decode]]); unknown containers fall
    * back to the stub rather than poisoning the batch.
    */
  def decode(m: MediaIn): MediaFeat =
    MediaCodec.decode(m.payload) match {
      case Some(d) =>
        MediaFeat(
          m.doc_id, d.kind, m.payload.length.toLong, d.width, d.height, d.nFrames,
          SimHash.fnv1a(m.payload, 0, m.payload.length))
      case None => decodeStub(m)
    }

  /** STUB fallback for containers [[MediaCodec]] doesn't parse. Features
    * are derived from an FNV-1a content hash so they are deterministic and
    * distribution-shaped like real metadata.
    */
  def decodeStub(m: MediaIn): MediaFeat = {
    val h = SimHash.fnv1a(m.payload, 0, m.payload.length)
    val w = 16 + ((h >>> 8) % 1905).toInt
    val ht = 16 + ((h >>> 24) % 1065).toInt
    val frames = m.kind match {
      case "video" => 1 + ((h >>> 40) % 300).toInt
      case "audio" => 1 + ((h >>> 40) % 100).toInt
      case _       => 1
    }
    MediaFeat(m.doc_id, m.kind, m.payload.length.toLong, w, ht, frames, h)
  }

  /** Synthesize a REAL media payload per document — spec-valid BMP / WAV
    * / Y4M bytes (kind by doc_id mod 3) with geometry that is a pure
    * arithmetic function of doc_id. These formulas are mirrored verbatim
    * by the q_multimodal_features oracle, so the decode path is verified
    * end-to-end: builder → container bytes → header parse → features.
    * Dimensions stay small (≤64px, ≤1.6k samples, ≤5 frames) so the
    * corpus-wide payload volume is bounded.
    */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaIn] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 0 =>
          MediaIn(id, "image", MediaCodec.buildBmp(
            16 + (id % 48).toInt, 16 + (id % 27).toInt, id))
        case 1 =>
          MediaIn(id, "audio", MediaCodec.buildWav(
            800 + (id % 800).toInt, 8000, id))
        case _ =>
          MediaIn(id, "video", MediaCodec.buildY4m(
            16 + (id % 4).toInt * 8, 8 + (id % 2).toInt * 8, 1 + (id % 5).toInt, id))
      }
    }
  }

  /** Batched feature extraction: mapPartitions so a heavier decoder's
    * per-partition init cost amortizes across each partition's rows.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaIn]): Dataset[MediaFeat] = {
    import spark.implicits._
    media.mapPartitions(_.map(decode))
  }

  /** Resize plan for an image-ish item: fit into a `target`×`target` box
    * preserving aspect ratio (integer arithmetic, deterministic). The
    * actual pixel resample is the stubbed decode step; this computes the
    * geometry a real resizer would apply.
    */
  def resizePlan(feats: DataFrame, target: Int = 224): DataFrame = {
    val scaleNum = lit(target)
    val longSide = greatest(col("width"), col("height"))
    feats.filter(col("width") > 0 && col("height") > 0) // audio has no geometry
      .select(
      col("doc_id"),
      col("width"),
      col("height"),
      ((col("width") * scaleNum) / longSide).cast("int").as("out_w"),
      ((col("height") * scaleNum) / longSide).cast("int").as("out_h"))
  }

  /** Frame sampling: one row per sampled frame index (stride so ≤8 frames
    * per item) — the explode pattern a video pipeline feeds to encoders.
    */
  def sampleFrames(feats: DataFrame, maxFrames: Int = 8): DataFrame = {
    // ceiling division: floor(n/max) would allow up to 2*max-1 samples
    val stride = greatest(lit(1), ((col("n_frames") + maxFrames - 1) / maxFrames).cast("int"))
    feats
      .select(
        col("doc_id"),
        col("kind"),
        col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, stride)).as("frame_idx"))
  }
}
