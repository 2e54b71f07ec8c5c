package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SimHash

/** Multimodal column plumbing: media (image/audio/video) travels as an
  * opaque `binary` payload column with typed metadata alongside. The
  * Spark-side structure — schema, typed Datasets, per-partition batched
  * decode, frame-sample explode — is real and tested; the actual codec
  * call is a STUB (this container has no image/audio libraries):
  * `decodeStub` derives deterministic fake features from a content hash,
  * clearly marked below. Swapping in a real decoder changes one function.
  *
  * Scale design: decode runs via mapPartitions so a real decoder would
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

  /** STUB decoder — no media libs in this environment. Features are
    * derived from an FNV-1a content hash so they are deterministic and
    * distribution-shaped like real metadata. A real implementation would
    * decode `payload` here (per-partition codec reuse).
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

  /** documents.text reinterpreted as opaque payload bytes — stands in for
    * a real binary media column; the plumbing downstream is unchanged.
    */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaIn] = {
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))
          .as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaIn]
  }

  /** Batched feature extraction: mapPartitions so a real decoder's
    * per-partition init cost amortizes. Stateless stub today.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaIn]): Dataset[MediaFeat] = {
    import spark.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Resize plan for an image-ish item: fit into a `target`×`target` box
    * preserving aspect ratio (integer arithmetic, deterministic). The
    * actual pixel resample is the stubbed decode step; this computes the
    * geometry a real resizer would apply.
    */
  def resizePlan(feats: DataFrame, target: Int = 224): DataFrame = {
    val scaleNum = lit(target)
    val longSide = greatest(col("width"), col("height"))
    feats.select(
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
