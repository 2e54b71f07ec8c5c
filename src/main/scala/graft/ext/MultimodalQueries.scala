package graft.ext

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables

/** Registered multimodal queries: binary-column metadata (differentially
  * verified — octet length + SHA-256 agree with DuckDB) and the stubbed
  * decode/feature/frame-sample pipeline (rows-only; the stub is
  * deterministic so ScalaTest pins exact values).
  */
object MultimodalQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "q_multimodal_meta",
      (s, d) =>
        Tables(s, d, "documents")
          .select(
            col("doc_id"),
            octet_length(col("text")).cast("long").as("n_bytes"),
            sha2(col("text").cast("binary"), 256).as("sha"))
          .orderBy("doc_id"),
      Some(
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
          "sha256(text) AS sha FROM documents ORDER BY doc_id")
    ),
    Q(
      "q_multimodal_features",
      // Binary payload → typed mapPartitions decode (stubbed) → features.
      (s, d) => {
        val media = Multimodal.mediaTable(s, Tables(s, d, "documents"))
        Multimodal.extractFeatures(s, media).toDF().orderBy("doc_id")
      },
      None
    ),
    Q(
      "q_multimodal_frames",
      // Frame-sample explode over the (stub-)decoded features: per-kind
      // frame counts — the fan-out a video encoder stage would consume.
      (s, d) => {
        val media = Multimodal.mediaTable(s, Tables(s, d, "documents"))
        val feats = Multimodal.extractFeatures(s, media).toDF()
        Multimodal
          .sampleFrames(feats)
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n_sampled_frames"), countDistinct(col("doc_id")).as("n_items"))
          .orderBy("kind")
      },
      None
    )
  )
}
