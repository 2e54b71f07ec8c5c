package graft.ext

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables

/** Registered multimodal queries: binary-column metadata (differentially
  * verified — octet length + SHA-256 agree with DuckDB) and the REAL
  * decode pipeline: payloads are spec-valid BMP/WAV/Y4M bytes whose
  * geometry is an arithmetic function of doc_id, the Spark side parses
  * the actual container headers, and the oracle recomputes the expected
  * features from the same formulas — builder and parser must agree
  * byte-for-byte on the container layout for the hash to match.
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
      // Binary payload → mapPartitions container-header decode → features.
      // content_hash is FNV-over-bytes (not SQL-expressible) so the query
      // projects the oracle-checkable columns; the hash is spec-pinned.
      (s, d) => {
        val media = Multimodal.mediaTable(s, Tables(s, d, "documents"))
        Multimodal.extractFeatures(s, media).toDF()
          .select(
            col("doc_id"), col("kind"), col("n_bytes"),
            col("width"), col("height"), col("n_frames"))
          .orderBy("doc_id")
      },
      // Mirrors mediaTable's geometry formulas and the exact container
      // overheads: BMP = 54 header + 4-byte-padded rows; WAV = 44-byte
      // canonical header + 2 bytes/sample; Y4M = ASCII stream header +
      // per-frame "FRAME\n" + w*h*3/2 C420 bytes.
      Some(
        "WITH m AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS k, " +
          "16 + CAST(doc_id % 48 AS INTEGER) AS iw, 16 + CAST(doc_id % 27 AS INTEGER) AS ih, " +
          "800 + CAST(doc_id % 800 AS INTEGER) AS an, " +
          "16 + CAST(doc_id % 4 AS INTEGER) * 8 AS vw, 8 + CAST(doc_id % 2 AS INTEGER) * 8 AS vh, " +
          "1 + CAST(doc_id % 5 AS INTEGER) AS vf FROM documents) " +
          "SELECT doc_id, " +
          "CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
          "CAST(CASE k WHEN 0 THEN 54 + ih * ((iw * 3 + 3) // 4 * 4) " +
          "WHEN 1 THEN 44 + an * 2 " +
          "ELSE length('YUV4MPEG2 W' || CAST(vw AS VARCHAR) || ' H' || CAST(vh AS VARCHAR) || ' F25:1 Ip A1:1 C420') + 1 + vf * (6 + vw * vh * 3 // 2) END AS BIGINT) AS n_bytes, " +
          "CAST(CASE k WHEN 0 THEN iw WHEN 1 THEN 0 ELSE vw END AS INTEGER) AS width, " +
          "CAST(CASE k WHEN 0 THEN ih WHEN 1 THEN 0 ELSE vh END AS INTEGER) AS height, " +
          "CAST(CASE k WHEN 0 THEN 1 WHEN 1 THEN an ELSE vf END AS INTEGER) AS n_frames " +
          "FROM m ORDER BY doc_id")
    ),
    Q(
      "q_multimodal_frames",
      // Frame-sample explode over the decoded features: per-kind frame
      // counts — the fan-out a video encoder stage would consume.
      (s, d) => {
        val media = Multimodal.mediaTable(s, Tables(s, d, "documents"))
        val feats = Multimodal.extractFeatures(s, media).toDF()
        Multimodal
          .sampleFrames(feats)
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n_sampled_frames"), countDistinct(col("doc_id")).as("n_items"))
          .orderBy("kind")
      },
      // sampled-per-item = floor((fr-1)/ceil(fr/8)) + 1, from the same
      // per-kind frame-count formulas as the features oracle.
      Some(
        "WITH m AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS k, " +
          "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 1 " +
          "WHEN 1 THEN 800 + CAST(doc_id % 800 AS INTEGER) " +
          "ELSE 1 + CAST(doc_id % 5 AS INTEGER) END AS fr FROM documents), " +
          "s AS (SELECT doc_id, k, (fr - 1) // ((fr + 7) // 8) + 1 AS sampled FROM m) " +
          "SELECT CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
          "CAST(SUM(sampled) AS BIGINT) AS n_sampled_frames, " +
          "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_items " +
          "FROM s GROUP BY 1 ORDER BY 1")
    ),
    Q(
      "q_dedup_phash",
      // Perceptual-hash image dedup — the multimodal × dedup pillar
      // intersection (round-8 verdict #4). Corpus: one smooth BMP per
      // image doc (Phash.buildSmoothBmp — low-frequency content, the
      // regime pooling hashes are built for; see its scaladoc for why
      // white noise is the wrong fixture), plus PLANTED near-duplicate
      // variants for every doc_id % 9 == 0 image: a 2× nearest-neighbor
      // resize (+10M id) and a +32 clamped brightness shift (+20M id),
      // both produced by re-encoding REAL pixel bytes, not by copying
      // hashes. Pipeline: mapPartitions dHash (pixel decode is the codec
      // tier's justified imperative island) → 4×16-bit hamming banding
      // (the q_dedup_simhash machinery) → band-join candidates → exact
      // hamming ≤ 8 verify (measured: resize variants p50=2/p99=8,
      // brightness ≤ 2, unrelated smooth images min 9/mean 32). The
      // hash is not SQL-expressible, so the gated output is the recall
      // invariant over the planted truth (floor 0.8) + the
      // sub-quadratic candidate ceiling; n_true_pairs is the real
      // differential (the oracle re-derives the planting arithmetic).
      (s, d) => {
        import s.implicits._
        val imgIds = Tables(s, d, "documents")
          .select(col("doc_id")).filter(col("doc_id") % 3 === 0).as[Long]
        val hashed = imgIds.mapPartitions { it =>
          it.flatMap { id =>
            val base = Phash.buildSmoothBmp(16 + (id % 48).toInt, 16 + (id % 27).toInt, id)
            val variants =
              if (id % 9 == 0)
                Seq(
                  (id + 10000000L, Phash.resizeBmp(base, 2).get),
                  (id + 20000000L, Phash.brightenBmp(base, 32).get))
              else Seq.empty
            ((id, base) +: variants).iterator.flatMap { case (i, bytes) =>
              Phash.dHash(bytes).map(h => (i, h))
            }
          }
        }.toDF("img_id", "ph")
        val chunks = hashed.select(
          col("img_id"), col("ph"),
          posexplode(array((0 until 4).map(i => expr(s"(ph >> ${i * 16}) & 65535")): _*))
            .as(Seq("chunk_idx", "chunk")))
        val a = chunks.select(col("img_id").as("a_id"), col("ph").as("a_ph"), col("chunk_idx"), col("chunk"))
        val b = chunks.select(col("img_id").as("b_id"), col("ph").as("b_ph"), col("chunk_idx"), col("chunk"))
        val found = a.join(b, Seq("chunk_idx", "chunk"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), expr("bit_count(a_ph ^ b_ph)").as("hamming"))
          .distinct()
          .filter(col("hamming") <= 8)
        val truth = imgIds.toDF("doc_id")
          .filter(col("doc_id") % 9 === 0)
          .select(explode(array(
            struct(col("doc_id").as("a_id"), (col("doc_id") + 10000000L).as("b_id")),
            struct(col("doc_id").as("a_id"), (col("doc_id") + 20000000L).as("b_id")))).as("p"))
          .select(col("p.a_id"), col("p.b_id"))
        DedupQueries.pairRecallGate(
          truth, found,
          hashed.agg(count(lit(1)).as("n_docs")),
          floor = 0.8)
      },
      Some(
        "SELECT CAST(2 * count(*) AS BIGINT) AS n_true_pairs, " +
          "true AS recall_ge_floor, true AS candidates_subquadratic " +
          "FROM documents WHERE doc_id % 9 = 0")
    )
  )
}
