package graft.ext

import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables

/** Embedding-compression and semantic-dedup operators (round-6 widening):
  *
  *   - int8 scalar quantization with per-vector scale and exact
  *     reconstruction-error audit (the storage/bandwidth step before an
  *     ANN index ships to serving)
  *   - SemDeDup-style semantic dedup: k-means cluster the corpus, then
  *     drop all but one of each within-cluster near-duplicate set
  *     (Abbas et al. 2023 shape: cluster → pairwise-within-cluster →
  *     keep-first)
  *   - product quantization ([[Pq]]): per-subspace codebooks compress
  *     each vector to M small codes, with an exact reconstruction-error
  *     audit
  *
  * Scale shape: quantization is a pure per-row expression pipeline (no
  * shuffle at all); SemDeDup joins only within cluster buckets — the
  * all-pairs stage is bounded by the largest cluster, the same blocking
  * argument as q_dedup_embed/q_sim_ivf.
  */
object EmbedQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "q_quantize_embed",
      // Per-vector symmetric int8 quantization: scale = max|x| / 127,
      // q_i = clamp(floor(x_i/scale + 0.5)) — floor(x+0.5) instead of
      // round() because both engines implement it with the same IEEE
      // double ops (Spark's round() goes through BigDecimal, DuckDB's
      // through std::round; floor stays in hardware semantics). The
      // reconstruction-error vector is reduced with max (order-free) and
      // a sequential-fold dot product (bit-equal to DuckDB's
      // list_dot_product), so every output column is cross-engine
      // deterministic WITHOUT quantizing the audit itself. Spark floor()
      // returns BIGINT — cast back to double before rescaling.
      (s, d) => {
        val v = col("embedding").cast("array<double>")
        val scale = when(col("amax") === 0.0, lit(1.0)).otherwise(col("amax") / 127.0)
        val errv = transform(
          col("v"),
          x =>
            abs(x - least(greatest(floor(x / col("scale") + 0.5).cast("double"), lit(-127.0)), lit(127.0))
              * col("scale")))
        Tables(s, d, "embeddings")
          .select(col("vec_id"), v.as("v"))
          .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
          .withColumn("scale", scale)
          .withColumn("errv", errv)
          .select(
            col("vec_id"),
            size(col("v")).cast("long").as("n_dims"),
            col("scale"),
            array_max(col("errv")).as("max_abs_err"),
            Similarity.dot(col("errv"), col("errv")).as("sq_err"))
          .orderBy("vec_id")
      },
      Some(
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
          "a AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM v), " +
          "s AS (SELECT vec_id, v, CASE WHEN amax = 0 THEN 1.0 ELSE amax / 127.0 END AS scale FROM a), " +
          "e AS (SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims, scale, " +
          "list_transform(v, x -> abs(x - least(greatest(floor(x / scale + 0.5), -127.0), 127.0) * scale)) AS errv FROM s) " +
          "SELECT vec_id, n_dims, scale, list_max(errv) AS max_abs_err, " +
          "list_dot_product(errv, errv) AS sq_err FROM e ORDER BY vec_id"),
      headline = true
    ),
    Q(
      "q_semdedup",
      // SemDeDup: deterministic k-means (Ivf.train, seeded picks, fixed
      // rounds) buckets the corpus; within each cluster a vector is
      // DROPPED when a lower-id cluster-mate sits within cosine >= tau.
      // The kept set is therefore pairwise < tau inside every cluster
      // (property-tested in EmbedSpec). Per-cluster audit rollup only —
      // k-means float averaging is partition-order sensitive, so this is
      // registered rows-only like q_sim_ivf. At scale: the candidate join
      // is keyed on cluster id, never all-pairs.
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        // tau = 0.3 matches q_dedup_embed: the synthetic labels are weak
        // cosine clusters, so a production-ish 0.9x threshold drops
        // nothing here — same shape, lower bar.
        SemDedup.perClusterAudit(SemDedup.dropFlags(s, emb, k = 16, tau = 0.3))
          .orderBy("cluster")
      },
      None
    ),
    Q(
      "q_pq_encode",
      // Product quantization: 4 subspaces × 16-entry codebooks (PQ4×4bit)
      // over the embedding corpus — each vector compresses to 4 nibbles.
      // Codebook training is the deterministic Ivf k-means per subspace;
      // encoding is a pure per-row expression. Registered rows-only (the
      // Lloyd means are float partition-order sensitive, same as
      // q_sim_ivf); PqSpec pins the exact-reconstruction invariant.
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Pq.audit(Pq.encode(emb, Pq.train(s, emb, m = 4, k = 16)))
      },
      None
    ),
    Q(
      "q_pq_adc",
      // PQ search via asymmetric distance computation: queries carry
      // 8×16 distance tables, corpus vectors are matched through their
      // stored codes alone — top-10 approximate-L2 neighbors for the
      // first 10 vectors. m=8 (not the encoder demo's 4): the synthetic
      // embeddings are near-random, so 16-bit codes recall ~0.14 while
      // 32-bit codes reach ~0.3 (15x over the 0.02 chance floor) —
      // measured at sf0.01, asserted in EmbedSpec. Rows-only (k-means
      // float means).
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val books = Pq.train(s, emb, m = 8, k = 16)
        val enc = Pq.encode(emb, books).select(col("vec_id"), col("m"), col("code"))
        Pq.adcTopK(emb.filter(col("vec_id") < 10), enc, books, k = 10)
          .orderBy("q_id", "rank")
      },
      None
    )
  )
}
