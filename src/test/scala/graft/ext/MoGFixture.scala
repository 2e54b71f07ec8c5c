package graft.ext

/** Deterministic mixture-of-Gaussians embedding fixture (FIXTURES.md
  * "mog-embeddings"): the REALISTIC clustered regime the late-interaction
  * and residual-PQ claims need, between the isotropic char-hash vectors
  * of the registered corpus (no cluster structure at all) and the
  * adversarially PLANTED sign-pattern corpora of the round-13 specs
  * (perfect structure by construction).
  *
  * Recipe — exact integer arithmetic throughout, so any engine (or a
  * reviewer with a calculator) re-derives it bit-for-bit from the seed:
  *
  *   - a splitmix-style mixer folds (seed, stream, indices...) into a
  *     non-negative Long; `unif(lo, hi, ...)` maps it to a uniform
  *     integer in [lo, hi];
  *   - cluster centers: dim coordinates uniform on [-2000, 2000]
  *     (stream 1);
  *   - member noise: mean of 6 uniforms on [-500, 500] (stream 2) —
  *     quasi-normal by CLT, std ≈ 118 per dim;
  *   - vector(c, i) = center(c) + noise(i).
  *
  * With dim = 16 that is ~6500 expected center-center distance vs ~470
  * cluster radius: clearly clustered (within-cluster cos ≈ 0.99), but
  * with hash-random center directions — nothing aligned to the pruning
  * cell key or the PQ subspaces, unlike the planted corpora.
  */
object MoGFixture {

  private def mix(parts: Long*): Long = {
    var h = 1125899906842597L
    parts.foreach { p =>
      h = (h ^ p) * 6364136223846793005L + 1442695040888963407L
    }
    h & 0x7fffffffffffffffL
  }

  private def unif(lo: Int, hi: Int, parts: Long*): Double =
    (mix(parts: _*) % (hi - lo + 1) + lo).toDouble

  def center(seed: Long, c: Long, dim: Int): Array[Double] =
    Array.tabulate(dim)(j => unif(-2000, 2000, seed, 1L, c, j.toLong))

  private def noise(seed: Long, i: Long, j: Int): Double =
    (0 until 6).map(t => unif(-500, 500, seed, 2L, i, j.toLong, t.toLong)).sum / 6.0

  /** Member `i`'s vector in cluster `c`. */
  def vector(seed: Long, c: Long, i: Long, dim: Int): Array[Double] = {
    val ctr = center(seed, c, dim)
    Array.tabulate(dim)(j => ctr(j) + noise(seed, i, j))
  }

  /** Single-vector corpus: n vectors over `clusters` round-robin
    * clusters, as (vec_id, cluster, embedding).
    */
  def singles(
      spark: org.apache.spark.sql.SparkSession,
      seed: Long, n: Int, clusters: Int, dim: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = (i % clusters).toLong
      (i.toLong, c, vector(seed, c, i.toLong, dim).toSeq)
    }.toDF("vec_id", "cluster", "embedding")
  }

  /** Multi-vector (token) corpus in the late-interaction family's shape
    * (doc_id, pos, term, tv, tn2): `tokens` vectors per doc, every
    * token drawn from the DOC's cluster (the realistic case — a doc's
    * token embeddings live near its topic).
    */
  def multiVector(
      spark: org.apache.spark.sql.SparkSession,
      seed: Long, nDocs: Int, clusters: Int, tokens: Int,
      dim: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = for {
      d <- 0 until nDocs
      k <- 0 until tokens
      c = (d % clusters).toLong
    } yield (d.toLong, k, s"t${d}_$k", vector(seed, c, d.toLong * tokens + k, dim).toSeq)
    rows.toDF("doc_id", "pos", "term", "tv")
      .withColumn("tv", col("tv").cast("array<double>"))
      .withColumn("tn2", Similarity.dot(col("tv"), col("tv")))
  }
}
