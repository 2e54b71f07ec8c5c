package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ, Jégou et al. 2011 "Product Quantization for
  * Nearest Neighbor Search" shape): split each embedding into M contiguous
  * subvectors and learn an independent k-entry codebook per subspace; a
  * vector is then stored as M small codes (M bytes at k ≤ 256) instead of
  * dim floats — the compression step between int8 scalar quantization
  * ([[EmbedQueries]] q_quantize_embed) and a serving ANN index.
  *
  * Codebooks reuse [[Ivf.train]]'s deterministic k-means (seeded picks,
  * fixed Lloyd rounds), run once per subspace on the sliced corpus. Scale
  * shape: training collects only M×k centroid rows to the driver; encoding
  * is a pure per-row expression against codebook literals (no shuffle);
  * the audit is one tiny hash-agg keyed on subspace id.
  */
object Pq {

  /** Squared L2 between a vector column and the codebook row selected by
    * `code` (1-based element_at; `code` is the 0-based assignment).
    */
  private def reconErr2(subv: Column, codebook: Seq[Seq[Double]], code: Column): Column = {
    val cbLit = array(codebook.map(c => array(c.map(lit): _*)): _*)
    val cent = element_at(cbLit, (code + 1).cast("int"))
    aggregate(
      zip_with(subv, cent, (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, e) => acc + e)
  }

  /** Train M codebooks of k entries each over dim/M-sized subvectors. */
  def train(spark: SparkSession, corpus: DataFrame, m: Int, k: Int): Seq[Seq[Seq[Double]]] = {
    val dim = corpus
      .select(size(col("embedding")).as("d")).limit(1).collect().head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    (0 until m).map { j =>
      Ivf.train(
        spark,
        corpus.select(
          col("vec_id"),
          slice(col("embedding").cast("array<double>"), j * sub + 1, sub).as("embedding")),
        k)
    }
  }

  /** Encode: one row per (vec_id, subspace) with the assigned code and its
    * exact squared reconstruction error.
    */
  def encode(corpus: DataFrame, books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val dim = books.map(_.head.size).sum
    val sub = dim / books.size
    val v = col("embedding").cast("array<double>")
    val perM = books.zipWithIndex.map { case (cb, j) =>
      val subv = slice(col("v"), j * sub + 1, sub)
      val code = Ivf.assignExpr(subv, cb)
      struct(lit(j).as("m"), code.as("code"), reconErr2(subv, cb, code).as("err2"))
    }
    corpus
      .select(col("vec_id"), v.as("v"))
      .select(col("vec_id"), explode(array(perM: _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.code").as("code"), col("s.err2").as("err2"))
  }

  /** Per-subspace audit rollup (small, stable output for the rows-only
    * gate): vectors encoded, codebook entries actually used, mean/max
    * squared reconstruction error.
    */
  def audit(encoded: DataFrame): DataFrame =
    encoded
      .groupBy(col("m"))
      .agg(
        count(lit(1)).as("n_vecs"),
        countDistinct(col("code")).as("codes_used"),
        avg(col("err2")).as("mse"),
        max(col("err2")).as("max_err2"))
      .orderBy("m")
}
