package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (cluster-then-prune, the shape
  * from Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication"): coarse k-means buckets the embedding
  * corpus, and within each bucket all but one member of every
  * near-duplicate set (cosine >= tau) are dropped. The keep rule is
  * deterministic — a vector is dropped iff a LOWER-ID cluster-mate is
  * within tau — which makes the kept set pairwise < tau inside each
  * cluster (if cos(a, c) >= tau with a < c, c is gone; chains collapse to
  * their lowest id).
  *
  * Scale: clustering is [[Ivf.train]] (only k centroid rows reach the
  * driver); the pairwise stage joins on cluster id, so cost is bounded by
  * the largest cluster, not the corpus — the standard SemDeDup argument
  * for why web-scale semantic dedup is tractable.
  */
object SemDedup {

  /** Per-vector drop decision: (vec_id, cluster, dropped). */
  def dropFlags(spark: SparkSession, corpus: DataFrame, k: Int, tau: Double): DataFrame = {
    val centroids = Ivf.train(spark, corpus, k)
    val assigned = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cluster", Ivf.assignExpr(col("v"), centroids))
    // per-vector norms once per side, not per within-cluster pair —
    // bit-identical to the fused cosine (see Similarity.bruteForceTopK)
    val a = assigned.select(
      col("cluster"), col("vec_id").as("a_id"), col("v").as("av"),
      sqrt(Similarity.dot(col("v"), col("v"))).as("an"))
    val b = assigned.select(
      col("cluster"), col("vec_id").as("b_id"), col("v").as("bv"),
      sqrt(Similarity.dot(col("v"), col("v"))).as("bn"))
    val droppedIds = a
      .join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .filter(Similarity.dot(col("av"), col("bv")) / (col("an") * col("bn")) >= tau)
      .select(col("b_id").as("vec_id"))
      .distinct()
    assigned
      .join(droppedIds.withColumn("dropped", lit(true)), Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        col("cluster"),
        coalesce(col("dropped"), lit(false)).as("dropped"))
  }

  /** Audit rollup: per-cluster member/drop counts (small, stable output
    * for the rows-only gate).
    */
  def perClusterAudit(flags: DataFrame): DataFrame =
    flags
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("dropped").cast("long")).as("n_dropped"))
      .withColumn(
        "kept_frac",
        (col("n_vecs") - col("n_dropped")).cast("double") / col("n_vecs").cast("double"))
}
