package graft

import org.apache.spark.sql.functions._

import graft.ext.{Ivf, Similarity}

/** A/B evidence harness for the kNN-graph scale path: times the exact
  * all-pairs form (q_knn_graph's serving plan) against the IVF-blocked
  * composition (Ivf.knnCandidates → knnTopK, q_knn_graph_ivf's serving
  * plan) on the same embeddings table, and reports the approximate path's
  * recall vs the exact truth plus its candidate volume — the numbers
  * PLANS.md cites for the sub-quadratic claim.
  *
  * Usage: runMain graft.SimAB <sfDir> <reps> [k] [r]
  */
object SimAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.build("graft-simab")
    Timing.warm(spark, sfDir)
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
    val n = emb.count()
    val k = if (args.length > 2) args(2).toInt else Ivf.cellCount(n)
    val r = if (args.length > 3) args(3).toInt else 2

    // train/index OUTSIDE the timed serving path: at production scale the
    // inverted index is a stored table (see Ivf scaladoc); the serving
    // cost is candidates + scoring + top-k.
    val centroids = Ivf.train(spark, emb, k = k)
    val cells = Ivf.indexMulti(emb, centroids, r = r).localCheckpoint(true)

    def exact() = Similarity.bruteForceTopK(emb, emb, 3)
    def ivf() = Ivf.knnTopK(Ivf.knnCandidates(cells), 3)

    val nCand = Ivf.knnCandidates(cells).count()
    val truth = exact().select(col("q_id"), col("n_id"))
    val hits = truth.join(
      ivf().select(col("src").as("q_id"), col("dst").as("n_id")),
      Seq("q_id", "n_id"), "left_semi").count()
    val nTruth = truth.count()
    print(s"""SIMAB_CFG {"k":$k,"r":$r} """)

    def run(f: () => org.apache.spark.sql.DataFrame): Double =
      Timing.timeOf(f().write.format("noop").mode("overwrite").save())
    // interleave A/B reps so box drift hits both arms equally
    val times = (1 to reps).map(_ => (run(exact _), run(ivf _)))
    val eMin = times.map(_._1).min
    val iMin = times.map(_._2).min
    println(
      s"""SIMAB {"n_vecs":$n,"n_cand":$nCand,"cand_frac_of_allpairs":${Timing.fmt3(nCand.toDouble / (n.toDouble * (n - 1)))},""" +
        s""""recall":${Timing.fmt3(hits.toDouble / nTruth)},"exact_sec":${Timing.fmt3(eMin)},"ivf_sec":${Timing.fmt3(iMin)},""" +
        s""""speedup":${Timing.fmt3(eMin / iMin)}}""")
    spark.stop()
  }
}
