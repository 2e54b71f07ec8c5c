package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quantization error bounds and the SemDeDup keep-set invariant. */
class EmbedSpec extends SparkSpec {

  test("int8 quantization error is bounded by half a quantization step") {
    val out = graft.Registry.byName("q_quantize_embed").run(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val maxErr = r.getAs[Double]("max_abs_err")
      val sqErr = r.getAs[Double]("sq_err")
      val nDims = r.getAs[Long]("n_dims")
      // floor(x/s + 0.5) rounds to the nearest level; clamp only ever
      // applies at |x| = amax which maps exactly to ±127 — so every
      // element's error is <= scale/2.
      assert(maxErr <= scale * 0.5 + 1e-12, s"vec ${r.get(0)}: $maxErr > ${scale * 0.5}")
      assert(sqErr >= 0.0 && sqErr <= nDims * maxErr * maxErr + 1e-12)
    }
  }

  test("semdedup kept set is pairwise below tau within every cluster") {
    val tau = 0.3
    val emb = graft.core.Tables(spark, sf(), "embeddings")
    val flags = SemDedup.dropFlags(spark, emb, k = 8, tau = tau)
    val kept = flags
      .filter(!col("dropped"))
      .join(emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), Seq("vec_id"))
      .select(col("cluster"), col("vec_id"), col("v"))
      .collect()
      .groupBy(_.getAs[Int]("cluster"))
    assert(kept.nonEmpty)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    kept.foreach { case (_, rows) =>
      val vs = rows.map(r => (r.getAs[Long]("vec_id"), r.getSeq[Double](2)))
      for {
        (ida, va) <- vs
        (idb, vb) <- vs
        if ida < idb
      } assert(cos(va, vb) < tau, s"kept pair ($ida, $idb) at cos >= $tau")
    }
    // every non-empty cluster keeps at least one member
    val audit = SemDedup.perClusterAudit(flags).collect()
    audit.foreach { r =>
      assert(r.getAs[Long]("n_dropped") < r.getAs[Long]("n_vecs"))
    }
  }
}
