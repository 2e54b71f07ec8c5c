package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** The k-means training family: inertia trajectory semantics on the real
  * fixture (strict decrease — tighter than the registered gate's
  * quantization slack) and clustering behavior on a planted corpus where
  * co-membership is decidable without reference to seeds.
  */
class ClusterSpec extends SparkSpec {

  test("kmeans: inertia strictly decreases on the fixture and the gate holds") {
    val out = Registry.byName("q_kmeans").run(spark, sf()).collect()
      .sortBy(_.getAs[Int]("iter"))
    assert(out.length == 4, "expected init + 3 update iterations")
    assert(out.forall(_.getAs[Boolean]("nonincreasing")))
    val inertia = out.map(_.getAs[Long]("inertia_fp"))
    assert(inertia.forall(_ > 0L))
    // the registered gate allows the dims·n quantization slack; on the
    // real fixture the first update must improve by far more than that
    assert(inertia(1) < inertia(0), s"no improvement: ${inertia.toSeq}")
    assert(inertia.sliding(2).forall { case Array(a, b) => b <= a }, s"non-monotone: ${inertia.toSeq}")
  }

  test("fused one-scan trainer recovers the instrumented trajectory bit-identically") {
    val dir = sf()
    val instrumented = Registry.byName("q_kmeans").run(spark, dir).collect()
      .map(r => (r.getAs[Int]("iter"), r.getAs[Long]("inertia_fp"), r.getAs[Boolean]("nonincreasing")))
      .sortBy { case (t, _, _) => t }.toSeq
    val fused = Registry.byName("q_kmeans_fused").run(spark, dir).collect()
      .map(r => (r.getAs[Int]("iter"), r.getAs[Long]("inertia_fp"), r.getAs[Boolean]("nonincreasing")))
      .sortBy { case (t, _, _) => t }.toSeq
    assert(fused == instrumented, s"fused=$fused\ninstrumented=$instrumented")
  }

  test("kmeans assignment: total, in-range, and consistent with the trajectory's final step") {
    val dir = sf()
    val n = graft.core.Tables(spark, dir, "embeddings").count()
    val out = Registry.byName("q_kmeans_assign").run(spark, dir).collect()
    assert(out.length == n, "every vector assigned exactly once")
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == n)
    assert(out.forall(r => r.getAs[Int]("bucket") >= 0 && r.getAs[Int]("bucket") < 8))
    assert(out.forall(_.getAs[Long]("d2_fp") >= 0L))
    // Σ per-row min-distances under the final centroids IS the last
    // trajectory point — the two queries must tell one story
    val lastInertia = Registry.byName("q_kmeans").run(spark, dir).collect()
      .maxBy(_.getAs[Int]("iter")).getAs[Long]("inertia_fp")
    assert(out.map(_.getAs[Long]("d2_fp")).sum == lastInertia)
  }

  test("kmeans on a planted corpus: identical vectors never split across clusters") {
    import spark.implicits._
    // 8 groups × 5 IDENTICAL vectors (one-hot direction per group, far
    // apart): whatever the md5 seeding picks, argmin is a function of the
    // vector alone, so group members must share a bucket at every step.
    val rows = for (g <- 0 until 8; i <- 0 until 5) yield {
      val v = Array.tabulate(64)(d => if (d == g * 8) 1.0f else -0.1f)
      (g * 5L + i, v, s"g$g")
    }
    val dir = Files.createTempDirectory("clusterspec").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Registry.byName("q_kmeans_assign").run(spark, dir).collect()
    assert(out.length == 40)
    val byGroup = out.groupBy(_.getAs[Long]("vec_id") / 5)
    for ((g, members) <- byGroup)
      assert(members.map(_.getAs[Int]("bucket")).distinct.length == 1,
        s"group $g split across buckets")
    // identical vectors sit exactly on their centroid candidates' argmin;
    // with 8 seeds over 8 distinct points at least 2 distinct buckets
    // must be in use (degenerate all-in-one would mean assignExpr broke)
    assert(out.map(_.getAs[Int]("bucket")).distinct.length >= 2)
  }
}
