package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized sweep for the connected-components kernels (the
  * repo's hand-rolled property convention — the scalacheck bridge isn't
  * in the offline cache): on random graphs of varied density, BOTH
  * registered kernels — star contraction ([[Graph.ccStar]], the
  * log-round default) and min-label propagation to fixpoint
  * ([[Graph.ccConverged]], the wave-tracked form the incremental repair
  * builds on) — must reproduce a plain JVM union-find's components
  * exactly, labeled by component minimum. Random graphs sweep the
  * shapes the fixture co-purchase graph (one dense blob) and the
  * planted spec graphs (chains, stars) can't: mixed-size components,
  * isolated nodes, dense cores with whiskers.
  */
class GraphPropertySpec extends SparkSpec {

  /** Reference: array union-find with path compression, labels =
    * component minimum node id.
    */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("star contraction and hash-min fixpoint both equal union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(424242)
    for (trial <- 0 until 12) {
      val n = 20 + rnd.nextInt(60)
      // density sweep: from near-forest (whisker-heavy, long diameters)
      // to dense (single blob) — m from ~n/2 to ~3n
      val m = (n / 2) + rnd.nextInt(3 * n)
      val pairs = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (a, b)
      }.filter { case (a, b) => a != b }
      val expected = unionFind(n, pairs)
      val e0 = pairs.toDF("src", "dst")
      val edges = e0
        .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      val nodes = spark.range(n.toLong).select(col("id").as("pk"))
      val (starLabels, starRounds, starDone) = Graph.ccStar(nodes, edges)
      val star = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == expected,
        s"trial $trial (n=$n, m=${pairs.size}): star contraction != union-find")
      assert(starDone && starRounds < Graph.CcMaxRounds, s"trial $trial: star hit the runaway cap")
      val (hmLabels, hmRounds, _, hmDone) = Graph.ccConverged(nodes, edges)
      val hm = hmLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hm == expected,
        s"trial $trial (n=$n, m=${pairs.size}): hash-min fixpoint != union-find")
      assert(hmDone && hmRounds < Graph.CcMaxRounds, s"trial $trial: hash-min hit the runaway cap")
    }
  }

  test("warm-start repair equals union-find after a random delta batch, for any base/delta split") {
    import spark.implicits._
    val rnd = new scala.util.Random(90210)
    for (trial <- 0 until 8) {
      val n = 30 + rnd.nextInt(40)
      val all = Seq.fill(2 * n) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val (basePairs, deltaPairs) = all.partition(_ => rnd.nextBoolean())
      if (deltaPairs.nonEmpty) {
        def und(p: Seq[(Long, Long)]) = {
          val e0 = p.toDF("src", "dst")
          e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
            .localCheckpoint(true)
        }
        val nodes = spark.range(n.toLong).select(col("id").as("pk"))
        val (labels0, _, _, _) = Graph.ccConverged(nodes, und(basePairs))
        val seed = und(deltaPairs).select(col("src").as("pk")).distinct()
        val (warm, _, _, _) = Graph.ccConvergedFrom(
          labels0, und(all), seed = Some(seed))
        val got = warm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == unionFind(n, all),
          s"trial $trial: warm repair != union-find on the merged graph")
      }
    }
  }
}
