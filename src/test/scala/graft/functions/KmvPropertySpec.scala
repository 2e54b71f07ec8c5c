package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Hand-rolled randomized properties for the KMV kernel (seeded, so
  * deterministic — the scalacheck bridge isn't in the offline cache;
  * the repo convention is explicit seeded sweeps). These run WITHOUT a
  * Spark session: they pin the pure JVM algebra the aggregate and the
  * scalar set operations are built on, across 200 random corpus pairs
  * per property — shapes the fixture-driven KmvSpec can't sweep.
  */
class KmvPropertySpec extends AnyFunSuite {

  private def sketch(items: Seq[String]): Array[Long] = {
    // reference construction: k smallest distinct hashes, by definition
    items.map(KmvSketch.hash32).distinct.sorted.take(KmvSketch.K).toArray
  }

  private def incremental(items: Seq[String]): Array[Long] = {
    // the aggregate's update path: bounded TreeSet fold in arrival order
    val set = new java.util.TreeSet[java.lang.Long]()
    items.foreach { s =>
      val h = KmvSketch.hash32(s)
      if (set.size < KmvSketch.K) set.add(h)
      else if (h < set.last()) { if (set.add(h)) set.remove(set.last()) }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  test("incremental fold equals the definitional k-min set on random streams, any arrival order") {
    val rnd = new scala.util.Random(1701)
    for (trial <- 0 until 200) {
      val n = 1 + rnd.nextInt(400)
      val vocab = 1 + rnd.nextInt(300)
      val items = Seq.fill(n)(s"t${rnd.nextInt(vocab)}-$trial")
      val shuffled = rnd.shuffle(items)
      assert(incremental(items).toSeq == sketch(items).toSeq, s"trial $trial: fold != definition")
      assert(incremental(shuffled).toSeq == incremental(items).toSeq,
        s"trial $trial: arrival order changed the k-min set")
    }
  }

  test("union theorem holds on random pairs: merge-truncate == k-min of the concatenation") {
    val rnd = new scala.util.Random(1702)
    for (trial <- 0 until 200) {
      val a = Seq.fill(1 + rnd.nextInt(300))(s"a${rnd.nextInt(200)}-$trial")
      val shared = Seq.fill(rnd.nextInt(100))(s"s${rnd.nextInt(80)}-$trial")
      val b = Seq.fill(1 + rnd.nextInt(300))(s"b${rnd.nextInt(200)}-$trial") ++ shared
      val sa = sketch(a ++ shared); val sb = sketch(b)
      assert(KmvSketch.union(sa, sb).toSeq == sketch(a ++ shared ++ b).toSeq,
        s"trial $trial: union of truncated sets != k-min of the combined stream")
    }
  }

  test("set-algebra identities hold exactly on the sketches for random pairs") {
    val rnd = new scala.util.Random(1703)
    for (trial <- 0 until 200) {
      val a = (0 until 1 + rnd.nextInt(500)).map(i => s"x$i-$trial")
      val off = rnd.nextInt(400)
      val b = (off until off + 1 + rnd.nextInt(500)).map(i => s"x$i-$trial")
      val sa = sketch(a); val sb = sketch(b)
      val theta = math.min(KmvSketch.thetaRaw(sa), KmvSketch.thetaRaw(sb))
      val belowA = sa.count(_.toDouble < theta)
      // partition identity: |A∖B| + |A∩B| = |A below θ| / θ, exactly
      val lhs = KmvSketch.diffEstimate(sa, sb) + KmvSketch.intersectEstimate(sa, sb)
      val rhs = belowA.toDouble * KmvSketch.HashSpace / theta
      assert(math.abs(lhs - rhs) <= math.ulp(rhs) * 4,
        s"trial $trial: diff+intersect=$lhs != belowA/theta=$rhs")
      // symmetry of the intersection estimator
      assert(KmvSketch.intersectEstimate(sa, sb) == KmvSketch.intersectEstimate(sb, sa),
        s"trial $trial: intersection estimate not symmetric")
      // A∖A = 0 and A∩A = estimate(A) for every sketch
      assert(KmvSketch.diffEstimate(sa, sa) == 0.0)
      assert(math.abs(KmvSketch.intersectEstimate(sa, sa) - KmvSketch.estimate(sa)) <=
        math.ulp(KmvSketch.estimate(sa)) * 4, s"trial $trial: A∩A != est(A)")
    }
  }

  test("estimate is exact below K and within the theta envelope above it, across cardinalities") {
    val rnd = new scala.util.Random(1704)
    for (trial <- 0 until 100) {
      val n = 1 + rnd.nextInt(60) // below K → exact mode
      val s = sketch((0 until n).map(i => s"e$i-$trial"))
      assert(KmvSketch.estimate(s) == s.length.toDouble, s"trial $trial: exact mode inexact")
    }
    // above K: relative error within 5/sqrt(K-2) (≈5σ) on every trial
    for (trial <- 0 until 50) {
      val n = 200 + rnd.nextInt(5000)
      val est = KmvSketch.estimate(sketch((0 until n).map(i => s"c$i-$trial")))
      val rse = 1.0 / math.sqrt((KmvSketch.K - 2).toDouble)
      assert(math.abs(est / n - 1.0) <= 5 * rse,
        f"trial $trial: estimate $est%.1f for true $n outside 5 sigma")
    }
  }
}
