package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit gates for the KMV/theta sketch beyond the q_kmv_* oracles: the
  * union monoid (partition layout and shard splits cannot change the
  * k-min set — the property partial aggregation rests on), exact-mode
  * degeneration (under-filled sketches estimate exactly), the
  * JVM-hash ≡ SQL-hash equivalence underwriting the relational DuckDB
  * reconstruction, and intersection-estimate semantics at both ends
  * (exact mode = exact distinct intersection of hashes; estimate mode
  * within the theta family's published error envelope).
  */
class KmvSpec extends SparkSpec {

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(expr("graft_kmv(term)").as("sk"))
      .head().getSeq[Long](0).toArray

  test("partition layout and shard-union cannot change the k-min set") {
    import spark.implicits._
    val terms = (0 until 6000).map(i => s"tok${i % 811}").toDF("term")
    val one = sketchOf(terms.repartition(1))
    val many = sketchOf(terms.repartition(32))
    assert(one.toSeq == many.toSeq, "32-partition partial-merge diverged from single-partition")
    assert(one.length == KmvSketch.K && one.toSeq == one.sorted.toSeq,
      "filled sketch must be exactly K sorted hashes")
    // hand-merged shard sketches ≡ corpus sketch: union + truncate
    val a = sketchOf(terms.filter($"term".substr(4, 1) < "5"))
    val b = sketchOf(terms.filter($"term".substr(4, 1) >= "5"))
    val merged = (a ++ b).distinct.sorted.take(KmvSketch.K)
    assert(merged.toSeq == one.toSeq, "shard-merged k-min set diverged from the corpus sketch")
  }

  test("exact mode: an under-filled sketch retains every distinct hash and estimates exactly") {
    import spark.implicits._
    // 17 distinct terms, heavy duplication: distinctness comes from the
    // TreeSet, not chance
    val terms = (0 until 900).map(i => s"only${i % 17}").toDF("term")
    val sk = sketchOf(terms)
    assert(sk.length == 17, s"exact-mode sketch retained ${sk.length} of 17 hashes")
    assert(KmvSketch.estimate(sk) == 17.0, "exact-mode estimate must equal the retained count")
    val expected = (0 until 17).map(i => KmvSketch.hash32(s"only$i")).toSet
    assert(sk.toSet == expected, "retained hashes diverged from the per-term md5-prefix hashes")
  }

  test("JVM hash32 equals the SQL md5-prefix chain (the oracle's reconstruction hash)") {
    import spark.implicits._
    val terms = Seq("alpha", "beta_gamma", "", "Ω_snow☃", "with space").toDF("t")
    val viaSql = terms
      .select(col("t"), expr("CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaSql.foreach { case (t, h) =>
      assert(KmvSketch.hash32(t) == h, s"hash mismatch for '$t': jvm=${KmvSketch.hash32(t)} sql=$h")
    }
  }

  test("estimate accuracy: (K-1)/theta lands within the theta family's envelope at 1k and 10k") {
    import spark.implicits._
    for (n <- Seq(1000, 10000)) {
      val sk = sketchOf((0 until n).map(i => s"card$i").toDF("term"))
      val est = KmvSketch.estimate(sk)
      // rse ≈ 1/sqrt(K-2) ≈ 12.7%; gate at 4σ ≈ 50% to stay
      // deterministic-fixture-safe while catching a broken formula
      assert(math.abs(est / n - 1.0) <= 0.5, f"estimate $est%.1f too far from true $n")
    }
  }

  test("union: scalar merge-truncate equals the aggregate over the concatenated stream") {
    import spark.implicits._
    // the KMV union theorem: the K smallest of A∪B are each within
    // their own source's K smallest, so merging two truncated sets
    // loses nothing
    val aTerms = (0 until 900).map(i => s"ua$i")
    val bTerms = (300 until 1200).map(i => s"ua$i") // overlap 300..899
    val a = sketchOf(aTerms.toDF("term"))
    val b = sketchOf(bTerms.toDF("term"))
    val direct = sketchOf((aTerms ++ bTerms).toDF("term"))
    assert(KmvSketch.union(a, b).toSeq == direct.toSeq,
      "scalar union diverged from the aggregate over the combined stream")
    // exact-mode pair: union is the exact distinct hash set
    val sa = sketchOf((0 until 20).map(i => s"su$i").toDF("term"))
    val sb = sketchOf((10 until 30).map(i => s"su$i").toDF("term"))
    assert(KmvSketch.union(sa, sb).length == 30)
    assert(KmvSketch.estimate(KmvSketch.union(sa, sb)) == 30.0)
  }

  test("difference: exact mode returns the exact hash difference; A∖B + A∩B ≈ A in estimate mode") {
    import spark.implicits._
    val sa = sketchOf((0 until 40).map(i => s"da$i").toDF("term"))
    val sb = sketchOf(((0 until 10).map(i => s"da$i") ++ (0 until 30).map(i => s"db$i")).toDF("term"))
    assert(KmvSketch.diffEstimate(sa, sb) == 30.0,
      "mutual exact mode must return the exact distinct difference")
    // estimate mode: the theta identity |A∖B| + |A∩B| = |A below θ| / θ
    // holds EXACTLY on the sketches (same θ, partitioned count)
    val aBig = sketchOf((0 until 1000).map(i => s"z$i").toDF("term"))
    val bBig = sketchOf((500 until 1500).map(i => s"z$i").toDF("term"))
    val theta = math.min(KmvSketch.thetaRaw(aBig), KmvSketch.thetaRaw(bBig))
    val below = aBig.count(_.toDouble < theta)
    val sum = KmvSketch.diffEstimate(aBig, bBig) + KmvSketch.intersectEstimate(aBig, bBig)
    val expected = below.toDouble * KmvSketch.HashSpace / theta
    assert(math.abs(sum - expected) < 1e-6,
      f"diff+intersect $sum%.3f diverged from the partition identity $expected%.3f")
  }

  test("intersection: exact mode returns the exact hash intersection; estimate mode tracks overlap") {
    import spark.implicits._
    // exact mode: two 40-distinct sets sharing 10 terms (< K each)
    val a40 = sketchOf((0 until 40).map(i => s"ia$i").toDF("term"))
    val shared = (0 until 10).map(i => s"ia$i")
    val b40 = sketchOf((shared ++ (0 until 30).map(i => s"ib$i")).toDF("term"))
    assert(KmvSketch.intersectEstimate(a40, b40) == 10.0,
      "mutual exact mode must return the exact distinct intersection")
    // estimate mode: 1000-term sets with 500 shared
    val aBig = sketchOf((0 until 1000).map(i => s"x$i").toDF("term"))
    val bBig = sketchOf((500 until 1500).map(i => s"x$i").toDF("term"))
    val est = KmvSketch.intersectEstimate(aBig, bBig)
    assert(est > 100.0 && est < 1000.0,
      f"intersection estimate $est%.1f implausible for true overlap 500")
    // disjoint sets: zero regardless of mode
    val cBig = sketchOf((0 until 1000).map(i => s"y$i").toDF("term"))
    assert(KmvSketch.intersectEstimate(aBig, cBig) == 0.0)
  }

  test("null elements in user-supplied sketch arrays are skipped, not a runtime crash") {
    // ADVICE round 17: the scalars accept array<bigint> with nullable
    // elements at analysis (parquet round-trips widen containsNull),
    // but toLongArray() threw at runtime on the first null. Defined
    // semantics now: a null element is no hash — the sketch is the set
    // of its non-null members.
    import spark.implicits._
    val df = Seq(1).toDF("one").select(
      expr("graft_kmv_est(array(CAST(NULL AS BIGINT), 5L, 9L))").as("est"),
      expr("graft_kmv_union(array(CAST(NULL AS BIGINT), 5L), array(3L, CAST(NULL AS BIGINT), 9L))").as("un"),
      expr("graft_kmv_intersect(array(CAST(NULL AS BIGINT), 5L, 9L), array(5L, CAST(NULL AS BIGINT)))").as("ix"),
      expr("graft_kmv_diff(array(CAST(NULL AS BIGINT), 5L, 9L), array(5L, CAST(NULL AS BIGINT)))").as("dx"))
    val r = df.head()
    assert(r.getDouble(0) == 2.0, s"est over [null,5,9] must see 2 hashes, got ${r.getDouble(0)}")
    assert(r.getSeq[Long](1) == Seq(3L, 5L, 9L), s"union must merge non-null members, got ${r.getSeq[Long](1)}")
    assert(r.getDouble(2) == 1.0, "intersect over null-bearing exact sketches must be exact")
    assert(r.getDouble(3) == 1.0, "diff over null-bearing exact sketches must be exact")
  }
}
