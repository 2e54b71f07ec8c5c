package graft.ext

import graft.{Registry, SparkSpec}

/** The linear-probe GD trainer (q_gd_train): descent semantics on the real
  * fixture. The cross-engine bit-equality of the trajectory is the
  * registered oracle's job; this spec pins the TRAINING behavior — strict
  * monotone loss decrease (EtaC sits 4× inside the measured divergence
  * boundary, so real descent must be monotone here, no slack needed) and
  * substantial convergence.
  */
class ProbeSpec extends SparkSpec {

  test("gd trainer: loss strictly decreases and converges on the fixture") {
    val out = Registry.byName("q_gd_train").run(spark, sf()).collect()
      .sortBy(_.getAs[Long]("iter"))
    assert(out.length == 6, "expected init + 5 update iterations")
    val loss = out.map(_.getAs[Long]("loss"))
    assert(loss.forall(_ > 0L))
    assert(
      loss.sliding(2).forall { case Array(a, b) => b < a },
      s"non-monotone loss: ${loss.toSeq}")
    assert(loss.last * 4 < loss.head, s"did not converge: ${loss.toSeq}")
  }

  test("pmod floor-division identity equals Math.floorDiv on adversarial values") {
    // the cross-engine update step rests on (a − pmod(a,d)) div d being
    // floor division for ANY sign of a — the identity both engines
    // evaluate; pin it against the JVM's floorDiv on hostile values
    val rnd = new scala.util.Random(42)
    val cases = Seq.tabulate(2000)(_ =>
      (rnd.nextLong() % (1L << 52), math.abs(rnd.nextLong() % (1L << 30)) + 1L)) ++
      Seq((Long.MinValue / 4, 3L), (-7L, 3L), (7L, 3L), (-9L, 3L), (0L, 5L), (-1L, 1L << 20))
    cases.foreach { case (a, d) =>
      val pm = ((a % d) + d) % d
      assert((a - pm) % d == 0L, s"pmod identity broke divisibility for ($a, $d)")
      assert((a - pm) / d == Math.floorDiv(a, d), s"floor mismatch for ($a, $d)")
    }
  }

  test("gd apply: totals conserve, the threshold splits the corpus, scores are sane") {
    val dir = sf()
    val out = Registry.byName("q_gd_apply").run(spark, dir).collect()
    val nDocs = graft.core.Tables(spark, dir, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs, "every document scored exactly once")
    val pass = out.map(_.getAs[Long]("n_pass")).sum
    assert(pass > 0L && pass < nDocs, s"threshold did not split the corpus: $pass/$nDocs")
    out.foreach { r =>
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("sum_pred_fp") > 0L)
    }
  }

  test("gd trainer: weights start at zero and every update moves them") {
    val out = Registry.byName("q_gd_train").run(spark, sf()).collect()
      .sortBy(_.getAs[Long]("iter"))
    val ws = out.map(r => (1 to 5).map(j => r.getAs[Long](s"w${j - 1}")))
    assert(ws.head.forall(_ == 0L), "iter 0 must report the zero init")
    // successive weight vectors differ while the loss is still dropping
    ws.sliding(2).foreach { case Array(a, b) => assert(a != b, s"stalled update: $a") }
    // the dominant true signal (y ~ 3·f1) pulls w1 positive immediately
    assert(out.last.getAs[Long]("w1") > 0L)
  }
}
