package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity gates for the codegen L2 kernels (graft_argmin_l2 /
  * graft_min_l2 / graft_l2s) against the HOF formulation they replaced —
  * the round-15 hot-loop swap behind every k-means assignment, PQ encode,
  * and IVF probe. Bit-exact equality is the contract (same IEEE fold
  * order), so any divergence is a red assert, not a tolerance.
  */
class L2KernelsSpec extends SparkSpec {

  /** The replaced HOF forms, verbatim. */
  private def hofDist2(v: org.apache.spark.sql.Column, c: Seq[Double]) =
    aggregate(
      zip_with(v, array(c.map(lit): _*), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, d) => acc + d)
  private def hofAssign(v: org.apache.spark.sql.Column, cs: Seq[Seq[Double]]) = {
    val dists = array(cs.map(c => hofDist2(v, c)): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }
  private def hofMin(v: org.apache.spark.sql.Column, cs: Seq[Seq[Double]]) =
    array_min(array(cs.map(c => hofDist2(v, c)): _*))

  private def booksLit(cs: Seq[Seq[Double]]) =
    array(cs.map(c => array(c.map(lit): _*)): _*)

  test("kernels are bit-identical to the HOF chain on real embeddings") {
    val cs = graft.ext.Ivf.trainShared(spark, sf(), k = 16)
    val vecs = graft.core.Tables(spark, sf(), "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
    val diffs = vecs.select(
      call_function("graft_argmin_l2", col("v"), booksLit(cs)).as("ka"),
      hofAssign(col("v"), cs).as("ha"),
      call_function("graft_min_l2", col("v"), booksLit(cs)).as("km"),
      hofMin(col("v"), cs).as("hm"),
      call_function("graft_l2s", col("v"), booksLit(cs)).as("kd"),
      array(cs.map(c => hofDist2(col("v"), c)): _*).as("hd"))
      .filter(col("ka") =!= col("ha") || col("km") =!= col("hm") || col("kd") =!= col("hd"))
      .count()
    assert(diffs == 0, "kernel diverged from the HOF form — bit-exactness broken")
  }

  test("tie-break is first-wins (array_position semantics) and float inputs widen exactly") {
    import spark.implicits._
    // two identical centroids: both forms must pick index 0
    val cs = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(9.0, 9.0))
    val r = Seq(Seq(1.0, 2.0)).toDF("v")
      .select(
        call_function("graft_argmin_l2", col("v"), booksLit(cs)).as("k"),
        hofAssign(col("v"), cs).as("h"))
      .collect().head
    assert(r.getInt(0) == 0 && r.getInt(1) == 0)
    // float vectors (the raw embedding column type) widen per element
    val rf = Seq(Seq(1.5f, 2.5f)).toDF("vf")
      .select(
        call_function("graft_argmin_l2", col("vf"), booksLit(cs)).as("k"),
        call_function("graft_min_l2", col("vf"), booksLit(cs)).as("m"))
      .collect().head
    assert(rf.getInt(0) == 0)
    assert(rf.getDouble(1) == (1.5 - 1.0) * (1.5 - 1.0) + (2.5 - 2.0) * (2.5 - 2.0))
  }

  test("null element / length mismatch null out exactly like the HOF form") {
    import spark.implicits._
    val cs = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))
    val rows = Seq(
      Seq[java.lang.Double](1.0, null), // null element → every distance null
      Seq[java.lang.Double](1.0)) // length mismatch → every distance null
      .toDF("v")
      .select(
        call_function("graft_argmin_l2", col("v"), booksLit(cs)).as("ka"),
        hofAssign(col("v"), cs).as("ha"),
        call_function("graft_min_l2", col("v"), booksLit(cs)).as("km"),
        hofMin(col("v"), cs).as("hm"))
      .collect()
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)))
    // per-entry nulls in the distance ROW where the entry width mismatches
    val ragged = Seq(Seq(1.0, 2.0)).toDF("v")
      .select(call_function("graft_l2s", col("v"),
        array(array(lit(1.0), lit(2.0)), array(lit(1.0)))).as("d"))
      .collect().head.getSeq[Any](0)
    assert(ragged.head == 0.0 && ragged(1) == null)
  }

  test("kernels agree between the codegen and interpreted evaluation paths") {
    // doGenCode and nullSafeEval are separate implementations of the
    // same contract; force the interpreted path and compare against the
    // codegen results on real data.
    val cs = graft.ext.Ivf.trainShared(spark, sf(), k = 16)
    val vecs = graft.core.Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def results(): Seq[(Long, Int, Double)] =
      vecs.select(
        col("vec_id"),
        call_function("graft_argmin_l2", col("v"), booksLit(cs)).as("a"),
        call_function("graft_min_l2", col("v"), booksLit(cs)).as("m"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val gen = results()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = results()
      assert(gen == interp, "codegen and interpreted kernel paths diverged")
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("non-foldable codebook is rejected at analysis") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((Seq(1.0), Seq(Seq(1.0)))).toDF("v", "b")
        .select(call_function("graft_argmin_l2", col("v"), col("b")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"))
  }
}
