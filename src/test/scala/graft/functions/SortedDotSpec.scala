package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the graft_sorted_dot codegen kernel — the champion-list
  * sparse-cosine scoring hot loop (round 15). The contract is exact
  * integer equality with the relational formulation it replaced
  * (candidate ⋈ signatures on (doc, term) → SUM(wa·wb)), so the main
  * gate is a count-0 differential over real corpus signatures, not a
  * tolerance.
  */
class SortedDotSpec extends SparkSpec {

  /** Per-doc top-5 TF-IDF signature (the championCosine recipe) as both
    * the thin (doc, term, w) relation and the (sorted terms, weights)
    * parallel arrays the kernel consumes.
    */
  private def signatures() = {
    val docs = graft.core.Tables(spark, sf(), "documents")
    val n = docs.agg(count(lit(1)).as("n"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val sigW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("w").desc, col("term"))
    val sig = tf
      .join(tf.groupBy(col("term")).agg(count(lit(1)).as("df")), Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), expr("tf * ((n * 1000000) div df)").as("w"))
      .withColumn("rnk", row_number().over(sigW))
      .filter(col("rnk") <= 5)
      .select(col("doc_id"), col("term"), col("w"))
    val sigArr = sig
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("term"), col("w")))).as("sw"))
      .select(
        col("doc_id"),
        expr("transform(sw, x -> x.term)").as("ts"),
        expr("transform(sw, x -> x.w)").as("ws"))
    (sig, sigArr)
  }

  test("kernel equals the relational SUM(wa*wb) on real corpus signatures") {
    val (sig, sigArr) = signatures()
    // bounded all-pairs slice: every ordered pair among the first 80 docs
    val ids = sigArr.filter(col("doc_id") < 80)
    val pairs = ids.select(col("doc_id").as("a_id"), col("ts").as("tsa"), col("ws").as("wsa"))
      .crossJoin(ids.select(col("doc_id").as("b_id"), col("ts").as("tsb"), col("ws").as("wsb")))
      .filter(col("a_id") < col("b_id"))
    val kernel = pairs.select(
      col("a_id"), col("b_id"),
      expr("graft_sorted_dot(tsa, wsa, tsb, wsb)").as("dot"))
    val relational = sig.filter(col("doc_id") < 80)
      .select(col("doc_id").as("a_id"), col("term"), col("w").as("wa"))
      .join(
        sig.filter(col("doc_id") < 80)
          .select(col("doc_id").as("b_id"), col("term"), col("w").as("wb")),
        Seq("term"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("wa") * col("wb")).as("dot"))
    // full-outer differential: the kernel must agree on shared-term pairs
    // AND report 0 exactly where the relational form has no row
    val mism = kernel.join(relational, Seq("a_id", "b_id"), "full_outer")
      .filter(coalesce(kernel("dot"), lit(0L)) =!= coalesce(relational("dot"), lit(0L)))
      .count()
    assert(mism == 0, "graft_sorted_dot diverged from the relational dot product")
    // and the slice actually exercises both regimes
    assert(kernel.filter(col("dot") > 0).count() > 0)
    assert(kernel.filter(col("dot") === 0).count() >= 0)
  }

  test("unit semantics: overlap, disjoint, empty, null") {
    import spark.implicits._
    val df = Seq(
      // (terms_a, ws_a, terms_b, ws_b, expected)
      (Seq("a", "c", "e"), Seq(2L, 3L, 5L), Seq("b", "c", "e"), Seq(7L, 11L, 13L), 3L * 11 + 5 * 13),
      (Seq("a", "b"), Seq(1L, 2L), Seq("c", "d"), Seq(3L, 4L), 0L),
      (Seq.empty[String], Seq.empty[Long], Seq("a"), Seq(1L), 0L))
      .toDF("ta", "wa", "tb", "wb", "want")
    assert(df.filter(expr("graft_sorted_dot(ta, wa, tb, wb)") =!= col("want")).count() == 0)
    val withNull = Seq((Seq("a"), Seq(1L))).toDF("ta", "wa")
      .select(expr("graft_sorted_dot(ta, wa, CAST(NULL AS ARRAY<STRING>), CAST(NULL AS ARRAY<BIGINT>))").as("d"))
      .collect().head
    assert(withNull.isNullAt(0))
  }

  test("integer-keyed form: same dot as the string-keyed merge under a key bijection") {
    import spark.implicits._
    // round 22: the sparse index dictionary-encodes terms to dense long
    // ids — the long-key merge must agree with the string-key merge
    // under any order-preserving-or-not bijection (the integer dot is
    // order-free), and keep the unit semantics
    val df = Seq(
      (Seq(1L, 3L, 5L), Seq(2L, 3L, 5L), Seq(2L, 3L, 5L), Seq(7L, 11L, 13L), 3L * 11 + 5 * 13),
      (Seq(1L, 2L), Seq(1L, 2L), Seq(3L, 4L), Seq(3L, 4L), 0L),
      (Seq.empty[Long], Seq.empty[Long], Seq(1L), Seq(1L), 0L))
      .toDF("ta", "wa", "tb", "wb", "want")
    assert(df.filter(expr("graft_sorted_dot(ta, wa, tb, wb)") =!= col("want")).count() == 0)
    // mixed key types must fail analysis, not silently zip
    val mixed = Seq((Seq("a"), Seq(1L), Seq(1L), Seq(1L))).toDF("ta", "wa", "tb", "wb")
    intercept[Exception] {
      mixed.select(expr("graft_sorted_dot(ta, wa, tb, wb)")).collect()
    }
    // overflow stays loud on the long-key path
    val big = Seq((Seq(1L), Seq(Long.MaxValue), Seq(1L), Seq(3L))).toDF("ta", "wa", "tb", "wb")
    intercept[Exception] {
      big.select(expr("graft_sorted_dot(ta, wa, tb, wb)")).collect()
    }
  }

  test("malformed inputs fail loudly, wrong types fail analysis") {
    import spark.implicits._
    // parallel arrays of different lengths: loud runtime error, never a wrong score
    val bad = Seq((Seq("a", "b"), Seq(1L), Seq("a"), Seq(1L))).toDF("ta", "wa", "tb", "wb")
      .select(expr("graft_sorted_dot(ta, wa, tb, wb)"))
    val e = intercept[Exception] { bad.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null && c.getMessage.contains("parallel arrays differ")))
    // int weights (not bigint) must be rejected at analysis time
    val wrongType = intercept[Exception] {
      Seq((Seq("a"), Seq(1), Seq("a"), Seq(1))).toDF("ta", "wa", "tb", "wb")
        .select(expr("graft_sorted_dot(ta, wa, tb, wb)")).collect()
    }
    assert(wrongType.getMessage.contains("graft_sorted_dot") ||
      wrongType.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("overflow fails loudly like the ANSI relational sum, never wraps into a score") {
    import spark.implicits._
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    // product past 2^63: 2^32 * 2^32
    val prodOverflow = Seq((Seq("a"), Seq(1L << 32), Seq("a"), Seq(1L << 32)))
      .toDF("ta", "wa", "tb", "wb")
      .select(expr("graft_sorted_dot(ta, wa, tb, wb)"))
    val e1 = intercept[Exception] { prodOverflow.collect() }
    assert(causes(e1).exists(c => c.getMessage != null && c.getMessage.contains("overflows long")))
    // accumulator past 2^63: two in-range products of 2^62 each
    val big = 1L << 62
    val accOverflow = Seq((Seq("a", "b"), Seq(big, big), Seq("a", "b"), Seq(1L, 1L)))
      .toDF("ta", "wa", "tb", "wb")
      .select(expr("graft_sorted_dot(ta, wa, tb, wb)"))
    val e2 = intercept[Exception] { accOverflow.collect() }
    assert(causes(e2).exists(c =>
      c.isInstanceOf[ArithmeticException] || (c.getMessage != null &&
        (c.getMessage.contains("overflow") || c.getMessage.contains("long overflow")))))
    // the guard is not over-eager: Long.MaxValue * 1 + 0 is fine
    val edge = Seq((Seq("a"), Seq(Long.MaxValue), Seq("a"), Seq(1L)))
      .toDF("ta", "wa", "tb", "wb")
      .select(expr("graft_sorted_dot(ta, wa, tb, wb)").as("d")).collect().head
    assert(edge.getLong(0) == Long.MaxValue)
  }
}
