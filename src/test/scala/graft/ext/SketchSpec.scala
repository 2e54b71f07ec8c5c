package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** One-sided error contracts of the frequency sketches. */
class SketchSpec extends SparkSpec {

  private def tokens = Tables(spark, sf(), "documents")
    .select(explode(split(col("text"), " ")).as("token"))
    .filter(col("token") =!= "")

  test("count-min estimates never underestimate and respect the eps bound") {
    val exact = tokens.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val est = SketchQueries.countMinEstimates(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty)
    est.foreach { case (t, e) =>
      assert(e >= exact(t), s"CMS underestimated '$t': $e < ${exact(t)}")
      assert(e <= exact(t) + (0.001 * total).ceil.toLong + 1,
        s"CMS estimate for '$t' exceeds the eps bound: $e vs ${exact(t)} (+${0.001 * total})")
    }
  }

  test("freqItems surfaces every true heavy hitter above support") {
    val got = graft.Registry.byName("q_freq_items").run(spark, sf()).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_heavy") >= 1L, s"no heavy tokens in fixture: ${got.head}")
    assert(got.head.getAs[Boolean]("all_heavy_found"),
      s"freqItems missed a >2%-frequency token: ${got.head}")
  }

  test("hll sketch columns estimate within the lgK=12 error bound, merged and per-source") {
    // lgK=12 → relative standard error ~1.04/sqrt(4096) ≈ 1.6%; assert 5%
    // (3 sigma) for every per-source row AND the union row — the union
    // must not degrade accuracy (sketch merge is lossless for HLL).
    val rows = graft.Registry.byName("q_hll_union").run(spark, sf()).collect()
    assert(rows.length >= 2)
    assert(rows.exists(_.getString(0) == "__union__"))
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_distinct") > 0L)
      assert(r.getAs[Boolean]("est_ok"),
        s"${r.getString(0)}: HLL estimate outside the 5% gate (exact ${r.getAs[Long]("exact_distinct")})")
    }
  }

  test("truncated retrieval returns exactly k ranked rows per query with valid cosines") {
    val rows = graft.Registry.byName("q_sim_truncate").run(spark, sf()).collect()
    val perQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(perQ.nonEmpty)
    perQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length), s"query $q ranks")
      val cs = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"query $q not cos-descending")
      assert(cs.forall(c => c >= -1.0000001 && c <= 1.0000001))
    }
  }
}
