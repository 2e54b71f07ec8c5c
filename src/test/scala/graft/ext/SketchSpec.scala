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
    assert(got.head.getLong(0) == 5L, s"freqItems missed a true top-5 token: $got")
  }
}
