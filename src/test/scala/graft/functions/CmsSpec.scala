package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit gates for the Count-Min sketch beyond the q_cms_* oracles: the
  * monoid algebra (per-shard sketches merged element-wise ≡ the corpus
  * sketch — the property distributed partial aggregation and the
  * per-source serving shape both rest on), serialization round-trip,
  * the one-sided error contract over EVERY term (the oracle samples the
  * top-20), and the JVM-fold ≡ SQL-HOF hash equivalence that underwrites
  * the relational DuckDB reconstruction.
  */
class CmsSpec extends SparkSpec {

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(expr("graft_cms(term)").as("sk"))
      .head().getSeq[Long](0).toArray

  test("partition layout cannot change the sketch (merge is element-wise add)") {
    import spark.implicits._
    val terms = (0 until 5000).map(i => s"tok${i % 257}").toDF("term")
    val one = sketchOf(terms.repartition(1))
    val many = sketchOf(terms.repartition(32))
    assert(one.toSeq == many.toSeq, "32-partition partial-merge diverged from single-partition")
    // per-shard sketches merged by hand equal the corpus sketch
    val a = sketchOf(terms.filter($"term".substr(4, 1) < "5"))
    val b = sketchOf(terms.filter($"term".substr(4, 1) >= "5"))
    val merged = a.zip(b).map { case (x, y) => x + y }
    assert(merged.toSeq == one.toSeq, "shard-merged sketch diverged from the corpus sketch")
  }

  test("estimate over-counts only, for EVERY term, and exact-counts singletons often enough") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 8000).map(_ => s"w${rnd.nextInt(1200)}")
    val sk = sketchOf(rows.toDF("term"))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bad = truth.filter { case (t, c) => CmsSketch.estimate(sk, t) < c }
    assert(bad.isEmpty, s"under-count violates the CMS one-sided contract: ${bad.take(3)}")
    // sanity that the sketch is not degenerate: with 1200 keys in 4×1024
    // counters, a majority of estimates should be EXACT
    val exact = truth.count { case (t, c) => CmsSketch.estimate(sk, t) == c }
    assert(exact * 2 > truth.size, s"only $exact/${truth.size} exact — hash degeneracy?")
  }

  test("serialize/deserialize round-trips the counter array bit-for-bit") {
    val agg = CmsAggregate(org.apache.spark.sql.catalyst.expressions.Literal("x"))
    val buf = agg.createAggregationBuffer()
    val rnd = new scala.util.Random(7)
    for (i <- buf.indices) buf(i) = rnd.nextLong().abs
    assert(agg.deserialize(agg.serialize(buf)).toSeq == buf.toSeq)
  }

  test("JVM bucket equals the SQL char-poly HOF fold (the oracle's hash)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val words = (0 until 500).map(_ =>
      (1 to 1 + rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).toDF("term")
    for (j <- 0 until CmsSketch.Depth) {
      val viaSql = words.select(
        col("term"),
        aggregate(
          transform(sequence(lit(1), length(col("term"))),
            i => ascii(col("term").substr(i, lit(1))).cast("long")),
          lit(7L + 13L * j),
          (h, c) => (h * (31L + 10L * j) + c) % 1048573L).%(CmsSketch.Width).as("b"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      words.collect().map(_.getString(0)).foreach { t =>
        assert(CmsSketch.bucket(t, j).toLong == viaSql(t), s"hash row $j diverged on '$t'")
      }
    }
  }
}
