package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE trainer vs the hand-computed reference merges on the classic
  * Sennrich fixture, plus the fold-merge's sequential semantics.
  */
class BpeSpec extends SparkSpec {

  test("learned merges match the hand-computed reference on the Sennrich fixture") {
    import spark.implicits._
    // corpus: low x5, lower x2, newest x6, widest x3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq(text).toDF("text")
    val out = Bpe.train(spark, docs, "text", merges = 3).collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("left"), r.getAs[String]("right"), r.getAs[Long]("n")))
      .sortBy(_._1)
    // round 1: (e,s) and (s,t) tie at 9, "e s" < "s t" lexicographically;
    // round 2: (es,t) at 9; round 3: (l,o) and (o,w) tie at 7, "l o" wins
    assert(out(0) == ((1, "e", "s", 9L)), s"merge 1 was ${out(0)}")
    assert(out(1) == ((2, "es", "t", 9L)), s"merge 2 was ${out(1)}")
    assert(out(2) == ((3, "l", "o", 7L)), s"merge 3 was ${out(2)}")
    // audit row: 16 total word symbols after 3 merges, frequency-weighted:
    // low=5x[l,o? -> after (l,o): lo,w] 2 syms x5; lower: lo,w,e,r 4x2;
    // newest: n,e,w,est 4x6; widest: w,i,d,est 4x3 => 10+8+24+12 = 54
    assert(out(3) == ((4, "<total_symbols>", "", 54L)), s"audit row was ${out(3)}")
  }

  test("fold merge fuses left-to-right without overlap") {
    import spark.implicits._
    val df = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(Bpe.mergeExpr(col("syms"), "a", "a").as("m"))
    // "aaa" with merge (a,a) must become [aa, a] — the pending fused
    // symbol must not fuse again with the next 'a'
    assert(df.collect().head.getSeq[String](0) == Seq("aa", "a"))
  }

  test("corpus training produces the requested merges with positive counts") {
    val out = graft.Registry.byName("q_bpe_train").run(spark, sf()).collect()
    assert(out.length == 7) // 6 merges + audit row
    val merges = out.filter(_.getAs[Int]("merge_rank") <= 6)
    assert(merges.forall(_.getAs[Long]("n") > 0))
    // counts are non-increasing: a later merge can never beat an earlier
    // one (merging only removes pair occurrences of the argmax winner...
    // except pairs CREATED by fusion, which can exceed remaining old
    // counts — so only assert positivity and distinct learned pairs)
    val pairs = merges.map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    assert(pairs.distinct.length == pairs.length)
  }
}
