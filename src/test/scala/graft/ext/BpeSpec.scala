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

  test("encode matches hand-computed token counts on the Sennrich fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower"),   // low -> [lo,w] 2; lower -> [lo,w,e,r] 4
      (2L, "newest widest") // newest -> [n,e,w,est] 4; widest -> [w,i,d,est] 4
    ).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "text", Seq(("e", "s"), ("es", "t"), ("l", "o")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 6L), (2L, 2L, 8L)))
  }

  test("corpus encode token total equals the trainer's symbol audit") {
    // the trainer's <total_symbols> row is the frequency-weighted symbol
    // count over the deduped vocab; encoding the same corpus with the
    // same merges must land on exactly that many tokens
    val docs = graft.core.Tables(spark, sf(), "documents")
    val trained = Bpe.train(spark, docs, "text", merges = 4).collect()
    val audit = trained.find(_.getAs[String]("left") == "<total_symbols>").get.getAs[Long]("n")
    val merges = trained.filter(_.getAs[String]("left") != "<total_symbols>")
      .sortBy(_.getAs[Int]("merge_rank"))
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    val total = Bpe.encode(docs, "text", merges)
      .agg(sum(col("n_tokens"))).collect().head.getLong(0)
    assert(total == audit, s"encode total $total != trainer audit $audit")
  }

  test("corpus training produces the requested merges with positive counts") {
    // q_bpe_train now runs the Sennrich fixture for the driver gate, so
    // corpus-scale training is exercised directly here
    val out = Bpe.train(spark, graft.core.Tables(spark, sf(), "documents"), "text", merges = 6)
      .collect()
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
