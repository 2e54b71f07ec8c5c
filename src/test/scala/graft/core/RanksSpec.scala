package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage for the distributed dense-ranking primitive beyond the
  * q_global_index oracle: randomized equivalence against the one-partition
  * window form, permutation totality, and the skewed/empty-partition edges
  * the fixture's uniform md5 keys never exercise.
  */
class RanksSpec extends SparkSpec {

  test("globalRunningSum equals the one-window exclusive prefix on random values") {
    // the q_pack_global core: two-level (in-block window + block-offset
    // window) running sum must be VALUE-identical to the naive single
    // global window, across partition counts and with a blockSize small
    // enough that many blocks exist (exercising the offset pass)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (p <- Seq(1, 4, 32)) {
      val n = 300 + rnd.nextInt(200)
      val df = (0 until n)
        .map(i => (i.toLong, rnd.nextLong(), (rnd.nextInt(1000) + 1).toLong))
        .toDF("id", "key", "v")
      val got = Ranks.globalRunningSum(df, Seq(col("key"), col("id")), col("v"), p, blockSize = 16L)
        .select(col("id"), col("cum_before")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      var acc = 0L
      val want = df.orderBy(col("key"), col("id")).collect().map { r =>
        val out = (r.getLong(0), acc); acc += r.getLong(2); out
      }.toMap
      assert(got == want, s"p=$p n=$n running sum diverged from the one-window form")
    }
  }

  test("globalIndex equals window row_number on random keys, any partition count") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3; p <- Seq(1, 4, 32)) {
      val n = 200 + rnd.nextInt(300)
      val df = (0 until n)
        .map(i => (i.toLong, rnd.nextLong()))
        .toDF("id", "key")
      val got = Ranks.globalIndex(df, Seq(col("key"), col("id")), p)
        .select(col("id"), col("gidx")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = df.orderBy(col("key"), col("id")).collect()
        .map(_.getLong(0)).zipWithIndex
        .map { case (id, i) => (id, i.toLong) }.toMap
      assert(got == want, s"trial=$trial p=$p n=$n diverged")
    }
  }

  test("globalIndex stays dense when a passthrough column is not a sort key") {
    import spark.implicits._
    // The round-16 regression: with lazy plans, column pruning made the
    // offsets branch's range exchange canonically DIFFERENT from the data
    // branch's whenever a passthrough column was absent from sortCols, so
    // the exchange was not reused — and a re-executed repartitionByRange
    // re-samples its boundaries with an RDD-id-seeded generator, skewing
    // offsets against the per-partition sequences (observed at sf0.01:
    // 15 000 rows → 14 675 distinct gidx). The checkpointed core makes
    // this shape safe; this test pins it with a payload column that is
    // prunable from the counting branch.
    val rnd = new scala.util.Random(23)
    val df = (0 until 4000)
      .map(i => (i.toLong, rnd.nextLong(), s"payload_$i"))
      .toDF("id", "key", "payload")
    val got = Ranks.globalIndex(df, Seq(col("key"), col("id")), 32)
    val gidx = got.select(col("gidx")).collect().map(_.getLong(0)).sorted
    assert(gidx.toSeq == (0L until 4000L), "gidx lost density under pruning divergence")
    // and the payload rides along unharmed, matched to the right rank
    val pair = got.orderBy("gidx").select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(pair.forall { case (id, pl) => pl == s"payload_$id" })
  }

  test("globalNtile equals SQL NTILE for uneven and degenerate bucket counts") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(37)
    // (N, buckets): non-divisible, divisible, N < buckets, single bucket
    for ((n, b) <- Seq((1003, 7), (1000, 5), (3, 8), (64, 1))) {
      val df = (0 until n).map(i => (i.toLong, rnd.nextLong())).toDF("id", "key")
      val got = Ranks.globalNtile(df, Seq(col("key"), col("id")), b, 16)
        .select(col("id"), col("__ntile")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = df
        .withColumn("t", ntile(b).over(Window.orderBy(col("key"), col("id"))).cast("long"))
        .select(col("id"), col("t")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"ntile diverged at n=$n buckets=$b")
    }
  }

  test("globalIndex is a dense 0..N-1 permutation under heavy key skew") {
    import spark.implicits._
    // one dominant key value forces one fat range partition (+ ties broken
    // by id), and P far above the distinct-key count forces empty
    // partitions — both must still produce a dense permutation
    val df = (0 until 500).map(i => (i.toLong, if (i % 10 == 0) 7L else i.toLong)).toDF("id", "key")
    val gidx = Ranks.globalIndex(df, Seq(col("key"), col("id")), 32)
      .select(col("gidx")).collect().map(_.getLong(0)).sorted
    assert(gidx.toSeq == (0L until 500L), "not a dense permutation")
  }
}
