package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage for the distributed dense-ranking primitive beyond the
  * q_global_index oracle: randomized equivalence against the one-partition
  * window form, permutation totality, and the skewed/empty-partition edges
  * the fixture's uniform md5 keys never exercise.
  */
class RanksSpec extends SparkSpec {

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
