package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Agg

/** Contract gates for graft_sum128 (the int128-buffer fixed-point sum
  * behind [[graft.core.Agg.dsum]]) against the decimal-accumulator form
  * it replaced. Equality is exact — same integer in, same Decimal(38,0)
  * out — so every assert is a hard differential.
  */
class Sum128Spec extends SparkSpec {

  import org.apache.spark.sql.Column

  private def s128(c: Column) = call_function("graft_sum128", c)
  private def sdec(c: Column) = sum(c.cast("decimal(38,0)"))

  /** The decimal-sum CONTROLS here must stay Spark's decimal-buffer sum:
    * with [[graft.engine.Sum128Rewrite]] default-ON, `sdec`/`dsumDecimal`
    * would silently plan as Sum128 too and every differential below
    * would compare Sum128 with itself. Each test pins the rewrite off.
    */
  private def noRewrite[T](f: => T): T = {
    spark.conf.set(graft.engine.Sum128Rewrite.Flag, "false")
    try f finally spark.conf.unset(graft.engine.Sum128Rewrite.Flag)
  }

  test("dsum via sum128 is bit-identical to the decimal-accumulator dsum on real data") { noRewrite {
    val li = graft.core.Tables(spark, sf(), "lineitem")
    val diffs = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Agg.dsum(col("l_quantity")).as("a"),
        Agg.dsumDecimal(col("l_quantity")).as("ad"),
        Agg.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("b"),
        Agg.dsumDecimal(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("bd"),
        Agg.davg(col("l_quantity")).as("c"),
        (Agg.dsumDecimal(col("l_quantity")) / count(col("l_quantity"))).cast("double").as("cd"))
      .filter(col("a") =!= col("ad") || col("b") =!= col("bd") || col("c") =!= col("cd"))
      .count()
    assert(diffs == 0L)
  } }

  test("totals crossing 2^63 stay exact (the overflow band a long sum cannot enter)") { noRewrite {
    import spark.implicits._
    // 400 × (Long.Max / 100): total = 4 × Long.Max = 2^65 - 4, far past
    // any 64-bit accumulator; both accumulators must agree exactly and
    // match the closed form.
    val big = Long.MaxValue / 100
    val df = (1 to 400).map(_ => big).toDF("x").repartition(7)
    val r = df.agg(
      s128(col("x")).as("k"),
      sdec(col("x")).as("d")).head()
    val expect = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(big).multiply(java.math.BigInteger.valueOf(400)))
    assert(r.getDecimal(0).compareTo(expect) == 0)
    assert(r.getDecimal(1).compareTo(expect) == 0)

    // alternating-sign partials: per-partition lo-limb wraps both ways
    val mixed = ((1 to 300).map(_ => big) ++ (1 to 100).map(_ => -big)).toDF("x").repartition(13)
    val m = mixed.agg(s128(col("x")).as("k"), sdec(col("x")).as("d")).head()
    assert(m.getDecimal(0) == m.getDecimal(1))
  } }

  test("negative totals, nulls skipped, empty and all-null groups are null") { noRewrite {
    import spark.implicits._
    val df = Seq(
      ("a", Some(-5L)), ("a", Some(-7L)), ("a", None),
      ("b", None), ("b", None)).toDF("k", "x")
    val rows = df.groupBy(col("k"))
      .agg(s128(col("x")).as("s"), sdec(col("x")).as("d"))
      .orderBy("k").collect()
    assert(rows(0).getDecimal(1).longValueExact == -12L)
    assert(rows(0).getDecimal(1) == rows(0).getDecimal(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    val empty = spark.emptyDataFrame.select(lit(1L).as("x")).agg(s128(col("x"))).head()
    assert(empty.isNullAt(0))
  } }

  test("random long inputs across many partitions agree with the decimal sum exactly") { noRewrite {
    import spark.implicits._
    // deterministic pseudo-random longs spanning the full range via
    // xxhash64 — includes Long.MinValue-adjacent magnitudes
    val df = (1L to 20000L).toDF("i")
      .select((xxhash64(col("i")) * when(col("i") % 3 === 0, -1).otherwise(1)).as("x"),
        (col("i") % 17).as("k"))
      .repartition(11)
    val diffs = df.groupBy("k")
      .agg(s128(col("x")).as("s"), sdec(col("x")).as("d"))
      .filter(col("s") =!= col("d")).count()
    assert(diffs == 0L)
  } }
}
