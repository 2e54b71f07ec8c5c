package graft.engine

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Gates for [[Sum128Rewrite]] — the optimizer rule that swaps Spark's
  * Decimal(38,0) sum buffer for the int128 primitive accumulator when
  * DELEGATED SQL text spells the fixed-point recipe
  * `SUM(CAST(<integral> AS DECIMAL(38,0)))`. The rule must (a) fire on
  * the aggregate and window shapes, (b) change no value — Sum128Spec
  * proves the accumulators bit-equal, so here a flag-on/flag-off
  * differential suffices — and (c) leave every out-of-scope sum alone.
  */
class Sum128RewriteSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def withFlag[T](on: Boolean)(f: => T): T = {
    spark.conf.set(Sum128Rewrite.Flag, on.toString)
    try f finally spark.conf.unset(Sum128Rewrite.Flag)
  }

  /** Parquet-backed fixture: a purely local relation would be folded by
    * ConvertToLocalRelation (the window test's extraction Project
    * collapses into the LocalTableScan before the rule can see it),
    * which is not the shape real scans produce.
    */
  private lazy val fixturePath: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("s128r").toString
    (1L to 5000L).map { i =>
      val x = i * 1000003L % 2000000L - 1000000L
      (i % 7, x, i.toInt, i * 0.5, if (i % 3 == 0) None else Some(x))
    }.toDF("k", "x", "xi", "d", "xn")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def fixture(): Unit =
    spark.read.parquet(fixturePath).createOrReplaceTempView("s128r")

  test("delegated SQL aggregate shape rewrites to graft_sum128 and agrees with the flag off") {
    fixture()
    val q = "SELECT k, SUM(CAST(x AS DECIMAL(38,0))) AS s FROM s128r GROUP BY k ORDER BY k"
    val on = spark.sql(q)
    assert(planOf(on).contains("graft_sum128"),
      s"default-on rewrite did not fire on the aggregate shape:\n${planOf(on).take(1200)}")
    val onRows = on.collect().map(r => (r.getLong(0), r.getDecimal(1)))
    val offRows = withFlag(false) {
      val off = spark.sql(q)
      assert(!planOf(off).contains("graft_sum128"), "rewrite fired with the flag off")
      off.collect().map(r => (r.getLong(0), r.getDecimal(1)))
    }
    assert(onRows.toSeq == offRows.toSeq)
  }

  test("window-frame shape rewrites too (WindowExec takes declarative aggregates)") {
    fixture()
    val q = "SELECT k, x, SUM(CAST(x AS DECIMAL(38,0))) OVER " +
      "(PARTITION BY k ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs " +
      "FROM s128r ORDER BY k, x"
    val on = spark.sql(q)
    assert(planOf(on).contains("graft_sum128"),
      s"rewrite did not fire on the window shape:\n${planOf(on).take(1200)}")
    val onRows = on.collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
    val offRows = withFlag(false)(spark.sql(q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))))
    assert(onRows.toSeq == offRows.toSeq)
  }

  test("int input widens through an exact long cast and still rewrites") {
    fixture()
    val on = spark.sql("SELECT SUM(CAST(xi AS DECIMAL(38,0))) AS s FROM s128r")
    assert(planOf(on).contains("graft_sum128"))
    assert(on.head().getDecimal(0).longValueExact == (1L to 5000L).sum)
  }

  test("AVG aggregate shape rewrites: sum slot becomes graft_sum128, values bit-equal") {
    fixture()
    // Bit-identity is by construction — the rewrite substitutes Sum128 /
    // Count into Spark's OWN Average.evaluateExpression, so whatever
    // decimal division/rounding tree this Spark builds is reused
    // verbatim. The differential still gates it end-to-end, on a domain
    // with non-exact quotients (rounding exercised), a 2^63-crossing
    // group sum (x*10^12 ≈ ±1e18 per row, 5000/7 rows per group), and
    // per-row NULLs via the nullable xn column (Average's count slot
    // must keep its non-null semantics through the Count substitution;
    // a CASE-produced null would not exercise scope — the optimizer
    // pushes the cast into the CASE branches, which is out of the
    // spelled-shape domain).
    val q = "SELECT k, " +
      "AVG(CAST(x AS DECIMAL(38,0))) AS a, " +
      "AVG(CAST(x * 1000000000000 AS DECIMAL(38,0))) AS abig, " +
      "AVG(CAST(xn AS DECIMAL(38,0))) AS anull " +
      "FROM s128r GROUP BY k ORDER BY k"
    val on = spark.sql(q)
    val p = planOf(on)
    assert(p.contains("graft_sum128"),
      s"default-on rewrite did not fire on the AVG shape:\n${p.take(1200)}")
    assert(!p.toLowerCase.contains("avg("),
      s"an Average survived in the rewritten plan:\n${p.take(1200)}")
    val onRows = on.collect()
      .map(r => (r.getLong(0), r.getDecimal(1), r.getDecimal(2), r.getDecimal(3)))
    val offRows = withFlag(false) {
      val off = spark.sql(q)
      assert(!planOf(off).contains("graft_sum128"), "rewrite fired with the flag off")
      off.collect().map(r => (r.getLong(0), r.getDecimal(1), r.getDecimal(2), r.getDecimal(3)))
    }
    // java.math.BigDecimal equality is value AND scale — decimal(38,4)
    // must round-trip exactly, not approximately
    assert(onRows.toSeq == offRows.toSeq)
  }

  test("AVG of an empty/all-null group returns NULL through the rewrite") {
    fixture()
    val q = "SELECT AVG(CAST(xn AS DECIMAL(38,0))) AS a FROM s128r WHERE xn IS NULL"
    val on = spark.sql(q)
    assert(planOf(on).contains("graft_sum128"))
    assert(on.head().isNullAt(0), "all-null AVG must be NULL")
    withFlag(false)(assert(spark.sql(q).head().isNullAt(0)))
  }

  test("scope guards: DISTINCT, fractional casts, and plain decimal sums keep Spark's sum") {
    fixture()
    for (q <- Seq(
        // DISTINCT aggregation plans its function specially — out of scope
        "SELECT SUM(DISTINCT CAST(x AS DECIMAL(38,0))) FROM s128r",
        // double→decimal(38,0) cast TRUNCATES toward zero — not the exact
        // integral domain; Sum128 over a long cast would round differently
        "SELECT SUM(CAST(d AS DECIMAL(38,0))) FROM s128r",
        // decimal of any other precision is not the fixed-point recipe
        "SELECT SUM(CAST(x AS DECIMAL(20,0))) FROM s128r",
        // same guards for the AVG shape
        "SELECT AVG(DISTINCT CAST(x AS DECIMAL(38,0))) FROM s128r",
        "SELECT AVG(CAST(d AS DECIMAL(38,0))) FROM s128r",
        "SELECT AVG(CAST(x AS DECIMAL(20,0))) FROM s128r",
        // a plain integral AVG is not the decimal fixed-point spelling
        "SELECT AVG(x) FROM s128r")) {
      assert(!planOf(spark.sql(q)).contains("graft_sum128"),
        s"rewrite overreached on out-of-scope shape: $q")
    }
  }
}
