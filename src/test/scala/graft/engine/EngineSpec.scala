package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Agg, Tables}

/** Delegated-SQL runner, salted aggregation equivalence, and bucketed
  * co-located joins (shuffle elimination asserted in the plan).
  */
class EngineSpec extends SparkSpec {

  test("QueryRunner executes arbitrary SQL over the corpus views") {
    val df = QueryRunner.run(spark, sf(),
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > 25")
    assert(df.collect().head.getLong(0) > 0)
  }

  test("salted aggregation equals direct aggregation (skew mitigation)") {
    val li = Tables(spark, sf(), "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(Agg.dsum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    val salted = Skew.saltedAgg(
      li,
      keys = Seq("l_returnflag"),
      saltBuckets = 8,
      partials = Seq(Agg.dsum(col("l_quantity")).as("ps"), count(lit(1)).as("pn")),
      merges = Seq(
        Agg.dsum(col("ps")).as("s"),
        sum(col("pn")).as("n")))
      .orderBy("l_returnflag").collect().toSeq
    assert(salted == direct)
  }

  test("AQE skew-join split fires on a hot key and preserves results") {
    import spark.implicits._
    // one hot key (0) carrying ~90% of rows, plus a uniform tail
    val skewed = spark.range(0, 60000)
      .select((when(col("id") % 10 =!= 0, col("id") % 1000).otherwise(0L)).as("k"),
        col("id").as("payload"))
    val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // shrink thresholds so the hot partition qualifies at test scale;
      // disable broadcast so a shuffle join (the skew-handled kind) plans
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // execute THIS df (count() would plan a separate query execution,
      // leaving joined's adaptive plan unfinalized)
      val joined = skewed.join(dim, Seq("k"))
      assert(joined.collect().length == 60000)
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("skew=true"), s"skew-join handling did not fire:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("approx_percentile within 2% of the exact percentile") {
    val li = Tables(spark, sf(), "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.95)").as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("p95"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("p95")).toMap
    approx.foreach { case (k, a) =>
      val relErr = math.abs(a - exact(k)) / exact(k)
      assert(relErr <= 0.02, s"flag $k: approx p95 $a vs exact ${exact(k)} (err $relErr)")
    }
    // the registered gate form must hold its rank contract on every group
    val gate = graft.Registry.byName("q_approx_percentile").run(spark, sf()).collect()
    assert(gate.nonEmpty)
    gate.foreach { r =>
      assert(r.getAs[Boolean]("p50_rank_ok") && r.getAs[Boolean]("p95_rank_ok") &&
        r.getAs[Boolean]("p99_rank_ok"), s"rank contract broken: $r")
    }
  }

  test("approx_count_distinct (HLL++, rsd=0.01) within 5% of exact") {
    val orders = Tables(spark, sf(), "orders")
    val exact = orders.select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    val approx = orders.select(approx_count_distinct(col("o_custkey"), 0.01)).collect().head.getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.05, s"HLL relative error $relErr (approx $approx vs exact $exact)")
  }

  test("dynamic partition pruning fires on a partitioned warehouse join") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("dpp").toString + "/events_by_day"
    // partitioned fact: events bucketed into day partitions
    graft.queries.Events.events(spark, sf())
      .withColumn("day", col("ts").cast("date"))
      .write.mode("overwrite").partitionBy("day").parquet(wh)
    val fact = spark.read.parquet(wh)
    // dim as a FILE source with a selective filter (DPP requires a
    // filterable scan on the pruning side, not a local relation)
    val dimPath = java.nio.file.Files.createTempDirectory("dppdim").toString + "/days"
    fact.select(col("day")).distinct()
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("day"))))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("idx") <= 2).select(col("day").as("d"))
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    val joined = fact.join(dim, fact("day") === dim("d"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the scan:\n${plan.take(1200)}")
    assert(joined.collect().map(_.getLong(1)).sum > 0)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val o = Tables(spark, sf(), "orders")
    val l = Tables(spark, sf(), "lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")
    // disable auto-broadcast so the join would otherwise need a shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed join inputs need no Exchange: the ONLY shuffle in the
      // whole plan is the final aggregate's (unbucketed would have 3)
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"expected at most 1 Exchange (agg), got $exchanges:\n${plan.take(1500)}")
      // correctness unchanged vs unbucketed
      val expect = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus").collect().toSeq
      assert(joined.orderBy("o_orderstatus").collect().toSeq == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("runtime bloom filter injects on a selective shuffle join") {
    // Row-level sibling of DPP: when the selective filter sits on the
    // build side of a SHUFFLE join over unpartitioned data, Catalyst can
    // inject a bloom-filter semi-filter on the probe side so most rows
    // die before the exchange. Thresholds are production-scale by
    // default; shrink them so the optimization fires at test size — the
    // assertion is the mechanism, the sizing argument lives at 100 TB.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val l = Tables(spark, sf(), "lineitem")
      val p = Tables(spark, sf(), "part").filter(col("p_partkey") % 100 === 0)
      val joined = l.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter in the optimized plan:\n${optimized.take(1500)}")
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("approx-distinct rewrite swaps COUNT(DISTINCT) for HLL++ only under the flag") {
    val li = Tables(spark, sf(), "lineitem")
    def q = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"))
    val exact = q.orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1)))
    // flag off: plan keeps the exact distinct aggregate
    assert(!q.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
    spark.conf.set(ApproxDistinctRewrite.Flag, "true")
    try {
      val rewritten = q
      val plan = rewritten.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"rewrite did not fire under the flag:\n${plan.take(1500)}")
      // schema unchanged (long, same name); estimates within HLL's 5% rsd
      // envelope (generous 3x margin so the test never flakes)
      val approx = rewritten.orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(approx.map(_._1).toSeq == exact.map(_._1).toSeq)
      exact.zip(approx).foreach { case ((_, e), (_, a)) =>
        assert(math.abs(a - e).toDouble / e <= 0.15, s"estimate $a vs exact $e")
      }
      // multi-arg distinct counts must NOT rewrite (exact semantics kept)
      val multi = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey"), col("l_suppkey")).as("d"))
      assert(!multi.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
    } finally spark.conf.unset(ApproxDistinctRewrite.Flag)
  }

  test("graft_bloom_agg / graft_might_contain: no false negatives, bounded false positives") {
    // The user-facing form of the runtime-filter machinery above: build a
    // bloom over one relation's keys, probe from another as a plain
    // boolean expression. Membership must be a SUPERSET of the true set
    // (bloom filters never false-negative) and the false-positive rate
    // on known non-members must stay near the sizing target (10 bits per
    // item ~ 1%; assert <= 5% so the test never flakes).
    import spark.implicits._
    val members = (0L until 1000L).map(i => s"m_$i").toDF("k")
    val bf = members
      .agg(expr("graft_bloom_agg(xxhash64(k), 1000L, 10000L)").as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probeHit = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(call_function("graft_might_contain", lit(bf), xxhash64(col("k")))).count()
    assert(probeHit(members) == 1000L, "bloom filter false-negatived a member")
    val nonMembers = (0L until 10000L).map(i => s"x_$i").toDF("k")
    val fp = probeHit(nonMembers)
    assert(fp <= 500L, s"false-positive rate too high: $fp / 10000")
  }
}
