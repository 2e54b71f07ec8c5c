package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Semantic checks for the round-3 nested-type / sampling / moments
  * queries (cross-engine parity is covered by the differential gate; these
  * pin the math against Spark's own built-ins and the sampling contract).
  */
class StructuredSpec extends SparkSpec {

  test("q_stats_moments matches Spark's built-in stddev/corr within float tolerance") {
    val ours = graft.Registry.byName("q_stats_moments").run(spark, sf())
      .select("l_returnflag", "stddev_qty", "corr_qp")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val builtin = Tables(spark, sf(), "lineitem")
      .groupBy("l_returnflag")
      .agg(
        stddev_samp(col("l_quantity")).as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(ours.keySet == builtin.keySet)
    ours.foreach { case (k, (sd, c)) =>
      // 1e-4 quantization + float-order wobble: generous but meaningful bound
      assert(math.abs(sd - builtin(k)._1) < 1e-3, s"stddev($k): $sd vs ${builtin(k)._1}")
      assert(math.abs(c - builtin(k)._2) < 1e-3, s"corr($k): $c vs ${builtin(k)._2}")
    }
  }

  test("q_sample_hash is a stable subset: rerun identical, rate near 8%") {
    val q = graft.Registry.byName("q_sample_hash")
    val a = q.run(spark, sf()).collect().map(_.getLong(0)).toSeq
    val b = q.run(spark, sf()).collect().map(_.getLong(0)).toSeq
    assert(a == b)
    val total = Tables(spark, sf(), "orders").count()
    val rate = a.size.toDouble / total
    assert(rate > 0.04 && rate < 0.12, s"rate $rate")
  }

  test("q_map_ops missing-key probe yields null, present keys round-trip") {
    val row = graft.Registry.byName("q_map_ops").run(spark, sf()).limit(1).collect().head
    assert(row.isNullAt(row.fieldIndex("missing")))
    assert(row.getString(row.fieldIndex("m_keys")) == "qty,disc")
  }
}
