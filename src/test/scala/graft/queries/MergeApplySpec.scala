package graft.queries

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** q_merge_apply: every CDC interaction class resolves per MERGE
  * last-write-wins semantics. The oracle differential proves Spark ≡
  * DuckDB; this spec pins the SEMANTICS against independently-derived
  * expectations from the base table.
  */
class MergeApplySpec extends SparkSpec {

  private def fixture() = {
    val dir = sf()
    val merged = Registry.byName("q_merge_apply").run(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("price")).toMap
    val orders = graft.core.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Double]("o_totalprice")).toMap
    (merged, orders)
  }

  test("merge apply: each op-interaction class lands in its MERGE-resolved state") {
    val (merged, orders) = fixture()
    var classes = Map("del" -> 0, "reinsert" -> 0, "u2" -> 0, "u1" -> 0, "untouched" -> 0)
    orders.foreach { case (k, price) =>
      if (k % 7 != 0 && k % 5 == 0) {
        // latest op is D (seq 3) regardless of earlier updates → deleted
        assert(!merged.contains(k), s"key $k should be deleted")
        classes += "del" -> (classes("del") + 1)
      } else if (k % 7 == 0) {
        // I (seq 4) is always last for target-absent keys → present at
        // the original price, even after a D at seq 3 (k % 35 == 0)
        assert(merged.get(k).contains(price), s"key $k should be re/inserted at $price")
        classes += "reinsert" -> (classes("reinsert") + 1)
      } else if (k % 9 == 0) {
        assert(merged.get(k).contains(price + 2.0), s"key $k: second update must win")
        classes += "u2" -> (classes("u2") + 1)
      } else if (k % 3 == 0) {
        assert(merged.get(k).contains(price + 1.0), s"key $k: single update")
        classes += "u1" -> (classes("u1") + 1)
      } else {
        assert(merged.get(k).contains(price), s"key $k: untouched row changed")
        classes += "untouched" -> (classes("untouched") + 1)
      }
    }
    // the fixture must actually exercise every class
    classes.foreach { case (c, n) => assert(n > 0, s"interaction class $c unexercised") }
  }

  test("merge apply: no keys invented, row count = target - deletes + inserts") {
    val (merged, orders) = fixture()
    assert(merged.keySet.subsetOf(orders.keySet))
    val expected = orders.keys.count(k =>
      (k % 7 != 0 && k % 5 != 0) || k % 7 == 0)
    assert(merged.size == expected, s"got ${merged.size}, want $expected")
  }
}
