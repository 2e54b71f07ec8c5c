package graft.queries

import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.functions._

import graft.Q
import graft.core.Tables
import graft.plans.TopKPerKey

/** Registered query for the custom whole-operator plan (§2.9 tier c):
  * per-key top-k via [[graft.plans.TopKPerKey]] — logical node, planner
  * strategy, bounded-heap partial/final physical operators. The oracle is
  * the semantically-identical ROW_NUMBER window form in DuckDB, so the
  * driver gate differentially proves the custom operator against an
  * independent engine's window implementation.
  */
object TopKQueries {

  val queries: Seq[Q] = Seq(
    Q(
      "q_topk_perkey",
      // top-3 customers by account balance per nation, executed by the
      // custom operator (map-side bounded heaps -> key exchange carrying
      // <= k rows per key per mapper -> final merge + rank) instead of
      // Window's full shuffle + per-key sort.
      (s, d) => {
        val child = Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
          .queryExecution.analyzed
        val key = child.output.find(_.name == "c_nationkey").get
        val bal = child.output.find(_.name == "c_acctbal").get
        val cust = child.output.find(_.name == "c_custkey").get
        val order = Seq(SortOrder(bal, Descending), SortOrder(cust, Ascending))
        GraftShim
          .ofRows(s, TopKPerKey(Seq(key), order, 3, TopKPerKey.rankAttribute(), child))
          .orderBy("c_nationkey", "rn")
      },
      Some(
        "SELECT c_custkey, c_nationkey, c_acctbal, rn FROM (" +
          "SELECT c_custkey, c_nationkey, c_acctbal, " +
          "CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey " +
          "ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn FROM customer) " +
          "WHERE rn <= 3 ORDER BY c_nationkey, rn"),
      headline = true
    )
  )
}
