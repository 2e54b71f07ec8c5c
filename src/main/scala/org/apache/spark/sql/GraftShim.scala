package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access shim for graft's custom logical operators: `Dataset.ofRows` is
  * `private[sql]`, and surfacing a hand-built [[LogicalPlan]] (e.g.
  * [[graft.plans.TopKPerKey]]) as a DataFrame needs it. Placing one
  * forwarding object inside `org.apache.spark.sql` is the standard
  * extension-library pattern (Delta, Iceberg, Sedona all do the same);
  * nothing else from the internal API is re-exported.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
