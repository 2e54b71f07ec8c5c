package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark implementation plus (where the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query used by
  * the driver's differential-correctness gate. `headline = true` marks the
  * queries timed by [[graft.Bench]].
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
