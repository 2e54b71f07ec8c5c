package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric helpers for cross-engine deterministic aggregation.
  *
  * A plain `sum(double)` is order-dependent (floating-point addition is not
  * associative), so a Spark partial-aggregate tree and a single-threaded
  * oracle can disagree in the last bits — enough to flip a rounded digit.
  * Casting each row to DECIMAL first makes the cast the only rounding step
  * (deterministic per row: same double → same decimal in any engine), and
  * the decimal sum is exact and order-independent. Casting the final sum
  * back to double is again a single deterministic rounding. The same
  * pattern in the DuckDB oracle yields bit-identical doubles.
  *
  * At scale this costs nothing extra: decimal sum is still a partial+final
  * hash aggregate with map-side combine; only the accumulator type changes.
  */
object Agg {

  /** Exact, order-independent sum of a double column: per-row cast to
    * DECIMAL(28,4), exact decimal sum, single cast back to double.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast(DoubleType)

  /** Deterministic average built from dsum / count (single final division). */
  def davg(c: Column): Column = (dsum(c) / count(c)).cast(DoubleType)

  /** SQL (DuckDB) text of the same expressions, for oracle parity. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,4))) AS DOUBLE)"
  def davgSql(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(28,4))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"
}
