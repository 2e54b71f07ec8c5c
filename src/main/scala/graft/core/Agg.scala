package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Numeric helpers for cross-engine deterministic aggregation.
  *
  * A plain `sum(double)` is order-dependent (floating-point addition is not
  * associative), so a Spark partial-aggregate tree and a single-threaded
  * oracle can disagree in the last bits. Worse, `CAST(double AS DECIMAL)`
  * itself diverges between engines: Spark converts via the exact binary
  * expansion (BigDecimal) while DuckDB scales in floating point, so values
  * near a rounding boundary can go either way.
  *
  * The portable fixed-point recipe used here does every step in double
  * space with identical IEEE ops in both engines:
  *
  *   1. per row: `round(x * 10000)` — one double multiply + one
  *      half-away-from-zero round (Java HALF_UP on exact midpoints equals
  *      C `std::round` for either sign);
  *   2. exact integer sum (decimal accumulator in Spark, HUGEINT in
  *      DuckDB) — order-independent, no overflow;
  *   3. one final integer→double conversion and one divide by 1e4.
  *
  * Same bits out of both engines, at the cost of quantizing inputs to 4
  * decimals. At scale this is still a partial+final hash aggregate with
  * map-side combine; only the accumulator type changes.
  *
  * Supported value domain: finite doubles with |x| < ~9e14 (so x*10000
  * stays exactly summable; the decimal/HUGEINT accumulators never
  * overflow). NaN/Infinity are outside the contract — the double→long
  * cast throws under ANSI mode (this repo's sessions; non-ANSI folds
  * them to 0 / ±Long.Max) and DuckDB's HUGEINT cast raises; filter them
  * upstream if the data can contain them.
  *
  * The per-row integer is produced as `cast(cast(v AS long) AS decimal)`,
  * not `cast(v AS decimal)`: Spark's double→decimal cast goes through
  * `BigDecimal.valueOf(Double.toString)` — a per-row string allocation
  * that dominated the q_agg_pricing profile (2.4 s → 1.5 s for 4 dsums
  * over 4.8M rows when routed via long) — and, above 2^53, the shortest
  * decimal string can differ from the double's exact binary value, which
  * is what DuckDB's HUGEINT cast takes. The long route is both the fast
  * path (compact-long Decimal, no BigDecimal) and the one that matches
  * the oracle bit-for-bit across the whole supported domain.
  */
object Agg {

  private val Scale = 10000.0

  /** Order-independent, cross-engine-deterministic sum of a double column
    * (quantized to 4 decimals).
    */
  def dsum(c: Column): Column =
    (call_function("graft_sum128", round(c * Scale).cast(LongType))
      .cast(DoubleType) / Scale)

  /** The built-in-only formulation (decimal sum buffer) — bit-identical
    * to [[dsum]]; kept as the cross-check [[graft.functions.Sum128]]'s
    * spec gates against and for sessions without graft extensions.
    */
  def dsumDecimal(c: Column): Column =
    (sum(round(c * Scale).cast(LongType).cast(DecimalType(38, 0))).cast(DoubleType) / Scale)

  /** Deterministic average built from dsum / count (single final division). */
  def davg(c: Column): Column =
    (dsum(c) / count(c)).cast(DoubleType)

  /** DuckDB SQL text of the same expressions, for oracle parity. */
  def dsumSql(expr: String): String =
    s"(CAST(SUM(CAST(ROUND(($expr) * 10000) AS HUGEINT)) AS DOUBLE) / 10000)"
  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / COUNT($expr))"
}
