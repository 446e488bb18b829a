package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine hash-stable numeric helpers.
  *
  * Floating-point SUM is order-dependent, and Spark's partial aggregation
  * order differs run-to-run and from any single-threaded oracle. To make
  * aggregate results bit-identical across Spark and DuckDB we route sums
  * through exact decimal arithmetic: per-row double expressions are
  * deterministic IEEE ops (identical in both engines), the decimal cast of
  * an identical double is identical, and decimal addition is exact and
  * therefore order-independent. The final cast back to double is again
  * deterministic. This costs one decimal conversion per row — negligible
  * next to the scan — and removes the entire class of last-ulp mismatches.
  *
  * At 100 TB the same trick keeps map-side partial aggregation safe: partial
  * sums are exact, so AQE/skew re-planning cannot change results.
  */
object Stable {

  /** Exact sum of a double expression; `scale` decimal digits are kept
    * (values beyond ~1e12 with scale 6 would overflow DecimalType(18+) —
    * Spark widens the accumulator, so the sum itself cannot overflow). */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent average: exact decimal sum divided by the count as a
    * single double division. */
  def davg(c: Column, scale: Int = 6): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") /
      count(c).cast("double"))

  /** SQL fragment equivalents for the DuckDB oracle. */
  def sqlDsum(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE)"

  def sqlDavg(expr: String, scale: Int = 6): String =
    s"(CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE) / CAST(COUNT($expr) AS DOUBLE))"
}
