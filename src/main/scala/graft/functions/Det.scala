package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic-aggregation helpers.
  *
  * Floating-point SUM/AVG are order-dependent, so a Spark result and a DuckDB
  * oracle result can disagree in the last ulps depending on partitioning. The
  * fix used across the whole verified query surface: cast each addend to a
  * wide decimal *before* aggregating. Decimal addition is exact and therefore
  * order-independent, so both engines produce bit-identical results; the final
  * value is rounded and cast back to double for a stable output schema.
  *
  * The DuckDB twin of `dsum(c)` is
  *   `round(sum(CAST(c AS DECIMAL(38,9))), 6)::DOUBLE`
  * (see graft.Oracle for the SQL-side generators).
  */
object Det {
  val Scale = 9      // decimal scale used for addends
  val OutScale = 6   // rounding of emitted doubles

  /** Exact (order-independent) sum of a double column, rounded to 6 dp. */
  def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(38, Scale))), OutScale).cast(DoubleType)

  /** Exact mean: exact decimal sum cast to double, divided by count, rounded.
    * Both engines perform the identical IEEE double division, so the result
    * matches bit-for-bit (up to the documented half-way rounding caveat).
    */
  def davg(c: Column): Column =
    round(sum(c.cast(DecimalType(38, Scale))).cast(DoubleType) / count(lit(1)), OutScale)

  /** Round an already-deterministic double expression for output. */
  def dround(c: Column): Column = round(c, OutScale)
}
