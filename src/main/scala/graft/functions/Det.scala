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

  /** Exact (order-independent) sum of a double column, rounded to 6 dp.
    * The round happens on the DECIMAL (exact in both engines) before the
    * double cast — no binary half-way hazard. */
  def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(38, Scale))), OutScale).cast(DoubleType)

  /** Cross-engine-exact 6-dp rounding of an arbitrary DOUBLE expression:
    * `floor(x·10⁶ + 0.5) / 10⁶` — the same IEEE ops in Spark and DuckDB, so
    * the result is bit-identical however each engine's `round()` treats
    * half-way cases. (Spark `round()` = HALF_UP on the SHORTEST-DECIMAL repr;
    * DuckDB rounds the binary value — they disagree whenever a structured
    * quotient lands exactly on x.xxxxxx5, e.g. a sentiment sum over 64
    * tokens: 41/640 = 0.0640625 → Spark 0.064063, DuckDB 0.064062. Found by
    * the sf0.1 oracle sweep.) Semantics: round half toward +∞ at 6 dp.
    * The DuckDB twin is [[graft.Oracle.qround]]. */
  def qround(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Exact mean: exact decimal sum cast to double, divided by count, then
    * cross-engine-exact rounding (counts are often 2^a·5^b, which makes the
    * quotient a terminating decimal — exactly the half-way hazard qround
    * exists for). */
  def davg(c: Column): Column =
    qround(sum(c.cast(DecimalType(38, Scale))).cast(DoubleType) / count(lit(1)))

  /** [[dsum]] over the WHOLE relation as an unpartitioned window — the
    * "global total next to each row" shape. Value-identical to
    * `crossJoin(broadcast(df.agg(dsum)))` (same exact decimal sum over the
    * same rows), but stays INSIDE one plan subtree: the separate aggregate
    * job + broadcast materialization barrier that the crossJoin form pays
    * on the critical path collapses into a single in-subtree exchange.
    * ONLY for relations bounded by construction (top-k cuts, model-sized
    * grids) — an unpartitioned window over a corpus-sized relation would
    * funnel it through one task. */
  def dsumAll(c: Column): Column = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    round(sum(c.cast(DecimalType(38, Scale))).over(w), OutScale)
      .cast(DoubleType)
  }
}
