package graft

/** DuckDB-side twins of the deterministic aggregation helpers in
  * [[graft.functions.Det]]. Oracle SQL must produce bit-identical values to
  * the Spark plan; see Det's scaladoc for why decimal-cast-before-sum makes
  * float aggregation order-independent.
  */
object Oracle {
  /** Twin of Det.dsum. */
  def dsum(c: String): String =
    s"round(sum(CAST(($c) AS DECIMAL(38,9))), 6)::DOUBLE"

  /** Twin of Det.qround: cross-engine-exact 6-dp rounding of a double
    * expression (identical IEEE ops in both engines — see Det.qround). */
  def qround(e: String): String =
    s"floor(($e) * 1000000.0 + 0.5) / 1000000.0"

  /** Twin of Det.davg (divides by count(*) — use on non-null columns only). */
  def davg(c: String): String =
    qround(s"(sum(CAST(($c) AS DECIMAL(38,9)))::DOUBLE) / count(*)")
}
