package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the verified surface.
  *
  * @param name   stable key (appears in CORRECTNESS/BENCH json)
  * @param run    (spark, sfDir) => result DataFrame. Must be deterministic:
  *               total ORDER BY, no raw float aggregation (use Det helpers).
  * @param oracle DuckDB SQL over the same tables producing the identical
  *               result (same column names/types). None => the driver records
  *               a weaker rows-only check (used for approx/hash-seeded ops).
  * @param bench  include in the headline Bench.scala timing set.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true
)
