package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-mitigation patterns for heavy-key workloads (the 100 TB reality:
  * `event_type` has a handful of values, so a naive groupBy/join sends
  * whole key populations to single tasks).
  *
  *  - Salted two-phase aggregation: groupBy (key, salt) partial →
  *    groupBy (key) final. The salt only partitions WORK; results are
  *    identical, so the plain group-by oracle still hash-matches.
  *  - Salted join: replicate the dimension `salt` ways, scatter the fact
  *    side uniformly, join on (key, salt) — every task sees 1/salt of each
  *    hot key instead of one task seeing all of it.
  *
  * (AQE's skew-join handling covers sort-merge joins automatically; these
  * explicit forms cover aggregations and the cases AQE cannot split, and
  * stay fully deterministic for the oracle.)
  */
object Skew {

  val SaltBuckets = 16

  /** Deterministic per-row salt — any uniform row hash works; results never
    * depend on it. */
  private def salt(c: org.apache.spark.sql.Column) =
    pmod(hash(c), lit(SaltBuckets))

  /** Two-phase (salted) aggregation over the skewed event_type key. */
  val qSkewSaltedAgg = GraftQuery(
    "q_skew_salted_agg",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("_salt", salt($"event_id"))
        .groupBy($"event_type", $"_salt")
        .agg(count(lit(1)).as("pc"),
          sum($"value".cast(DecimalType(38, 9))).as("ps"))
        .groupBy($"event_type")
        .agg(sum($"pc").as("n_events"),
          round(sum($"ps"), 6).cast(DoubleType).as("sum_value"))
        .orderBy($"event_type")
    },
    Some(s"""
      SELECT event_type, count(*) AS n_events,
        ${Oracle.dsum("value")} AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  )

  /** Generic salted join: fact scattered, dim replicated `SaltBuckets`×. */
  def saltedJoin(fact: DataFrame, saltSrc: String, dim: DataFrame,
                 key: String): DataFrame = {
    val f = fact.withColumn("_salt", salt(col(saltSrc)))
    val d = dim.withColumn("_salt",
      explode(array((0 until SaltBuckets).map(lit): _*)))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  /** Skewed fact⋈dim through the salted join (broadcast deliberately not
    * used — the pattern matters when the dim is too big to broadcast or the
    * join must shuffle anyway). */
  val qSkewSaltedJoin = GraftQuery(
    "q_skew_salted_join",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val dim = ev.select($"event_type").distinct()
        .withColumn("weight", length($"event_type").cast(DoubleType))
      saltedJoin(ev, "event_id", dim.hint("shuffle_hash"), "event_type")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum(($"value" * $"weight").cast(DecimalType(38, 9))), 6)
            .cast(DoubleType).as("weighted_value"))
        .orderBy($"event_type")
    },
    Some(s"""
      SELECT e.event_type, count(*) AS n_events,
        ${Oracle.dsum("e.value * length(e.event_type)")} AS weighted_value
      FROM events e
      JOIN (SELECT DISTINCT event_type FROM events) d
        ON e.event_type = d.event_type
      GROUP BY e.event_type
      ORDER BY e.event_type""")
  )

  val all: Seq[GraftQuery] = Seq(qSkewSaltedAgg, qSkewSaltedJoin)
}
