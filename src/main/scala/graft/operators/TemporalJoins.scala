package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.Det._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no native form of, composed Spark-first
  * (the preference order of the build brief: compose existing ops before
  * custom plans).
  *
  *  - AS-OF join: "for each event, the latest right-side row at or before
  *    it, per key". NOT a range join — one union + one window pass:
  *    tag both sides, sort by (key, ts, side), carry the right side's value
  *    forward with last(ignoreNulls). O(n log n) in the shuffle, no pair
  *    explosion, and AQE-friendly. DuckDB's native ASOF JOIN is the oracle.
  *
  *  - RANGE join (event-in-interval): equi-join on a time bucket + residual
  *    predicate. Each interval expands to the buckets it covers (bounded,
  *    here ≤ 2); events hash-join on their bucket — the classic
  *    bucket-and-prune shape that avoids the BroadcastNestedLoopJoin trap
  *    a naive BETWEEN join plans at scale.
  */
object TemporalJoins {

  /** For each event of `leftAll`, attach the latest (ts, value) of the
    * user's `rightType` event at-or-before it. Right side deduped to one
    * row per (user, ts) for determinism. */
  def asofJoin(events: DataFrame, rightType: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // The right row travels as ONE struct: two independent last(ignoreNulls)
    // columns would tear the pair when r_value is NULL (ts from the newest
    // purchase, value skipping back to an older one) — an ASOF join must
    // return the latest right ROW including its null value, like DuckDB's.
    val right = events.filter($"event_type" === rightType)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"ts_us").orderBy($"event_id".desc)))
      .filter($"rn" === 1)
      .select($"user_id", $"ts_us", lit(0).as("side"),
        lit(null).cast("bigint").as("event_id"),
        struct($"ts_us".as("r_ts_us"), $"value".as("r_value")).as("r"))
    val left = events.select($"user_id", $"ts_us", lit(1).as("side"),
      $"event_id",
      lit(null).cast("struct<r_ts_us:bigint,r_value:double>").as("r"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts_us", $"side", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("asof", last($"r", ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"event_id", $"user_id", $"ts_us",
        $"asof.r_ts_us".as("asof_ts_us"), $"asof.r_value".as("asof_value"))
  }

  /** AS-OF join of every event to the user's latest preceding purchase. */
  val qAsofJoin = GraftQuery(
    "q_asof_join",
    (spark, dir) => {
      import spark.implicits._
      asofJoin(Tables.events(spark, dir), "purchase")
        .orderBy($"event_id")
    },
    Some("""
      WITH r AS (
        SELECT user_id, epoch_us(ts) AS r_ts, value AS r_value,
          row_number() OVER (PARTITION BY user_id, epoch_us(ts)
            ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase')
      SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
        r.r_ts AS asof_ts_us, r.r_value AS asof_value
      FROM events l
      ASOF LEFT JOIN (SELECT * FROM r WHERE rn = 1) r
        ON l.user_id = r.user_id AND epoch_us(l.ts) >= r.r_ts
      ORDER BY l.event_id""")
  )

  val NCampaigns = 20

  /** Range join: 20 synthetic campaign intervals laid over [min(ts), max(ts)]
    * (campaign k = [t0 + k·Δ, t0 + k·Δ + Δ/2), Δ = span div 20 — integer
    * arithmetic, exact in both engines); events matched by bucket equi-join
    * + residual BETWEEN, then aggregated per campaign. */
  val qRangeJoin = GraftQuery(
    "q_range_join",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      // bucket width floored at 1: a degenerate time span (single event, or
      // all events within < 2·NCampaigns µs) makes `delta div 2` zero, and
      // under Spark 4's default ANSI mode a zero divisor THROWS where the
      // oracle's plain BETWEEN join just returns empty — the `end > start`
      // guard reproduces that empty result instead
      val bounds = ev.agg(min($"ts_us").as("t0"), max($"ts_us").as("t1"))
        .select($"t0", expr(s"(t1 - t0) div $NCampaigns").as("delta"))
        .withColumn("bw", greatest(expr("delta div 2"), lit(1L)))
      val campaigns = spark.range(NCampaigns).toDF("campaign_id")
        .crossJoin(broadcast(bounds))
        .select($"campaign_id", $"bw",
          ($"t0" + $"campaign_id" * $"delta").as("start"),
          ($"t0" + $"campaign_id" * $"delta" + expr("delta div 2")).as("end"))
        .filter($"end" > $"start")
        .withColumn("bucket",
          explode(sequence(expr("start div bw"), expr("(end - 1) div bw"))))
      val evB = ev.crossJoin(broadcast(bounds))
        .select($"ts_us", $"value", expr("ts_us div bw").as("bucket"))
      evB.join(campaigns, Seq("bucket"))
        .filter($"ts_us" >= $"start" && $"ts_us" < $"end")
        .groupBy($"campaign_id")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .orderBy($"campaign_id")
    },
    Some(s"""
      WITH bounds AS (
        SELECT min(epoch_us(ts)) AS t0,
          (max(epoch_us(ts)) - min(epoch_us(ts))) // $NCampaigns AS delta
        FROM events),
      camp AS (
        SELECT k AS campaign_id, t0 + k * delta AS start,
          t0 + k * delta + delta // 2 AS "end"
        FROM bounds CROSS JOIN (SELECT unnest(range($NCampaigns)) AS k))
      SELECT campaign_id, count(*) AS n_events,
        ${Oracle.dsum("value")} AS sum_value
      FROM events e JOIN camp c
        ON epoch_us(e.ts) >= c.start AND epoch_us(e.ts) < c."end"
      GROUP BY campaign_id
      ORDER BY campaign_id""")
  )

  /** Microseconds per day — the session-interval grain below. */
  private val DayUs = 86400000000L

  /** INTERVAL-OVERLAP join — the third temporal-join shape (AS-OF: latest
    * row at-or-before; RANGE: point-in-interval; here: interval×interval).
    * Per-user daily activity spans `[min ts, max ts + 1)` are matched to
    * the synthetic campaign windows of [[qRangeJoin]]; output per campaign
    * = overlapping-session count + total overlap microseconds.
    *
    * Scale shape — grid bucketing with CANONICAL-CELL attribution: both
    * interval sets explode to the `bw`-wide grid cells they cover and
    * equi-join on the cell, but a pair is emitted ONLY at the cell
    * containing `greatest(s, start)` (the overlap's first instant — always
    * covered by both sides). Every overlapping pair therefore appears
    * EXACTLY once with no `.distinct()` de-duplication shuffle — the trick
    * that makes a large×large interval join one equi-join at 100 TB (here
    * Catalyst broadcasts the 20-campaign side; the logical shape is the
    * one that survives when both sides are big). Overlap arithmetic is
    * all-integer (half-open µs bounds), so the oracle is exact by
    * construction. Zero-width campaigns (degenerate time span) are
    * filtered on BOTH sides — a half-open empty interval overlaps
    * nothing. */
  val qIntervalJoin = GraftQuery(
    "q_interval_join",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val bounds = ev.agg(min($"ts_us").as("t0"), max($"ts_us").as("t1"))
        .select($"t0", expr(s"(t1 - t0) div $NCampaigns").as("delta"))
        .withColumn("bw", greatest(expr("delta div 2"), lit(1L)))
      val campaigns = spark.range(NCampaigns).toDF("campaign_id")
        .crossJoin(broadcast(bounds))
        .select($"campaign_id", $"bw",
          ($"t0" + $"campaign_id" * $"delta").as("start"),
          ($"t0" + $"campaign_id" * $"delta" + expr("delta div 2")).as("end"))
        .filter($"end" > $"start")
        .withColumn("cell",
          explode(sequence(expr("start div bw"), expr("(end - 1) div bw"))))
      val sess = ev
        .groupBy($"user_id", expr(s"ts_us div $DayUs").as("day"))
        .agg(min($"ts_us").as("s"), (max($"ts_us") + lit(1L)).as("e"))
        .crossJoin(broadcast(bounds.select($"bw".as("sbw"))))
        .withColumn("cell",
          explode(sequence(expr("s div sbw"), expr("(e - 1) div sbw"))))
        .drop("sbw")
      sess.join(campaigns, Seq("cell"))
        .filter($"s" < $"end" && $"start" < $"e" &&
          $"cell" === expr("greatest(s, start) div bw"))
        .groupBy($"campaign_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(least($"e", $"end") - greatest($"s", $"start"))
            .as("overlap_us"))
        .orderBy($"campaign_id")
    },
    Some(s"""
      WITH bounds AS (
        SELECT min(epoch_us(ts)) AS t0,
          (max(epoch_us(ts)) - min(epoch_us(ts))) // $NCampaigns AS delta
        FROM events),
      camp AS (
        SELECT k AS campaign_id, t0 + k * delta AS start,
          t0 + k * delta + delta // 2 AS "end"
        FROM bounds CROSS JOIN (SELECT unnest(range($NCampaigns)) AS k)),
      sess AS (
        SELECT user_id, epoch_us(ts) // $DayUs AS day,
          min(epoch_us(ts)) AS s, max(epoch_us(ts)) + 1 AS e
        FROM events GROUP BY 1, 2)
      SELECT campaign_id, count(*) AS n_sessions,
        sum(least(e, "end") - greatest(s, start))::BIGINT AS overlap_us
      FROM sess JOIN camp
        ON s < "end" AND start < e AND "end" > start
      GROUP BY campaign_id
      ORDER BY campaign_id""")
  )

  val all: Seq[GraftQuery] = Seq(qAsofJoin, qRangeJoin, qIntervalJoin)
}
