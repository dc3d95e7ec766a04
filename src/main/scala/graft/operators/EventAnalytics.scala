package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.Det
import graft.functions.Det._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The dashboard analytics of the reference (SURVEY.md §2.5-2.7, §3.4) as
  * Spark queries over the `events` stream table: union, dedup-keep-last,
  * trailing time-window filter, rolling mean ± 2σ bands, group-sums, top-k,
  * latest-row metrics, plus JSON prop extraction (F8 family).
  *
  * Timestamps: Tables.events adapts to the physical type the driver shipped
  * (INT64 nanos in early rounds, timestamp[us] since the round-7 regen) and
  * always exposes exact epoch-microsecond bigints (`ts_us`); all arithmetic
  * happens on `ts_us` so Spark and the DuckDB oracle (epoch_us) agree
  * bit-for-bit regardless of the file's shape — see Tables.events.
  */
object EventAnalytics {

  private val SixHoursUs = 6L * 3600 * 1000000
  private val DayUs = 24L * 3600 * 1000000

  /** A2 analog: global time range + row count of the batch/table. */
  val qEventTimerange = GraftQuery(
    "q_event_timerange",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .agg(min($"ts_us").as("min_ts_us"), max($"ts_us").as("max_ts_us"),
          count(lit(1)).as("n_events"))
    },
    Some("""
      SELECT min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
        count(*) AS n_events
      FROM events""")
  )

  /** W3: dedup keep-last — latest event per user (ties: event_id desc). */
  val qDedupKeepLast = GraftQuery(
    "q_dedup_keep_last",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id").orderBy($"ts_us".desc, $"event_id".desc)))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"ts_us", $"event_type", $"value")
        .orderBy($"user_id")
    },
    Some("""
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
      FROM (SELECT *, row_number() OVER (
              PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id""")
  )

  /** P7: trailing 6h window relative to max(ts) — the dashboard's 1h/6h/24h
    * cutoff filter — then per-type activity. */
  val qWindowFilter6h = GraftQuery(
    "q_window_filter_6h",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val cutoff = ev.agg((max($"ts_us") - lit(SixHoursUs)).as("cutoff"))
      ev.crossJoin(broadcast(cutoff))
        .filter($"ts_us" >= $"cutoff")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .orderBy($"event_type")
    },
    Some(s"""
      SELECT event_type, count(*) AS n_events,
        ${Oracle.dsum("value")} AS sum_value
      FROM events
      WHERE epoch_us(ts) >= (SELECT max(epoch_us(ts)) FROM events) - ${SixHoursUs}
      GROUP BY event_type
      ORDER BY event_type""")
  )

  /** The 6h-bucket mean-value series that feeds the rolling-stat queries —
    * the analog of the reference's per-batch metric snapshots. */
  private def metricSeries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(expr(s"ts_us div $SixHoursUs").as("bucket"))
      .agg(count(lit(1)).as("n_events"), davg($"value").as("avg_value"))
  }

  private val metricSeriesSql = s"""
    SELECT epoch_us(ts) // ${SixHoursUs} AS bucket,
      count(*) AS n_events, ${Oracle.davg("value")} AS avg_value
    FROM events GROUP BY 1"""

  /** W1+W2: pandas-rolling(5)-equivalent mean and ±2σ band over the metric
    * series: null for the first 4 rows (min_periods=window), sample stddev
    * (ddof=1). The stddev is computed from exact decimal window sums via
    * sqrt((s2 - s1²/n)/(n-1)) so both engines do identical double math.
    *
    * The empty-partition-spec window (Spark warns "No Partition Defined")
    * is deliberate and bounded: it runs over the 6h-bucket AGGREGATE
    * series, whose row count is time-range/6h (1,460/year) regardless of
    * corpus size — not over fact rows. For a corpus-sized global ordering
    * see qAssignIds' two-phase shape (PipelineOps). */
  val qRollingMetric = GraftQuery(
    "q_rolling_metric",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.orderBy($"bucket")
      val frame = w.rowsBetween(-4, Window.currentRow)
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, Det.Scale))
      val series = metricSeries(spark, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("s1", sum(dec($"avg_value")).over(frame).cast(DoubleType))
        .withColumn("s2", sum(dec($"avg_value" * $"avg_value")).over(frame).cast(DoubleType))
      // one copy of the mean/deviation formulas; qround wraps each EMITTED
      // band whole, so the doubles are bit-identical to the inlined form
      val mean = $"s1" / lit(5.0)
      val sd0 = sqrt(greatest(($"s2" - $"s1" * $"s1" / lit(5.0)) / lit(4.0), lit(0.0)))
      def band(c: org.apache.spark.sql.Column) = when($"rn" >= 5, Det.qround(c))
      series
        .select($"bucket", $"n_events", $"avg_value",
          band(mean).as("ma5"), band(sd0).as("sd5"),
          band(mean + lit(2.0) * sd0).as("upper"),
          band(mean - lit(2.0) * sd0).as("lower"))
        .orderBy($"bucket")
    },
    Some(s"""
      WITH series AS ($metricSeriesSql),
      win AS (
        SELECT bucket, n_events, avg_value,
          row_number() OVER (ORDER BY bucket) AS rn,
          sum(CAST(avg_value AS DECIMAL(38,9))) OVER
            (ORDER BY bucket ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)::DOUBLE AS s1,
          sum(CAST(avg_value * avg_value AS DECIMAL(38,9))) OVER
            (ORDER BY bucket ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)::DOUBLE AS s2
        FROM series)
      SELECT bucket, n_events, avg_value,
        CASE WHEN rn >= 5 THEN floor(s1 / 5.0 * 1000000.0 + 0.5) / 1000000.0 END AS ma5,
        CASE WHEN rn >= 5 THEN floor(sqrt(greatest((s2 - s1 * s1 / 5.0) / 4.0, 0.0)) * 1000000.0 + 0.5) / 1000000.0 END AS sd5,
        CASE WHEN rn >= 5 THEN floor((s1 / 5.0 + 2.0 * sqrt(greatest((s2 - s1 * s1 / 5.0) / 4.0, 0.0))) * 1000000.0 + 0.5) / 1000000.0 END AS upper,
        CASE WHEN rn >= 5 THEN floor((s1 / 5.0 - 2.0 * sqrt(greatest((s2 - s1 * s1 / 5.0) / 4.0, 0.0))) * 1000000.0 + 0.5) / 1000000.0 END AS lower
      FROM win
      ORDER BY bucket""")
  )

  /** W4: latest-row metric (max_by analog, explicit deterministic order). */
  val qLatestMetric = GraftQuery(
    "q_latest_metric",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .orderBy($"ts_us".desc, $"event_id".desc)
        .limit(1)
        .select($"event_id", $"ts_us", $"event_type", $"value")
    },
    Some("""
      SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
      FROM events
      ORDER BY epoch_us(ts) DESC, event_id DESC
      LIMIT 1""")
  )

  /** A7: multi-key group-sums — daily activity per event type. */
  val qActivityDaily = GraftQuery(
    "q_activity_daily",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy(expr(s"ts_us div $DayUs").as("day"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"day", $"event_type")
    },
    Some(s"""
      SELECT epoch_us(ts) // ${DayUs} AS day, event_type,
        count(*) AS n_events, ${Oracle.dsum("value")} AS sum_value,
        count(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1, 2
      ORDER BY day, event_type""")
  )

  /** O3: top-3 event types by activity (dashboard's nlargest(3)). */
  val qTop3EventTypes = GraftQuery(
    "q_top3_event_types",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .orderBy($"n_events".desc, $"event_type")
        .limit(3)
    },
    Some(s"""
      SELECT event_type, count(*) AS n_events, ${Oracle.dsum("value")} AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY n_events DESC, event_type
      LIMIT 3""")
  )

  /** U0: explicit unionByName of two metric slices then re-aggregate —
    * the dashboard's concat-all-parquet-files path. */
  val qUnionMetrics = GraftQuery(
    "q_union_metrics",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      def slice(t: String) = ev.filter($"event_type" === t)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("kind", lit(t))
      slice("click").unionByName(slice("view"))
        .select($"day", $"kind", $"n_events")
        .orderBy($"day", $"kind")
    },
    Some(s"""
      SELECT day, kind, n_events FROM (
        SELECT epoch_us(ts) // ${DayUs} AS day, 'click' AS kind, count(*) AS n_events
        FROM events WHERE event_type = 'click' GROUP BY 1
        UNION ALL
        SELECT epoch_us(ts) // ${DayUs} AS day, 'view' AS kind, count(*) AS n_events
        FROM events WHERE event_type = 'view' GROUP BY 1)
      ORDER BY day, kind""")
  )

  /** F8 family: JSON prop extraction (the events.props column), grouped. */
  val qJsonProps = GraftQuery(
    "q_json_props",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .select(get_json_object($"props", "$.k").cast(LongType).as("k"), $"value")
        .groupBy(expr("k div 10").as("k_decile"))
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .orderBy($"k_decile")
    },
    Some(s"""
      SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) // 10 AS k_decile,
        count(*) AS n_events, ${Oracle.dsum("value")} AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY k_decile""")
  )

  private val HourUs = 3600000000L
  private val HalfHourUs = 1800000000L

  /** Event-time TUMBLING window aggregate — the semantics the reference's
    * `WINDOW_SEC` env var intends but never applies (SURVEY.md §2.11).
    *
    * Window assignment is epoch-aligned bucket ARITHMETIC on the exact
    * microsecond epoch (`ts_us div 1h * 1h`), identical to what Spark's
    * `window($"ts", "1 hour")` computes for non-negative epochs — but the
    * bucket expression stays inside whole-stage codegen, where `window()`
    * over the `timestamp_micros`-derived column was measured ~20× slower at
    * sf0.1 (BENCH_r01: 9.6 s vs sub-second for the same-shaped
    * q_activity_daily). Native `window()` remains in the genuinely streaming
    * path (streaming/Sessionize, MicroBatchPipeline), where its watermark
    * integration is the point. */
  val qTumblingWindow = GraftQuery(
    "q_tumbling_window",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy((expr(s"ts_us div $HourUs") * HourUs).as("win_start_us"),
          $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .select($"win_start_us", $"event_type", $"n_events", $"sum_value")
        .orderBy($"win_start_us", $"event_type")
    },
    Some(s"""
      SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
        event_type, count(*) AS n_events, ${Oracle.dsum("value")} AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start_us, event_type""")
  )

  /** Event-time SLIDING window (1h window, 30m slide): every event lands in
    * exactly window/slide = 2 windows, materialized by an explicit 2-way
    * expansion (`explode(sequence(0,1))`) + the same epoch-aligned bucket
    * arithmetic as the tumbling query — identical results to
    * `window($"ts", "1 hour", "30 minutes")` for non-negative epochs,
    * without dropping out of whole-stage codegen (see qTumblingWindow). */
  val qSlidingWindow = GraftQuery(
    "q_sliding_window",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .select($"ts_us", $"value", explode(sequence(lit(0L), lit(1L))).as("k"))
        .groupBy(((expr(s"ts_us div $HalfHourUs") - $"k") * HalfHourUs)
          .as("win_start_us"))
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .orderBy($"win_start_us")
    },
    Some(s"""
      SELECT win_start_us, count(*) AS n_events, ${Oracle.dsum("value")} AS sum_value
      FROM (
        SELECT (epoch_us(ts) // 1800000000 - k) * 1800000000 AS win_start_us, value
        FROM events CROSS JOIN (SELECT unnest(range(2)) AS k))
      GROUP BY win_start_us
      ORDER BY win_start_us""")
  )

  /** P6: membership (isin) filter — the dashboard's subreddit multi-select
    * (streamlit_app.py:337) transposed onto event types. */
  val qMembershipFilter = GraftQuery(
    "q_membership_filter",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .filter($"event_type".isin("click", "view", "purchase"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .orderBy($"event_type")
    },
    Some(s"""
      SELECT event_type, count(*) AS n_events,
        ${Oracle.dsum("value")} AS sum_value
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase')
      GROUP BY event_type
      ORDER BY event_type""")
  )

  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Sessionization (gap > 30 min starts a new session) as a batch query:
    * lag + running sum of session starts + per-session aggregate — the exact
    * relational twin of the streaming flatMapGroupsWithState operator in
    * graft.streaming.Sessionize, and fully oracle-checkable. */
  val qSessionize = GraftQuery(
    "q_sessionize",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      Tables.events(spark, dir)
        .withColumn("prev", lag($"ts_us", 1).over(w))
        .withColumn("new_sess",
          when($"prev".isNull || $"ts_us" - $"prev" > SessionGapUs, 1L).otherwise(0L))
        .withColumn("sess_seq", sum($"new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sess_seq")
        .agg(count(lit(1)).as("n_events"),
          min($"ts_us").as("start_us"), max($"ts_us").as("end_us"))
        .select($"user_id", $"sess_seq", $"n_events", $"start_us", $"end_us",
          ($"end_us" - $"start_us").as("duration_us"))
        .orderBy($"user_id", $"sess_seq")
    },
    Some(s"""
      WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${SessionGapUs}
               THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      s AS (
        SELECT user_id, ts_us,
          sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS sess_seq
        FROM g)
      SELECT user_id, sess_seq, count(*) AS n_events,
        min(ts_us) AS start_us, max(ts_us) AS end_us,
        max(ts_us) - min(ts_us) AS duration_us
      FROM s
      GROUP BY user_id, sess_seq
      ORDER BY user_id, sess_seq""")
  )

  /** Top-10 within-session event-type trigram paths — sequential-pattern
    * mining over [[qSessionize]]'s session boundaries, the EXPLORATORY
    * companion to q_event_funnel's fixed 3-step funnel and
    * q_markov_transitions' order-1 matrix: which 3-step behaviors actually
    * dominate, with global support. Consecutive-only (a session's step i,
    * i+1, i+2 — the app-flow reading), ranked by count with a full
    * lexicographic tiebreak so the LIMIT is deterministic.
    *
    * Scale shape: the session assignment and both lead() frames ride ONE
    * user-hash exchange (HashPartitioning(user_id) satisfies the
    * (user_id, sess_seq) clustering — no second shuffle, just the
    * in-partition sort); the trigram space is ≤|types|³ rows, so the
    * count/support/top-k stages are all bounded-domain. Exactness: counts
    * are integers; support is one qrounded integer division. */
  /** Shared count→support→top-10 readout over a (step1, step2, step3, n)
    * trigram-count relation — used by [[qSessionPaths]] and the streaming
    * maintainer graft.streaming.StreamPaths, so the two surfaces cannot
    * drift (counts are additive integers; support is one qrounded
    * division over the ≤|types|³ domain). */
  private[graft] def sessionPathsReport(counts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val tot = counts.agg(sum($"n").as("tot"))
    counts.crossJoin(broadcast(tot))
      .select($"step1", $"step2", $"step3", $"n",
        Det.qround($"n".cast(DoubleType) / $"tot").as("support"))
      .orderBy($"n".desc, $"step1", $"step2", $"step3")
      .limit(10)
  }

  val qSessionPaths = GraftQuery(
    "q_session_paths",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val sess = Tables.events(spark, dir)
        .withColumn("prev", lag($"ts_us", 1).over(w))
        .withColumn("new_sess",
          when($"prev".isNull || $"ts_us" - $"prev" > SessionGapUs, 1L)
            .otherwise(0L))
        .withColumn("sess_seq", sum($"new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val ws = Window.partitionBy($"user_id", $"sess_seq")
        .orderBy($"ts_us", $"event_id")
      val counts = sess
        .withColumn("step2", lead($"event_type", 1).over(ws))
        .withColumn("step3", lead($"event_type", 2).over(ws))
        .filter($"step2".isNotNull && $"step3".isNotNull)
        .groupBy($"event_type".as("step1"), $"step2", $"step3")
        .agg(count(lit(1)).as("n"))
      sessionPathsReport(counts)
    },
    Some(s"""
      WITH g AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${SessionGapUs}
               THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      s AS (
        SELECT user_id, event_id, event_type, ts_us,
          sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS sess_seq
        FROM g),
      tri AS (
        SELECT event_type AS step1,
          lead(event_type, 1) OVER w2 AS step2,
          lead(event_type, 2) OVER w2 AS step3
        FROM s
        WINDOW w2 AS (PARTITION BY user_id, sess_seq
          ORDER BY ts_us, event_id)),
      c AS (
        SELECT step1, step2, step3, count(*)::BIGINT AS n
        FROM tri WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        GROUP BY 1, 2, 3),
      t AS (SELECT sum(n)::BIGINT AS tot FROM c)
      SELECT step1, step2, step3, n,
        ${Oracle.qround("CAST(n AS DOUBLE) / tot")} AS support
      FROM c CROSS JOIN t
      ORDER BY n DESC, step1, step2, step3
      LIMIT 10""")
  )

  /** ROLLUP aggregation: (event_type, day) hierarchy with subtotal and
    * grand-total rows — beyond the reference's flat group-bys, standard for
    * an analytics surface. grouping() flags disambiguate NULL keys. */
  val qRollupActivity = GraftQuery(
    "q_rollup_activity",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("day", expr(s"ts_us div $DayUs"))
        .rollup($"event_type", $"day")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"),
          grouping($"event_type").cast(LongType).as("g_type"),
          grouping($"day").cast(LongType).as("g_day"))
        .select($"event_type", $"day", $"g_type", $"g_day",
          $"n_events", $"sum_value")
        .orderBy($"g_type", $"g_day", $"event_type", $"day")
    },
    Some(s"""
      SELECT event_type, epoch_us(ts) // ${DayUs} AS day,
        grouping(event_type)::BIGINT AS g_type,
        grouping(epoch_us(ts) // ${DayUs})::BIGINT AS g_day,
        count(*) AS n_events, ${Oracle.dsum("value")} AS sum_value
      FROM events
      GROUP BY ROLLUP (event_type, epoch_us(ts) // ${DayUs})
      ORDER BY g_type, g_day, event_type, day""")
  )

  /** Exact percentiles per group (median + p90). Spark `percentile` and
    * DuckDB `quantile_cont` both use linear interpolation over the sorted
    * values; rounded to 6 dp for a stable cross-engine compare. */
  val qValueQuantiles = GraftQuery(
    "q_value_quantiles",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(
          Det.qround(expr("percentile(value, 0.5)")).as("p50"),
          Det.qround(expr("percentile(value, 0.9)")).as("p90"),
          count(lit(1)).as("n_events"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
        floor(quantile_cont(value, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS p50,
        floor(quantile_cont(value, 0.9) * 1000000.0 + 0.5) / 1000000.0 AS p90,
        count(*) AS n_events
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  )

  /** Scale twin of qValueQuantiles: `approx_percentile` (Greenwald-Khanna
    * sketch) — bounded memory per group and map-side mergeable, which the
    * exact sort-based `percentile` is not; at 100 TB the exact variant
    * buffers every value per group while the sketch stays O(1/accuracy).
    * The sketch's returned values are engine-specific, so the verified
    * output is the ε-rank contract the sketch guarantees instead: the
    * approx value for quantile p at accuracy a must occupy a sorted rank
    * within n/a (+1 for the discrete boundary) of p·n. The query computes
    * the sketch, then counts each group's values below/at the sketch value
    * (one broadcast join of the 5-row sketch relation back to events) and
    * emits `p50_rank_ok`/`p90_rank_ok`; the oracle asserts both are 1. A
    * sketch whose rank error exceeds the bound now FAILS the hash compare
    * instead of being skipped. RollupQuantilesSpec still bounds the VALUE
    * error against the exact twin. */
  val qValueQuantilesApprox = GraftQuery(
    "q_value_quantiles_approx",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir).select($"event_type", $"value")
      val sketch = ev.groupBy($"event_type").agg(
        expr("approx_percentile(value, 0.5, 10000)").as("a50"),
        expr("approx_percentile(value, 0.9, 10000)").as("a90"))
      // rank interval of value a among the group's NON-NULL values is
      // [lt+1, le]; ok iff it intersects [p·nn − tol, p·nn + tol],
      // tol = nn/accuracy + 1. Ranks are over nn = count(value), NOT the
      // row count: approx_percentile and the lt/le comparisons both skip
      // NULLs, so using n_events would mis-center the target on any group
      // with NULL values (and a fully-NULL group passes vacuously, like
      // the oracle's hardcoded 1).
      def rankOk(p: Double, lt: Column, le: Column, nn: Column): Column = {
        val tol = nn.cast(DoubleType) / 10000.0 + 1.0
        val target = nn.cast(DoubleType) * p
        when(nn === 0L, 1L)
          .when(target >= lt.cast(DoubleType) + 1.0 - tol &&
            target <= le.cast(DoubleType) + tol, 1L).otherwise(0L)
      }
      ev.join(broadcast(sketch), Seq("event_type"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          count($"value").as("nn"),
          sum(when($"value" < $"a50", 1L).otherwise(0L)).as("lt50"),
          sum(when($"value" <= $"a50", 1L).otherwise(0L)).as("le50"),
          sum(when($"value" < $"a90", 1L).otherwise(0L)).as("lt90"),
          sum(when($"value" <= $"a90", 1L).otherwise(0L)).as("le90"))
        .select($"event_type", $"n_events",
          rankOk(0.5, $"lt50", $"le50", $"nn").as("p50_rank_ok"),
          rankOk(0.9, $"lt90", $"le90", $"nn").as("p90_rank_ok"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n_events,
        1::BIGINT AS p50_rank_ok, 1::BIGINT AS p90_rank_ok
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  )

  /** The event-type domain, pinned so `pivot` never runs its implicit
    * distinct-collect pass (Spark collects pivot values to the driver when
    * they are not supplied — an extra job AND a nondeterministic column
    * order; a pinned domain is the 100 TB shape). */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Long-to-wide pivot: per-day revenue by event type as one row per day
    * with one column per (pinned) event type. Catalyst rewrites this to a
    * single hash aggregate with `sum(CASE WHEN type = t …)` per pivot value
    * — exactly the conditional-aggregation twin the oracle states, and one
    * exchange on `day` total. Combos absent from the data stay NULL (both
    * engines: conditional SUM over zero rows). */
  val qPivotDaily = GraftQuery(
    "q_pivot_daily",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("day", expr(s"ts_us div $DayUs"))
        .groupBy($"day")
        .pivot("event_type", EventTypes)
        .agg(dsum($"value"))
        .orderBy($"day")
    },
    Some(s"""
      SELECT epoch_us(ts) // $DayUs AS day,
        ${EventTypes.map(t =>
          s"round(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(38,9)) END), 6)::DOUBLE AS $t")
          .mkString(",\n        ")}
      FROM events
      GROUP BY day
      ORDER BY day""")
  )

  /** CUBE over (event_type, day-of-week): every grouping-set combination in
    * one pass — the full-materialization sibling of q_rollup_activity's
    * hierarchy. GROUPING() flags disambiguate "NULL because subtotal" from a
    * NULL key (the keys here are never null, but the flags are part of the
    * operator's contract and pin a total ORDER BY that never compares
    * engine-specific NULL orderings on the key columns first). Scale shape:
    * Spark expands to 4 grouping sets BEFORE the exchange but partial
    * aggregation collapses each set map-side; one exchange, 4x the
    * (tiny) distinct-key space. */
  val qCubeActivity = GraftQuery(
    "q_cube_activity",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("dow", expr(s"(ts_us div $DayUs) % 7"))
        .cube($"event_type", $"dow")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"),
          grouping($"event_type").cast(LongType).as("g_type"),
          grouping($"dow").cast(LongType).as("g_dow"))
        .select($"event_type", $"dow", $"g_type", $"g_dow",
          $"n_events", $"sum_value")
        .orderBy($"g_type", $"g_dow", $"event_type", $"dow")
    },
    Some(s"""
      SELECT event_type, (epoch_us(ts) // $DayUs) % 7 AS dow,
        grouping(event_type)::BIGINT AS g_type,
        grouping((epoch_us(ts) // $DayUs) % 7)::BIGINT AS g_dow,
        count(*) AS n_events, ${Oracle.dsum("value")} AS sum_value
      FROM events
      GROUP BY CUBE (event_type, (epoch_us(ts) // $DayUs) % 7)
      ORDER BY g_type, g_dow, event_type, dow""")
  )

  /** Statistical moments per event type — mean, sample stddev, and the
    * value↔hour-of-day correlation — assembled from decimal-exact raw sums
    * (Σv, Σv², Σh, Σh², Σvh) instead of Spark's `stddev_samp`/`corr`
    * aggregates. The builtins are single-pass but accumulate in IEEE
    * doubles whose partial-merge order is partition-dependent — not
    * reproducible run to run, let alone engine to engine. Raw decimal sums
    * are order-independent, and both engines then apply the SAME double
    * formula to the SAME rounded sums, so the output is bit-identical by
    * construction. One partial+final aggregate, one exchange on
    * event_type; the moment formulas are driver-free column arithmetic. */
  val qEventValueStats = GraftQuery(
    "q_event_value_stats",
    (spark, dir) => {
      import spark.implicits._
      val hourOfDay = expr(s"(ts_us div ${3600L * 1000000}) % 24").cast(DoubleType)
      val g = Tables.events(spark, dir)
        .withColumn("h", hourOfDay)
        .groupBy($"event_type")
        .agg(
          count(lit(1)).cast(DoubleType).as("n"),
          dsum($"value").as("sv"),
          dsum($"value" * $"value").as("svv"),
          dsum($"h").as("sh"),
          dsum($"h" * $"h").as("shh"),
          dsum($"value" * $"h").as("svh"))
      g.select($"event_type", $"n".cast(LongType).as("n_events"),
          Det.qround($"sv" / $"n").as("mean_value"),
          Det.qround(sqrt(($"svv" - $"sv" * $"sv" / $"n") / ($"n" - 1)))
            .as("stddev_value"),
          Det.qround(($"n" * $"svh" - $"sv" * $"sh") /
            (sqrt($"n" * $"svv" - $"sv" * $"sv") * sqrt($"n" * $"shh" - $"sh" * $"sh")))
            .as("corr_value_hour"))
        .orderBy($"event_type")
    },
    Some(s"""
      WITH g AS (
        SELECT event_type,
          count(*)::DOUBLE AS n,
          ${Oracle.dsum("value")} AS sv,
          ${Oracle.dsum("value * value")} AS svv,
          ${Oracle.dsum("h")} AS sh,
          ${Oracle.dsum("h * h")} AS shh,
          ${Oracle.dsum("value * h")} AS svh
        FROM (SELECT event_type, value,
                ((epoch_us(ts) // ${3600L * 1000000}) % 24)::DOUBLE AS h
              FROM events)
        GROUP BY event_type)
      SELECT event_type, n::BIGINT AS n_events,
        ${Oracle.qround("sv / n")} AS mean_value,
        ${Oracle.qround("sqrt((svv - sv * sv / n) / (n - 1))")} AS stddev_value,
        ${Oracle.qround(
          "(n * svh - sv * sh) / (sqrt(n * svv - sv * sv) * sqrt(n * shh - sh * sh))")}
          AS corr_value_hour
      FROM g
      ORDER BY event_type""")
  )

  /** Higher moments per event type — population skewness and EXCESS
    * kurtosis from decimal-exact raw power sums (Σv..Σv⁴), the
    * [[qEventValueStats]] discipline extended one tier up: Spark's
    * `skewness`/`kurtosis` builtins accumulate IEEE central moments whose
    * partial-merge order is partition-dependent, so the reproducible
    * formulation is raw decimal sums + one shared double formula. Every
    * power is an explicit left-associated product and the composite
    * formulas are written with the same association in both engines; the
    * moment ratios divide by varᵏ (>0 on any non-degenerate group,
    * CASE-guarded to null otherwise — the EmptyTablesSpec discipline).
    * Distribution-shape stats like these are the data-audit signal for
    * value-metric drift (heavy tails, spikes) a training pipeline watches. */
  val qValueMoments = GraftQuery(
    "q_value_moments",
    (spark, dir) => {
      import spark.implicits._
      val g = Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(
          count(lit(1)).cast(DoubleType).as("n"),
          dsum($"value").as("s1"),
          dsum($"value" * $"value").as("s2"),
          dsum($"value" * $"value" * $"value").as("s3"),
          dsum($"value" * $"value" * $"value" * $"value").as("s4"))
      val m = $"s1" / $"n"
      val va = $"s2" / $"n" - m * m
      val skew = ($"s3" / $"n" - lit(3.0) * m * ($"s2" / $"n") +
        lit(2.0) * m * m * m) / (va * sqrt(va))
      val kurt = ($"s4" / $"n" - lit(4.0) * m * ($"s3" / $"n") +
        lit(6.0) * m * m * ($"s2" / $"n") - lit(3.0) * m * m * m * m) /
        (va * va) - lit(3.0)
      g.select($"event_type", $"n".cast(LongType).as("n_events"),
          Det.qround(m).as("mean_value"),
          Det.qround(va).as("var_pop"),
          when(va > 0, Det.qround(skew)).as("skew_pop"),
          when(va > 0, Det.qround(kurt)).as("kurt_excess"))
        .orderBy($"event_type")
    },
    Some(s"""
      WITH g AS (
        SELECT event_type,
          count(*)::DOUBLE AS n,
          ${Oracle.dsum("value")} AS s1,
          ${Oracle.dsum("value * value")} AS s2,
          ${Oracle.dsum("value * value * value")} AS s3,
          ${Oracle.dsum("value * value * value * value")} AS s4
        FROM events
        GROUP BY event_type),
      d AS (
        SELECT *, s1 / n AS m, s2 / n - (s1 / n) * (s1 / n) AS va FROM g)
      SELECT event_type, n::BIGINT AS n_events,
        ${Oracle.qround("m")} AS mean_value,
        ${Oracle.qround("va")} AS var_pop,
        CASE WHEN va > 0 THEN ${Oracle.qround(
          "(s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m) / (va * sqrt(va))")}
          END AS skew_pop,
        CASE WHEN va > 0 THEN ${Oracle.qround(
          "(s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n) - 3.0 * m * m * m * m) / (va * va) - 3.0")}
          END AS kurt_excess
      FROM d
      ORDER BY event_type""")
  )

  /** Wide→long UNPIVOT (melt) — the inverse of [[qPivotDaily]], stated with
    * Spark 4's native `unpivot` operator over the pivoted frame. NULL cells
    * (day × type combos with no events) are filtered explicitly because the
    * two engines disagree by default (Spark unpivot keeps null measure
    * rows; DuckDB UNPIVOT excludes them). With nulls dropped,
    * unpivot∘pivot is exactly the plain (day, type) aggregate — which is
    * the oracle, making this a ROUND-TRIP check of both operators. */
  val qUnpivotDaily = GraftQuery(
    "q_unpivot_daily",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("day", expr(s"ts_us div $DayUs"))
        .groupBy($"day")
        .pivot("event_type", EventTypes)
        .agg(dsum($"value"))
        .unpivot(Array($"day"), EventTypes.map(col).toArray,
          "event_type", "sum_value")
        .filter($"sum_value".isNotNull)
        .orderBy($"day", $"event_type")
    },
    Some(s"""
      SELECT epoch_us(ts) // $DayUs AS day, event_type,
        ${Oracle.dsum("value")} AS sum_value
      FROM events
      GROUP BY day, event_type
      ORDER BY day, event_type""")
  )

  /** VariantType JSON access — Spark 4's binary semi-structured path:
    * `parse_json` shreds the props string ONCE into a Variant value and
    * `variant_get` does typed field access on the binary form, vs
    * [[qJsonProps]]'s `get_json_object`, which re-parses the string per
    * extraction. One parse however many fields are pulled — the shape that
    * matters when a 100 TB event stream carries wide JSON payloads. Same
    * relational skeleton as q_json_props (per-key-group aggregate) so the
    * two stay comparable in the bench. */
  val qVariantProps = GraftQuery(
    "q_variant_props",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .select(variant_get(parse_json($"props"), "$.k", "bigint").as("k"),
          $"value")
        .groupBy($"k")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .orderBy($"k")
    },
    Some(s"""
      SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
        count(*) AS n_events, ${Oracle.dsum("value")} AS sum_value
      FROM events
      GROUP BY k
      ORDER BY k""")
  )

  /** Time-series gap fill (densification): the per-(day, type) activity
    * series with every missing combination zero-filled. The dense spine is
    * `sequence(min_day, max_day)` × the pinned type domain — a BOUNDED
    * relation (days × 5) built from one global min/max aggregate, never
    * from the fact table's row count — and the only fact-proportional work
    * is the single daily aggregation; the fill join touches aggregated
    * rows only (Catalyst broadcasts the agg side). Gap-filled series are
    * what makes downstream rolling windows / trend fits honest: a day with
    * zero events must contribute a zero, not silently vanish. */
  val qGapFill = GraftQuery(
    "q_gap_fill",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .withColumn("day", expr(s"ts_us div $DayUs"))
      val daily = ev.groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      val spine = ev.agg(min($"day").as("lo"), max($"day").as("hi"))
        .select(explode(sequence($"lo", $"hi")).as("day"))
        .crossJoin(EventTypes.toDF("event_type"))
      spine.join(daily, Seq("day", "event_type"), "left")
        .select($"day", $"event_type",
          coalesce($"n_events", lit(0L)).as("n_events"),
          coalesce($"sum_value", lit(0.0)).as("sum_value"))
        .orderBy($"day", $"event_type")
    },
    Some(s"""
      WITH daily AS (
        SELECT epoch_us(ts) // $DayUs AS day, event_type,
          count(*) AS n_events, ${Oracle.dsum("value")} AS sum_value
        FROM events GROUP BY day, event_type),
      bounds AS (
        SELECT min(epoch_us(ts) // $DayUs) AS lo,
          max(epoch_us(ts) // $DayUs) AS hi
        FROM events),
      spine AS (
        SELECT gs.day, t.event_type
        FROM (SELECT unnest(generate_series(lo, hi)) AS day FROM bounds) gs
        CROSS JOIN (SELECT unnest([${EventTypes.map(t => s"'$t'").mkString(",")}])
          AS event_type) t)
      SELECT s.day, s.event_type,
        coalesce(d.n_events, 0) AS n_events,
        coalesce(d.sum_value, 0.0) AS sum_value
      FROM spine s LEFT JOIN daily d
        ON s.day = d.day AND s.event_type = d.event_type
      ORDER BY s.day, s.event_type""")
  )

  /** CDC upsert (MERGE INTO semantics, SCD type 1): the per-user latest
    * state from the historical base, merged with a "late batch" (the final
    * day of the stream). WHEN MATCHED → the update wins, WHEN NOT MATCHED
    * BY TARGET → insert, WHEN NOT MATCHED BY SOURCE → base row is kept;
    * `action` records which branch fired. Stated as one full-outer join on
    * the merge key with coalesce per column — the shape every lakehouse
    * MERGE lowers to. At scale both sides shuffle once on user_id
    * (sort-merge full outer); a production target would be bucketed on the
    * merge key so only the (much smaller) update batch moves. */
  val qUpsertMerge = GraftQuery(
    "q_upsert_merge",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val cutoff = ev.agg((max($"ts_us") - lit(DayUs)).as("cutoff"))
      val tagged = ev.crossJoin(broadcast(cutoff))
      def latest(df: DataFrame, p: String): DataFrame = df
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts_us").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as(s"${p}event_id"),
          col("ts_us").as(s"${p}ts_us"), col("event_type").as(s"${p}event_type"),
          col("value").as(s"${p}value"))
      val base = latest(tagged.filter($"ts_us" < $"cutoff"), "b_")
      val upd = latest(tagged.filter($"ts_us" >= $"cutoff"), "u_")
      base.join(upd, Seq("user_id"), "full_outer")
        .select($"user_id",
          coalesce($"u_event_id", $"b_event_id").as("event_id"),
          coalesce($"u_ts_us", $"b_ts_us").as("ts_us"),
          coalesce($"u_event_type", $"b_event_type").as("event_type"),
          coalesce($"u_value", $"b_value").as("value"),
          when($"b_event_id".isNull, lit("insert"))
            .when($"u_event_id".isNull, lit("keep"))
            .otherwise(lit("update")).as("action"))
        .orderBy($"user_id")
    },
    Some(s"""
      WITH cutoff AS (SELECT max(epoch_us(ts)) - $DayUs AS c FROM events),
      base AS (
        SELECT user_id, event_id, ts_us, event_type, value FROM (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events WHERE epoch_us(ts) < (SELECT c FROM cutoff))
        WHERE rn = 1),
      upd AS (
        SELECT user_id, event_id, ts_us, event_type, value FROM (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events WHERE epoch_us(ts) >= (SELECT c FROM cutoff))
        WHERE rn = 1)
      SELECT coalesce(u.user_id, b.user_id) AS user_id,
        coalesce(u.event_id, b.event_id) AS event_id,
        coalesce(u.ts_us, b.ts_us) AS ts_us,
        coalesce(u.event_type, b.event_type) AS event_type,
        coalesce(u.value, b.value) AS value,
        CASE WHEN b.user_id IS NULL THEN 'insert'
             WHEN u.user_id IS NULL THEN 'keep'
             ELSE 'update' END AS action
      FROM base b FULL OUTER JOIN upd u ON b.user_id = u.user_id
      ORDER BY user_id""")
  )

  /** Per-type revenue trend: least-squares slope/intercept of daily revenue
    * vs day index — the REGR_SLOPE/REGR_INTERCEPT family, assembled from
    * decimal-exact raw sums (Σx, Σx², Σy, Σxy) for the same reason as
    * [[qEventValueStats]]: the builtin regr_* aggregates merge IEEE partials
    * in partition order and are not reproducible; raw decimal sums are, and
    * both engines then run the SAME double formula. Days are rebased to the
    * series start (x = day − min_day) so the intercept is the fitted level
    * at the first day, not at epoch 0. Two tiny aggregates over the daily
    * series; all fact-proportional work is the first daily group-by. */
  val qValueTrend = GraftQuery(
    "q_value_trend",
    (spark, dir) => {
      import spark.implicits._
      val daily = Tables.events(spark, dir)
        .withColumn("day", expr(s"ts_us div $DayUs"))
        .groupBy($"event_type", $"day")
        .agg(dsum($"value").as("rev"))
      val lo = daily.agg(min($"day").as("lo"))
      val g = daily.crossJoin(broadcast(lo))
        .withColumn("x", ($"day" - $"lo").cast(DoubleType))
        .groupBy($"event_type")
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          dsum($"x").as("sx"), dsum($"x" * $"x").as("sxx"),
          dsum($"rev").as("sy"), dsum($"x" * $"rev").as("sxy"))
        .withColumn("slope", Det.qround(
          ($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx")))
      g.select($"event_type", $"n".cast(LongType).as("n_days"), $"slope",
          Det.qround(($"sy" - $"slope" * $"sx") / $"n").as("intercept"))
        .orderBy($"event_type")
    },
    Some(s"""
      WITH daily AS (
        SELECT event_type, epoch_us(ts) // $DayUs AS day,
          ${Oracle.dsum("value")} AS rev
        FROM events GROUP BY event_type, day),
      g AS (
        SELECT event_type,
          count(*)::DOUBLE AS n,
          ${Oracle.dsum("x")} AS sx, ${Oracle.dsum("x * x")} AS sxx,
          ${Oracle.dsum("rev")} AS sy, ${Oracle.dsum("x * rev")} AS sxy
        FROM (SELECT event_type, rev,
                (day - (SELECT min(day) FROM daily))::DOUBLE AS x
              FROM daily)
        GROUP BY event_type),
      s AS (
        SELECT *, ${Oracle.qround("(n * sxy - sx * sy) / (n * sxx - sx * sx)")}
          AS slope
        FROM g)
      SELECT event_type, n::BIGINT AS n_days, slope,
        ${Oracle.qround("(sy - slope * sx) / n")} AS intercept
      FROM s
      ORDER BY event_type""")
  )

  /** Per-user event journey: the first 20 events of every user assembled
    * into one ordered path string — ordered string aggregation (Spark 4's
    * `listagg ... WITHIN GROUP (ORDER BY ...)`), the sequence-assembly
    * primitive behind session-path mining and multi-turn conversation
    * assembly for training data. The journey is truncated BEFORE
    * aggregation (row_number ≤ 20, planned as WindowGroupLimit — partial
    * top-k per key map-side), so no unbounded per-user string ever
    * materializes: at 100 TB the output row is bounded by construction,
    * not by hoping users are small. One hash exchange on user_id serves
    * both the window and the aggregate. */
  val qEventPaths = GraftQuery(
    "q_event_paths",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 20)
        .groupBy($"user_id")
        .agg(
          expr("listagg(event_type, '>') WITHIN GROUP (ORDER BY ts_us, event_id)")
            .as("path"),
          count(lit(1)).as("n_steps"))
        .orderBy($"user_id")
    },
    Some("""
      WITH first20 AS (
        SELECT user_id, event_type, ts_us, event_id FROM (
          SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS rn
          FROM events)
        WHERE rn <= 20)
      SELECT user_id,
        string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path,
        count(*) AS n_steps
      FROM first20
      GROUP BY user_id
      ORDER BY user_id""")
  )

  /** Winsorized robust statistics — outlier clipping, the robust
    * preprocessing step a metrics (or training-feature) pipeline applies
    * before averaging: clip each value into its group's exact [p5, p95]
    * band, then take the decimal-exact mean of the clipped values. The
    * clip bounds are the RAW interpolated percentiles (Spark `percentile`
    * ≡ DuckDB `quantile_cont`, bit-identical — the q_value_quantiles
    * precedent), so `least/greatest` sees the same doubles in both
    * engines; rounding happens only on output.
    *
    * Scale shape: bounds are a group-sized aggregate broadcast back onto
    * the fact scan; exact percentile buffers per group (the documented
    * trade — q_value_quantiles_approx is the sketch-based scale twin). */
  val qWinsorizedStats = GraftQuery(
    "q_winsorized_stats",
    (spark, dir) => {
      import spark.implicits._
      val bounds = Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(expr("percentile(value, 0.05)").as("lo"),
          expr("percentile(value, 0.95)").as("hi"))
      Tables.events(spark, dir)
        .join(broadcast(bounds), Seq("event_type"))
        .groupBy($"event_type", $"lo", $"hi")
        .agg(count(lit(1)).as("n_events"),
          Det.davg(least(greatest($"value", $"lo"), $"hi")).as("winsor_mean"))
        .select($"event_type", $"n_events",
          Det.qround($"lo").as("p05"), Det.qround($"hi").as("p95"),
          $"winsor_mean")
        .orderBy($"event_type")
    },
    Some(s"""
      WITH b AS (
        SELECT event_type,
          quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type)
      SELECT e.event_type, count(*)::BIGINT AS n_events,
        ${Oracle.qround("lo")} AS p05, ${Oracle.qround("hi")} AS p95,
        ${Oracle.davg("least(greatest(value, lo), hi)")} AS winsor_mean
      FROM events e JOIN b USING (event_type)
      GROUP BY e.event_type, lo, hi
      ORDER BY e.event_type""")
  )

  /** EWMA depth: 8 trailing observations; weights 1, 1/2, … 1/128. */
  val EwmaDepth = 8

  /** Exponentially-weighted moving average per event type — the smoothing
    * the dashboard's rolling mean (W1) graduates to when recency should
    * dominate: half-life-one decay over the trailing [[EwmaDepth]]
    * observations, normalized by the weights actually present so the head
    * of each series is well-defined (pandas `ewm(alpha=.5, adjust=True)`
    * truncated to 8 terms).
    *
    * Exactness without decimals: every weight is a power of two, so each
    * `value/2ᵏ` is an EXACT double (exponent shift), and both engines
    * evaluate the 8-term numerator in the same left-to-right IEEE
    * association (the q_embed_int8 discipline) — one qround at the end.
    *
    * Scale shape: one hash exchange on event_type, one in-partition sort,
    * ONE Window operator computing all 7 lags (same frame), arithmetic in
    * the following Project — no self-join formulation (the naive "join the
    * 8 previous rows" is an 8× blowup). */
  val qEwmaMetric = GraftQuery(
    "q_ewma_metric",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"ts_us", $"event_id")
      // materialize each lag ONCE, then combine: referencing lag(k) in both
      // num and den would double every window expression (Spark does not
      // dedupe identical lags within one Window)
      val lagged = Tables.events(spark, dir)
        .select(Seq($"event_id", $"event_type", $"ts_us", $"value") ++
          (1 until EwmaDepth).map(k => lag($"value", k).over(w).as(s"l$k")): _*)
      val num = (1 until EwmaDepth).foldLeft($"value": org.apache.spark.sql.Column) {
        (acc, k) => acc + coalesce(col(s"l$k") / lit(1L << k), lit(0.0))
      }
      val den = (1 until EwmaDepth).foldLeft(lit(1.0)) {
        (acc, k) => acc + when(col(s"l$k").isNotNull, lit(1.0 / (1L << k))).otherwise(lit(0.0))
      }
      lagged
        .select($"event_id", $"event_type", $"ts_us", $"value",
          Det.qround(num / den).as("ewma"))
        .orderBy($"event_type", $"ts_us", $"event_id")
    },
    Some(s"""
      WITH w AS (
        SELECT event_id, event_type, epoch_us(ts) AS ts_us, value,
          ${(1 until EwmaDepth).map(k =>
            s"lag(value, $k) OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id) AS l$k")
            .mkString(", ")}
        FROM events)
      SELECT event_id, event_type, ts_us, value,
        ${Oracle.qround(
          "(" + (1 until EwmaDepth).foldLeft("value") {
            (acc, k) => s"$acc + coalesce(l$k / ${1L << k}, 0e0)"
          } + ") / (" + (1 until EwmaDepth).foldLeft("1e0") {
            (acc, k) => s"$acc + (CASE WHEN l$k IS NOT NULL THEN 1e0 / ${1L << k} ELSE 0e0 END)"
          } + ")")} AS ewma
      FROM w
      ORDER BY event_type, ts_us, event_id""")
  )

  /** Incremental aggregate maintenance — the materialized-view refresh
    * pattern: a standing per-type summary (the 80% "base" slice, standing
    * in for yesterday's materialization) is REFRESHED by merging the 20%
    * "delta" slice's summary, WITHOUT rescanning the base rows' raw form.
    * Works because every statistic carried is algebraic: counts and exact
    * decimal sums add, min/max take min/max, and the mean is derived once
    * from the merged exact state — the same partial/final decomposition
    * Spark's own HashAggregate uses, lifted to the query level so a
    * standing table can hold the partials across runs.
    *
    * The oracle is deliberately the ONE-SHOT full aggregation over all
    * events: the gate proves refresh ≡ recompute bit-for-bit, which is the
    * entire contract of incremental maintenance (exact decimal partials
    * make the merge order-independent; IEEE-float partials would not
    * hash-match a recompute).
    *
    * Scale shape: each slice is one partial+final aggregate on the bounded
    * type key; the merge re-aggregates two |types|-row relations. At 100 TB
    * only the delta slice is scanned per refresh — that is the point. */
  val qIncrementalAgg = GraftQuery(
    "q_incremental_agg",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"event_id", $"event_type", $"value")
      def summarize(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast(DecimalType(38, 9))).as("s1"),
            min($"value").as("mn"), max($"value").as("mx"))
      val base = summarize(ev.filter(pmod($"event_id", lit(10)) < 8))
      val delta = summarize(ev.filter(pmod($"event_id", lit(10)) >= 8))
      base.unionByName(delta)
        .groupBy($"event_type")
        .agg(sum($"n").as("n_events"), sum($"s1").as("s1"),
          min($"mn").as("min_value"), max($"mx").as("max_value"))
        .select($"event_type", $"n_events",
          round($"s1", 6).cast(DoubleType).as("total_value"),
          Det.qround($"s1".cast(DoubleType) / $"n_events").as("mean_value"),
          $"min_value", $"max_value")
        .orderBy($"event_type")
    },
    // the full one-shot recompute: refresh must equal it exactly
    Some(s"""
      SELECT event_type, count(*) AS n_events,
        ${Oracle.dsum("value")} AS total_value,
        ${Oracle.davg("value")} AS mean_value,
        min(value) AS min_value, max(value) AS max_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  )

  /** Time-weighted average of `value` per (event_type, day) — the
    * irregular-sampling mean: a plain AVG over-weights bursts of closely
    * spaced readings, while the trapezoidal integral ∫v dt / ∫dt weights
    * each reading by the time it "held". Each adjacent pair (ordered by
    * ts, event_id within the day) contributes (vᵢ+vᵢ₋₁)/2 · Δt; the
    * denominator telescopes to last−first. Days whose events all share one
    * microsecond (span 0) have no integral and are excluded identically in
    * both engines; a single-event day loses its only row to the lag filter
    * and vanishes the same way.
    *
    * Exactness: (vᵢ+vᵢ₋₁)/2 · Δt is pinned IEEE double arithmetic (Δt a
    * ≤2⁵³ integer, exact as double); the trapezoid sum goes through the
    * exact decimal path, and the final quotient is qround'd.
    *
    * Scale shape: the lag window is partitioned by (event_type, day) — a
    * bounded partition (one type-day of events) that shrinks further with
    * sub-day bucketing; one hash exchange, partial+final aggregate on the
    * same key, no self-join. */
  val qTimeWeightedAvg = GraftQuery(
    "q_time_weighted_avg",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"event_type", $"day")
        .orderBy($"ts_us", $"event_id")
      Tables.events(spark, dir)
        .select($"event_type", expr(s"ts_us div $DayUs").as("day"),
          $"ts_us", $"event_id", $"value")
        .select($"event_type", $"day", $"ts_us", $"value",
          lag($"value", 1).over(w).as("pv"),
          lag($"ts_us", 1).over(w).as("pt"))
        .filter($"pt".isNotNull)
        .groupBy($"event_type", $"day")
        .agg(
          count(lit(1)).as("n_seg"),
          sum($"ts_us" - $"pt").as("span_us"),
          sum(((($"value" + $"pv") / lit(2.0)) * ($"ts_us" - $"pt"))
            .cast(DecimalType(38, 9))).cast(DoubleType).as("num"))
        .filter($"span_us" > 0)
        .select($"event_type", $"day", $"n_seg", $"span_us",
          Det.qround($"num" / $"span_us").as("twa"))
        .orderBy($"event_type", $"day")
    },
    Some(s"""
      WITH ev AS (
        SELECT event_type, epoch_us(ts) // $DayUs AS day,
          epoch_us(ts) AS ts_us, event_id, value
        FROM events),
      l AS (
        SELECT event_type, day, ts_us, value,
          lag(value) OVER w AS pv, lag(ts_us) OVER w AS pt
        FROM ev
        WINDOW w AS (PARTITION BY event_type, day ORDER BY ts_us, event_id)),
      s AS (
        SELECT event_type, day, count(*) AS n_seg,
          sum(ts_us - pt)::BIGINT AS span_us,
          sum(CAST(((value + pv) / 2.0) * (ts_us - pt) AS DECIMAL(38,9)))::DOUBLE AS num
        FROM l WHERE pt IS NOT NULL
        GROUP BY 1, 2)
      SELECT event_type, day, n_seg, span_us,
        ${Oracle.qround("num / span_us")} AS twa
      FROM s WHERE span_us > 0
      ORDER BY event_type, day""")
  )

  /** Hour-of-day × event-type seasonality profile: counts and exact-decimal
    * mean value per (UTC hour, type) — the diurnal baseline an anomaly
    * monitor compares live traffic against (a spike is only a spike
    * relative to its hour's norm). The hour derives from `ts_us` by pure
    * integer arithmetic (floor-mod: pmod(ts_us, 86400e6) div 3600e6)
    * rather than an engine datetime function, so the bucketing is
    * bit-identical across engines and immune to calendar/timezone library
    * differences. Floor-mod, not `%`: Spark `%`/`div` truncate toward zero
    * while DuckDB `//` floors, so a pre-epoch timestamp (a shape
    * Tables.events supports — see SchemaDriftSpec's negative fixture)
    * would bucket differently and could even land outside 0..23; pmod on
    * the Spark side and an explicit double-mod on the oracle side keep
    * every ts_us, negative included, in 0..23 identically.
    *
    * Scale shape: one (hour, type) aggregate, partial+final — 24×|types|
    * output rows regardless of corpus size. */
  val qHourlyProfile = GraftQuery(
    "q_hourly_profile",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("hour", expr("pmod(ts_us, 86400000000) div 3600000000"))
        .groupBy($"hour", $"event_type")
        .agg(count(lit(1)).as("n_events"), Det.davg($"value").as("avg_value"))
        .orderBy($"hour", $"event_type")
    },
    Some(s"""
      SELECT (((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000)
          // 3600000000 AS hour,
        event_type, count(*)::BIGINT AS n_events,
        ${Oracle.davg("value")} AS avg_value
      FROM events
      GROUP BY hour, event_type
      ORDER BY hour, event_type""")
  )

  /** Maximum autocorrelation lag (days) for [[qAutocorr]]. */
  val MaxLag = 7

  /** Sample autocorrelation function of the daily value series per event
    * type, lags 1..[[MaxLag]] — the seasonality/persistence diagnostic run
    * before forecasting or anomaly thresholds are fit (a weekly cycle
    * shows as an acf(7) spike; q_value_trend fits the trend, this
    * measures what the trend leaves behind):
    *
    *   acf(k) = Σ_t (v_t − m)(v_{t−k} − m) / Σ_t (v_t − m)²
    *
    * Scale shape: the corpus collapses to the (type, day) daily aggregate
    * first (partial+final); everything after is day-domain-sized — ONE
    * type-partitioned Window computes all seven lag columns (the
    * q_ewma_metric discipline: one sort, seven frames), an unpivot fans
    * them to (type, k) rows, and the numerator/denominator aggregates run
    * over days × 7. Means and denominators are broadcast back. Exactness:
    * v and m are 6-dp via dsum/qround, deviation products go through
    * [[Det.dsum]]; a constant series (den = 0) yields NULL acf in both
    * engines instead of a NaN hash mismatch. */
  /** The (event_type, day, v) daily value series — the shared input of the
    * whole time-series family ([[qAutocorr]], [[qStlDecompose]],
    * [[qSeasonalForecast]]) and the fold target of the streaming
    * maintainer (graft.streaming.StreamDaily), so the four surfaces can
    * never drift. */
  private[graft] def dailyByType(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.withColumn("day", expr(s"ts_us div $DayUs"))
      .groupBy($"event_type", $"day")
      .agg(dsum($"value").as("v"))
  }

  /** The ACF readout over a daily series — see [[qAutocorr]]. */
  private[graft] def autocorrReport(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = dailyIn.sparkSession
    import spark.implicits._
    {
      // eager: the day-domain-sized series is consumed by the means
      // broadcast, the den broadcast AND the num chain — uncached, the
      // corpus-priced (type, day) aggregate lineage ran once per
      // consumer; cached it is a few rows per type per day (r17)
      val daily = Tables.eager(dailyIn)
      val means = daily.groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"), dsum($"v").as("sv"))
        .select($"event_type", Det.qround($"sv" / $"n_days").as("m"))
      val dev = daily.join(broadcast(means), Seq("event_type"))
        .withColumn("dd", $"v" - $"m")
      val den = dev.groupBy($"event_type")
        .agg(dsum($"dd" * $"dd").as("den"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val lagged = (1 to MaxLag).foldLeft(
          dev.select($"event_type", $"day", $"dd")) {
        case (df, k) => df.withColumn(s"d$k", lag($"dd", k).over(w))
      }
      val stackArgs = (1 to MaxLag).map(k => s"$k, d$k").mkString(", ")
      val num = lagged
        .selectExpr("event_type", "dd",
          s"stack($MaxLag, $stackArgs) as (k, dlag)")
        .filter($"dlag".isNotNull)
        .groupBy($"event_type", $"k")
        .agg(count(lit(1)).as("n_pairs"), dsum($"dd" * $"dlag").as("num"))
      num.join(broadcast(den), Seq("event_type"))
        .select($"event_type", $"k".cast(LongType).as("k"), $"n_pairs",
          when($"den" > 0, Det.qround($"num" / $"den"))
            .otherwise(lit(null).cast(DoubleType)).as("acf"))
        .orderBy($"event_type", $"k")
    }
  }

  /** χ²₀.₉₅ critical values for df = 1..7 (published table constants,
    * exact decimal literals) — [[qLjungBox]]'s rejection line. */
  val Chi2Crit95: Seq[Double] =
    Seq(3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067)

  /** Ljung–Box portmanteau test (Ljung & Box 1978) per event type — the
    * model-diagnostic that asks whether the daily series' first
    * [[MaxLag]] autocorrelations are JOINTLY zero ("is this series white
    * noise, or is there structure a forecaster is leaving on the
    * table"): Q = n(n+2)·Σ_{k≤m} r_k²/(n−k) ~ χ²(m) under H₀, compared
    * against the published 95% critical value. Rides the SAME acf
    * relation as q_autocorr (one shared daily collapse); lags with a
    * degenerate denominator drop and df adjusts.
    *
    * Exactness: r_k are the already-qrounded acf values; each Q term is
    * qrounded then decimal-summed over the ≤m-row lag relation (q_anova_f
    * discipline); the critical-value lookup is a CASE over integer df. Scale
    * shape: everything after the daily aggregate is bounded-domain
    * arithmetic. */
  /** The Ljung–Box readout over a (event_type, day, v) daily series —
    * shared by [[qLjungBox]] and graft.streaming.StreamDaily's fold, so
    * the maintained white-noise monitor can never drift from the batch
    * query (this is the FOURTH readout of the same maintained daily log,
    * after acf/STL/forecast — the one-state-many-readouts discipline). */
  private[graft] def ljungBoxReport(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = dailyIn.sparkSession
    import spark.implicits._
    // eager (was lazy persist): the nDays broadcast and the acf chain
    // raced the first materialization, each re-running the corpus-priced
    // daily aggregate lineage (r17)
    val daily = Tables.eager(dailyIn)
    val nDays = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
    val acf = autocorrReport(daily)
    val terms = acf.join(broadcast(nDays), Seq("event_type"))
      .filter($"acf".isNotNull && $"n" - $"k" > 0)
      .select($"event_type", $"n",
        Det.qround($"acf" * $"acf" / ($"n" - $"k")).as("t"))
    val crit = Chi2Crit95.zipWithIndex
      .map { case (c, i) => (i.toLong + 1, c) }.toDF("df", "crit")
    terms.groupBy($"event_type", $"n")
      .agg(count(lit(1)).as("df"),
        round(sum($"t".cast(DecimalType(38, 9))), 6).cast(DoubleType)
          .as("tsum"))
      .join(broadcast(crit), Seq("df"))
      .select($"event_type", $"n".as("n_days"), $"df",
        Det.qround($"n" * ($"n" + 2) * $"tsum").as("q_stat"),
        $"crit",
        (Det.qround($"n" * ($"n" + 2) * $"tsum") > $"crit")
          .as("reject_white_noise"))
      .orderBy($"event_type")
  }

  val qLjungBox = GraftQuery(
    "q_ljung_box",
    (spark, dir) =>
      ljungBoxReport(dailyByType(Tables.events(spark, dir))),
    Some(s"""
      WITH daily AS (
        SELECT event_type, epoch_us(ts) // $DayUs AS day,
          ${Oracle.dsum("value")} AS v
        FROM events GROUP BY 1, 2),
      nd AS (
        SELECT event_type, count(*)::BIGINT AS n FROM daily GROUP BY 1),
      means AS (
        SELECT event_type,
          ${Oracle.qround(s"${Oracle.dsum("v")} / count(*)")} AS m
        FROM daily GROUP BY event_type),
      dev AS (
        SELECT d.event_type, d.day, d.v - m.m AS dd
        FROM daily d JOIN means m USING (event_type)),
      den AS (
        SELECT event_type, ${Oracle.dsum("dd * dd")} AS den
        FROM dev GROUP BY 1),
      lagged AS (
        SELECT event_type, dd,
          ${(1 to MaxLag).map(k => s"lag(dd, $k) OVER w AS d$k").mkString(", ")}
        FROM dev
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      stacked AS (
        SELECT event_type, k, dd,
          CASE k ${(1 to MaxLag).map(k => s"WHEN $k THEN d$k").mkString(" ")}
          END AS dlag
        FROM lagged
        CROSS JOIN (SELECT unnest(range(1, ${MaxLag + 1})) AS k)),
      num AS (
        SELECT event_type, k, ${Oracle.dsum("dd * dlag")} AS num
        FROM stacked WHERE dlag IS NOT NULL
        GROUP BY event_type, k),
      acf AS (
        SELECT n.event_type, n.k,
          CASE WHEN d.den > 0
            THEN ${Oracle.qround("n.num / d.den")} END AS acf
        FROM num n JOIN den d USING (event_type)),
      terms AS (
        SELECT a.event_type, nd.n,
          ${Oracle.qround("a.acf * a.acf / (nd.n - a.k)")} AS t
        FROM acf a JOIN nd USING (event_type)
        WHERE a.acf IS NOT NULL AND nd.n - a.k > 0),
      agg AS (
        SELECT event_type, n, count(*)::BIGINT AS df,
          round(sum(CAST(t AS DECIMAL(38,9))), 6)::DOUBLE AS tsum
        FROM terms GROUP BY event_type, n),
      crit AS (
        SELECT unnest(range(1, ${Chi2Crit95.size + 1}))::BIGINT AS df,
          unnest([${Chi2Crit95.mkString(", ")}]) AS crit)
      SELECT event_type, n AS n_days, df,
        ${Oracle.qround("n * (n + 2) * tsum")} AS q_stat, crit,
        (${Oracle.qround("n * (n + 2) * tsum")} > crit)
          AS reject_white_noise
      FROM agg JOIN crit USING (df)
      ORDER BY event_type""")
  )

  /** Single-changepoint detection over the daily value series — the
    * offline AMOC (at-most-one-change) scan via binary segmentation
    * (Scott & Knott 1974 lineage; the first step of every changepoint
    * stack and the offline companion to q_cusum_drift's online monitor):
    * for every candidate split after day d, the between-segment sum of
    * squares BSS = n_L(m̄_L − m̄)² + n_R(m̄_R − m̄)² from exact prefix
    * sums; the argmax is the estimated changepoint. Every candidate row
    * is emitted with its BSS (the scan profile a reviewer reads to judge
    * whether the peak is sharp or the series is just drifting), the
    * winner flagged; ties break to the earlier day.
    *
    * Exactness: daily masses are [[Det.dsum]]-rounded once; prefix sums
    * ride DECIMAL(38,9) windows over the ≤|days|-row relation (never
    * float prefix sums — the q_ks_test lesson); BSS is one IEEE tree per
    * candidate, identical in both engines, so the argmax cannot flip.
    * Scale shape: ONE corpus aggregate to the day domain; everything
    * downstream is windows over that bounded relation. */
  /** UNROUNDED per-day decimal value masses — ADDITIVE (the fdr/ate/did
    * discipline), so graft.streaming.StreamCpt maintains this relation
    * per micro-batch; the fold rounds once through [[cptFinish]]. */
  private[graft] def cptDailyDec(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.groupBy(expr(s"ts_us div $DayUs").as("day"))
      .agg(sum($"value".cast(DecimalType(38, 9))).as("v_d"))
  }

  /** Round each decimal daily mass once (the Det.dsum output shape). */
  private[graft] def cptFinish(dec: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = dec.sparkSession
    import spark.implicits._
    dec.select($"day", round($"v_d", 6).cast(DoubleType).as("v"))
  }

  /** The AMOC scan over a finished (day, v) relation — shared by
    * [[qChangepoint]] and the streaming maintainer. */
  private[graft] def cptReport(daily: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = daily.sparkSession
    import spark.implicits._
    {
      val W = org.apache.spark.sql.expressions.Window
      val wc = W.orderBy($"day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val tot = daily.agg(count(lit(1)).as("n"),
        sum($"v".cast(DecimalType(38, 9))).cast(DoubleType).as("sv"))
      val cand = daily
        .withColumn("nl", count(lit(1)).over(wc))
        .withColumn("sl",
          sum($"v".cast(DecimalType(38, 9))).over(wc).cast(DoubleType))
        .crossJoin(broadcast(tot))
        .filter($"nl" < $"n") // right segment must be non-empty
        .withColumn("ml", $"sl" / $"nl")
        .withColumn("mr", ($"sv" - $"sl") / ($"n" - $"nl"))
        .withColumn("m", $"sv" / $"n")
        .withColumn("bss0",
          $"nl" * ($"ml" - $"m") * ($"ml" - $"m") +
            ($"n" - $"nl") * ($"mr" - $"m") * ($"mr" - $"m"))
      cand
        .withColumn("rk", row_number().over(
          W.orderBy($"bss0".desc, $"day")))
        .select($"day", $"nl".as("n_left"), ($"n" - $"nl").as("n_right"),
          Det.qround($"ml").as("mean_left"),
          Det.qround($"mr").as("mean_right"),
          Det.qround($"bss0").as("bss"),
          ($"rk" === 1).as("is_changepoint"))
        .orderBy($"day")
    }
  }

  val qChangepoint = GraftQuery(
    "q_changepoint",
    (spark, dir) =>
      cptReport(cptFinish(cptDailyDec(Tables.events(spark, dir)))),
    Some(s"""
      WITH daily AS (
        SELECT epoch_us(ts) // $DayUs AS day, ${Oracle.dsum("value")} AS v
        FROM events GROUP BY 1),
      tot AS (
        SELECT count(*)::BIGINT AS n,
          sum(CAST(v AS DECIMAL(38,9)))::DOUBLE AS sv
        FROM daily),
      cand AS (
        SELECT day,
          (count(*) OVER w)::BIGINT AS nl,
          (sum(CAST(v AS DECIMAL(38,9))) OVER w)::DOUBLE AS sl
        FROM daily
        WINDOW w AS (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      scored AS (
        SELECT day, nl, n - nl AS nr,
          sl / nl AS ml, (sv - sl) / (n - nl) AS mr, sv / n AS m,
          nl * (sl / nl - sv / n) * (sl / nl - sv / n)
            + (n - nl) * ((sv - sl) / (n - nl) - sv / n)
              * ((sv - sl) / (n - nl) - sv / n) AS bss0
        FROM cand CROSS JOIN tot
        WHERE nl < n),
      ranked AS (
        SELECT *, row_number() OVER (ORDER BY bss0 DESC, day) AS rk
        FROM scored)
      SELECT day, nl AS n_left, nr AS n_right,
        ${Oracle.qround("ml")} AS mean_left,
        ${Oracle.qround("mr")} AS mean_right,
        ${Oracle.qround("bss0")} AS bss,
        (rk = 1) AS is_changepoint
      FROM ranked
      ORDER BY day""")
  )

  val qAutocorr = GraftQuery(
    "q_autocorr",
    (spark, dir) => autocorrReport(dailyByType(Tables.events(spark, dir))),
    Some(s"""
      WITH daily AS (
        SELECT event_type, epoch_us(ts) // $DayUs AS day,
          ${Oracle.dsum("value")} AS v
        FROM events GROUP BY 1, 2),
      means AS (
        SELECT event_type,
          ${Oracle.qround(s"${Oracle.dsum("v")} / count(*)")} AS m
        FROM daily GROUP BY event_type),
      dev AS (
        SELECT d.event_type, d.day, d.v - m.m AS dd
        FROM daily d JOIN means m USING (event_type)),
      den AS (
        SELECT event_type, ${Oracle.dsum("dd * dd")} AS den
        FROM dev GROUP BY 1),
      lagged AS (
        SELECT event_type, dd,
          ${(1 to 7).map(k => s"lag(dd, $k) OVER w AS d$k").mkString(", ")}
        FROM dev
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      stacked AS (
        SELECT event_type, k, dd,
          CASE k ${(1 to 7).map(k => s"WHEN $k THEN d$k").mkString(" ")}
          END AS dlag
        FROM lagged CROSS JOIN (SELECT unnest(range(1, 8)) AS k)),
      num AS (
        SELECT event_type, k, count(*) AS n_pairs,
          ${Oracle.dsum("dd * dlag")} AS num
        FROM stacked WHERE dlag IS NOT NULL GROUP BY 1, 2)
      SELECT n.event_type, n.k, n.n_pairs,
        CASE WHEN den > 0 THEN ${Oracle.qround("num / den")} END AS acf
      FROM num n JOIN den USING (event_type)
      ORDER BY event_type, k""")
  )

  /** Cross-correlation function of the click and purchase daily value
    * series at lags −7..+7 — the leading-indicator diagnostic beside
    * [[qAutocorr]] (does click volume LEAD purchase volume, and by how
    * many days?):
    *
    *   ccf(k) = Σ_t (x_t − m_x)(y_{t+k} − m_y) / √(Σ(x−m_x)² · Σ(y−m_y)²)
    *
    * The day grid is the corpus's activity days; a day with no events of
    * one type contributes 0 to that type's series (zero-fill inside the
    * SAME daily aggregate — no pivot, no second scan). Scale shape: one
    * corpus pass to the daily pair series; the lag alignment is a
    * day-domain self-join against the broadcast 15-row lag list —
    * everything past the daily aggregate is day-domain-sized. Means,
    * deviations and the denominator follow the q_autocorr determinism
    * recipe (dsum/qround); denominator zero (a constant series) yields
    * NULL ccf in both engines. */
  val qCrossCorr = GraftQuery(
    "q_cross_corr",
    (spark, dir) => {
      import spark.implicits._
      val daily = Tables.events(spark, dir)
        .withColumn("day", expr(s"ts_us div $DayUs"))
        .groupBy($"day")
        .agg(
          dsum(when($"event_type" === "click", $"value").otherwise(lit(0.0)))
            .as("x"),
          dsum(when($"event_type" === "purchase", $"value").otherwise(lit(0.0)))
            .as("y"))
      val means = daily
        .agg(count(lit(1)).as("n"), dsum($"x").as("sx"), dsum($"y").as("sy"))
        .select(Det.qround($"sx" / $"n").as("mx"),
          Det.qround($"sy" / $"n").as("my"))
      val dev = daily.crossJoin(broadcast(means))
        .select($"day", ($"x" - $"mx").as("dx"), ($"y" - $"my").as("dy"))
      val den = dev.agg(dsum($"dx" * $"dx").as("sxx"),
        dsum($"dy" * $"dy").as("syy"))
      val lags = spark.range(-7, 8).toDF("k")
      val pairs = dev.as("a")
        .crossJoin(broadcast(lags))
        .join(dev.as("b"), $"b.day" === $"a.day" + $"k")
        .groupBy($"k")
        .agg(count(lit(1)).as("n_pairs"), dsum($"a.dx" * $"b.dy").as("num"))
      pairs.crossJoin(broadcast(den))
        .select($"k", $"n_pairs",
          when($"sxx" * $"syy" > 0,
            Det.qround($"num" / sqrt($"sxx" * $"syy")))
            .otherwise(lit(null).cast(DoubleType)).as("ccf"))
        .orderBy($"k")
    },
    Some(s"""
      WITH daily AS (
        SELECT epoch_us(ts) // $DayUs AS day,
          ${Oracle.dsum("CASE WHEN event_type = 'click' THEN value ELSE 0e0 END")}
            AS x,
          ${Oracle.dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0e0 END")}
            AS y
        FROM events GROUP BY 1),
      means AS (
        SELECT ${Oracle.qround(s"${Oracle.dsum("x")} / count(*)")} AS mx,
          ${Oracle.qround(s"${Oracle.dsum("y")} / count(*)")} AS my
        FROM daily),
      dev AS (
        SELECT day, x - mx AS dx, y - my AS dy
        FROM daily CROSS JOIN means),
      den AS (
        SELECT ${Oracle.dsum("dx * dx")} AS sxx,
          ${Oracle.dsum("dy * dy")} AS syy
        FROM dev),
      lags AS (SELECT unnest(range(-7, 8)) AS k),
      pairs AS (
        SELECT l.k, count(*) AS n_pairs,
          ${Oracle.dsum("a.dx * b.dy")} AS num
        FROM dev a CROSS JOIN lags l JOIN dev b ON b.day = a.day + l.k
        GROUP BY l.k)
      SELECT k, n_pairs,
        CASE WHEN sxx * syy > 0 THEN
          ${Oracle.qround("num / sqrt(sxx * syy)")}
        END AS ccf
      FROM pairs CROSS JOIN den
      ORDER BY k""")
  )

  /** Classical seasonal decomposition (moving-average flavor, the STL
    * ancestor) of the per-type daily value series: v = trend + seasonal +
    * residual, with trend = centered 7-day moving average (defined only
    * where the full window exists), seasonal = the mean detrended value of
    * the day-of-week slot, residual = what's left — the decomposition a
    * metrics pipeline runs before alerting on "weekday dip or real drop?".
    *
    * Determinism: a FLOAT windowed average is a cross-engine hazard
    * (Spark's running frame vs DuckDB's segment tree can disagree in the
    * last ulp — the q_t_closeness lesson), so the trend window sums
    * DECIMAL-cast addends (exact, order-free) and divides once; seasonal
    * means go through dsum/qround. Scale shape: one corpus pass to the
    * (type, day) aggregate; the trend window and the 7-row-per-type
    * seasonal relation are day-domain-sized, partitioned by type. */
  /** The decomposition readout over a daily series — see
    * [[qStlDecompose]]. */
  private[graft] def stlReport(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = dailyIn.sparkSession
    import spark.implicits._
    {
      // eager: trended is derived twice (the seasonal broadcast and the
      // final join's left side) — uncached, each derivation re-ran the
      // corpus-priced daily aggregate; the cache is day-domain-sized (r17)
      val daily = Tables.eager(dailyIn)
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(-3, 3)
      val trended = daily
        .withColumn("win_n", count(lit(1)).over(w))
        .withColumn("trend",
          when($"win_n" === 7, Det.qround(
            sum($"v".cast(DecimalType(38, Det.Scale))).over(w)
              .cast(DoubleType) / lit(7.0))))
        .withColumn("detr", $"v" - $"trend")
      val seasonal = trended.filter($"trend".isNotNull)
        .groupBy($"event_type", ($"day" % 7).as("dow"))
        .agg(count(lit(1)).as("ns"), dsum($"detr").as("sd"))
        .select($"event_type", $"dow",
          Det.qround($"sd" / $"ns").as("seasonal"))
      trended.as("t")
        .join(broadcast(seasonal.select($"event_type".as("s_type"),
            $"dow", $"seasonal")),
          $"t.event_type" === $"s_type" && ($"t.day" % 7) === $"dow",
          "left")
        .select($"t.event_type".as("event_type"), $"t.day".as("day"),
          $"t.v".as("v"), $"t.trend".as("trend"),
          when($"t.trend".isNotNull, $"seasonal").as("seasonal"),
          when($"t.trend".isNotNull,
            Det.qround($"t.v" - $"t.trend" - $"seasonal")).as("residual"))
        .orderBy($"event_type", $"day")
    }
  }

  val qStlDecompose = GraftQuery(
    "q_stl_decompose",
    (spark, dir) => stlReport(dailyByType(Tables.events(spark, dir))),
    Some(s"""
      WITH daily AS (
        SELECT event_type, epoch_us(ts) // $DayUs AS day,
          ${Oracle.dsum("value")} AS v
        FROM events GROUP BY 1, 2),
      trended AS (
        SELECT event_type, day, v,
          CASE WHEN count(*) OVER w = 7 THEN
            ${Oracle.qround(
              "(sum(CAST(v AS DECIMAL(38,9))) OVER w)::DOUBLE / 7e0")}
          END AS trend
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      seasonal AS (
        SELECT event_type, day % 7 AS dow,
          ${Oracle.qround(s"${Oracle.dsum("v - trend")} / count(*)")}
            AS seasonal
        FROM trended WHERE trend IS NOT NULL
        GROUP BY 1, 2)
      SELECT t.event_type, t.day, t.v, t.trend,
        CASE WHEN t.trend IS NOT NULL THEN s.seasonal END AS seasonal,
        CASE WHEN t.trend IS NOT NULL THEN
          ${Oracle.qround("t.v - t.trend - s.seasonal")}
        END AS residual
      FROM trended t
      LEFT JOIN seasonal s
        ON s.event_type = t.event_type AND s.dow = t.day % 7
      ORDER BY t.event_type, t.day""")
  )

  /** Backtest horizon (days) for [[qSeasonalForecast]] — the final H days
    * of the corpus are the holdout; also the seasonal period (weekly). */
  val ForecastHorizon = 7

  /** Seasonal-naive forecast backtest with MASE — the forecasting readout
    * that closes the time-series ladder (q_value_trend fits the trend,
    * [[qAutocorr]] finds the weekly cycle, [[qStlDecompose]] splits it
    * out; this MEASURES whether the cycle actually predicts): hold out
    * the final [[ForecastHorizon]] days of each type's daily value
    * series, forecast each holdout day with the seasonal-naive rule
    * ŷ(t) = v(t − 7), and score with MAE/RMSE plus MASE — the
    * scale-free standard (Hyndman & Koehler 2006) whose denominator is
    * the TRAIN-side mean absolute one-step naive error, so MASE < 1
    * means "beats naive one-step"; it is the only error measure here
    * that is comparable across types of different volume.
    *
    * The series is the ZERO-FILLED (type × full day grid) — a day
    * without events is a zero-valued observation, not a missing row (the
    * q_cross_corr convention; a row-lag over observed days only would
    * silently compare across gaps). Exactness: daily v via dsum (6-dp);
    * lag alignment is exact integer day arithmetic on the complete grid
    * (row-lag ≡ day-lag by construction); |error| aggregates are
    * decimal-summed with [[Det.qround]]ed outputs; RMSE's per-day
    * squared error is prerounded before the decimal sum (the q_anova_f
    * discipline). A zero train scale (constant train series) yields NULL
    * mase, not NaN.
    *
    * Scale shape: ONE corpus pass to the (type, day) aggregate; the grid
    * completion is a broadcast day-spine cross join against the bounded
    * type dimension; the lag window and both reductions are
    * day-domain-sized, partitioned by type. */
  /** The backtest readout over a daily series — see
    * [[qSeasonalForecast]]. */
  private[graft] def forecastReport(dailyIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = dailyIn.sparkSession
    import spark.implicits._
    {
      val H = ForecastHorizon
      // eager (was lazy persist): the bounds broadcast, the spine
      // broadcast and the grid join all raced the first materialization
      // — Prof showed SIX concurrent re-executions of the daily exchange
      // on the cold path (r17)
      val daily = Tables.eager(dailyIn)
      val bounds = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      val spine = bounds.select(explode(sequence($"d0", $"d1")).as("day"))
      val types = daily.select($"event_type").distinct()
      val grid = types.crossJoin(broadcast(spine))
        .join(daily, Seq("event_type", "day"), "left")
        .na.fill(0.0, Seq("v"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val lagged = grid
        .withColumn("v_lag7", lag($"v", H).over(w))
        .withColumn("v_lag1", lag($"v", 1).over(w))
        .crossJoin(broadcast(bounds))
        .withColumn("is_test", $"day" > $"d1" - H)
      val test = lagged.filter($"is_test" && $"v_lag7".isNotNull)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_test"),
          Det.dsum(abs($"v" - $"v_lag7")).as("sae"),
          Det.dsum(Det.qround(($"v" - $"v_lag7") * ($"v" - $"v_lag7")))
            .as("sse"))
        .select($"event_type", $"n_test",
          Det.qround($"sae" / $"n_test").as("mae"),
          Det.qround(sqrt($"sse" / $"n_test")).as("rmse"))
      val scale = lagged.filter(!$"is_test" && $"v_lag1".isNotNull)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_train"),
          Det.dsum(abs($"v" - $"v_lag1")).as("snae"))
        .select($"event_type", $"n_train",
          Det.qround($"snae" / $"n_train").as("naive_mae"))
      test.join(scale, Seq("event_type"))
        .select($"event_type", $"n_train", $"n_test", $"mae", $"rmse",
          $"naive_mae",
          when($"naive_mae" > 0, Det.qround($"mae" / $"naive_mae"))
            .as("mase"))
        .orderBy($"event_type")
    }
  }

  val qSeasonalForecast = GraftQuery(
    "q_seasonal_forecast",
    (spark, dir) => forecastReport(dailyByType(Tables.events(spark, dir))),
    Some(s"""
      WITH daily AS (
        SELECT event_type, epoch_us(ts) // $DayUs AS day,
          ${Oracle.dsum("value")} AS v
        FROM events GROUP BY 1, 2),
      bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      spine AS (
        SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds),
      grid AS (
        SELECT t.event_type, s.day, coalesce(d.v, 0e0) AS v
        FROM (SELECT DISTINCT event_type FROM daily) t
        CROSS JOIN spine s
        LEFT JOIN daily d USING (event_type, day)),
      lagged AS (
        SELECT g.*, b.d1,
          lag(v, $ForecastHorizon) OVER w AS v_lag7,
          lag(v, 1) OVER w AS v_lag1
        FROM grid g CROSS JOIN bounds b
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      test AS (
        SELECT event_type, count(*) AS n_test,
          ${Oracle.qround(s"${Oracle.dsum("abs(v - v_lag7)")} / count(*)")}
            AS mae,
          ${Oracle.qround(s"sqrt(${Oracle.dsum(
            Oracle.qround("(v - v_lag7) * (v - v_lag7)"))} / count(*))")}
            AS rmse
        FROM lagged
        WHERE day > d1 - $ForecastHorizon AND v_lag7 IS NOT NULL
        GROUP BY 1),
      scl AS (
        SELECT event_type, count(*) AS n_train,
          ${Oracle.qround(s"${Oracle.dsum("abs(v - v_lag1)")} / count(*)")}
            AS naive_mae
        FROM lagged
        WHERE day <= d1 - $ForecastHorizon AND v_lag1 IS NOT NULL
        GROUP BY 1)
      SELECT event_type, n_train::BIGINT AS n_train, n_test::BIGINT AS n_test,
        mae, rmse, naive_mae,
        CASE WHEN naive_mae > 0 THEN ${Oracle.qround("mae / naive_mae")}
        END AS mase
      FROM test JOIN scl USING (event_type)
      ORDER BY event_type""")
  )

  /** Theil–Sen robust trend of the per-type daily series — the
    * breakdown-resistant counterpart of q_value_trend's OLS (one wild day
    * drags a least-squares slope arbitrarily; the median of pairwise
    * slopes shrugs off up to ~29% contamination — the estimator a
    * metrics pipeline wants under exactly the outliers q_outlier_events
    * exists to find). Slope = median over all day pairs of
    * (v_j − v_i)/(x_j − x_i); intercept = median of (v_i − slope·x_i).
    *
    * Exactness: pairwise slopes are single IEEE divisions of 6-dp-stable
    * numerators by exact integer day gaps, [[Det.qround]]ed BEFORE
    * ranking so both engines rank identical values (ties pinned by the
    * pair key); the even-count median is the qround'ed mean of the two
    * middle order statistics. Scale shape: the corpus collapses to the
    * (type, day) aggregate first; the pair self-join, both median
    * windows and the residual pass are all day-domain-sized (≤ C(days,2)
    * rows per type — bounded by the calendar, not the corpus). */
  val qTheilSen = GraftQuery(
    "q_theil_sen",
    (spark, dir) => {
      import spark.implicits._
      val lo0 = dailyByType(Tables.events(spark, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lo = lo0.agg(min($"day").as("lo"))
      val daily = lo0.crossJoin(broadcast(lo))
        .select($"event_type", ($"day" - $"lo").as("x"), $"v")
      val W = org.apache.spark.sql.expressions.Window
      def medianOf(df: org.apache.spark.sql.DataFrame, c: String,
          tieCols: Seq[String], out: String) = {
        val w = W.partitionBy($"event_type")
          .orderBy(col(c) +: tieCols.map(col): _*)
        df.withColumn("rn", row_number().over(w))
          .withColumn("m", count(lit(1)).over(W.partitionBy($"event_type")))
          // integer div, NOT Column./ (which is double division): the two
          // middle order statistics, coinciding when m is odd
          .filter(expr("rn = (m + 1) div 2 OR rn = m div 2 + 1"))
          .groupBy($"event_type")
          .agg(max($"m").as(s"n_$out"), Det.qround(avg(col(c))).as(out))
      }
      val slopes = daily.as("a").join(daily.as("b"),
          $"a.event_type" === $"b.event_type" && $"b.x" > $"a.x")
        .select($"a.event_type".as("event_type"), $"a.x".as("xa"),
          $"b.x".as("xb"),
          Det.qround(($"b.v" - $"a.v") /
            ($"b.x" - $"a.x").cast(DoubleType)).as("s"))
      val slope = medianOf(slopes, "s", Seq("xa", "xb"), "pairs")
        .select($"event_type", $"n_pairs", $"pairs".as("ts_slope"))
      val resid = daily.join(broadcast(slope), Seq("event_type"))
        .select($"event_type", $"n_pairs", $"ts_slope", $"x",
          Det.qround($"v" - $"ts_slope" * $"x").as("r"))
      medianOf(resid, "r", Seq("x"), "days")
        .select($"event_type", $"n_days", $"days".as("ts_intercept"))
        .join(slope, Seq("event_type"))
        .select($"event_type", $"n_days", $"n_pairs", $"ts_slope",
          $"ts_intercept")
        .orderBy($"event_type")
    },
    Some(s"""
      WITH daily0 AS (
        SELECT event_type, epoch_us(ts) // $DayUs AS day,
          ${Oracle.dsum("value")} AS v
        FROM events GROUP BY 1, 2),
      lo AS (SELECT min(day) AS lo FROM daily0),
      daily AS (
        SELECT event_type, day - lo AS x, v FROM daily0 CROSS JOIN lo),
      slopes AS (
        SELECT a.event_type, a.x AS xa, b.x AS xb,
          ${Oracle.qround("(b.v - a.v) / (b.x - a.x)::DOUBLE")} AS s
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.x > a.x),
      sr AS (
        SELECT event_type, s,
          row_number() OVER (PARTITION BY event_type
            ORDER BY s, xa, xb) AS rn,
          count(*) OVER (PARTITION BY event_type) AS m
        FROM slopes),
      slope AS (
        SELECT event_type, max(m)::BIGINT AS n_pairs,
          ${Oracle.qround("avg(s)")} AS ts_slope
        FROM sr WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        GROUP BY event_type),
      resid AS (
        SELECT d.event_type,
          ${Oracle.qround("v - ts_slope * x")} AS r, d.x
        FROM daily d JOIN slope USING (event_type)),
      rr AS (
        SELECT event_type, r,
          row_number() OVER (PARTITION BY event_type ORDER BY r, x) AS rn,
          count(*) OVER (PARTITION BY event_type) AS m
        FROM resid),
      icept AS (
        SELECT event_type, max(m)::BIGINT AS n_days,
          ${Oracle.qround("avg(r)")} AS ts_intercept
        FROM rr WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        GROUP BY event_type)
      SELECT event_type, n_days, n_pairs, ts_slope, ts_intercept
      FROM icept JOIN slope USING (event_type)
      ORDER BY event_type""")
  )

  val all: Seq[GraftQuery] = Seq(
    qRollupActivity, qValueQuantiles, qValueQuantilesApprox,
    qEventTimerange, qDedupKeepLast, qWindowFilter6h, qRollingMetric,
    qLatestMetric, qActivityDaily, qTop3EventTypes, qUnionMetrics, qJsonProps,
    qMembershipFilter, qTumblingWindow, qSlidingWindow, qSessionize,
    qSessionPaths,
    qPivotDaily, qCubeActivity, qEventValueStats, qValueMoments,
    qUnpivotDaily, qVariantProps,
    qGapFill, qUpsertMerge, qValueTrend, qEventPaths, qEwmaMetric,
    qWinsorizedStats, qIncrementalAgg, qTimeWeightedAvg, qHourlyProfile,
    qAutocorr, qCrossCorr, qStlDecompose, qSeasonalForecast, qTheilSen,
    qSnapshotDiff, qChangepoint, qLjungBox)

  /** Snapshot diff — the read-side companion of [[qUpsertMerge]]'s MERGE:
    * given two versions of a keyed table, report what changed (the audit a
    * pipeline runs between ingest versions before promoting one). The two
    * versions are derived DETERMINISTICALLY from `orders` with disjoint
    * salted-hash carve-outs: 'old' misses h%20 = 0 keys (they read as
    * ADDED), 'new' misses h%23 = 0 keys (REMOVED) and perturbs h%17 = 0
    * prices by +1.00 (CHANGED); everything else is UNCHANGED. Per status:
    * row count and the total absolute price drift (decimal-exact).
    *
    * Scale shape: one full-outer join on the key — the unavoidable diff
    * shuffle (bucketed/co-partitioned snapshots would make it
    * exchange-free, the BucketingSpec layout); the status/delta logic is
    * map-side on the joined row. */
  lazy val qSnapshotDiff = GraftQuery(
    "q_snapshot_diff",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
        .select($"o_orderkey".as("k"), $"o_totalprice",
          expr(PipelineOps.u32Expr(
            "concat('v:', cast(o_orderkey as string))")).as("h"))
      val old = o.filter($"h" % 20 =!= 0)
        .select($"k", $"o_totalprice".as("po"))
      val neu = o.filter($"h" % 23 =!= 0)
        .select($"k",
          when($"h" % 17 === 0, $"o_totalprice" + lit(1.0))
            .otherwise($"o_totalprice").as("pn"))
      old.join(neu, Seq("k"), "full_outer")
        .select(
          when($"po".isNull, "added")
            .when($"pn".isNull, "removed")
            .when($"pn" =!= $"po", "changed")
            .otherwise("unchanged").as("status"),
          when($"po".isNotNull && $"pn".isNotNull, abs($"pn" - $"po"))
            .otherwise(lit(0.0)).as("dp"))
        .groupBy($"status")
        .agg(count(lit(1)).as("n"),
          graft.functions.Det.dsum($"dp").as("abs_price_delta"))
        .orderBy($"status")
    },
    Some(s"""
      WITH o AS (
        SELECT o_orderkey AS k, o_totalprice,
          ${PipelineOps.u32Sql("'v:' || CAST(o_orderkey AS VARCHAR)")} AS h
        FROM orders),
      old AS (SELECT k, o_totalprice AS po FROM o WHERE h % 20 != 0),
      nw AS (SELECT k,
          CASE WHEN h % 17 = 0 THEN o_totalprice + 1.0
            ELSE o_totalprice END AS pn
        FROM o WHERE h % 23 != 0),
      d AS (
        SELECT
          CASE WHEN po IS NULL THEN 'added'
            WHEN pn IS NULL THEN 'removed'
            WHEN pn != po THEN 'changed'
            ELSE 'unchanged' END AS status,
          CASE WHEN po IS NOT NULL AND pn IS NOT NULL THEN abs(pn - po)
            ELSE 0.0 END AS dp
        FROM old FULL OUTER JOIN nw USING (k))
      SELECT status, count(*)::BIGINT AS n,
        ${graft.Oracle.dsum("dp")} AS abs_price_delta
      FROM d GROUP BY 1 ORDER BY 1""")
  )
}
