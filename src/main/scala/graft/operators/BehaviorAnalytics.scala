package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.Det
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** User-behavior analytics over `events` — the product-analytics trio every
  * event pipeline ships:
  *
  *  - ordered conversion funnel (signup → click-after-signup →
  *    purchase-after-that-click), each stage anchored at the FIRST
  *    qualifying event of the previous stage;
  *  - cohort retention matrix (cohort = a user's first active day; cell =
  *    distinct users of that cohort active `offset` days later);
  *  - statistical outlier detection (|z| > 3 against per-type moments) —
  *    the cheap anomaly screen that runs before any model does.
  *
  * Physical design: all three key every shuffle on `user_id` or a bounded
  * dimension. The funnel is three user-keyed aggregates whose joins reuse
  * one hash partitioning (Spark plans a single exchange per side and reuses
  * it across stages); retention reduces events to distinct (user, day) rows
  * first — the only corpus-sized exchange — and every later join is against
  * a days×days bounded table; outliers broadcast a 5-row moments table back
  * onto a map-only scan. Per-type moments come from ONE pass of decimal
  * raw sums (sum, sum of squares) — the same order-independent trick as
  * q_value_trend — so mean/σ are bit-identical across engines and the
  * z-filter decisions cannot drift.
  */
object BehaviorAnalytics {

  private[graft] val DayUs = 24L * 3600 * 1000000

  /** Funnel stage spine: event types in conversion order. */
  val FunnelStages: Seq[String] = Seq("signup", "click", "purchase")

  /** Shared stage-count → conversion readout over a (stage, n_users)
    * relation (possibly sparse — the spine densifies missing stages to
    * 0), used by [[qEventFunnel]] and the streaming maintainer
    * graft.streaming.StreamFunnel so the two surfaces cannot drift. */
  private[graft] def funnelReport(stageCounts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = stageCounts.sparkSession
    import spark.implicits._
    val spine = FunnelStages.zipWithIndex
      .map { case (s, i) => (i + 1, s) }.toDF("stage", "step")
    val dense = spine.join(stageCounts, Seq("stage"), "left")
      .select($"stage", $"step", coalesce($"n_users", lit(0L)).as("n_users"))
    val n0 = dense.filter($"stage" === 1).select($"n_users".as("n0"))
    dense.crossJoin(broadcast(n0))
      .select($"stage", $"step", $"n_users",
        when($"n0" > 0,
          Det.qround($"n_users".cast(DoubleType) / $"n0")).as("conv_frac"))
      .orderBy($"stage")
  }

  val qEventFunnel = GraftQuery(
    "q_event_funnel",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"user_id", $"event_type", $"ts_us")
      // the per-user stage tables are each consumed 2-3 times (next stage's
      // join + the stage count + the conversion denominator): persist them
      // so each stage's events pass runs once — same barrier rationale as
      // q_contamination's shingles
      val t1 = ev.filter($"event_type" === FunnelStages(0))
        .groupBy($"user_id").agg(min($"ts_us").as("t1"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t2 = ev.join(t1, Seq("user_id"))
        .filter($"event_type" === FunnelStages(1) && $"ts_us" > $"t1")
        .groupBy($"user_id").agg(min($"ts_us").as("t2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t3 = ev.join(t2, Seq("user_id"))
        .filter($"event_type" === FunnelStages(2) && $"ts_us" > $"t2")
        .groupBy($"user_id").agg(min($"ts_us").as("t3"))
      val counts = t1.agg(count(lit(1)).as("n_users"))
        .select(lit(1).as("stage"), $"n_users")
        .unionByName(t2.agg(count(lit(1)).as("n_users"))
          .select(lit(2).as("stage"), $"n_users"))
        .unionByName(t3.agg(count(lit(1)).as("n_users"))
          .select(lit(3).as("stage"), $"n_users"))
      funnelReport(counts)
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      t1 AS (
        SELECT user_id, min(ts_us) AS t1 FROM ev
        WHERE event_type = '${FunnelStages(0)}' GROUP BY user_id),
      t2 AS (
        SELECT e.user_id, min(ts_us) AS t2 FROM ev e JOIN t1 USING (user_id)
        WHERE event_type = '${FunnelStages(1)}' AND ts_us > t1
        GROUP BY e.user_id),
      t3 AS (
        SELECT e.user_id, min(ts_us) AS t3 FROM ev e JOIN t2 USING (user_id)
        WHERE event_type = '${FunnelStages(2)}' AND ts_us > t2
        GROUP BY e.user_id),
      c AS (
        SELECT 1 AS stage, '${FunnelStages(0)}' AS step, count(*) AS n FROM t1
        UNION ALL
        SELECT 2, '${FunnelStages(1)}', count(*) FROM t2
        UNION ALL
        SELECT 3, '${FunnelStages(2)}', count(*) FROM t3),
      n0 AS (SELECT count(*) AS n0 FROM t1)
      SELECT stage, step, n::BIGINT AS n_users,
        CASE WHEN n0 > 0 THEN ${Oracle.qround("n::DOUBLE / n0")} END AS conv_frac
      FROM c CROSS JOIN n0
      ORDER BY stage""")
  )

  /** Shared lag readout over a (stage ∈ {1,2}, d) transition-duration
    * relation — used by [[qFunnelLag]] and the streaming maintainer
    * graft.streaming.StreamFunnel's second readout (one delta log, two
    * reports), so the surfaces cannot drift. Missing transitions
    * densify to (0, NULL, NULL, NULL) over the spine. */
  private[graft] def funnelLagReport(lags: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = lags.sparkSession
    import spark.implicits._
    val spine = Seq(
      (1, s"${FunnelStages(0)}->${FunnelStages(1)}"),
      (2, s"${FunnelStages(1)}->${FunnelStages(2)}"))
      .toDF("stage", "transition")
    val stats = lags.groupBy($"stage")
      .agg(count(lit(1)).as("nu"),
        sum(expr("CAST(d AS DECIMAL(38,0))")).as("sd"),
        expr("percentile(d, 0.5)").as("q50"),
        expr("percentile(d, 0.9)").as("q90"))
    spine.join(stats, Seq("stage"), "left")
      .select($"stage", $"transition",
        coalesce($"nu", lit(0L)).as("n_users"),
        when($"nu" > 0,
          Det.qround(expr("CAST(sd AS DOUBLE) / nu"))).as("mean_us"),
        Det.qround($"q50").as("p50_us"),
        Det.qround($"q90").as("p90_us"))
      .orderBy($"stage")
  }

  /** Time-to-convert distribution per funnel transition — the question
    * q_event_funnel's counts don't answer: HOW LONG does each surviving
    * step take? Per transition (stage-1→2, stage-2→3): converter count,
    * mean lag, and the p50/p90 lag in microseconds over the same
    * strict-ordering min-time chain the funnel counts. A growth team
    * reads p90 blowups as the step where users stall before converting.
    *
    * Scale shape: the same three user-keyed min-aggregates as
    * q_event_funnel (the per-user stage tables are the one exchange
    * family), then per-transition 1-row aggregates — percentiles ride
    * the Spark `percentile` ≡ DuckDB `quantile_cont` parity (q_conformal
    * precedent, same sorted-multiset interpolation). Exactness:
    * durations are exact integer micros; mean is a decimal sum over a
    * count; every emitted double is qrounded. */
  val qFunnelLag = GraftQuery(
    "q_funnel_lag",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"user_id", $"event_type", $"ts_us")
      val t1 = ev.filter($"event_type" === FunnelStages(0))
        .groupBy($"user_id").agg(min($"ts_us").as("t1"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t2 = ev.join(t1, Seq("user_id"))
        .filter($"event_type" === FunnelStages(1) && $"ts_us" > $"t1")
        .groupBy($"user_id").agg(min($"ts_us").as("t2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t3 = ev.join(t2, Seq("user_id"))
        .filter($"event_type" === FunnelStages(2) && $"ts_us" > $"t2")
        .groupBy($"user_id").agg(min($"ts_us").as("t3"))
      val l1 = t2.join(t1, Seq("user_id"))
        .select(lit(1).as("stage"), ($"t2" - $"t1").as("d"))
      val l2 = t3.join(t2, Seq("user_id"))
        .select(lit(2).as("stage"), ($"t3" - $"t2").as("d"))
      funnelLagReport(l1.unionByName(l2))
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      t1 AS (
        SELECT user_id, min(ts_us) AS t1 FROM ev
        WHERE event_type = '${FunnelStages(0)}' GROUP BY user_id),
      t2 AS (
        SELECT e.user_id, min(ts_us) AS t2 FROM ev e JOIN t1 USING (user_id)
        WHERE event_type = '${FunnelStages(1)}' AND ts_us > t1
        GROUP BY e.user_id),
      t3 AS (
        SELECT e.user_id, min(ts_us) AS t3 FROM ev e JOIN t2 USING (user_id)
        WHERE event_type = '${FunnelStages(2)}' AND ts_us > t2
        GROUP BY e.user_id),
      l1 AS (SELECT t2 - t1 AS d FROM t2 JOIN t1 USING (user_id)),
      l2 AS (SELECT t3 - t2 AS d FROM t3 JOIN t2 USING (user_id)),
      r AS (
        SELECT 1 AS stage,
          '${FunnelStages(0)}->${FunnelStages(1)}' AS transition,
          count(*)::BIGINT AS n_users,
          sum(CAST(d AS DECIMAL(38,0))) AS sd,
          quantile_cont(d, 0.5) AS q50, quantile_cont(d, 0.9) AS q90
        FROM l1
        UNION ALL
        SELECT 2, '${FunnelStages(1)}->${FunnelStages(2)}',
          count(*)::BIGINT,
          sum(CAST(d AS DECIMAL(38,0))),
          quantile_cont(d, 0.5), quantile_cont(d, 0.9)
        FROM l2)
      SELECT stage, transition, n_users,
        CASE WHEN n_users > 0 THEN
          ${Oracle.qround("CAST(sd AS DOUBLE) / n_users")} END AS mean_us,
        ${Oracle.qround("q50")} AS p50_us,
        ${Oracle.qround("q90")} AS p90_us
      FROM r ORDER BY stage""")
  )

  /** Shared cohort-retention readout over a (cohort_day, day_offset,
    * n_users) relation — used by [[qRetentionCohorts]] and the streaming
    * maintainer graft.streaming.StreamRetention so the two surfaces
    * cannot drift: the day-0 row of each cohort is its size, retention
    * is one qrounded integer division. */
  private[graft] def retentionReport(ret: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ret.sparkSession
    import spark.implicits._
    // the size side re-aliases every column (fresh expression ids) so the
    // self-join resolves even when `ret` is a named view (DeduplicateRelations
    // does not rewrite view-backed conflicting references)
    val sz = ret.toDF("cohort_day", "day_offset", "n_users")
      .filter($"day_offset" === 0)
      .select($"cohort_day", $"n_users".as("cohort_size"))
    ret
      .join(broadcast(sz), Seq("cohort_day"))
      .select($"cohort_day", $"day_offset", $"n_users", $"cohort_size",
        Det.qround($"n_users".cast(DoubleType) / $"cohort_size")
          .as("retention"))
      .orderBy($"cohort_day", $"day_offset")
  }

  val qRetentionCohorts = GraftQuery(
    "q_retention_cohorts",
    (spark, dir) => {
      import spark.implicits._
      // (user, day) distinct rows feed both the cohort assignment and the
      // retention join — persist so the corpus-sized distinct runs once
      val ud = Tables.events(spark, dir)
        .select($"user_id", expr(s"ts_us div $DayUs").as("day"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val coh = ud.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      val ret = ud.join(coh, Seq("user_id"))
        .groupBy($"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
      retentionReport(ret)
    },
    Some(s"""
      WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events),
      coh AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id),
      ret AS (
        SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
        FROM ud JOIN coh USING (user_id)
        GROUP BY cohort_day, day - cohort_day),
      sz AS (
        SELECT cohort_day, n_users AS cohort_size FROM ret WHERE day_offset = 0)
      SELECT cohort_day, day_offset, n_users::BIGINT AS n_users,
        cohort_size::BIGINT AS cohort_size,
        ${Oracle.qround("n_users::DOUBLE / cohort_size")} AS retention
      FROM ret JOIN sz USING (cohort_day)
      ORDER BY cohort_day, day_offset""")
  )

  /** |z| above this flags an event as an outlier (population σ). */
  val ZThreshold = 3.0

  val qOutlierEvents = GraftQuery(
    "q_outlier_events",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"event_id", $"event_type", $"value")
      // decimal raw moments per type: order-independent, bit-identical to
      // the oracle; mean/m2/σ derived in the SAME IEEE operation order
      val stats = ev.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(38, 12))).cast(DoubleType).as("s1"),
          sum(($"value" * $"value").cast(DecimalType(38, 12)))
            .cast(DoubleType).as("s2"))
        .select($"event_type", ($"s1" / $"n").as("mean"),
          sqrt($"s2" / $"n" - ($"s1" / $"n") * ($"s1" / $"n")).as("sd"))
        // a zero-variance group makes z = 0/0 = NaN, and the engines
        // DISAGREE on NaN comparisons (Spark: NaN > x is false; DuckDB
        // orders NaN above everything) — a degenerate group has no
        // outliers by definition, so exclude it identically in both
        .filter($"sd" > 0)
      ev.join(broadcast(stats), Seq("event_type"))
        .filter(abs(($"value" - $"mean") / $"sd") > ZThreshold)
        .select($"event_id", $"event_type", $"value",
          Det.qround(($"value" - $"mean") / $"sd").as("z"))
        .orderBy($"event_id")
    },
    Some(s"""
      WITH ev AS (SELECT event_id, event_type, value FROM events),
      st AS (
        SELECT event_type, count(*) AS n,
          sum(CAST(value AS DECIMAL(38,12)))::DOUBLE AS s1,
          sum(CAST(value * value AS DECIMAL(38,12)))::DOUBLE AS s2
        FROM ev GROUP BY event_type),
      m AS (
        SELECT event_type, s1 / n AS mean,
          sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sd
        FROM st),
      mg AS (SELECT * FROM m WHERE sd > 0),
      z AS (
        SELECT event_id, e.event_type, value, (value - mean) / sd AS z
        FROM ev e JOIN mg USING (event_type))
      SELECT event_id, event_type, value, ${Oracle.qround("z")} AS z
      FROM z WHERE abs(z) > $ZThreshold
      ORDER BY event_id""")
  )

  /** Modified-z threshold for [[qAnomalyMad]] (Iglewicz–Hoaglin's
    * recommended 3.5). */
  val MadThreshold = 3.5

  /** 0.6745 ≈ Φ⁻¹(3/4): scales MAD to estimate σ under normality. */
  val MadScale = 0.6745

  /** Robust outlier detection via median absolute deviation — the screen
    * that survives what breaks [[qOutlierEvents]]: the z-score's own mean
    * and stddev are corrupted by the outliers being hunted (masking), while
    * the median and MAD have a 50% breakdown point. Flags events whose
    * modified z-score `0.6745·(v − med)/MAD` exceeds ±[[MadThreshold]]
    * (Iglewicz & Hoaglin 1993).
    *
    * Exactness: Spark's exact interpolated `percentile` ≡ DuckDB's
    * `quantile_cont` on raw doubles (the q_winsorized_stats precedent);
    * the deviation, scaling, and ratio are pinned IEEE ops over identical
    * medians. A zero-MAD group (majority-constant values) is excluded
    * identically in both engines — same discipline as the zero-variance
    * guard in [[qOutlierEvents]].
    *
    * Scale shape: two per-type aggregates (median pass, then MAD pass over
    * broadcast-joined deviations) — exact medians are sort-based aggs kept
    * deliberately as the oracle twin, with the GK-sketch
    * `q_value_quantiles_approx` pattern as the declared scale path; the
    * final screen broadcasts the 5-row (type, med, mad) relation onto a
    * map-only scan. */
  val qAnomalyMad = GraftQuery(
    "q_anomaly_mad",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"event_id", $"event_type", $"value")
      val med = ev.groupBy($"event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = ev.join(broadcast(med), Seq("event_type"))
        .groupBy($"event_type", $"med")
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
        .filter($"mad" > 0)
      ev.join(broadcast(mad), Seq("event_type"))
        .filter(abs(lit(MadScale) * ($"value" - $"med") / $"mad")
          > MadThreshold)
        .select($"event_id", $"event_type", $"value",
          Det.qround(lit(MadScale) * ($"value" - $"med") / $"mad").as("mz"))
        .orderBy($"event_id")
    },
    Some(s"""
      WITH ev AS (SELECT event_id, event_type, value FROM events),
      med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM ev GROUP BY event_type),
      mad AS (
        SELECT e.event_type, med,
          quantile_cont(abs(value - med), 0.5) AS mad
        FROM ev e JOIN med USING (event_type)
        GROUP BY e.event_type, med),
      mg AS (SELECT * FROM mad WHERE mad > 0),
      z AS (
        SELECT event_id, e.event_type, value,
          $MadScale * (value - med) / mad AS mz
        FROM ev e JOIN mg USING (event_type))
      SELECT event_id, event_type, value, ${Oracle.qround("mz")} AS mz
      FROM z WHERE abs(mz) > $MadThreshold
      ORDER BY event_id""")
  )

  /** Per-user inter-arrival profile: exact integer µs gaps between
    * consecutive events (ordered by ts_us, event_id ties) rolled up to
    * min/max/exact-decimal-mean per user — the burstiness/bot screen
    * (human gaps are heavy-tailed with large means; scripted traffic shows
    * tiny regular gaps) and the input any rate-limit or session-timeout
    * tuning starts from. Single-event users surface with n_gaps = 0 and
    * null gap stats, not silently dropped — their presence is the "new
    * user" denominator.
    *
    * Scale shape: one user-keyed window (the lag) feeding one user-keyed
    * rollup — the exchange is shared, no second shuffle; all arithmetic is
    * exact int64 µs except the qround'ed mean. */
  val qInterarrival = GraftQuery(
    "q_interarrival",
    (spark, dir) => {
      import spark.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
      Tables.events(spark, dir)
        .withColumn("gap", $"ts_us" - lag($"ts_us", 1).over(w))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          count($"gap").as("n_gaps"),
          min($"gap").as("min_gap_us"),
          max($"gap").as("max_gap_us"),
          // mean rounded to WHOLE µs, not qround: gaps run ~1e10 µs, and
          // qround's ×1e6 would exceed the 53-bit double mantissa (the
          // floor becomes engine-dependent garbage — caught by the sf0.001
          // sweep); floor(x + 0.5) at 1e10 is exact, and sub-µs mean
          // precision is physically meaningless anyway
          when(count($"gap") > 0,
            floor(sum($"gap".cast(DecimalType(38, Det.Scale))).cast(DoubleType)
              / count($"gap") + lit(0.5)).cast(LongType)).as("avg_gap_us"))
        .orderBy($"user_id")
    },
    Some(s"""
      WITH g AS (
        SELECT user_id,
          epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS gap
        FROM events)
      SELECT user_id, count(*)::BIGINT AS n_events,
        count(gap)::BIGINT AS n_gaps,
        min(gap)::BIGINT AS min_gap_us,
        max(gap)::BIGINT AS max_gap_us,
        CASE WHEN count(gap) > 0 THEN
          floor(sum(CAST(gap AS DECIMAL(38,9)))::DOUBLE / count(gap) + 0.5)::BIGINT
        END AS avg_gap_us
      FROM g GROUP BY user_id ORDER BY user_id""")
  )

  /** First-order Markov transition matrix over per-user event journeys —
    * the sequence-model summary behind next-action prediction, journey
    * anomaly screens, and curriculum ordering of interaction logs (which
    * (state → state) moves dominate, which never happen).
    *
    * Each user's events are ordered by (ts, event_id); consecutive pairs
    * (prev → next) are counted and row-normalized into transition
    * probabilities p = n / Σ_next n.
    *
    * Scale shape: ONE hash exchange on user_id feeds the lag window (the
    * q_interarrival/SCD2 exchange); the pair stream then collapses through
    * a partial+final aggregate on (prev, next) — at most |types|² rows
    * cross that exchange, and the row-normalizing window runs over that
    * |types|²-row relation, never over corpus-sized input. Determinism:
    * ties inside a timestamp are broken by event_id (the house order);
    * p is a long/long → double division, [[Det.qround]]ed on output. */
  /** (prev_type, next_type, n) transition counts from a batch event
    * relation — the lag-window half of the Markov build, shared with the
    * streaming maintainer's spec reconciliation. */
  private[graft] def markovCounts(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    events
      .select($"user_id", $"event_type", $"ts_us", $"event_id")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Row-normalize a (prev_type, next_type, n) count relation into the
    * transition-probability report — shared by [[qMarkovTransitions]] and
    * graft.streaming.StreamMarkov's fold-at-query report, so the two
    * surfaces can never drift. */
  private[graft] def markovReport(counts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    counts
      .withColumn("row_n", sum($"n").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"prev_type")))
      .select($"prev_type", $"next_type", $"n",
        Det.qround($"n" / $"row_n").as("p"))
      .orderBy($"prev_type", $"next_type")
  }

  val qMarkovTransitions = GraftQuery(
    "q_markov_transitions",
    (spark, dir) => markovReport(markovCounts(Tables.events(spark, dir))),
    Some(s"""
      WITH pairs AS (
        SELECT event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_type
        FROM events),
      c AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM pairs WHERE prev_type IS NOT NULL
        GROUP BY 1, 2)
      SELECT prev_type, next_type, n,
        ${Oracle.qround("n / ((sum(n) OVER (PARTITION BY prev_type))::BIGINT)")} AS p
      FROM c
      ORDER BY prev_type, next_type""")
  )

  /** Welch's two-sample t-test between the click and purchase value
    * distributions — the A/B experimentation primitive (unequal
    * variances, unequal sizes; the test a metrics platform runs on every
    * experiment readout). One row: per-group (n, mean, var), the t
    * statistic and the Welch–Satterthwaite degrees of freedom.
    *
    * Exactness: means and the Σx² moments are decimal-exact
    * ([[Det.dsum]] over x and x²); sample variance is computed from the
    * exact moments as (Σx² − n·m²)/(n−1) — one IEEE expression tree over
    * 6-dp-stable inputs, identical in both engines; t and df are pure
    * double arithmetic over those, [[Det.qround]]ed on output. Scale
    * shape: ONE partial+final aggregate over a 2-column scan with the
    * group filter pushed to it; everything downstream is a 2-row
    * relation. */
  /** UNROUNDED per-arm decimal moments (n, Σx, Σx²) of the click/purchase
    * experiment arms — ADDITIVE, so graft.streaming.StreamWelch maintains
    * this relation per micro-batch; the fold rounds once through
    * [[armFinish]] and serves BOTH the significance readout (q_ab_welch)
    * and the design readout (q_ab_power). */
  private[graft] def armMomentsDec(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.filter($"event_type".isin("click", "purchase"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(38, 9))).as("sx_d"),
        sum(($"value" * $"value").cast(DecimalType(38, 9))).as("sxx_d"))
  }

  /** Round each decimal moment once (the Det.dsum output shape). */
  private[graft] def armFinish(dec: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = dec.sparkSession
    import spark.implicits._
    dec.select($"event_type", $"n",
      round($"sx_d", 6).cast(DoubleType).as("sx"),
      round($"sxx_d", 6).cast(DoubleType).as("sxx"))
  }

  /** Welch t/df from the finished arm moments. */
  private[graft] def welchReport(g0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = g0.sparkSession
    import spark.implicits._
    val g = g0.select($"event_type", $"n",
      Det.qround($"sx" / $"n").as("mean"),
      when($"n" > 1, Det.qround(
        ($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1))).as("variance"))
    val a = g.filter($"event_type" === "click")
      .select($"n".as("n1"), $"mean".as("m1"), $"variance".as("v1"))
    val b = g.filter($"event_type" === "purchase")
      .select($"n".as("n2"), $"mean".as("m2"), $"variance".as("v2"))
    a.crossJoin(broadcast(b))
      .withColumn("se1", $"v1" / $"n1")
      .withColumn("se2", $"v2" / $"n2")
      .select($"n1", $"m1", $"v1", $"n2", $"m2", $"v2",
        Det.qround(($"m1" - $"m2") / sqrt($"se1" + $"se2")).as("t_stat"),
        Det.qround(
          ($"se1" + $"se2") * ($"se1" + $"se2") /
            ($"se1" * $"se1" / ($"n1" - 1) +
              $"se2" * $"se2" / ($"n2" - 1))).as("df"))
      .orderBy($"n1")
  }

  /** Mixing-prior variance for [[qMsprt]] (effect prior N(0, τ²)): 2⁻²,
    * an exact binary fraction (the K1/B precedent). */
  val MsprtTauSq = 0.25

  /** Always-valid mSPRT readout from the finished arm moments (shared
    * with graft.streaming.StreamWelch — a THIRD readout from the same
    * maintained log). Λ = √(V/(V+τ²))·exp(δ̂²τ²/(2V(V+τ²))) with
    * V = s₁²/n₁ + s₂²/n₂ the variance of the observed effect;
    * p_always_valid = min(1, 1/Λ). */
  private[graft] def msprtReport(g0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = g0.sparkSession
    import spark.implicits._
    val g = g0.select($"event_type", $"n",
      Det.qround($"sx" / $"n").as("mean"),
      when($"n" > 1, Det.qround(
        ($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1))).as("variance"))
    val a = g.filter($"event_type" === "click")
      .select($"n".as("n1"), $"mean".as("m1"), $"variance".as("v1"))
    val b = g.filter($"event_type" === "purchase")
      .select($"n".as("n2"), $"mean".as("m2"), $"variance".as("v2"))
    a.crossJoin(broadcast(b))
      .filter($"v1".isNotNull && $"v2".isNotNull)
      .withColumn("delta", Det.qround($"m1" - $"m2"))
      .withColumn("vv", $"v1" / $"n1" + $"v2" / $"n2")
      .filter($"vv" > 0)
      .withColumn("lambda", Det.qround(
        sqrt($"vv" / ($"vv" + lit(MsprtTauSq))) *
          exp($"delta" * $"delta" * lit(MsprtTauSq) /
            (lit(2.0) * $"vv" * ($"vv" + lit(MsprtTauSq))))))
      .select($"n1", $"n2", $"delta", Det.qround($"vv").as("v_delta"),
        $"lambda",
        Det.qround(least(lit(1.0), lit(1.0) / $"lambda")).as("p_av"))
  }

  /** Always-valid sequential test (mixture SPRT; Johari, Koomen, Pekelis
    * & Walsh 2017 — the "peeking-proof" A/B readout every modern
    * experimentation platform ships): unlike the fixed-horizon Welch t,
    * 1/Λ is a p-value valid at EVERY interim look, so a live dashboard
    * can stop the moment it crosses α without inflating false positives.
    * Same click/purchase arms and the same finished arm-moment relation
    * as q_ab_welch/q_ab_power — three readouts, one additive state (and
    * the streaming maintainer serves this one live from its log too).
    * Honest null: arms share the value distribution by construction, so
    * the expected readout is Λ < 1 ⇒ p_av = 1 — the machinery (mixture
    * LR, capped inverse) is what is verified. τ² = [[MsprtTauSq]] is an
    * exact binary fraction; the ln/exp tree follows the engine-wide
    * determinism precedent. */
  val qMsprt = GraftQuery(
    "q_msprt",
    (spark, dir) =>
      msprtReport(armFinish(armMomentsDec(Tables.events(spark, dir)))),
    Some(s"""
      WITH g AS (
        SELECT event_type, count(*) AS n,
          ${Oracle.dsum("value")} AS sx,
          ${Oracle.dsum("value * value")} AS sxx
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1),
      m AS (
        SELECT event_type, n,
          ${Oracle.qround("sx / n")} AS mean,
          CASE WHEN n > 1 THEN
            ${Oracle.qround("(sxx - sx * sx / n) / (n - 1)")} END AS variance
        FROM g),
      ab AS (
        SELECT a.n AS n1, a.mean AS m1, a.variance AS v1,
               b.n AS n2, b.mean AS m2, b.variance AS v2
        FROM (SELECT * FROM m WHERE event_type = 'click') a
        CROSS JOIN (SELECT * FROM m WHERE event_type = 'purchase') b
        WHERE a.variance IS NOT NULL AND b.variance IS NOT NULL),
      e AS (
        SELECT n1, n2,
          ${Oracle.qround("m1 - m2")} AS delta,
          (v1 / n1 + v2 / n2) AS vv
        FROM ab),
      l AS (
        SELECT n1, n2, delta, vv,
          ${Oracle.qround(
            s"""sqrt(vv / (vv + $MsprtTauSq)) *
               exp(delta * delta * $MsprtTauSq /
                 (2.0 * vv * (vv + $MsprtTauSq)))""")} AS lambda
        FROM e WHERE vv > 0)
      SELECT n1, n2, delta, ${Oracle.qround("vv")} AS v_delta, lambda,
        ${Oracle.qround("least(1.0, 1.0 / lambda)")} AS p_av
      FROM l
      ORDER BY n1""")
  )

  val qAbWelch = GraftQuery(
    "q_ab_welch",
    (spark, dir) =>
      welchReport(armFinish(armMomentsDec(Tables.events(spark, dir)))),
    Some(s"""
      WITH g AS (
        SELECT event_type, count(*) AS n,
          ${Oracle.dsum("value")} AS sx,
          ${Oracle.dsum("value * value")} AS sxx
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1),
      m AS (
        SELECT event_type, n,
          ${Oracle.qround("sx / n")} AS mean,
          CASE WHEN n > 1 THEN
            ${Oracle.qround("(sxx - sx * sx / n) / (n - 1)")}
          END AS variance
        FROM g),
      a AS (SELECT n AS n1, mean AS m1, variance AS v1 FROM m
            WHERE event_type = 'click'),
      b AS (SELECT n AS n2, mean AS m2, variance AS v2 FROM m
            WHERE event_type = 'purchase'),
      j AS (
        SELECT *, v1 / n1 AS se1, v2 / n2 AS se2
        FROM a CROSS JOIN b)
      SELECT n1, m1, v1, n2, m2, v2,
        ${Oracle.qround("(m1 - m2) / sqrt(se1 + se2)")} AS t_stat,
        ${Oracle.qround(
          """(se1 + se2) * (se1 + se2) /
             (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))""")} AS df
      FROM j
      ORDER BY n1""")
  )

  /** Per-distinct-value counts of the two experiment arms — the shared
    * input of [[qKsTest]] and [[qMwuTest]]. ONE partial+final aggregate
    * over a 2-column scan collapses the corpus to the distinct-value
    * domain (the driver's `value` is a 2-dp grid, so the domain is bounded
    * by range·100 rows, not by the corpus); every rank/ECDF computation
    * downstream is value-domain-sized. */
  private[graft] def armValueCounts(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.filter($"event_type".isin(ArmA, ArmB))
      .groupBy($"value")
      .agg(sum(when($"event_type" === ArmA, 1L).otherwise(0L)).as("c1"),
        sum(when($"event_type" === ArmB, 1L).otherwise(0L)).as("c2"))
  }

  private val ArmA = "click"
  private val ArmB = "purchase"

  /** Oracle-side twin of [[armValueCounts]] plus the arm totals. */
  private val ArmCountsSql = s"""
      c AS (
        SELECT value,
          sum(CASE WHEN event_type = '$ArmA' THEN 1 ELSE 0 END)::BIGINT AS c1,
          sum(CASE WHEN event_type = '$ArmB' THEN 1 ELSE 0 END)::BIGINT AS c2
        FROM events WHERE event_type IN ('$ArmA', '$ArmB')
        GROUP BY 1),
      tot AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM c)"""

  /** Two-sample Kolmogorov–Smirnov test between the click and purchase
    * value distributions — the NONPARAMETRIC companion of [[qAbWelch]]
    * (does the whole distribution differ, not just the mean?). One row:
    * arm sizes, the KS D statistic, the scaled statistic
    * λ = √(n₁n₂/(n₁+n₂))·D and the one-term asymptotic p ≈ 2·e^(−2λ²).
    *
    * Exactness: the ECDF difference at every distinct value is the exact
    * INTEGER |cum1·n₂ − cum2·n₁| (cumulative counts are windowed integer
    * sums — the q_t_closeness lesson: never float prefix sums across
    * engines), so the max is order-free and D is a single exact-integer
    * division, [[Det.qround]]ed; λ and p are short IEEE trees over
    * 6-dp-stable inputs. Products ride DECIMAL(38,0) so a 10⁹-row arm
    * cannot silently wrap a BIGINT (Spark wraps, DuckDB raises — the
    * decimal lane removes the asymmetry).
    *
    * Scale shape: ONE corpus aggregate (partial+final) to the value
    * domain; the unpartitioned cum window runs above that bounded
    * aggregate (the q_psi_drift discipline — at an unbounded domain you
    * would swap in the two-phase range-partitioned prefix sum). An arm
    * with zero rows yields an empty readout (no cross-engine 0/0). */
  /** KS readout over a raw (value, c1, c2) count relation — shared by
    * [[qKsTest]] and graft.streaming.StreamDist so the two surfaces
    * cannot drift. */
  private[graft] def ksReport(counts0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = counts0.sparkSession
    import spark.implicits._
    val dec = DecimalType(38, 0)
    val counts = counts0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = counts.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
        .filter($"n1" > 0 && $"n2" > 0)
      val w = org.apache.spark.sql.expressions.Window.orderBy($"value")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val cum = counts.select(
        sum($"c1").over(w).as("cum1"), sum($"c2").over(w).as("cum2"))
      val dnum = cum.crossJoin(broadcast(tot))
        .agg(max(abs($"cum1".cast(dec) * $"n2" - $"cum2".cast(dec) * $"n1"))
          .as("dnum"))
      dnum.crossJoin(broadcast(tot))
        .select($"n1", $"n2",
          Det.qround($"dnum".cast(DoubleType) /
            ($"n1".cast(dec) * $"n2").cast(DoubleType)).as("d_stat"))
        .withColumn("ks_lambda", Det.qround(
          sqrt(($"n1".cast(DoubleType) * $"n2".cast(DoubleType)) /
            ($"n1".cast(DoubleType) + $"n2".cast(DoubleType))) * $"d_stat"))
        .select($"n1", $"n2", $"d_stat", $"ks_lambda",
          Det.qround(lit(2.0) *
            exp(lit(-2.0) * $"ks_lambda" * $"ks_lambda")).as("p_approx"))
  }

  val qKsTest = GraftQuery(
    "q_ks_test",
    (spark, dir) => ksReport(armValueCounts(Tables.events(spark, dir))),
    Some(s"""
      WITH $ArmCountsSql,
      cum AS (
        SELECT (sum(c1) OVER w)::BIGINT AS cum1,
               (sum(c2) OVER w)::BIGINT AS cum2
        FROM c
        WINDOW w AS (ORDER BY value
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      m AS (
        SELECT max(abs(cum1::DECIMAL(38,0) * n2 - cum2::DECIMAL(38,0) * n1))
          AS dnum
        FROM cum CROSS JOIN tot),
      d AS (
        SELECT n1, n2,
          ${Oracle.qround(
            "(dnum::DOUBLE) / ((n1::DECIMAL(38,0) * n2)::DOUBLE)")} AS d_stat
        FROM m CROSS JOIN tot WHERE n1 > 0 AND n2 > 0),
      l AS (
        SELECT n1, n2, d_stat,
          ${Oracle.qround(
            """sqrt((n1::DOUBLE * n2::DOUBLE) /
               (n1::DOUBLE + n2::DOUBLE)) * d_stat""")} AS ks_lambda
        FROM d)
      SELECT n1, n2, d_stat, ks_lambda,
        ${Oracle.qround("2.0 * exp(-2.0 * ks_lambda * ks_lambda)")} AS p_approx
      FROM l
      ORDER BY n1""")
  )

  /** 1-Wasserstein distance (earth-mover's, Vaserstein 1969; the "EMD
    * drift" number modern ML monitoring reads beside PSI and KS) between
    * the same click/purchase value distributions as [[qKsTest]]: where KS
    * is the MAX of |F₁−F₂|, W₁ = ∫|F₁(v) − F₂(v)| dv is its integral — a
    * drift measure in the UNITS of the metric, insensitive to binning
    * (unlike PSI) and sensitive to how FAR mass moved (unlike KS).
    *
    * Exactness: on the value-domain count relation, W₁ = Σᵢ
    * |cum₁ᵢ·n₂ − cum₂ᵢ·n₁|/(n₁·n₂) · (vᵢ₊₁ − vᵢ) over consecutive
    * distinct values — the cumulative term is the SAME exact integer the
    * KS max reads (DECIMAL(38,0) lane, no float prefix sums), each
    * segment term is one IEEE product, and addends ride DECIMAL(38,12).
    * The last value's segment has no successor and F₁ = F₂ = 1 beyond it,
    * so dropping it is exact, not a truncation.
    *
    * Scale shape: identical to q_ks_test — ONE corpus aggregate to the
    * value domain; the cum/lead windows run above that bounded aggregate.
    * Empty arms yield an empty readout. */
  /** EMD readout over a raw (value, c1, c2) count relation — shared by
    * [[qEmdDrift]] and graft.streaming.StreamDist. */
  private[graft] def emdReport(counts0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = counts0.sparkSession
    import spark.implicits._
    val dec = DecimalType(38, 0)
    val counts = counts0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = counts.agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
          min($"value").as("vlo"), max($"value").as("vhi"))
        .filter($"n1" > 0 && $"n2" > 0)
      val wc = org.apache.spark.sql.expressions.Window.orderBy($"value")
      val cum = counts.select($"value",
        sum($"c1").over(wc.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)).as("cum1"),
        sum($"c2").over(wc.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)).as("cum2"))
        .withColumn("next_v", lead($"value", 1).over(wc))
      val emd = cum.filter($"next_v".isNotNull)
        .crossJoin(broadcast(tot))
        .select((abs($"cum1".cast(dec) * $"n2" - $"cum2".cast(dec) * $"n1")
          .cast(DoubleType) /
          ($"n1".cast(dec) * $"n2").cast(DoubleType) *
          ($"next_v" - $"value")).as("term"))
        .agg(sum($"term".cast(DecimalType(38, 12))).cast(DoubleType)
          .as("w1"))
      emd.crossJoin(broadcast(tot))
        .select($"n1", $"n2",
          Det.qround($"w1").as("emd"),
          when($"vhi" > $"vlo",
            Det.qround($"w1" / ($"vhi" - $"vlo"))).as("emd_rel"))
  }

  val qEmdDrift = GraftQuery(
    "q_emd_drift",
    (spark, dir) => emdReport(armValueCounts(Tables.events(spark, dir))),
    Some(s"""
      WITH $ArmCountsSql,
      tot2 AS (
        SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
          min(value) AS vlo, max(value) AS vhi
        FROM c),
      cum AS (
        SELECT value,
          (sum(c1) OVER w)::BIGINT AS cum1,
          (sum(c2) OVER w)::BIGINT AS cum2,
          lead(value) OVER (ORDER BY value) AS next_v
        FROM c
        WINDOW w AS (ORDER BY value
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      terms AS (
        SELECT (abs(cum1::DECIMAL(38,0) * n2 - cum2::DECIMAL(38,0) * n1)::DOUBLE
            / (n1::DECIMAL(38,0) * n2)::DOUBLE) * (next_v - value) AS term
        FROM cum CROSS JOIN tot2
        WHERE next_v IS NOT NULL AND n1 > 0 AND n2 > 0),
      w1s AS (
        SELECT sum(CAST(term AS DECIMAL(38,12)))::DOUBLE AS w1 FROM terms)
      SELECT n1, n2,
        ${Oracle.qround("w1")} AS emd,
        CASE WHEN vhi > vlo
          THEN ${Oracle.qround("w1 / (vhi - vlo)")} END AS emd_rel
      FROM w1s CROSS JOIN tot2
      WHERE n1 > 0 AND n2 > 0
      ORDER BY n1""")
  )

  /** Mann–Whitney U test (Wilcoxon rank-sum) between the same two arms —
    * the rank-based location test that, unlike [[qAbWelch]], is robust to
    * the heavy right tail a revenue-like `value` column always has. One
    * row: arm sizes, U₁, the tie-corrected normal approximation
    * (μ_U, σ_U) and z.
    *
    * Exactness: tied observations take their average rank, and with
    * per-value counts that average is the exact HALF-INTEGER
    * (2·cum_before + c + 1)/2 — so 2·R₁ = Σ c₁·(2·cum_before + c + 1) and
    * 2·U₁ stay exact integers end-to-end (no float rank arithmetic at
    * all); the tie-correction term Σ(t³−t) is likewise integer. Only the
    * final μ/σ/z are doubles over those exact integers, [[Det.qround]]ed.
    * Products ride DECIMAL(38,0) (same wrap-vs-raise rationale as
    * [[qKsTest]]).
    *
    * Scale shape: identical to [[qKsTest]] — one corpus aggregate, then
    * value-domain-sized windows and a broadcast totals row. */
  /** Two-sided 95% normal quantile for [[aucDelongReport]]'s CI — the
    * standard published constant, an exact decimal literal. */
  val Z975 = 1.959964

  /** AUC + DeLong variance readout over a raw (value, c1, c2) count
    * relation — shared by [[qAucDelong]] and graft.streaming.StreamDist
    * (the FOURTH readout from that maintained log). Treating arm 1 as
    * positives and arm 2 as negatives, AUC = P(X₁ > X₂) + ½P(X₁ = X₂) is
    * exactly U₁/(n₁n₂) (q_mwu_test's statistic rescaled — the spec pins
    * the equality); DeLong, DeLong & Clarke-Pearson 1988 give its
    * variance from the per-sample placement values V₁₀/V₀₁, which on the
    * count relation are integer numerators over 2n: W₁₀(v) = 2·cum₂(v) −
    * c₂(v), W₀₁(v) = 2·(n₁ − cum₁(v)) + c₁(v). All sums of c·W and c·W²
    * ride DECIMAL(38,0) (exact up to ~4n·n² ≈ 10²⁸ at 10⁹-row arms);
    * the only IEEE ops are the final divisions. */
  private[graft] def aucDelongReport(counts0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = counts0.sparkSession
    import spark.implicits._
    val dec = DecimalType(38, 0)
    val counts = counts0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = counts.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
      .filter($"n1" > 1 && $"n2" > 1)
    val w = org.apache.spark.sql.expressions.Window.orderBy($"value")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = counts.select($"c1", $"c2",
      sum($"c1").over(w).as("cum1"), sum($"c2").over(w).as("cum2"))
    val sums = cum.crossJoin(broadcast(tot))
      .select($"c1", $"c2",
        (lit(2) * $"cum2".cast(dec) - $"c2").as("w10"),
        (lit(2) * ($"n1" - $"cum1").cast(dec) + $"c1").as("w01"))
      .agg(
        sum($"c1" * $"w10").as("a"),
        sum($"c1".cast(dec) * $"w10" * $"w10").as("b"),
        sum($"c2" * $"w01").as("cc"),
        sum($"c2".cast(dec) * $"w01" * $"w01").as("d"))
    sums.crossJoin(broadcast(tot))
      .withColumn("nn1", $"n1".cast(DoubleType))
      .withColumn("nn2", $"n2".cast(DoubleType))
      .withColumn("auc0",
        $"a".cast(DoubleType) / (lit(2.0) * $"nn1" * $"nn2"))
      .withColumn("s10",
        ($"b".cast(DoubleType) / (lit(4.0) * $"nn2" * $"nn2") -
          $"nn1" * $"auc0" * $"auc0") / ($"nn1" - 1.0))
      .withColumn("s01",
        ($"d".cast(DoubleType) / (lit(4.0) * $"nn1" * $"nn1") -
          $"nn2" * $"auc0" * $"auc0") / ($"nn2" - 1.0))
      .withColumn("v0", $"s10" / $"nn1" + $"s01" / $"nn2")
      .select($"n1", $"n2", Det.qround($"auc0").as("auc"),
        when($"v0" > 0, Det.qround(sqrt($"v0"))).as("se"),
        when($"v0" > 0,
          Det.qround(($"auc0" - lit(0.5)) / sqrt($"v0"))).as("z_stat"),
        when($"v0" > 0,
          Det.qround($"auc0" - lit(Z975) * sqrt($"v0"))).as("ci_lo"),
        when($"v0" > 0,
          Det.qround($"auc0" + lit(Z975) * sqrt($"v0"))).as("ci_hi"))
  }

  /** AUC with the DeLong confidence interval between the click and
    * purchase value distributions — "how well does `value` separate the
    * two arms", the effect-size companion the rank family was missing
    * (q_mwu_test answers IS there a shift; this answers HOW MUCH, with a
    * peer-reviewed variance). Same maintained count relation as
    * KS/MWU/EMD — one state, four readouts. Honest split: arms share the
    * value distribution by construction, so AUC ≈ ½ and the CI covers it
    * — the machinery (placement sums, DeLong components) is what is
    * verified. */
  val qAucDelong = GraftQuery(
    "q_auc_delong",
    (spark, dir) =>
      aucDelongReport(armValueCounts(Tables.events(spark, dir))),
    Some(s"""
      WITH $ArmCountsSql,
      cum AS (
        SELECT c1, c2,
          (sum(c1) OVER w)::BIGINT AS cum1,
          (sum(c2) OVER w)::BIGINT AS cum2
        FROM c
        WINDOW w AS (ORDER BY value
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      pl AS (
        SELECT c1, c2,
          (2 * cum2::DECIMAL(38,0) - c2) AS w10,
          (2 * (n1 - cum1)::DECIMAL(38,0) + c1) AS w01
        FROM cum CROSS JOIN tot),
      s AS (
        SELECT sum(c1 * w10) AS a,
          sum(c1::DECIMAL(38,0) * w10 * w10) AS b,
          sum(c2 * w01) AS cc,
          sum(c2::DECIMAL(38,0) * w01 * w01) AS d
        FROM pl),
      e AS (
        SELECT n1, n2,
          n1::DOUBLE AS nn1, n2::DOUBLE AS nn2,
          a::DOUBLE / (2.0 * n1::DOUBLE * n2::DOUBLE) AS auc0,
          b::DOUBLE AS bb, d::DOUBLE AS dd
        FROM s CROSS JOIN tot WHERE n1 > 1 AND n2 > 1),
      v AS (
        SELECT n1, n2, auc0,
          ((bb / (4.0 * nn2 * nn2) - nn1 * auc0 * auc0) / (nn1 - 1.0)) / nn1
            + ((dd / (4.0 * nn1 * nn1) - nn2 * auc0 * auc0) / (nn2 - 1.0))
              / nn2 AS v0
        FROM e)
      SELECT n1, n2, ${Oracle.qround("auc0")} AS auc,
        CASE WHEN v0 > 0 THEN ${Oracle.qround("sqrt(v0)")} END AS se,
        CASE WHEN v0 > 0
          THEN ${Oracle.qround("(auc0 - 0.5) / sqrt(v0)")} END AS z_stat,
        CASE WHEN v0 > 0
          THEN ${Oracle.qround(s"auc0 - $Z975 * sqrt(v0)")} END AS ci_lo,
        CASE WHEN v0 > 0
          THEN ${Oracle.qround(s"auc0 + $Z975 * sqrt(v0)")} END AS ci_hi
      FROM v
      ORDER BY n1""")
  )

  /** MWU readout over a raw (value, c1, c2) count relation — shared by
    * [[qMwuTest]] and graft.streaming.StreamDist. */
  private[graft] def mwuReport(counts0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = counts0.sparkSession
    import spark.implicits._
    val dec = DecimalType(38, 0)
    val counts = counts0
      .withColumn("cnt", $"c1" + $"c2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = counts.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
        .filter($"n1" > 0 && $"n2" > 0)
      val w = org.apache.spark.sql.expressions.Window.orderBy($"value")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val sums = counts
        .withColumn("cb", sum($"cnt").over(w) - $"cnt")
        .agg(
          sum($"c1".cast(dec) * (lit(2) * $"cb" + $"cnt" + 1)).as("r1x2"),
          sum(($"cnt".cast(dec) * $"cnt" * $"cnt" - $"cnt")).as("tie_sum"))
      sums.crossJoin(broadcast(tot))
        .withColumn("u1x2",
          lit(2) * $"n1".cast(dec) * $"n2" + $"n1".cast(dec) * ($"n1" + 1)
            - $"r1x2")
        .withColumn("nn", ($"n1" + $"n2").cast(DoubleType))
        .withColumn("mu",
          ($"n1".cast(DoubleType) * $"n2".cast(DoubleType)) / lit(2.0))
        .withColumn("sigma", Det.qround(sqrt(
          ($"n1".cast(DoubleType) * $"n2".cast(DoubleType)) / lit(12.0) *
            (($"nn" + lit(1.0)) -
              $"tie_sum".cast(DoubleType) / ($"nn" * ($"nn" - lit(1.0)))))))
        .select($"n1", $"n2",
          ($"u1x2".cast(DoubleType) / lit(2.0)).as("u_stat"),
          $"tie_sum".cast(LongType).as("tie_sum"),
          $"mu", $"sigma",
          Det.qround(($"u1x2".cast(DoubleType) / lit(2.0) - $"mu") / $"sigma")
            .as("z_score"))
  }

  val qMwuTest = GraftQuery(
    "q_mwu_test",
    (spark, dir) => mwuReport(armValueCounts(Tables.events(spark, dir))),
    Some(s"""
      WITH $ArmCountsSql,
      cum AS (
        SELECT c1, c1 + c2 AS cnt,
          (sum(c1 + c2) OVER w)::BIGINT - (c1 + c2) AS cb
        FROM c
        WINDOW w AS (ORDER BY value
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      sums AS (
        SELECT
          sum(c1::DECIMAL(38,0) * (2 * cb + cnt + 1)) AS r1x2,
          sum(cnt::DECIMAL(38,0) * cnt * cnt - cnt) AS tie_sum
        FROM cum),
      j AS (
        SELECT n1, n2, r1x2, tie_sum,
          2 * n1::DECIMAL(38,0) * n2 + n1::DECIMAL(38,0) * (n1 + 1) - r1x2
            AS u1x2,
          (n1 + n2)::DOUBLE AS nn,
          (n1::DOUBLE * n2::DOUBLE) / 2.0 AS mu
        FROM sums CROSS JOIN tot WHERE n1 > 0 AND n2 > 0),
      s AS (
        SELECT *,
          ${Oracle.qround(
            """sqrt((n1::DOUBLE * n2::DOUBLE) / 12.0 *
               ((nn + 1.0) - tie_sum::DOUBLE / (nn * (nn - 1.0))))""")}
            AS sigma
        FROM j)
      SELECT n1, n2, u1x2::DOUBLE / 2.0 AS u_stat, tie_sum::BIGINT AS tie_sum,
        mu, sigma,
        ${Oracle.qround("(u1x2::DOUBLE / 2.0 - mu) / sigma")} AS z_score
      FROM s
      ORDER BY n1""")
  )

  /** One-way ANOVA F test of `value` across ALL event arms — the k-sample
    * completion of the two-sample ladder ([[qAbWelch]] location, [[qKsTest]]
    * distribution, [[qMwuTest]] rank): does ANY arm's mean value differ?
    * One row: k, N, SS_between, SS_within, F, and η² (effect size —
    * the fraction of value variance explained by the arm).
    *
    * Exactness: per-arm (n, Σx, Σx²) are decimal-exact ([[Det.dsum]]);
    * the cross-arm reductions are where order-dependence would creep back
    * in (Spark folds the k arm rows in partition order), so every cross-arm
    * addend is [[Det.qround]]ed to a 6-dp-stable double FIRST and then
    * decimal-summed again — Σ_g sx_g²/n_g and Σ_g (sxx_g − sx_g²/n_g) are
    * order-free in both engines. SSB = Σ sx_g²/n_g − (Σsx)²/N by the
    * moment identity (no per-row grand-mean residuals — the corpus is
    * touched ONCE). F and η² are short IEEE trees over 6-dp-stable inputs.
    *
    * Scale shape: ONE partial+final aggregate over a 2-column scan reduces
    * the corpus to k rows; everything downstream is k-row arithmetic. The
    * guards (k ≥ 2, N > k, SSW > 0) yield NULL statistics, not NaN, in
    * both engines. */
  val qAnovaF = GraftQuery(
    "q_anova_f",
    (spark, dir) => {
      import spark.implicits._
      val g = Tables.events(spark, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), Det.dsum($"value").as("sx"),
          Det.dsum($"value" * $"value").as("sxx"))
        .select($"n", $"sx", $"sxx",
          Det.qround($"sx" * $"sx" / $"n").as("t_g"))
      g.agg(count(lit(1)).as("k"), sum($"n").as("n_total"),
          Det.dsum($"sx").as("sx_all"),
          Det.dsum($"t_g").as("s1"),
          Det.dsum(Det.qround($"sxx" - $"sx" * $"sx" / $"n")).as("ssw"))
        .filter($"k" >= 2 && $"n_total" > $"k")
        .withColumn("ssb",
          Det.qround($"s1" - $"sx_all" * $"sx_all" / $"n_total"))
        .select($"k", $"n_total",
          $"ssb".as("ss_between"), $"ssw".as("ss_within"),
          when($"ssw" > 0, Det.qround(
            ($"ssb" / ($"k" - 1)) / ($"ssw" / ($"n_total" - $"k"))))
            .as("f_stat"),
          when($"ssb" + $"ssw" > 0,
            Det.qround($"ssb" / ($"ssb" + $"ssw"))).as("eta_sq"))
        .orderBy($"k")
    },
    Some(s"""
      WITH g AS (
        SELECT event_type, count(*) AS n,
          ${Oracle.dsum("value")} AS sx,
          ${Oracle.dsum("value * value")} AS sxx
        FROM events GROUP BY 1),
      t AS (
        SELECT n, sx, sxx,
          ${Oracle.qround("sx * sx / n")} AS t_g
        FROM g),
      red AS (
        SELECT count(*) AS k, sum(n)::BIGINT AS n_total,
          ${Oracle.dsum("sx")} AS sx_all,
          ${Oracle.dsum("t_g")} AS s1,
          ${Oracle.dsum(Oracle.qround("sxx - sx * sx / n"))} AS ssw
        FROM t),
      s AS (
        SELECT k, n_total, ssw,
          ${Oracle.qround("s1 - sx_all * sx_all / n_total")} AS ssb
        FROM red WHERE k >= 2 AND n_total > k)
      SELECT k, n_total, ssb AS ss_between, ssw AS ss_within,
        CASE WHEN ssw > 0 THEN
          ${Oracle.qround("(ssb / (k - 1)) / (ssw / (n_total - k))")}
        END AS f_stat,
        CASE WHEN ssb + ssw > 0 THEN
          ${Oracle.qround("ssb / (ssb + ssw)")}
        END AS eta_sq
      FROM s
      ORDER BY k""")
  )

  /** Fixed per-subject observation window for [[qKaplanMeier]], in hours:
    * each user is observed for at most this long after their first event
    * (administrative right-censoring). */
  val KmObsHours = 48L

  private val HourUs = 3600L * 1000000

  /** Kaplan–Meier survival curve of time-to-first-purchase — the
    * time-to-conversion readout (the estimator every conversion-latency
    * dashboard draws): duration = whole hours from a user's first event to
    * their first `purchase`, administratively RIGHT-CENSORED at
    * [[KmObsHours]] (every subject is observed for a fixed window; a user
    * who has not purchased by then — or never purchases — is censored, not
    * a failure; dropping them instead is the classic conversion-latency
    * bias KM exists to fix). The censoring design is deliberate: on this
    * corpus every user purchases EVENTUALLY at every SF, so corpus-end
    * censoring would make the censored branch vacuous (the q_cooccur_pmi
    * lesson — a parameter choice that verifies green on 0 rows is not
    * verified); the fixed window keeps both branches exercised at all
    * three SFs (48 h ⇒ roughly a ⅔ / ⅓ event/censored split). One row per
    * distinct conversion hour t: the at-risk count n_t, conversion count
    * d_t, censored-at-t count, and Ŝ(t) = Π_{t_i ≤ t} (1 − d_i/n_i) with
    * the standard deaths-before-censorings tie convention (censored at t
    * are at risk AT t).
    *
    * Exactness: durations and the at-risk suffix counts are exact integer
    * arithmetic (windowed INTEGER sums — the q_t_closeness discipline);
    * the survival product rides ln-space as a RUNNING decimal sum of
    * 6-dp-prerounded ln(1 − d/n) addends (the q_cusum_drift discipline:
    * prerounding makes the running sum bit-identical cross-engine), one
    * exp at the end. A zero factor (everyone at risk converts — only
    * possible at the last conversion time) short-circuits to Ŝ = 0
    * instead of entering ln.
    *
    * Scale shape: ONE partial+final user aggregate collapses the corpus
    * to |users| rows (the purchase-side min folds into the same pass), a
    * second to the ≤[[KmObsHours]]-row duration domain; the unpartitioned
    * windows run above that bounded aggregate (the q_psi_drift
    * discipline). */
  /** The per-user (first event, first purchase) duration bucketing of
    * [[qKaplanMeier]] — pure function of the two per-user minima, shared
    * with graft.streaming.StreamKm whose ValueState holds exactly those
    * minima (min is commutative, so the streamed buckets are
    * arrival-order-free by construction). */
  private[graft] def kmBucket(first: org.apache.spark.sql.Column,
      purch: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val latH = floor((purch - first).cast(DoubleType) /
      lit(HourUs.toDouble)).cast(LongType)
    val converted = latH.isNotNull && latH < KmObsHours
    (when(converted, latH).otherwise(lit(KmObsHours)), converted)
  }

  /** (dur_hours, d_t, c_t) duration-bucket counters over an events
    * relation — the additive core the streaming twin folds to. */
  private[graft] def kmDurations(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val perUser = ev
      .groupBy($"user_id")
      .agg(min($"ts_us").as("first_us"),
        min(when($"event_type" === "purchase", $"ts_us")).as("purch_us"))
    val (bucket, converted) = kmBucket($"first_us", $"purch_us")
    perUser
      .select(bucket.as("dur_hours"), converted.as("converted"))
      .groupBy($"dur_hours")
      .agg(sum(when($"converted", 1L).otherwise(0L)).as("d_t"),
        sum(when($"converted", 0L).otherwise(1L)).as("c_t"))
  }

  /** The KM estimator over a (dur_hours, d_t, c_t) relation — shared by
    * [[qKaplanMeier]] and the streaming twin's fold-at-query report. */
  private[graft] def kmReport(durs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = durs.sparkSession
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val wRisk = W.orderBy($"dur_hours".desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wSurv = W.orderBy($"dur_hours".asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    durs
      .withColumn("n_risk", sum($"d_t" + $"c_t").over(wRisk))
        .withColumn("ln_term",
          when($"d_t" < $"n_risk", Det.qround(
            log(($"n_risk" - $"d_t").cast(DoubleType) /
              $"n_risk".cast(DoubleType)))))
        .withColumn("zeroed",
          max(when($"d_t" === $"n_risk", 1).otherwise(0)).over(wSurv))
        .withColumn("survival",
          when($"zeroed" === 1, lit(0.0)).otherwise(Det.qround(exp(
            sum(when($"d_t" > 0, $"ln_term").otherwise(lit(0.0))
              .cast(DecimalType(38, 9))).over(wSurv).cast(DoubleType)))))
        .filter($"d_t" > 0)
        .select($"dur_hours", $"n_risk", $"d_t".as("n_events"),
          $"c_t".as("n_censored"), $"survival")
        .orderBy($"dur_hours")
  }

  /** (g = user_id % 2, dur_hours, d_t, c_t) per-arm duration counters —
    * the ADDITIVE core of [[qLogrank]] (the kmDurations shape with the
    * arm key kept), so a streaming maintainer can fold per-batch deltas
    * of the same relation. NOTE: additive over USER slices (the StreamKm
    * convention — a user's events must land in one slice). */
  private[graft] def kmArmDurations(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val perUser = ev
      .groupBy($"user_id")
      .agg(min($"ts_us").as("first_us"),
        min(when($"event_type" === "purchase", $"ts_us")).as("purch_us"))
    val (bucket, converted) = kmBucket($"first_us", $"purch_us")
    perUser
      .select(($"user_id" % 2).as("g"), bucket.as("dur_hours"),
        converted.as("converted"))
      .groupBy($"g", $"dur_hours")
      .agg(sum(when($"converted", 1L).otherwise(0L)).as("d_t"),
        sum(when($"converted", 0L).otherwise(1L)).as("c_t"))
  }

  /** The log-rank readout over a per-arm (g, dur_hours, d_t, c_t)
    * relation — shared by [[qLogrank]] and any streaming maintainer. */
  private[graft] def logrankReport(durs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = durs.sparkSession
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val wide = durs.groupBy($"dur_hours")
      .agg(sum(when($"g" === 0, $"d_t").otherwise(0L)).as("d1"),
        sum(when($"g" === 0, $"c_t").otherwise(0L)).as("c1"),
        sum(when($"g" === 1, $"d_t").otherwise(0L)).as("d2"),
        sum(when($"g" === 1, $"c_t").otherwise(0L)).as("c2"))
    val wRisk = W.orderBy($"dur_hours".desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val at = wide
      .withColumn("n1r", sum($"d1" + $"c1").over(wRisk))
      .withColumn("n2r", sum($"d2" + $"c2").over(wRisk))
      .withColumn("d", $"d1" + $"d2")
      .withColumn("n", $"n1r" + $"n2r")
      .filter($"d" > 0 && $"n" > 1)
      .select($"d1",
        Det.qround($"d".cast(DoubleType) * $"n1r" / $"n").as("e1"),
        Det.qround($"d".cast(DoubleType) *
          ($"n1r".cast(DoubleType) / $"n") *
          ($"n2r".cast(DoubleType) / $"n") *
          (($"n" - $"d").cast(DoubleType) / ($"n" - 1))).as("v"))
    def d6(c: org.apache.spark.sql.Column) =
      round(sum(c.cast(DecimalType(38, 9))), 6).cast(DoubleType)
    at.agg(count(lit(1)).as("n_times"), sum($"d1").as("o1"),
        d6($"e1").as("e1"), d6($"v").as("v_sum"))
      .filter($"n_times" > 0)
      .select($"n_times", $"o1", $"e1", $"v_sum",
        when($"v_sum" > 0, Det.qround(
          ($"o1" - $"e1") / sqrt($"v_sum"))).as("z_stat"),
        when($"v_sum" > 0, Det.qround(
          ($"o1" - $"e1") * ($"o1" - $"e1") / $"v_sum")).as("chi2"))
  }

  /** Log-rank test (Mantel 1966; Peto & Peto 1972) between the two
    * user-parity survival curves — the standard "do these cohorts convert
    * at different rates over time" hypothesis test that completes the
    * survival family around [[qKaplanMeier]]'s single-curve estimate: at
    * each event time, observed arm-1 events vs the hypergeometric
    * expectation under H₀ (shared hazard), O−E summed over times and
    * normalized by the summed hypergeometric variance — z and χ²(1).
    * Honest split: user_id%2 is independent of conversion latency by
    * construction, so |z| should be small (the q_cuped discipline).
    *
    * Exactness: risk sets are exact integer reverse-cumulative sums over
    * the bounded duration domain (the q_ks_test integer-lane lesson
    * applied to survival); E and V terms are [[Det.qround]]ed and
    * decimal-summed (q_anova_f discipline). Scale shape: ONE user-keyed
    * aggregate, then a ≤[[KmObsHours]]+1-row domain — all windows run
    * above the bounded collapse. */
  val qLogrank = GraftQuery(
    "q_logrank",
    (spark, dir) =>
      logrankReport(kmArmDurations(Tables.events(spark, dir))),
    Some(s"""
      WITH pu AS (
        SELECT user_id, min(epoch_us(ts)) AS first_us,
          min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
            AS purch_us
        FROM events GROUP BY 1),
      lat AS (
        SELECT user_id % 2 AS g,
          CAST(floor((purch_us - first_us)::DOUBLE / ${HourUs}.0)
            AS BIGINT) AS lat_h
        FROM pu),
      durs AS (
        SELECT g,
          CASE WHEN lat_h IS NOT NULL AND lat_h < $KmObsHours
            THEN lat_h ELSE $KmObsHours END AS dur_hours,
          (lat_h IS NOT NULL AND lat_h < $KmObsHours) AS converted
        FROM lat),
      wide AS (
        SELECT dur_hours,
          sum(CASE WHEN g = 0 AND converted THEN 1 ELSE 0 END)::BIGINT AS d1,
          sum(CASE WHEN g = 0 AND NOT converted THEN 1 ELSE 0 END)::BIGINT
            AS c1,
          sum(CASE WHEN g = 1 AND converted THEN 1 ELSE 0 END)::BIGINT AS d2,
          sum(CASE WHEN g = 1 AND NOT converted THEN 1 ELSE 0 END)::BIGINT
            AS c2
        FROM durs GROUP BY 1),
      r AS (
        SELECT *,
          (sum(d1 + c1) OVER w)::BIGINT AS n1r,
          (sum(d2 + c2) OVER w)::BIGINT AS n2r
        FROM wide
        WINDOW w AS (ORDER BY dur_hours DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      at AS (
        SELECT d1,
          ${Oracle.qround(
            "(d1 + d2)::DOUBLE * n1r / (n1r + n2r)")} AS e1,
          ${Oracle.qround(
            """(d1 + d2)::DOUBLE * (n1r::DOUBLE / (n1r + n2r)) *
               (n2r::DOUBLE / (n1r + n2r)) *
               ((n1r + n2r - d1 - d2)::DOUBLE / (n1r + n2r - 1))""")} AS v
        FROM r
        WHERE d1 + d2 > 0 AND n1r + n2r > 1),
      s AS (
        SELECT count(*)::BIGINT AS n_times, sum(d1)::BIGINT AS o1,
          round(sum(CAST(e1 AS DECIMAL(38,9))), 6)::DOUBLE AS e1,
          round(sum(CAST(v AS DECIMAL(38,9))), 6)::DOUBLE AS v_sum
        FROM at)
      SELECT n_times, o1, e1, v_sum,
        CASE WHEN v_sum > 0
          THEN ${Oracle.qround("(o1 - e1) / sqrt(v_sum)")} END AS z_stat,
        CASE WHEN v_sum > 0
          THEN ${Oracle.qround("(o1 - e1) * (o1 - e1) / v_sum")} END AS chi2
      FROM s WHERE n_times > 0
      ORDER BY n_times""")
  )

  /** Newton steps for [[qCoxHr]]. */
  val CoxIters = 3

  /** Cox proportional-hazards ratio between the two user-parity survival
    * arms (Cox 1972) — the semiparametric EFFECT-SIZE companion to
    * [[qLogrank]]'s hypothesis test (log-rank answers "do the curves
    * differ"; this answers "by what hazard ratio", and the score test of
    * this model at β = 0 IS the log-rank statistic): with one binary
    * covariate the partial likelihood reduces to Breslow risk-set sums
    * over the SAME bounded duration relation, and [[CoxIters]] Newton
    * steps solve it — U(β) = Σ_t (d₁ₜ − dₜ·n₁ₜeᵝ/(n₁ₜeᵝ+n₂ₜ)),
    * I(β) = Σ_t dₜ·n₁ₜeᵝn₂ₜ/(n₁ₜeᵝ+n₂ₜ)², β ← β + U/I. One row: the
    * fitted β, HR = eᵝ, SE = 1/√I, z — honest-null HR ≈ 1.
    *
    * Exactness: risk sets are the exact integer reverse cumulative sums
    * q_logrank already pins; per-time U/I terms are [[Det.qround]]ed and
    * decimal-summed per step (q_anova_f discipline), so each Newton
    * iterate is bit-identical cross-engine; β re-enters each step as a
    * driver-collected LITERAL (the k-center licensed-scalar shape), while
    * the oracle carries it as an unrolled 1-row relation. Scale shape:
    * ONE user-keyed aggregate, then [[CoxIters]] passes over the
    * ≤[[KmObsHours]]+1-row domain. */
  /** The Cox-Newton readout over a per-arm (g, dur_hours, d_t, c_t)
    * relation — shared by [[qCoxHr]] and graft.streaming.StreamLogrank
    * (the second readout from that retraction-maintained log). */
  private[graft] def coxReport(durs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = durs.sparkSession
    import spark.implicits._
    {
      val wide = durs.groupBy($"dur_hours")
        .agg(sum(when($"g" === 0, $"d_t").otherwise(0L)).as("d1"),
          sum(when($"g" === 0, $"c_t").otherwise(0L)).as("c1"),
          sum(when($"g" === 1, $"d_t").otherwise(0L)).as("d2"),
          sum(when($"g" === 1, $"c_t").otherwise(0L)).as("c2"))
      val W = org.apache.spark.sql.expressions.Window
      val wRisk = W.orderBy($"dur_hours".desc)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val at = wide
        .withColumn("n1r", sum($"d1" + $"c1").over(wRisk))
        .withColumn("n2r", sum($"d2" + $"c2").over(wRisk))
        .withColumn("d", $"d1" + $"d2")
        .filter($"d" > 0)
        .select($"d1", $"d", $"n1r", $"n2r")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def d6(c: org.apache.spark.sql.Column) =
        round(sum(c.cast(DecimalType(38, 9))), 6).cast(DoubleType)
      def step(beta: Double): Option[(Double, Double, Long, Long)] = {
        val eb = math.exp(beta)
        val r = at
          .withColumn("a", $"n1r" * lit(eb))
          .withColumn("den", $"a" + $"n2r")
          .select(
            Det.qround($"d1" - $"d" * $"a" / $"den").as("u_t"),
            Det.qround($"d" * $"a" * $"n2r" / ($"den" * $"den")).as("i_t"),
            $"d1")
          .agg(d6($"u_t").as("u"), d6($"i_t").as("i"),
            count(lit(1)).as("n_times"), sum($"d1").as("o1"))
          .filter($"i" > 0)
          .as[(Double, Double, Long, Long)].collect()
        r.headOption
      }
      var beta = 0.0
      var last: Option[(Double, Double, Long, Long)] = None
      for (_ <- 1 to CoxIters) {
        last = step(beta)
        last.foreach { case (u, i, _, _) => beta = beta + u / i }
      }
      last match {
        case Some((_, _, nTimes, o1)) =>
          // one final information evaluation AT the fitted beta for SE/z
          val fin = step(beta)
          val i = fin.map(_._2).getOrElse(0.0)
          Seq((nTimes, o1, beta, i)).toDF("n_times", "o1", "beta0", "i0")
            .select($"n_times", $"o1",
              Det.qround($"beta0").as("beta"),
              Det.qround(exp($"beta0")).as("hazard_ratio"),
              when($"i0" > 0, Det.qround(lit(1.0) / sqrt($"i0"))).as("se"),
              when($"i0" > 0, Det.qround($"beta0" * sqrt($"i0")))
                .as("z_stat"))
        case None =>
          Seq.empty[(Long, Long, Double, Double, Option[Double],
            Option[Double])]
            .toDF("n_times", "o1", "beta", "hazard_ratio", "se", "z_stat")
      }
    }
  }

  val qCoxHr = GraftQuery(
    "q_cox_hr",
    (spark, dir) =>
      coxReport(kmArmDurations(Tables.events(spark, dir))),
    Some {
      def stepSql(i: Int): String = {
        val prev = if (i == 1) "b0" else s"b${i - 1}"
        s"""
      s$i AS (
        SELECT
          round(sum(CAST(${Oracle.qround(
            s"d1 - d * (n1r * exp($prev.beta)) / (n1r * exp($prev.beta) + n2r)")}
            AS DECIMAL(38,9))), 6)::DOUBLE AS u,
          round(sum(CAST(${Oracle.qround(
            s"""d * (n1r * exp($prev.beta)) * n2r /
               ((n1r * exp($prev.beta) + n2r) * (n1r * exp($prev.beta) + n2r))""")}
            AS DECIMAL(38,9))), 6)::DOUBLE AS i
        FROM at CROSS JOIN $prev),
      b$i AS (SELECT $prev.beta + s$i.u / s$i.i AS beta
              FROM $prev CROSS JOIN s$i WHERE s$i.i > 0)"""
      }
      s"""
      WITH pu AS (
        SELECT user_id, min(epoch_us(ts)) AS first_us,
          min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
            AS purch_us
        FROM events GROUP BY 1),
      lat AS (
        SELECT user_id % 2 AS g,
          CAST(floor((purch_us - first_us)::DOUBLE / ${HourUs}.0)
            AS BIGINT) AS lat_h
        FROM pu),
      durs AS (
        SELECT g,
          CASE WHEN lat_h IS NOT NULL AND lat_h < $KmObsHours
            THEN lat_h ELSE $KmObsHours END AS dur_hours,
          (lat_h IS NOT NULL AND lat_h < $KmObsHours) AS converted
        FROM lat),
      wide AS (
        SELECT dur_hours,
          sum(CASE WHEN g = 0 AND converted THEN 1 ELSE 0 END)::BIGINT AS d1,
          sum(CASE WHEN g = 0 AND NOT converted THEN 1 ELSE 0 END)::BIGINT
            AS c1,
          sum(CASE WHEN g = 1 AND converted THEN 1 ELSE 0 END)::BIGINT AS d2,
          sum(CASE WHEN g = 1 AND NOT converted THEN 1 ELSE 0 END)::BIGINT
            AS c2
        FROM durs GROUP BY 1),
      r AS (
        SELECT *,
          (sum(d1 + c1) OVER w)::BIGINT AS n1r,
          (sum(d2 + c2) OVER w)::BIGINT AS n2r
        FROM wide
        WINDOW w AS (ORDER BY dur_hours DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      at AS (
        SELECT d1, d1 + d2 AS d, n1r, n2r FROM r WHERE d1 + d2 > 0),
      b0 AS (SELECT 0e0 AS beta),
      ${(1 to CoxIters).map(stepSql).mkString(",")},
      cnt AS (
        SELECT count(*)::BIGINT AS n_times, sum(d1)::BIGINT AS o1 FROM at),
      fin AS (
        SELECT
          round(sum(CAST(${Oracle.qround(
            s"""d * (n1r * exp(b$CoxIters.beta)) * n2r /
               ((n1r * exp(b$CoxIters.beta) + n2r)
                * (n1r * exp(b$CoxIters.beta) + n2r))""")}
            AS DECIMAL(38,9))), 6)::DOUBLE AS i0
        FROM at CROSS JOIN b$CoxIters)
      SELECT n_times, o1,
        ${Oracle.qround(s"b$CoxIters.beta")} AS beta,
        ${Oracle.qround(s"exp(b$CoxIters.beta)")} AS hazard_ratio,
        CASE WHEN i0 > 0
          THEN ${Oracle.qround("1e0 / sqrt(i0)")} END AS se,
        CASE WHEN i0 > 0
          THEN ${Oracle.qround(s"b$CoxIters.beta * sqrt(i0)")} END AS z_stat
      FROM cnt CROSS JOIN b$CoxIters CROSS JOIN fin
      WHERE n_times > 0
      ORDER BY n_times"""
    }
  )

  val qKaplanMeier = GraftQuery(
    "q_kaplan_meier",
    (spark, dir) => kmReport(kmDurations(Tables.events(spark, dir))),
    Some(s"""
      WITH pu AS (
        SELECT user_id, min(epoch_us(ts)) AS first_us,
          min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
            AS purch_us
        FROM events GROUP BY 1),
      lat AS (
        SELECT CAST(floor((purch_us - first_us)::DOUBLE / ${HourUs}.0)
          AS BIGINT) AS lat_h
        FROM pu),
      durs AS (
        SELECT
          CASE WHEN lat_h IS NOT NULL AND lat_h < $KmObsHours
            THEN lat_h ELSE $KmObsHours END AS dur_hours,
          (lat_h IS NOT NULL AND lat_h < $KmObsHours) AS converted
        FROM lat),
      g AS (
        SELECT dur_hours,
          sum(CASE WHEN converted THEN 1 ELSE 0 END)::BIGINT AS d_t,
          sum(CASE WHEN converted THEN 0 ELSE 1 END)::BIGINT AS c_t
        FROM durs GROUP BY 1),
      r AS (
        SELECT *,
          (sum(d_t + c_t) OVER (ORDER BY dur_hours DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
            AS n_risk
        FROM g),
      lt AS (
        SELECT *,
          CASE WHEN d_t < n_risk THEN
            ${Oracle.qround("ln((n_risk - d_t)::DOUBLE / n_risk::DOUBLE)")}
          END AS ln_term
        FROM r),
      s AS (
        SELECT *,
          max(CASE WHEN d_t = n_risk THEN 1 ELSE 0 END) OVER w AS zeroed,
          (sum(CAST(CASE WHEN d_t > 0 THEN ln_term ELSE 0e0 END
            AS DECIMAL(38,9))) OVER w)::DOUBLE AS ln_sum
        FROM lt
        WINDOW w AS (ORDER BY dur_hours ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT dur_hours, n_risk, d_t AS n_events, c_t AS n_censored,
        CASE WHEN zeroed = 1 THEN 0e0
          ELSE ${Oracle.qround("exp(ln_sum)")} END AS survival
      FROM s WHERE d_t > 0
      ORDER BY dur_hours""")
  )

  /** Bootstrap replica count for [[qBootstrapCi]]; CI ranks are the
    * standard ceil(q·B) order statistics (2.5% → 3rd, 97.5% → 98th). */
  val BootReplicas = 100

  /** Poisson(1) CDF thresholds in u32 units — floor(P(X ≤ k)·2³²) for
    * k = 0..8, hardcoded as INTEGER literals so the resampling weights are
    * exact integer comparisons in both engines (no float CDF inversion
    * at query time; mass beyond k = 8 — ~1.1e−6 — draws weight 9). */
  val PoissonU32: Seq[Long] = Seq(1580030168L, 3160060337L, 3950075421L,
    4213413783L, 4279248373L, 4292415291L, 4294609777L, 4294923276L,
    4294962463L)

  /** Distributed bootstrap CI of the mean event value — the Poisson
    * bootstrap (Chamandy et al. / Kleiner et al. lineage): classic
    * resampling draws n rows WITH replacement per replica, which cannot be
    * done in one distributed pass; drawing each row's multiplicity
    * Poisson(1) per replica is the standard large-scale approximation and
    * needs only a map-side weight per (row, replica). Every weight is
    * DETERMINISTIC — u32(md5("boot:" || event_id || ":" || b)) compared
    * against the hardcoded integer CDF thresholds [[PoissonU32]] — so the
    * whole resampling replays bit-identically in DuckDB and the CI is
    * hash-checked EXACTLY (no tolerance band needed, unlike the sketch
    * audits). One row: n, point mean, replica count, and the 95%
    * percentile-bootstrap interval.
    *
    * Scale shape: the ×[[BootReplicas]] explode collapses map-side
    * (partial aggregate per replica id) — ≤ B rows per partition cross
    * the one exchange; the CI is an ordered rank selection over the
    * B-row replica relation (the bounded-window discipline). Replica
    * means are qround(decimal sum / integer weight-count). */
  /** (value, b, w) Poisson resampling weights for an events relation —
    * the map-side core shared with graft.streaming.StreamBoot (weights
    * are a pure hash of (event_id, b), so the streamed and batch weights
    * are identical by construction). */
  private[graft] def bootWeights(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val ladder = PoissonU32.zipWithIndex.foldRight(
        lit(PoissonU32.size): org.apache.spark.sql.Column) {
      case ((t, k), alt) => when($"u" < t, lit(k)).otherwise(alt)
    }
    ev.select($"event_id", $"value",
        explode(sequence(lit(0), lit(BootReplicas - 1))).as("b"))
      .withColumn("u", expr(PipelineOps.u32Expr(
        "concat('boot:', cast(event_id as string), ':', cast(b as string))")))
      .withColumn("w", ladder)
  }

  /** CI readout over a (b, ws, wn) replica relation and a 1-row
    * (n, point_mean) relation — shared with the streaming twin's
    * fold-at-query report. */
  private[graft] def bootReport(reps0: org.apache.spark.sql.DataFrame,
      point: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = reps0.sparkSession
    import spark.implicits._
    val reps = reps0.filter($"wn" > 0)
      .select($"b", Det.qround($"ws" / $"wn").as("m"))
    val W = org.apache.spark.sql.expressions.Window
    val ordered = reps.withColumn("rk",
      row_number().over(W.orderBy($"m".asc, $"b".asc)))
    val ci = ordered.agg(
      count(lit(1)).as("n_replicas"),
      max(when($"rk" === 3, $"m")).as("ci_lo"),
      max(when($"rk" === 98, $"m")).as("ci_hi"))
    point.filter($"n" > 0).crossJoin(broadcast(ci))
      .select($"n", $"point_mean", $"n_replicas", $"ci_lo", $"ci_hi")
      .orderBy($"n")
  }

  val qBootstrapCi = GraftQuery(
    "q_bootstrap_ci",
    (spark, dir) => {
      import spark.implicits._
      // spread: the ×100 replica explode + 60M md5 draws would otherwise
      // run on the sf table's SINGLE split (one thread) — measured 10.6 s
      // → ~1 s at sf0.1; weights are content-hashed so partitioning
      // cannot change them
      val reps = bootWeights(Tables.spread(Tables.events(spark, dir)))
        .groupBy($"b")
        .agg(Det.dsum($"w" * $"value").as("ws"), sum($"w").as("wn"))
      val point = Tables.events(spark, dir)
        .agg(count(lit(1)).as("n"), Det.davg($"value").as("point_mean"))
      bootReport(reps, point)
    },
    Some(s"""
      WITH reps AS (
        SELECT b,
          ${Oracle.qround(s"${Oracle.dsum("w * value")} / sum(w)")} AS m
        FROM (
          SELECT value, b,
            CASE ${PoissonU32.zipWithIndex
              .map { case (t, k) => s"WHEN u < $t THEN $k" }
              .mkString(" ")} ELSE ${PoissonU32.size} END AS w
          FROM (
            SELECT value, b,
              ${PipelineOps.u32Sql(
                "'boot:' || CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")}
                AS u
            FROM events
            CROSS JOIN (SELECT unnest(range(0, $BootReplicas)) AS b)))
        GROUP BY b HAVING sum(w) > 0),
      ordered AS (
        SELECT m, row_number() OVER (ORDER BY m ASC, b ASC) AS rk
        FROM reps),
      ci AS (
        SELECT count(*)::BIGINT AS n_replicas,
          max(CASE WHEN rk = 3 THEN m END) AS ci_lo,
          max(CASE WHEN rk = 98 THEN m END) AS ci_hi
        FROM ordered),
      pt AS (
        SELECT count(*)::BIGINT AS n, ${Oracle.davg("value")} AS point_mean
        FROM events HAVING count(*) > 0)
      SELECT n, point_mean, n_replicas, ci_lo, ci_hi
      FROM pt CROSS JOIN ci
      ORDER BY n""")
  )

  /** Association rules (market-basket) over per-(user, day) event-type
    * baskets — the co-occurrence miner behind "users who error also
    * purchase": directional rules a→b with support, confidence and lift.
    * Baskets are (user_id, UTC day) because the per-USER basket is
    * degenerate on this corpus (every user emits every type across a
    * month; within a day the mean basket holds ~2 of 5 types).
    *
    * The A-priori shape that scales: the corpus collapses FIRST to the
    * distinct (user, day, type) relation (persisted — four consumers:
    * basket count, item counts, both sides of the pair join); the
    * within-basket self-join is keyed on the full basket id, so its
    * output is bounded by Σ_baskets k² with k ≤ |event types| — never a
    * corpus×corpus product. The support threshold is CORPUS-RELATIVE
    * (n_both·100 ≥ n_baskets, i.e. ≥1% support) so the rule set stays
    * non-degenerate at every SF instead of pinning an absolute count.
    * All ratios are single integer divisions, [[Det.qround]]ed. */
  /** Distinct (user, day, type) basket-membership relation — the A-priori
    * collapse [[qAssocRules]] runs on; shared with the scale rehearsal so
    * the measured relation IS the executed one. */
  private[graft] def assocBaskets(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import events.sparkSession.implicits._
    events.select($"user_id", expr("ts_us div 86400000000").as("d"),
      $"event_type").distinct()
  }

  /** The within-basket pair stream BEFORE aggregation (one row per
    * (basket, type<type) pair — Σ_baskets C(k,2) rows, k ≤ |event
    * types|): the candidate volume of the rule miner, linear in basket
    * count by construction. Shared by [[qAssocRules]] and the rehearsal. */
  private[graft] def assocPairRows(b: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import b.sparkSession.implicits._
    b.as("a").join(b.as("c"),
      $"a.user_id" === $"c.user_id" && $"a.d" === $"c.d" &&
        $"a.event_type" < $"c.event_type")
  }

  val qAssocRules = GraftQuery(
    "q_assoc_rules",
    (spark, dir) => {
      import spark.implicits._
      val b = assocBaskets(Tables.events(spark, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nb = b.select($"user_id", $"d").distinct()
        .agg(count(lit(1)).as("nb"))
      val items = b.groupBy($"event_type").agg(count(lit(1)).as("ni"))
      // persisted (≤ |event_type|² rows): the symmetrization union reads
      // this twice under DIFFERENT aliases, so the leg plans never
      // canonicalize equal and the basket pair-enumeration re-executed
      // per leg (the q_minhash_tune exchange-reuse lesson)
      val p = assocPairRows(b)
        .groupBy($"a.event_type".as("x"), $"c.event_type".as("y"))
        .agg(count(lit(1)).as("nxy"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val r = p.select($"x".as("ante"), $"y".as("cons"), $"nxy")
        .unionByName(p.select($"y".as("ante"), $"x".as("cons"), $"nxy"))
      r.join(broadcast(items.select($"event_type".as("ante"),
          $"ni".as("n_ante"))), Seq("ante"))
        .join(broadcast(items.select($"event_type".as("cons"),
          $"ni".as("n_cons"))), Seq("cons"))
        .crossJoin(broadcast(nb))
        .filter($"nxy" * 100 >= $"nb")
        .select($"ante", $"cons", $"nxy".as("n_both"), $"n_ante", $"n_cons",
          Det.qround(expr("CAST(nxy AS DOUBLE) / nb")).as("support"),
          Det.qround(expr("CAST(nxy AS DOUBLE) / n_ante")).as("confidence"),
          Det.qround(expr("CAST(nxy AS DOUBLE) * nb / (n_ante * n_cons)"))
            .as("lift"))
        .orderBy($"ante", $"cons")
    },
    Some(s"""
      WITH b AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d, event_type
        FROM events),
      u AS (SELECT count(*)::BIGINT AS nb
            FROM (SELECT DISTINCT user_id, d FROM b)),
      i AS (SELECT event_type, count(*)::BIGINT AS ni FROM b GROUP BY 1),
      p AS (
        SELECT a.event_type AS x, c.event_type AS y, count(*)::BIGINT AS nxy
        FROM b a JOIN b c ON a.user_id = c.user_id AND a.d = c.d
          AND a.event_type < c.event_type
        GROUP BY 1, 2),
      r AS (SELECT x AS ante, y AS cons, nxy FROM p
            UNION ALL SELECT y, x, nxy FROM p)
      SELECT r.ante, r.cons, r.nxy AS n_both, ia.ni AS n_ante, ic.ni AS n_cons,
        ${Oracle.qround("CAST(r.nxy AS DOUBLE) / u.nb")} AS support,
        ${Oracle.qround("CAST(r.nxy AS DOUBLE) / ia.ni")} AS confidence,
        ${Oracle.qround("CAST(r.nxy AS DOUBLE) * u.nb / (ia.ni * ic.ni)")} AS lift
      FROM r JOIN i ia ON r.ante = ia.event_type
        JOIN i ic ON r.cons = ic.event_type CROSS JOIN u
      WHERE r.nxy * 100 >= u.nb
      ORDER BY ante, cons""")
  )

  /** Per-type overdispersion diagnostics of per-user event counts — the
    * count-model selection readout (Poisson assumes var = mean; real user
    * activity rarely obliges): dispersion index var/mean and the
    * method-of-moments negative-binomial size r = m²/(v − m) where
    * overdispersed. The corpus collapses to (user, type) counts in one
    * exchange; everything downstream is |types|-sized decimal-exact
    * moments (the q_ab_welch shapes per group). */
  val qOverdispersion = GraftQuery(
    "q_overdispersion",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("c"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_users"),
          Det.dsum($"c").as("sx"), Det.dsum($"c" * $"c").as("sxx"))
        .filter($"n_users" > 1)
        .select($"event_type", $"n_users",
          Det.qround(expr("sx / n_users")).as("mean_count"),
          Det.qround(expr("(sxx - sx * sx / n_users) / (n_users - 1)"))
            .as("var_count"),
          Det.qround(expr(
            "((sxx - sx * sx / n_users) / (n_users - 1)) / (sx / n_users)"))
            .as("dispersion"),
          expr("""CASE WHEN (sxx - sx * sx / n_users) / (n_users - 1)
                > sx / n_users THEN
              CAST(floor((sx / n_users) * (sx / n_users) /
                ((sxx - sx * sx / n_users) / (n_users - 1) - sx / n_users)
                * 1000000.0 + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE)
            END""").as("nb_size"))
        .orderBy($"event_type")
    },
    Some(s"""
      WITH pc AS (
        SELECT user_id, event_type, count(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      g AS (
        SELECT event_type, count(*)::BIGINT AS n_users,
          ${Oracle.dsum("c")} AS sx, ${Oracle.dsum("c * c")} AS sxx
        FROM pc GROUP BY 1)
      SELECT event_type, n_users,
        ${Oracle.qround("sx / n_users")} AS mean_count,
        ${Oracle.qround("(sxx - sx * sx / n_users) / (n_users - 1)")}
          AS var_count,
        ${Oracle.qround(
          "((sxx - sx * sx / n_users) / (n_users - 1)) / (sx / n_users)")}
          AS dispersion,
        CASE WHEN (sxx - sx * sx / n_users) / (n_users - 1)
            > sx / n_users THEN
          CAST(floor((sx / n_users) * (sx / n_users) /
            ((sxx - sx * sx / n_users) / (n_users - 1) - sx / n_users)
            * 1000000.0 + 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE)
        END AS nb_size
      FROM g WHERE n_users > 1
      ORDER BY event_type""")
  )

  /** z_{α/2} + z_{β} for two-sided α = 0.05, power = 0.80 — the classic
    * 1.959964 + 0.841621; the SQUARED sum is precomputed here and
    * interpolated into both engines as one round-tripping literal. */
  private val ZSum2: Double = {
    val z = 1.959964 + 0.841621
    z * z
  }

  /** Experiment power analysis from the observed arm moments — the
    * design readout next to q_ab_welch's significance readout: given the
    * click/purchase arms' pooled variance and observed effect, the
    * per-arm sample size a FUTURE experiment needs to detect that effect
    * at α = 0.05 / power = 0.80, and the minimal detectable effect at
    * the CURRENT size. One corpus aggregate (the Welch moments), then
    * one-row arithmetic; the z-quantile constant is a precomputed
    * literal so no inverse-CDF is evaluated at query time. */
  /** Power/MDE design readout from the finished arm moments. */
  private[graft] def powerReport(g0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = g0.sparkSession
    import spark.implicits._
    val g = g0.select($"event_type", $"n",
      Det.qround(expr("sx / n")).as("mean"),
      when($"n" > 1, Det.qround(
        expr("(sxx - sx * sx / n) / (n - 1)"))).as("variance"))
    val a = g.filter($"event_type" === "click")
      .select($"n".as("n1"), $"mean".as("m1"), $"variance".as("v1"))
    val b = g.filter($"event_type" === "purchase")
      .select($"n".as("n2"), $"mean".as("m2"), $"variance".as("v2"))
    a.crossJoin(broadcast(b))
      .withColumn("s2p", expr(
        "(v1 * (n1 - 1) + v2 * (n2 - 1)) / (n1 + n2 - 2)"))
      .withColumn("delta", expr("m1 - m2"))
      .select($"n1", $"n2", Det.qround($"delta").as("delta"),
        Det.qround($"s2p").as("s2_pooled"),
        expr(s"""CASE WHEN delta <> 0.0 THEN
            CAST(ceil(2.0 * s2p * $ZSum2 / (delta * delta)) AS BIGINT)
          END""").as("n_per_arm_required"),
        Det.qround(expr(
          s"sqrt(2.0 * s2p * $ZSum2 / CAST(least(n1, n2) AS DOUBLE))"))
          .as("mde_at_current_n"))
      .orderBy($"n1")
  }

  val qAbPower = GraftQuery(
    "q_ab_power",
    (spark, dir) =>
      powerReport(armFinish(armMomentsDec(Tables.events(spark, dir)))),
    Some(s"""
      WITH g AS (
        SELECT event_type, count(*) AS n,
          ${Oracle.dsum("value")} AS sx,
          ${Oracle.dsum("value * value")} AS sxx
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1),
      m AS (
        SELECT event_type, n,
          ${Oracle.qround("sx / n")} AS mean,
          CASE WHEN n > 1 THEN
            ${Oracle.qround("(sxx - sx * sx / n) / (n - 1)")}
          END AS variance
        FROM g),
      a AS (SELECT n AS n1, mean AS m1, variance AS v1 FROM m
            WHERE event_type = 'click'),
      b AS (SELECT n AS n2, mean AS m2, variance AS v2 FROM m
            WHERE event_type = 'purchase'),
      j AS (
        SELECT *, (v1 * (n1 - 1) + v2 * (n2 - 1)) / (n1 + n2 - 2) AS s2p,
          m1 - m2 AS delta
        FROM a CROSS JOIN b)
      SELECT n1, n2, ${Oracle.qround("delta")} AS delta,
        ${Oracle.qround("s2p")} AS s2_pooled,
        CASE WHEN delta <> 0.0 THEN
          CAST(ceil(2.0 * s2p * $ZSum2 / (delta * delta)) AS BIGINT)
        END AS n_per_arm_required,
        ${Oracle.qround(
          s"sqrt(2.0 * s2p * $ZSum2 / CAST(least(n1, n2) AS DOUBLE))")}
          AS mde_at_current_n
      FROM j ORDER BY n1""")
  )

  /** CUPED variance reduction (Deng et al. 2013 — the industry-standard
    * experiment-sensitivity booster): per user, the mean event value in
    * the PRE window (days 0–14) becomes the covariate x for the POST
    * window metric y (days 15+); θ = cov(x,y)/var(x) and the adjusted
    * metric y − θ·x has variance var(y)·(1 − ρ²). The readout reports θ
    * and the achieved variance-reduction fraction — on this corpus ≈ 0
    * BY DESIGN (user values are i.i.d. across days, so pre behavior
    * predicts nothing: the audit proves the independence the generator
    * promises, the same honest-null pattern as q_roc_auc).
    *
    * Scale shape: one user-keyed exchange builds the per-user (x, y)
    * relation (conditional decimal sums for both windows in ONE pass);
    * the covariance moments are decimal-cast sums over that users-sized
    * relation; everything after is 1-row arithmetic. */
  /** Pre/post window boundary for [[qCuped]]: epoch day of 2024-01-16
    * UTC — the corpus spans 2024-01-01..01-30, so days 1–15 are the
    * pre-experiment covariate window and 16+ the experiment window. */
  val CupedCutoffDay = 19738L

  val qCuped = GraftQuery(
    "q_cuped",
    (spark, dir) => {
      import spark.implicits._
      val u = Tables.events(spark, dir)
        .select($"user_id", expr(s"ts_us div $DayUs").as("day"), $"value")
        .groupBy($"user_id")
        .agg(
          count(when($"day" < CupedCutoffDay, 1)).as("np"),
          count(when($"day" >= CupedCutoffDay, 1)).as("nq"),
          sum(when($"day" < CupedCutoffDay, $"value").otherwise(lit(0.0))
            .cast(DecimalType(38, 9))).as("sxp"),
          sum(when($"day" >= CupedCutoffDay, $"value").otherwise(lit(0.0))
            .cast(DecimalType(38, 9))).as("syp"))
        .filter($"np" > 0 && $"nq" > 0)
        .select(
          (expr("CAST(sxp AS DOUBLE)") / $"np").as("x"),
          (expr("CAST(syp AS DOUBLE)") / $"nq").as("y"))
      def d(e: String) = sum(expr(s"CAST($e AS DECIMAL(38,9))"))
      u.agg(count(lit(1)).as("n"), d("x").as("sx"), d("y").as("sy"),
          d("x * y").as("sxy"), d("x * x").as("sxx"), d("y * y").as("syy"))
        .select($"n",
          expr("CAST(sx AS DOUBLE)").as("sxd"),
          expr("CAST(sy AS DOUBLE)").as("syd"),
          expr("CAST(sxy AS DOUBLE)").as("sxyd"),
          expr("CAST(sxx AS DOUBLE)").as("sxxd"),
          expr("CAST(syy AS DOUBLE)").as("syyd"))
        .withColumn("covxy", expr("(sxyd - sxd * syd / n) / (n - 1)"))
        .withColumn("varx", expr("(sxxd - sxd * sxd / n) / (n - 1)"))
        .withColumn("vary", expr("(syyd - syd * syd / n) / (n - 1)"))
        .withColumn("theta", expr("covxy / varx"))
        .select($"n".as("n_users"),
          Det.qround($"theta").as("theta"),
          Det.qround($"vary").as("var_y"),
          Det.qround(expr("vary - covxy * covxy / varx")).as("var_adjusted"),
          Det.qround(expr("(covxy * covxy / varx) / vary"))
            .as("variance_reduction"))
        .orderBy($"n_users")
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, epoch_us(ts) // $DayUs AS day, value FROM events),
      u AS (
        SELECT
          CAST(sum(CASE WHEN day < $CupedCutoffDay
              THEN CAST(value AS DECIMAL(38,9)) ELSE 0.0 END) AS DOUBLE)
            / count(*) FILTER (WHERE day < $CupedCutoffDay) AS x,
          CAST(sum(CASE WHEN day >= $CupedCutoffDay
              THEN CAST(value AS DECIMAL(38,9)) ELSE 0.0 END) AS DOUBLE)
            / count(*) FILTER (WHERE day >= $CupedCutoffDay) AS y
        FROM ev GROUP BY user_id
        HAVING count(*) FILTER (WHERE day < $CupedCutoffDay) > 0
          AND count(*) FILTER (WHERE day >= $CupedCutoffDay) > 0),
      m AS (
        SELECT count(*)::BIGINT AS n,
          (sum(CAST(x AS DECIMAL(38,9))))::DOUBLE AS sxd,
          (sum(CAST(y AS DECIMAL(38,9))))::DOUBLE AS syd,
          (sum(CAST(x * y AS DECIMAL(38,9))))::DOUBLE AS sxyd,
          (sum(CAST(x * x AS DECIMAL(38,9))))::DOUBLE AS sxxd,
          (sum(CAST(y * y AS DECIMAL(38,9))))::DOUBLE AS syyd
        FROM u),
      c AS (
        SELECT *, (sxyd - sxd * syd / n) / (n - 1) AS covxy,
          (sxxd - sxd * sxd / n) / (n - 1) AS varx,
          (syyd - syd * syd / n) / (n - 1) AS vary
        FROM m)
      SELECT n AS n_users,
        ${Oracle.qround("covxy / varx")} AS theta,
        ${Oracle.qround("vary")} AS var_y,
        ${Oracle.qround("vary - covxy * covxy / varx")} AS var_adjusted,
        ${Oracle.qround("(covxy * covxy / varx) / vary")}
          AS variance_reduction
      FROM c ORDER BY n_users""")
  )

  /** Entropy rate of the user-journey Markov chain — the predictability
    * readout over the SAME transition counts as q_markov_transitions:
    * conditional entropy H(next | prev), marginal H(next), and the
    * information the previous event carries (their difference, ≈ 0 nats
    * on this corpus — journeys are memoryless BY DESIGN, agreeing with
    * the flat transition matrix). Every addend is one ln of an exact
    * integer ratio, decimal-cast before the \|types\|²-row sums; margins
    * broadcast back onto the bounded cell relation (the q_mutual_info
    * shape on the lagged pairs). */
  val qMarkovEntropy = GraftQuery(
    "q_markov_entropy",
    (spark, dir) => {
      import spark.implicits._
      val c = markovCounts(Tables.events(spark, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = c.groupBy($"prev_type").agg(sum($"n").as("rn"))
      val cols = c.groupBy($"next_type").agg(sum($"n").as("cn"))
      val hcond = c.join(broadcast(rows), Seq("prev_type"))
        .agg(coalesce(sum($"n"), lit(0L)).as("n_transitions"),
          sum(expr(
            "CAST(CAST(n AS DOUBLE) * ln(CAST(rn AS DOUBLE) / n) AS DECIMAL(38,9))"))
            .cast(DoubleType).as("hcs"))
      val tot = c.agg(coalesce(sum($"n"), lit(0L)).as("nt"))
      val hmarg = cols.crossJoin(broadcast(tot))
        .agg(sum(expr(
          "CAST(CAST(cn AS DOUBLE) * ln(CAST(nt AS DOUBLE) / cn) AS DECIMAL(38,9))"))
          .cast(DoubleType).as("hms"))
      hcond.crossJoin(broadcast(hmarg))
        .select($"n_transitions",
          Det.qround(expr("hcs / n_transitions")).as("h_cond"),
          Det.qround(expr("hms / n_transitions")).as("h_marg"),
          Det.qround(expr("(hms - hcs) / n_transitions")).as("info_gain"))
        .orderBy($"n_transitions")
    },
    Some(s"""
      WITH pairs AS (
        SELECT event_type,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_type
        FROM events),
      c AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM pairs WHERE prev_type IS NOT NULL
        GROUP BY 1, 2),
      r AS (SELECT prev_type, sum(n)::BIGINT AS rn FROM c GROUP BY 1),
      k AS (SELECT next_type, sum(n)::BIGINT AS cn FROM c GROUP BY 1),
      tot AS (SELECT coalesce(sum(n), 0)::BIGINT AS nt FROM c),
      hc AS (
        SELECT coalesce(sum(n), 0)::BIGINT AS n_transitions,
          (sum(CAST(CAST(n AS DOUBLE) * ln(CAST(rn AS DOUBLE) / n)
            AS DECIMAL(38,9))))::DOUBLE AS hcs
        FROM c JOIN r USING (prev_type)),
      hm AS (
        SELECT (sum(CAST(CAST(cn AS DOUBLE) * ln(CAST(nt AS DOUBLE) / cn)
          AS DECIMAL(38,9))))::DOUBLE AS hms
        FROM k CROSS JOIN tot)
      SELECT n_transitions,
        ${Oracle.qround("hcs / n_transitions")} AS h_cond,
        ${Oracle.qround("hms / n_transitions")} AS h_marg,
        ${Oracle.qround("(hms - hcs) / n_transitions")} AS info_gain
      FROM hc CROSS JOIN hm ORDER BY n_transitions""")
  )

  /** Benjamini–Hochberg FDR level for [[qBhFdr]] ("0.1" parses to the
    * identical IEEE double in both engines). */
  val FdrQ = 0.1

  /** UNROUNDED per-(event_type, hour-of-day) decimal moments (n, Σx, Σx²)
    * — ADDITIVE, so graft.streaming.StreamFdr maintains this relation per
    * micro-batch (the [[armMomentsDec]] discipline); the fold rounds once
    * through [[fdrFinish]] and feeds [[bhReport]]. */
  private[graft] def fdrCellMomentsDec(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.withColumn("hour", expr("pmod(ts_us, 86400000000) div 3600000000"))
      .groupBy($"event_type", $"hour")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(38, 9))).as("sx_d"),
        sum(($"value" * $"value").cast(DecimalType(38, 9))).as("sxx_d"))
  }

  /** Round each decimal cell moment once (the Det.dsum output shape). */
  private[graft] def fdrFinish(dec: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = dec.sparkSession
    import spark.implicits._
    dec.select($"event_type", $"hour", $"n",
      round($"sx_d", 6).cast(DoubleType).as("sx"),
      round($"sxx_d", 6).cast(DoubleType).as("sxx"))
  }

  /** The BH step-up readout over a finished (event_type, hour, n, sx,
    * sxx) cell relation — shared by [[qBhFdr]] and the streaming
    * maintainer so the two surfaces cannot drift. */
  private[graft] def bhReport(cells0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = cells0.sparkSession
    import spark.implicits._
    val cells = cells0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val glob = cells.agg(
        sum($"n").as("gn"),
        sum($"sx".cast(DecimalType(38, 9))).cast(DoubleType).as("gx"))
      val tested = cells.crossJoin(broadcast(glob))
        .select($"event_type", $"hour", $"n",
          Det.qround($"sx" / $"n").as("mean"),
          when($"n" > 1, Det.qround(
            ($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1))).as("variance"),
          Det.qround($"gx" / $"gn").as("g_mean"))
        .filter($"variance".isNotNull && $"variance" > 0)
        .withColumn("z_stat",
          Det.qround(($"mean" - $"g_mean") / sqrt($"variance" / $"n")))
        .withColumn("x", abs($"z_stat") / sqrt(lit(2.0)))
        .withColumn("t", lit(1.0) / (lit(1.0) + lit(0.3275911) * $"x"))
        .withColumn("p_value", Det.qround(
          $"t" * (lit(0.254829592) + $"t" * (lit(-0.284496736) + $"t" *
            (lit(1.421413741) + $"t" * (lit(-1.453152027) +
              $"t" * lit(1.061405429))))) * exp(-($"x" * $"x"))))
        .select($"event_type", $"hour", $"n", $"mean", $"z_stat",
          $"p_value")
      // ascending-p ranking over the bounded cell grid (≤ |types|·24 rows
      // by construction — never corpus-sized)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"p_value", $"event_type", $"hour")
      val ranked = tested.withColumn("p_rank",
        row_number().over(w).cast(LongType))
      val m = ranked.agg(count(lit(1)).as("m"))
      val withCrit = ranked.crossJoin(broadcast(m))
        .withColumn("crit", Det.qround($"p_rank" * lit(FdrQ) / $"m"))
      val kmax = withCrit
        .agg(max(when($"p_value" <= $"crit", $"p_rank")).as("k"))
      withCrit.crossJoin(broadcast(kmax))
        .select($"event_type", $"hour", $"n", $"mean", $"z_stat",
          $"p_value", $"p_rank", $"crit",
          when($"p_rank" <= coalesce($"k", lit(0L)), 1L).otherwise(0L)
            .as("rejected"))
        .orderBy($"p_rank")
  }

  /** Benjamini–Hochberg FDR screen over the (event_type × hour-of-day)
    * metric grid — the multiple-testing correction every experimentation
    * platform applies when it reads MANY cell-level readouts at once
    * (Benjamini & Hochberg 1995): each cell's mean `value` is z-tested
    * against the corpus mean, two-sided p-values come from the normal
    * tail, and BH rejects the top-k of the ascending p ranking where
    * p_(i) ≤ i·q/m. On this synthetic corpus the nulls are mostly true
    * by construction, so the honest readout is few/no rejections — the
    * machinery (rank, step-up threshold, max-k cutoff) is what is
    * verified, per the q_cuped honest-null discipline.
    *
    * The normal tail is the Abramowitz–Stegun 7.1.26 erfc approximation
    * (|error| < 1.5e-7, far inside the 6-dp round): both engines evaluate
    * the IDENTICAL Horner tree, so the approximation cannot drift
    * cross-engine — the same determinism argument as the engine-wide
    * `ln` usage (BM25, entropy). p, crit and the rejection decision are
    * all [[Det.qround]]ed before comparison, so the BH cutoff is decided
    * on bit-identical doubles.
    *
    * Scale shape: ONE partial+final corpus aggregate collapses events to
    * the ≤|types|·24-cell grid (decimal raw moments, the q_ab_welch
    * pattern); the global mean re-aggregates the CELL relation (no second
    * corpus pass); the p ranking, m count and max-k cutoff are windows/
    * aggregates over the bounded grid with 1-row broadcasts back. At
    * 100 TB the only corpus-sized work is the first aggregate. */
  val qBhFdr = GraftQuery(
    "q_bh_fdr",
    (spark, dir) =>
      bhReport(fdrFinish(fdrCellMomentsDec(Tables.events(spark, dir)))),
    Some(s"""
      WITH cells AS (
        SELECT event_type,
          (((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000)
            // 3600000000 AS hour,
          count(*)::BIGINT AS n,
          ${Oracle.dsum("value")} AS sx,
          ${Oracle.dsum("value * value")} AS sxx
        FROM events GROUP BY 1, 2),
      gstats AS (
        SELECT sum(n)::BIGINT AS gn,
          sum(CAST(sx AS DECIMAL(38,9)))::DOUBLE AS gx
        FROM cells),
      tested AS (
        SELECT event_type, hour, n,
          ${Oracle.qround("sx / n")} AS mean,
          CASE WHEN n > 1 THEN
            ${Oracle.qround("(sxx - sx * sx / n) / (n - 1)")}
          END AS variance,
          ${Oracle.qround("gx / gn")} AS g_mean
        FROM cells CROSS JOIN gstats),
      zed AS (
        SELECT event_type, hour, n, mean,
          ${Oracle.qround("(mean - g_mean) / sqrt(variance / n)")} AS z_stat
        FROM tested WHERE variance IS NOT NULL AND variance > 0),
      pv AS (
        SELECT event_type, hour, n, mean, z_stat,
          ${Oracle.qround("""t * (0.254829592e0 + t * (-0.284496736e0 +
              t * (1.421413741e0 + t * (-1.453152027e0 +
              t * 1.061405429e0)))) * exp(-(x * x))""")} AS p_value
        FROM (
          SELECT event_type, hour, n, mean, z_stat,
            abs(z_stat) / sqrt(2e0) AS x,
            1e0 / (1e0 + 0.3275911e0 * (abs(z_stat) / sqrt(2e0))) AS t
          FROM zed)),
      rk AS (
        SELECT *, row_number()
          OVER (ORDER BY p_value, event_type, hour)::BIGINT AS p_rank
        FROM pv),
      mm AS (SELECT count(*)::BIGINT AS m FROM rk),
      cr AS (
        SELECT *, ${Oracle.qround(s"p_rank * ${FdrQ}e0 / m")} AS crit
        FROM rk CROSS JOIN mm),
      km AS (
        SELECT max(CASE WHEN p_value <= crit THEN p_rank END) AS k FROM cr)
      SELECT event_type, hour, n, mean, z_stat, p_value, p_rank, crit,
        (CASE WHEN p_rank <= coalesce(k, 0) THEN 1 ELSE 0 END)::BIGINT
          AS rejected
      FROM cr CROSS JOIN km
      ORDER BY p_rank""")
  )

  /** UNROUNDED per-(arm = user_id % 2, post = day ≥ CupedCutoffDay) decimal
    * moments (n, Σx, Σx²) — ADDITIVE (the [[armMomentsDec]] discipline), so
    * a streaming maintainer can fold per-batch deltas; the fold rounds once
    * through [[didFinish]] and feeds [[didReport]]. */
  private[graft] def didCellMomentsDec(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.groupBy(($"user_id" % 2).as("t"),
        (expr(s"ts_us div $DayUs") >= CupedCutoffDay).as("post"))
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(38, 9))).as("sx_d"),
        sum(($"value" * $"value").cast(DecimalType(38, 9))).as("sxx_d"))
  }

  /** Round each decimal cell moment once (the Det.dsum output shape). */
  private[graft] def didFinish(dec: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = dec.sparkSession
    import spark.implicits._
    dec.select($"t", $"post", $"n",
      round($"sx_d", 6).cast(DoubleType).as("sx"),
      round($"sxx_d", 6).cast(DoubleType).as("sxx"))
  }

  /** The DiD readout over a finished 4-cell (t, post, n, sx, sxx)
    * relation — shared by [[qDid]] and any streaming maintainer. */
  private[graft] def didReport(cells: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    def cell(t: Int, post: Boolean, col: String) =
      sum(when($"t" === t && $"post" === post, org.apache.spark.sql.functions.col(col)))
    val wide = cells.agg(
      cell(1, post = false, "n").as("n_t_pre"),
      cell(1, post = false, "sx").as("sx_t_pre"),
      cell(1, post = false, "sxx").as("sxx_t_pre"),
      cell(1, post = true, "n").as("n_t_post"),
      cell(1, post = true, "sx").as("sx_t_post"),
      cell(1, post = true, "sxx").as("sxx_t_post"),
      cell(0, post = false, "n").as("n_c_pre"),
      cell(0, post = false, "sx").as("sx_c_pre"),
      cell(0, post = false, "sxx").as("sxx_c_pre"),
      cell(0, post = true, "n").as("n_c_post"),
      cell(0, post = true, "sx").as("sx_c_post"),
      cell(0, post = true, "sxx").as("sxx_c_post"))
      .filter($"n_t_pre" > 1 && $"n_t_post" > 1 && $"n_c_pre" > 1 &&
        $"n_c_post" > 1)
    def m(p: String) = Det.qround(col(s"sx_$p") / col(s"n_$p"))
    def se2(p: String) =
      (col(s"sxx_$p") - col(s"sx_$p") * col(s"sx_$p") / col(s"n_$p")) /
        (col(s"n_$p") - 1) / col(s"n_$p")
    wide.select(
      ($"n_t_pre" + $"n_t_post" + $"n_c_pre" + $"n_c_post").as("n"),
      m("t_pre").as("m_t_pre"), m("t_post").as("m_t_post"),
      m("c_pre").as("m_c_pre"), m("c_post").as("m_c_post"),
      Det.qround((m("t_post") - m("t_pre")) - (m("c_post") - m("c_pre")))
        .as("did"),
      (se2("t_pre") + se2("t_post") + se2("c_pre") + se2("c_post"))
        .as("v0"))
      .select($"n", $"m_t_pre", $"m_t_post", $"m_c_pre", $"m_c_post",
        $"did",
        when($"v0" > 0, Det.qround(sqrt($"v0"))).as("se"),
        when($"v0" > 0, Det.qround($"did" / sqrt($"v0"))).as("z_stat"))
  }

  /** Difference-in-differences — the workhorse quasi-experimental
    * estimator (Card & Krueger 1994 canon): treatment T = user_id % 2,
    * period split = the [[CupedCutoffDay]] pre/post boundary q_cuped
    * already uses, outcome = event value. DiD = (ȳ_T,post − ȳ_T,pre) −
    * (ȳ_C,post − ȳ_C,pre), SE from the four independent cell variances,
    * z — with T independent of value by construction, the honest-null
    * readout (the q_cuped/q_strata_ate discipline): the parallel-trends
    * machinery is what is verified, not a planted effect.
    *
    * Scale shape: ONE corpus aggregate to a 4-cell decimal moment grid
    * (additive, streaming-twin-ready); the estimator is a scalar IEEE
    * tree over that one row. Any empty/singleton cell degrades to an
    * empty readout rather than a division error. */
  val qDid = GraftQuery(
    "q_did",
    (spark, dir) =>
      didReport(didFinish(didCellMomentsDec(Tables.events(spark, dir)))),
    Some(s"""
      WITH cells AS (
        SELECT user_id % 2 AS t,
          (epoch_us(ts) // $DayUs >= $CupedCutoffDay) AS post,
          count(*)::BIGINT AS n,
          round(sum(CAST(value AS DECIMAL(38,9))), 6)::DOUBLE AS sx,
          round(sum(CAST(value * value AS DECIMAL(38,9))), 6)::DOUBLE AS sxx
        FROM events GROUP BY 1, 2),
      wide AS (
        SELECT
          sum(CASE WHEN t = 1 AND NOT post THEN n END)::BIGINT AS n_t_pre,
          sum(CASE WHEN t = 1 AND NOT post THEN sx END) AS sx_t_pre,
          sum(CASE WHEN t = 1 AND NOT post THEN sxx END) AS sxx_t_pre,
          sum(CASE WHEN t = 1 AND post THEN n END)::BIGINT AS n_t_post,
          sum(CASE WHEN t = 1 AND post THEN sx END) AS sx_t_post,
          sum(CASE WHEN t = 1 AND post THEN sxx END) AS sxx_t_post,
          sum(CASE WHEN t = 0 AND NOT post THEN n END)::BIGINT AS n_c_pre,
          sum(CASE WHEN t = 0 AND NOT post THEN sx END) AS sx_c_pre,
          sum(CASE WHEN t = 0 AND NOT post THEN sxx END) AS sxx_c_pre,
          sum(CASE WHEN t = 0 AND post THEN n END)::BIGINT AS n_c_post,
          sum(CASE WHEN t = 0 AND post THEN sx END) AS sx_c_post,
          sum(CASE WHEN t = 0 AND post THEN sxx END) AS sxx_c_post
        FROM cells),
      ok AS (
        SELECT * FROM wide
        WHERE n_t_pre > 1 AND n_t_post > 1 AND n_c_pre > 1 AND n_c_post > 1),
      est AS (
        SELECT
          (n_t_pre + n_t_post + n_c_pre + n_c_post)::BIGINT AS n,
          ${Oracle.qround("sx_t_pre / n_t_pre")} AS m_t_pre,
          ${Oracle.qround("sx_t_post / n_t_post")} AS m_t_post,
          ${Oracle.qround("sx_c_pre / n_c_pre")} AS m_c_pre,
          ${Oracle.qround("sx_c_post / n_c_post")} AS m_c_post,
          ((sxx_t_pre - sx_t_pre * sx_t_pre / n_t_pre) / (n_t_pre - 1)
              / n_t_pre
            + (sxx_t_post - sx_t_post * sx_t_post / n_t_post)
              / (n_t_post - 1) / n_t_post
            + (sxx_c_pre - sx_c_pre * sx_c_pre / n_c_pre) / (n_c_pre - 1)
              / n_c_pre
            + (sxx_c_post - sx_c_post * sx_c_post / n_c_post)
              / (n_c_post - 1) / n_c_post) AS v0
        FROM ok),
      est2 AS (
        SELECT n, m_t_pre, m_t_post, m_c_pre, m_c_post, v0,
          ${Oracle.qround("(m_t_post - m_t_pre) - (m_c_post - m_c_pre)")}
            AS did
        FROM est)
      SELECT n, m_t_pre, m_t_post, m_c_pre, m_c_post, did,
        CASE WHEN v0 > 0 THEN ${Oracle.qround("sqrt(v0)")} END AS se,
        CASE WHEN v0 > 0 THEN ${Oracle.qround("did / sqrt(v0)")} END
          AS z_stat
      FROM est2
      ORDER BY n""")
  )

  /** UNROUNDED per-(stratum = event_type, arm = user_id % 2) decimal
    * moments (n, Σx, Σx²) — ADDITIVE (the [[armMomentsDec]] discipline),
    * so a streaming maintainer can fold per-batch deltas; the fold rounds
    * once through [[strataFinish]] and feeds [[strataAteReport]]. */
  private[graft] def strataCellMomentsDec(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.groupBy($"event_type".as("stratum"), ($"user_id" % 2).as("t"))
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(38, 9))).as("sx_d"),
        sum(($"value" * $"value").cast(DecimalType(38, 9))).as("sxx_d"))
  }

  /** Round each decimal cell moment once (the Det.dsum output shape). */
  private[graft] def strataFinish(dec: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = dec.sparkSession
    import spark.implicits._
    dec.select($"stratum", $"t", $"n",
      round($"sx_d", 6).cast(DoubleType).as("sx"),
      round($"sxx_d", 6).cast(DoubleType).as("sxx"))
  }

  /** The post-stratification readout over a finished (stratum, t, n, sx,
    * sxx) cell relation — shared by [[qStrataAte]] and the streaming
    * maintainer so the two surfaces cannot drift. */
  private[graft] def strataAteReport(cells: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    // both-arm strata only (the estimator's common-support requirement)
    val wide = cells.groupBy($"stratum")
      .agg(sum(when($"t" === 1, $"n")).as("n1"),
        sum(when($"t" === 1, $"sx")).as("sx1"),
        sum(when($"t" === 1, $"sxx")).as("sxx1"),
        sum(when($"t" === 0, $"n")).as("n0"),
        sum(when($"t" === 0, $"sx")).as("sx0"),
        sum(when($"t" === 0, $"sxx")).as("sxx0"))
      .filter($"n1" > 0 && $"n0" > 0)
    val tot = wide.agg(sum($"n1" + $"n0").as("nn"),
      sum($"n1").as("nt"), sum($"n0").as("nc"),
      round(sum($"sx1".cast(DecimalType(38, 9))), 6).cast(DoubleType)
        .as("sxt"),
      round(sum($"sx0".cast(DecimalType(38, 9))), 6).cast(DoubleType)
        .as("sxc"))
    def variance(sxx: org.apache.spark.sql.Column,
        sx: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      when(n > 1, (sxx - sx * sx / n) / (n - 1))
    val per = wide.crossJoin(broadcast(tot))
      .select($"stratum", $"n1", $"n0", $"nn", $"nt", $"nc", $"sxt", $"sxc",
        Det.qround($"sx1" / $"n1" - $"sx0" / $"n0").as("d_s"),
        (($"n1" + $"n0").cast(DoubleType) / $"nn").as("w_s"),
        (variance($"sxx1", $"sx1", $"n1") / $"n1" +
          variance($"sxx0", $"sx0", $"n0") / $"n0").as("v_s"))
      .select($"stratum", $"nn", $"nt", $"nc", $"sxt", $"sxc",
        Det.qround($"d_s" * $"w_s").as("wd"),
        Det.qround($"v_s" * $"w_s" * $"w_s").as("wv"))
    def d6(c: org.apache.spark.sql.Column) =
      round(sum(c.cast(DecimalType(38, 9))), 6).cast(DoubleType)
    per.groupBy($"nn", $"nt", $"nc", $"sxt", $"sxc")
      .agg(count(lit(1)).as("n_strata"), d6($"wd").as("ate"),
        d6($"wv").as("var_sum"))
      .select($"n_strata", $"nn".as("n"), $"nt".as("n_treat"),
        $"nc".as("n_ctrl"),
        Det.qround($"sxt" / $"nt" - $"sxc" / $"nc").as("diff_raw"),
        $"ate".as("ate_strat"),
        when($"var_sum" > 0, Det.qround(sqrt($"var_sum"))).as("se_strat"),
        when($"var_sum" > 0,
          Det.qround($"ate" / sqrt($"var_sum"))).as("z_stat"))
  }

  /** Post-stratification ATE — the exact-matching causal estimator every
    * experimentation/observational readout starts from (Imbens & Rubin
    * 2015 ch. 17; "stratify, difference within, reweight by stratum
    * mass"): treatment T = user_id % 2 (independent of value by
    * construction — the honest-null readout, per the q_cuped discipline),
    * outcome = event value, strata = event_type. Emits the UNADJUSTED
    * treated−control difference beside the stratified estimate Σ w_s·Δ_s,
    * its SE √(Σ w_s²·(s²₁/n₁ + s²₀/n₀)) and z — the side-by-side a
    * reviewer reads to see what stratification absorbed. Strata missing
    * either arm are dropped (common support), and the raw diff is
    * computed over the SAME supported population so the two estimates
    * answer the same question.
    *
    * Exactness: one corpus aggregate to the ≤|types|·2-cell moment grid
    * (decimal, rounded once through [[strataFinish]]); every cross-stratum
    * reduction 6-dp-prerounds its addends then decimal-sums (the q_anova_f
    * discipline). Scale shape: at 100 TB the only corpus-priced work is
    * the first aggregate; the estimator itself is arithmetic over a
    * bounded grid with a 1-row broadcast of the totals. */
  val qStrataAte = GraftQuery(
    "q_strata_ate",
    (spark, dir) =>
      strataAteReport(strataFinish(strataCellMomentsDec(
        Tables.events(spark, dir)))),
    Some(s"""
      WITH cells AS (
        SELECT event_type AS stratum, user_id % 2 AS t,
          count(*)::BIGINT AS n,
          round(sum(CAST(value AS DECIMAL(38,9))), 6)::DOUBLE AS sx,
          round(sum(CAST(value * value AS DECIMAL(38,9))), 6)::DOUBLE AS sxx
        FROM events GROUP BY 1, 2),
      wide AS (
        SELECT stratum,
          sum(CASE WHEN t = 1 THEN n END)::BIGINT AS n1,
          sum(CASE WHEN t = 1 THEN sx END) AS sx1,
          sum(CASE WHEN t = 1 THEN sxx END) AS sxx1,
          sum(CASE WHEN t = 0 THEN n END)::BIGINT AS n0,
          sum(CASE WHEN t = 0 THEN sx END) AS sx0,
          sum(CASE WHEN t = 0 THEN sxx END) AS sxx0
        FROM cells GROUP BY stratum
        HAVING n1 > 0 AND n0 > 0),
      tot AS (
        SELECT sum(n1 + n0)::BIGINT AS nn, sum(n1)::BIGINT AS nt,
          sum(n0)::BIGINT AS nc,
          round(sum(CAST(sx1 AS DECIMAL(38,9))), 6)::DOUBLE AS sxt,
          round(sum(CAST(sx0 AS DECIMAL(38,9))), 6)::DOUBLE AS sxc
        FROM wide),
      per AS (
        SELECT nn, nt, nc, sxt, sxc,
          ${Oracle.qround("sx1 / n1 - sx0 / n0")} AS d_s_,
          (n1 + n0)::DOUBLE / nn AS w_s,
          (CASE WHEN n1 > 1 THEN (sxx1 - sx1 * sx1 / n1) / (n1 - 1) END) / n1
            + (CASE WHEN n0 > 1 THEN (sxx0 - sx0 * sx0 / n0) / (n0 - 1) END)
              / n0 AS v_s
        FROM wide CROSS JOIN tot),
      per2 AS (
        SELECT nn, nt, nc, sxt, sxc,
          ${Oracle.qround("d_s_ * w_s")} AS wd,
          ${Oracle.qround("v_s * w_s * w_s")} AS wv
        FROM per),
      agg AS (
        SELECT nn, nt, nc, sxt, sxc, count(*)::BIGINT AS n_strata,
          round(sum(CAST(wd AS DECIMAL(38,9))), 6)::DOUBLE AS ate,
          round(sum(CAST(wv AS DECIMAL(38,9))), 6)::DOUBLE AS var_sum
        FROM per2 GROUP BY nn, nt, nc, sxt, sxc)
      SELECT n_strata, nn AS n, nt AS n_treat, nc AS n_ctrl,
        ${Oracle.qround("sxt / nt - sxc / nc")} AS diff_raw,
        ate AS ate_strat,
        CASE WHEN var_sum > 0
          THEN ${Oracle.qround("sqrt(var_sum)")} END AS se_strat,
        CASE WHEN var_sum > 0
          THEN ${Oracle.qround("ate / sqrt(var_sum)")} END AS z_stat
      FROM agg
      ORDER BY n_strata""")
  )

  /** Quantile treatment effects over the q_ab_welch arms — the
    * heterogeneous-effect readout the mean-based Welch test hides: per
    * decile p ∈ {10%..90%}, the exact per-arm value quantile and the QTE
    * (treatment − control at that quantile). A positive mean diff with
    * QTE concentrated in the upper deciles means the treatment moved the
    * TAIL, not the typical user — the standard next question after a
    * significant A/B readout. Arms follow q_ab_welch verbatim
    * ('click' = treatment, 'purchase' = control).
    *
    * Exactness: Spark `percentile(value, array(...))` ≡ DuckDB
    * `quantile_cont` per element (same linear interpolation over the
    * sorted values — the q_value_quantiles precedent); the QTE and
    * relative QTE are IEEE ops on those identical doubles, qround'd; a
    * zero control quantile yields a NULL relative effect, not a NaN.
    *
    * Scale shape: exact `percentile` buffers each arm's values — correct
    * for a 2-arm experiment readout and bounded by the value domain; at
    * a scale where that buffer hurts, q_value_quantiles_approx's
    * GK-sketch + rank-contract pattern is the drop-in (documented
    * tradeoff). Everything after the 2-row aggregate is a 9-row grid. */
  val qQte = GraftQuery(
    "q_qte",
    (spark, dir) => {
      import spark.implicits._
      val ps = (1 to 9).map(i => s"0.$i").mkString(", ")
      val arms = Tables.events(spark, dir)
        .filter($"event_type".isin("click", "purchase"))
        .groupBy($"event_type")
        .agg(expr(s"percentile(value, array($ps))").as("qs"),
          count(lit(1)).as("n"))
      val e = arms.select($"event_type", $"n", posexplode($"qs"))
        .toDF("event_type", "n", "i", "qv")
      val t = e.filter($"event_type" === "click")
        .select($"i", $"qv".as("qt"), $"n".as("n_treat"))
      val c = e.filter($"event_type" === "purchase")
        .select($"i", $"qv".as("qc"), $"n".as("n_ctrl"))
      t.join(c, "i")
        .select((($"i" + 1) * 10).cast(LongType).as("pct"),
          $"n_treat", $"n_ctrl",
          Det.qround($"qt").as("q_treat"), Det.qround($"qc").as("q_ctrl"),
          Det.qround($"qt" - $"qc").as("qte"),
          when($"qc" =!= 0.0, Det.qround(($"qt" - $"qc") / $"qc"))
            .as("rel_qte"))
        .orderBy($"pct")
    },
    Some(s"""
      WITH arms AS (
        SELECT event_type, count(*) AS n,
          quantile_cont(value, [${(1 to 9).map(i => s"0.$i")
            .mkString(", ")}]) AS qs
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1),
      g AS (SELECT unnest(range(1, 10)) AS i),
      e AS (SELECT event_type, n, i, qs[i] AS qv FROM arms CROSS JOIN g),
      t AS (SELECT i, qv AS qt, n AS n_treat FROM e
            WHERE event_type = 'click'),
      c AS (SELECT i, qv AS qc, n AS n_ctrl FROM e
            WHERE event_type = 'purchase')
      SELECT (i * 10)::BIGINT AS pct, n_treat, n_ctrl,
        ${Oracle.qround("qt")} AS q_treat, ${Oracle.qround("qc")} AS q_ctrl,
        ${Oracle.qround("qt - qc")} AS qte,
        CASE WHEN qc <> 0 THEN ${Oracle.qround("(qt - qc) / qc")} END
          AS rel_qte
      FROM t JOIN c USING (i)
      ORDER BY pct""")
  )

  val all: Seq[GraftQuery] =
    Seq(qEventFunnel, qRetentionCohorts, qOutlierEvents, qAnomalyMad,
      qInterarrival, qMarkovTransitions, qAbWelch, qKsTest, qMwuTest,
      qAnovaF, qKaplanMeier, qBootstrapCi, qAssocRules, qOverdispersion,
      qAbPower, qCuped, qMarkovEntropy, qBhFdr, qStrataAte, qEmdDrift, qDid,
      qMsprt, qAucDelong, qLogrank, qCoxHr, qFunnelLag, qQte)
}
