package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.Det
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset-governance operators a production training-data pipeline needs
  * around the analytics the reference ships (reddit_consumer.py's per-batch
  * stats are point-in-time; a 100 TB corpus additionally needs history
  * tracking, privacy audits, declarative quality gates, drift monitoring and
  * mergeable-sketch rollups to stay operable):
  *
  *  - SCD2 history build: collapse a CDC-style change log into type-2
  *    dimension rows (valid_from / valid_to / is_current) — ONE shuffle on
  *    the entity key; both window passes reuse the same partitioning.
  *  - k-anonymity + l-diversity audit over quasi-identifier classes.
  *  - Declarative data-quality rules (range / domain / cross-table /
  *    referential) evaluated in ONE pass over the fact table.
  *  - PSI (population stability index) drift between time halves.
  *  - HLL sketch build → re-aggregation (the store-sketches-per-day,
  *    union-at-query-time pattern — at 100 TB you never re-scan history to
  *    answer "distinct users this month").
  */
object Governance {

  /** Type-2 SCD build over an arbitrary change log (user_id, event_type,
    * ts_us, event_id) — the definition [[qScd2History]] executes AND the
    * streaming twin's spec reconciles against
    * (graft.streaming.StreamScd2), so the two surfaces can never drift.
    *
    * Scale shape: one hash exchange on `user_id`; the change-detect lag and
    * the valid_to lead run over the SAME (partition, order) so the second
    * Window reuses the first's exchange and sort — the plan has exactly one
    * shuffle however large the log (GovernanceSpec plan-guards this). */
  private[graft] def scd2(changeLog: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = changeLog.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    changeLog
      .select($"user_id", $"event_type", $"ts_us", $"event_id")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
      .withColumn("valid_to_us", lead($"ts_us", 1).over(w))
      .select($"user_id", $"event_type", $"ts_us".as("valid_from_us"),
        $"event_id", $"valid_to_us", $"valid_to_us".isNull.as("is_current"))
  }

  /** Type-2 slowly-changing-dimension build from the events change log.
    *
    * `events` is read as a CDC stream: each row asserts its user's
    * `event_type` state from `ts` on. No-op updates (same type as the
    * previous row) are collapsed; each surviving change opens a version
    * whose validity ends where the next change begins. The build itself is
    * the shared [[scd2]] relation.
    */
  val qScd2History = GraftQuery(
    "q_scd2_history",
    (spark, dir) => {
      import spark.implicits._
      scd2(Tables.events(spark, dir))
        .orderBy($"user_id", $"valid_from_us", $"event_id")
    },
    Some("""
      WITH src AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
      chg AS (
        SELECT user_id, event_type, ts_us, event_id FROM (
          SELECT user_id, event_type, ts_us, event_id,
            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
          FROM src)
        WHERE prev_type IS NULL OR prev_type <> event_type)
      SELECT user_id, event_type, ts_us AS valid_from_us, event_id,
        lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us,
        (lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL) AS is_current
      FROM chg
      ORDER BY user_id, valid_from_us, event_id""")
  )

  /** k-anonymity / l-diversity audit thresholds. */
  val KAnon = 5
  val LDiv = 2

  /** Privacy audit over quasi-identifier equivalence classes.
    *
    * QID = (lang, n_chars div 100): every document in a class is
    * indistinguishable on the quasi-identifiers; `source` is the sensitive
    * attribute. A class is at risk if it is smaller than k (re-identifiable)
    * OR its sensitive attribute has < l distinct values (attribute
    * disclosure even without re-identification).
    *
    * One partial+final aggregate over a pruned 3-column scan. `div` is safe
    * here: n_chars >= 0 by construction (truncate == floor for nonnegative
    * operands, so the Spark and DuckDB buckets agree).
    */
  /** (lang, chars_bucket, source) QID projection of a documents relation —
    * the class key every k-anonymity surface shares (batch audit and the
    * streaming maintainer graft.streaming.StreamKanon). */
  private[graft] def kanonClasses(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("lang"), expr("n_chars div 100").as("chars_bucket"),
      col("source"))

  /** Risk flags over a per-class (lang, chars_bucket, class_n, l_diversity)
    * relation — shared by [[qKAnonymity]] and the streaming report. */
  private[graft] def kanonReport(perClass: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    perClass
      .withColumn("at_risk",
        col("class_n") < KAnon || col("l_diversity") < LDiv)
      .orderBy(col("lang"), col("chars_bucket"))

  val qKAnonymity = GraftQuery(
    "q_k_anonymity",
    (spark, dir) => {
      import spark.implicits._
      kanonReport(kanonClasses(Tables.documents(spark, dir))
        .groupBy($"lang", $"chars_bucket")
        .agg(count(lit(1)).as("class_n"),
          countDistinct($"source").as("l_diversity")))
    },
    Some(s"""
      SELECT lang, n_chars // 100 AS chars_bucket, count(*) AS class_n,
        count(DISTINCT source) AS l_diversity,
        (count(*) < $KAnon OR count(DISTINCT source) < $LDiv) AS at_risk
      FROM documents
      GROUP BY 1, 2
      ORDER BY lang, chars_bucket""")
  )

  /** Declarative data-quality gate: six rules (value ranges, a domain check,
    * a cross-table temporal constraint, referential integrity) evaluated in
    * ONE pass over lineitem — each rule is a summed indicator inside a single
    * aggregate, so adding a rule never adds a scan. The left join keeps
    * orphaned facts (their violation IS rule fk_order_exists). `stack`
    * unpivots the one-row aggregate into the per-rule report.
    */
  /** The six DQ rules as ONE additive counter row (n_checked + per-rule
    * violation sums) over a lineitem-shaped relation left-joined to the
    * orders dim. Additivity is the point: counters over disjoint row
    * slices SUM to the counters over the union, so the streaming gate
    * (graft.streaming.StreamDq) runs THIS definition per micro-batch and
    * merges by summing — the rules can never drift between the batch
    * audit and the streamed gate. */
  private[graft] def dqCounters(li: org.apache.spark.sql.DataFrame,
      ord: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = li.sparkSession
    import spark.implicits._
    li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left")
      .agg(
        count(lit(1)).as("n_checked"),
        sum(when(!$"l_quantity".between(1, 50), 1L).otherwise(0L))
          .as("v_quantity_range"),
        sum(when(!$"l_discount".between(0.0, 0.1), 1L).otherwise(0L))
          .as("v_discount_range"),
        sum(when(!($"l_extendedprice" > 0), 1L).otherwise(0L))
          .as("v_positive_price"),
        sum(when(!$"l_returnflag".isin("A", "N", "R"), 1L).otherwise(0L))
          .as("v_returnflag_domain"),
        sum(when($"o_orderdate".isNotNull && $"l_shipdate" < $"o_orderdate", 1L)
          .otherwise(0L)).as("v_ship_after_order"),
        sum(when($"o_orderdate".isNull, 1L).otherwise(0L))
          .as("v_fk_order_exists"))
  }

  /** Unpivot a one-row counter relation into the per-rule report. */
  private[graft] def dqStack(counters: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = counters.sparkSession
    import spark.implicits._
    counters
      .select($"n_checked", expr(
        """stack(6,
          'quantity_range', v_quantity_range,
          'discount_range', v_discount_range,
          'positive_price', v_positive_price,
          'returnflag_domain', v_returnflag_domain,
          'ship_after_order', v_ship_after_order,
          'fk_order_exists', v_fk_order_exists) AS (rule, n_violations)"""))
      .select($"rule", $"n_checked", $"n_violations",
        Det.qround($"n_violations".cast(DoubleType) /
          $"n_checked".cast(DoubleType)).as("violation_rate"))
      .orderBy($"rule")
  }

  val qDqRules = GraftQuery(
    "q_dq_rules",
    (spark, dir) => {
      import spark.implicits._
      dqStack(dqCounters(Tables.lineitem(spark, dir),
        Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate")))
    },
    Some(s"""
      WITH j AS (
        SELECT l.l_quantity, l.l_discount, l.l_extendedprice, l.l_returnflag,
          l.l_shipdate, o.o_orderdate
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
      a AS (
        SELECT count(*)::BIGINT AS n_checked,
          sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END)::BIGINT AS v_quantity_range,
          sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1) THEN 1 ELSE 0 END)::BIGINT AS v_discount_range,
          sum(CASE WHEN NOT (l_extendedprice > 0) THEN 1 ELSE 0 END)::BIGINT AS v_positive_price,
          sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END)::BIGINT AS v_returnflag_domain,
          sum(CASE WHEN o_orderdate IS NOT NULL AND l_shipdate < o_orderdate THEN 1 ELSE 0 END)::BIGINT AS v_ship_after_order,
          sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT AS v_fk_order_exists
        FROM j)
      SELECT * FROM (
        SELECT 'quantity_range' AS rule, n_checked, v_quantity_range AS n_violations,
          ${Oracle.qround("v_quantity_range::DOUBLE / n_checked::DOUBLE")} AS violation_rate FROM a
        UNION ALL SELECT 'discount_range', n_checked, v_discount_range,
          ${Oracle.qround("v_discount_range::DOUBLE / n_checked::DOUBLE")} FROM a
        UNION ALL SELECT 'positive_price', n_checked, v_positive_price,
          ${Oracle.qround("v_positive_price::DOUBLE / n_checked::DOUBLE")} FROM a
        UNION ALL SELECT 'returnflag_domain', n_checked, v_returnflag_domain,
          ${Oracle.qround("v_returnflag_domain::DOUBLE / n_checked::DOUBLE")} FROM a
        UNION ALL SELECT 'ship_after_order', n_checked, v_ship_after_order,
          ${Oracle.qround("v_ship_after_order::DOUBLE / n_checked::DOUBLE")} FROM a
        UNION ALL SELECT 'fk_order_exists', n_checked, v_fk_order_exists,
          ${Oracle.qround("v_fk_order_exists::DOUBLE / n_checked::DOUBLE")} FROM a)
      ORDER BY rule""")
  )

  /** PSI bin count. */
  val PsiBins = 10

  /** Population-stability-index drift of `value` between the older and newer
    * time half of the corpus.
    *
    * Equal-width bins over the global [min, max] (identical IEEE double ops
    * in both engines, so bucketing is bit-identical); Laplace-smoothed
    * proportions (n + 0.5) / (N + bins/2) so empty bins never divide by
    * zero; psi_term = (p_new − p_old)·ln(p_new / p_old), always >= 0.
    *
    * Scale shape: one global bounds aggregate broadcast back, one
    * partial+final aggregate on the 10-bin key; the unpartitioned windows
    * computing half totals and psi_total run over the 10-row AUDIT relation,
    * never corpus-sized data. Terms are summed through exact decimals so
    * psi_total is order-independent.
    */
  /** The equal-width PSI bin of `value` given (vlo, width) columns —
    * when width == 0 everything lands in bin 0; otherwise
    * least(bins−1, floor((v − vlo)/width)). Shared by [[qPsiDrift]] AND
    * the streaming drift monitor (graft.streaming.StreamPsi bins each
    * micro-batch against FIXED reference bounds with THIS definition), so
    * bucketing can never drift between the two surfaces. BOTH ends clamp:
    * the batch query's corpus-derived bounds make the low clamp a no-op
    * (value ≥ vlo by construction — the oracles need no greatest()), but
    * a STREAM monitored against frozen bounds can drift BELOW vlo, and
    * without the clamp that mass landed in negative bins the report's
    * bin spine silently discarded — a drift monitor blind to downward
    * drift (round-11 review catch; StreamPsiSpec pins the alarm now). */
  private[graft] def psiBinCol(value: org.apache.spark.sql.Column,
      vlo: org.apache.spark.sql.Column,
      width: org.apache.spark.sql.Column,
      bins: Int = PsiBins): org.apache.spark.sql.Column =
    when(width === 0.0, lit(0L))
      .otherwise(greatest(lit(0L),
        least(lit((bins - 1).toLong), floor((value - vlo) / width))))

  /** Smoothing + PSI terms over a (bin, n_old, n_new) counts relation
    * (partial is fine — missing bins are spine-filled with 0): Laplace
    * (n + 0.5)/(N + bins/2) proportions, psi_term = (p_new − p_old)·
    * ln(p_new/p_old), exact-decimal order-independent total. The
    * unpartitioned windows run over the ≤[[PsiBins]]-row audit relation
    * only (GovernanceSpec plan-guards this for the batch query). */
  private[graft] def psiOfCounts(counts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val spine = spark.range(0, PsiBins).select($"id".as("bin"))
    val w = Window.partitionBy()
    spine.join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_old", "n_new"))
      .withColumn("p_old", ($"n_old" + lit(0.5)) /
        (sum($"n_old").over(w) + lit(PsiBins / 2.0)))
      .withColumn("p_new", ($"n_new" + lit(0.5)) /
        (sum($"n_new").over(w) + lit(PsiBins / 2.0)))
      .withColumn("psi_term",
        Det.qround(($"p_new" - $"p_old") * log($"p_new" / $"p_old")))
      .withColumn("psi_total",
        round(sum($"psi_term".cast(DecimalType(38, 9))).over(w), 6)
          .cast(DoubleType))
      .select($"bin", $"n_old", $"n_new", $"psi_term", $"psi_total")
      .orderBy($"bin")
  }

  val qPsiDrift = GraftQuery(
    "q_psi_drift",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir).select($"ts_us", $"value")
      val bounds = ev.agg(
        min($"ts_us").as("tmin"), max($"ts_us").as("tmax"),
        min($"value").as("vlo"), max($"value").as("vhi"))
      val counts = ev.crossJoin(broadcast(bounds))
        // Pre-epoch safety: both engines truncate integer division toward
        // zero — Spark `div` by definition, and DuckDB's `//` on BIGINT
        // operands (measured: SELECT (-7)//2 → -3, not the floored -4) —
        // so the midpoint is bit-identical even when tmin + tmax is
        // negative and odd, and no boundary event can flip halves.
        .withColumn("is_old", $"ts_us" <= expr("(tmin + tmax) div 2"))
        .withColumn("width", ($"vhi" - $"vlo") / lit(PsiBins.toDouble))
        .withColumn("bin", psiBinCol($"value", $"vlo", $"width"))
        .groupBy($"bin")
        .agg(sum(when($"is_old", 1L).otherwise(0L)).as("n_old"),
          sum(when(!$"is_old", 1L).otherwise(0L)).as("n_new"))
      psiOfCounts(counts)
    },
    Some(s"""
      WITH b AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid,
          min(value) AS vlo, (max(value) - min(value)) / ${PsiBins.toDouble} AS width
        FROM events),
      binned AS (
        SELECT CASE WHEN b.width = 0 THEN 0
                    ELSE least(${PsiBins - 1}, floor((e.value - b.vlo) / b.width)::BIGINT) END AS bin,
          (epoch_us(e.ts) <= b.mid) AS is_old
        FROM events e, b),
      counts AS (
        SELECT t.bin,
          coalesce(sum(CASE WHEN bn.is_old THEN 1 ELSE 0 END), 0)::BIGINT AS n_old,
          coalesce(sum(CASE WHEN NOT bn.is_old THEN 1 ELSE 0 END), 0)::BIGINT AS n_new
        FROM range(0, $PsiBins) t(bin) LEFT JOIN binned bn ON bn.bin = t.bin
        GROUP BY t.bin),
      p AS (
        SELECT bin, n_old, n_new,
          (n_old + 0.5) / (sum(n_old) OVER () + ${PsiBins / 2.0}) AS p_old,
          (n_new + 0.5) / (sum(n_new) OVER () + ${PsiBins / 2.0}) AS p_new
        FROM counts),
      terms AS (
        SELECT bin, n_old, n_new,
          ${Oracle.qround("(p_new - p_old) * ln(p_new / p_old)")} AS psi_term
        FROM p)
      SELECT bin, n_old, n_new, psi_term,
        round(sum(CAST(psi_term AS DECIMAL(38,9))) OVER (), 6)::DOUBLE AS psi_total
      FROM terms
      ORDER BY bin""")
  )

  /** Mergeable distinct-count sketches: build a Datasketches HLL sketch of
    * `user_id` per (event_type, day), then answer the per-type rollup by
    * UNIONING the daily sketches — never re-touching the raw rows. This is
    * the incremental pattern that makes distinct-counts tractable at 100 TB:
    * the per-day sketch build is the only full scan ever paid; every later
    * rollup (week, month, all-time, any type subset) is an hll_union_agg
    * over kilobyte sketches.
    *
    * The audit joins the merged estimate against the exact distinct count
    * (feasible at verify scale) and asserts it within the HLL error bound
    * (3·rsd at lgK=12 ≈ 4.8%, floored at 1 like the other sketch audits);
    * the oracle pins the exact counts and approx_ok = 1. `div`-truncation
    * on pre-epoch timestamps only shifts WHICH daily sketch a row lands in,
    * never the union — bucket boundaries don't affect distinct-union
    * semantics.
    */
  /** (event_type, day, user_id) projection of an events relation — the
    * sketch bucketing every HLL surface shares. */
  private[graft] def eventDays(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    ev.select(col("event_type"),
      expr("ts_us div 86400000000").as("day"), col("user_id"))

  /** Per-(event_type, day) HLL day-sketches — the only pass that ever
    * touches raw rows. Shared by [[qHllSketchMerge]] AND the streaming
    * incremental maintainer (graft.streaming.StreamSketch runs THIS
    * definition per micro-batch), so batch and streamed sketches are
    * byte-compatible by construction. */
  private[graft] def dailySketches(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    eventDays(ev).groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))

  /** Union stored day-sketches up to one estimate per event_type. Below
    * the coupon->dense promotion (~512 distinct per sketch at lgK=12) HLL
    * sketches are exact coupon lists and ANY partition of the input rows
    * into sketch rows (per day, per batch-and-day, …) unions to the
    * IDENTICAL estimate — the regime the streaming twin's equality spec
    * pins. In the promotion band the two paths can disagree by a few
    * units (PropertySpec probes the boundary); both stay within the
    * 3·rsd error the production audit ([[qHllSketchMerge]]'s approx_ok)
    * actually enforces. */
  private[graft] def sketchRollup(daily: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    daily.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))

  val qHllSketchMerge = GraftQuery(
    "q_hll_sketch_merge",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val merged = sketchRollup(dailySketches(ev))
      val exact = eventDays(ev).groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users_exact"))
      exact.join(broadcast(merged), Seq("event_type"))
        .select($"event_type", $"n_events", $"n_users_exact",
          when(abs($"est" - $"n_users_exact").cast(DoubleType)
            <= greatest(lit(1.0), lit(0.048) * $"n_users_exact".cast(DoubleType)), 1L)
            .otherwise(0L).as("approx_ok"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n_events,
        count(DISTINCT user_id) AS n_users_exact,
        1::BIGINT AS approx_ok
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  )

  /** Histogram bin count for [[qHistQuantiles]] (finer than PSI's 10 —
    * bin width IS the quantile error bound). */
  val HistBins = 64

  /** Mergeable-histogram quantiles — the quantile companion of
    * [[qHllSketchMerge]]'s store-per-day / merge-at-query pattern: build a
    * fixed-bin histogram of `value` per day (the ONLY pass over raw rows;
    * bucketing via [[psiBinCol]]'s expression family, identical IEEE double
    * ops in both engines), answer quantiles by SUMMING the day histograms —
    * at 100 TB the rollup reads O(days × bins) count rows, never history.
    *
    * For each p ∈ {0.25, 0.5, 0.75, 0.9}: approx = right edge of the first
    * bin whose merged cumulative count reaches ceil(p·n). The exact
    * p-quantile (rank-based, no interpolation — both engines agree
    * bit-exactly) lies inside that bin, so |approx − exact| ≤ width by
    * construction; the audit joins the exact value (feasible at verify
    * scale, like the HLL audit's exact distinct) and emits the bound as
    * approx_ok — computed identically in both engines, not pinned.
    *
    * Scale shape: one partial+final aggregate on (day, bin); the merge and
    * the ≤[[HistBins]]-row cumulative window touch audit-sized relations
    * only; the exact-rank side is the verify-scale audit, not the
    * production path.
    */
  /** The merged global histogram with cumulative counts and the bounds
    * columns riding along — the PRODUCTION relation of the pattern: the
    * bounds pass + the per-day histogram build are its only raw-row scans
    * (the PSI two-scan shape); output is ≤[[HistBins]] rows.
    * GovernanceSpec plan-guards the two-scan claim on THIS relation;
    * [[qHistQuantiles]] persists it so every downstream consumer (targets,
    * quantile lookups) reads the cached audit-sized relation, never the
    * corpus. */
  private[graft] def histCum(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(expr("ts_us div 86400000000").as("day"), $"value")
    val bounds = ev.agg(min($"value").as("vlo"),
      ((max($"value") - min($"value")) / lit(HistBins.toDouble)).as("width"),
      count(lit(1)).as("n"))
    val daily = ev.crossJoin(broadcast(bounds))
      .withColumn("bin", psiBinCol($"value", $"vlo", $"width", HistBins))
      .groupBy($"day", $"bin").agg(count(lit(1)).as("cnt"),
        first($"vlo").as("vlo"), first($"width").as("width"),
        first($"n").as("n"))
    daily.groupBy($"bin")
      .agg(sum($"cnt").as("cnt"), first($"vlo").as("vlo"),
        first($"width").as("width"), first($"n").as("n"))
      .withColumn("cum", sum($"cnt").over(Window.orderBy($"bin")))
  }

  /** Quantile lookup over a merged-histogram relation (bin, vlo, width, n,
    * cum): for each audit p, the first bin whose cumulative count reaches
    * ceil(p·n), with approx_q as that bin's right edge. Shared by
    * [[qHistQuantiles]] AND the streaming maintainer
    * (graft.streaming.StreamHist folds its bin log into the same shape and
    * runs THIS lookup), so the two surfaces cannot drift. */
  private[graft] def histQuantileLookup(cum: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = cum.sparkSession
    import spark.implicits._
    val targets = Quantiles.toDF("p")
      .crossJoin(broadcast(cum.select($"vlo", $"width", $"n").limit(1)))
      .withColumn("trn", ceil($"p" * $"n"))
    targets.join(broadcast(cum.select($"bin", $"cum")), $"cum" >= $"trn")
      .groupBy($"p", $"n", $"vlo", $"width", $"trn")
      .agg(min($"bin").as("bin"))
      .withColumn("approx_q", when($"width" === 0.0, $"vlo")
        .otherwise($"vlo" + ($"bin" + lit(1L)) * $"width"))
  }

  val qHistQuantiles = GraftQuery(
    "q_hist_quantiles",
    (spark, dir) => {
      import spark.implicits._
      val cum = histCum(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val approx = histQuantileLookup(cum)
      val ranked = Tables.events(spark, dir).select($"value")
        .withColumn("rn", row_number().over(Window.orderBy($"value")))
      val exact = approx.select($"p", $"trn")
        .join(ranked, $"rn" === $"trn")
        .select($"p", $"value".as("exact_q"))
      approx.join(broadcast(exact), Seq("p"))
        .select($"p", $"n".as("n_total"), $"bin", $"approx_q", $"exact_q",
          when(abs($"approx_q" - $"exact_q") <= $"width", 1L)
            .otherwise(0L).as("approx_ok"))
        .orderBy($"p")
    },
    Some(s"""
      WITH b AS (
        SELECT min(value) AS vlo,
          (max(value) - min(value)) / ${HistBins.toDouble} AS width,
          count(*)::BIGINT AS n
        FROM events),
      binned AS (
        SELECT CASE WHEN b.width = 0 THEN 0
                    ELSE least(${HistBins - 1}, floor((e.value - b.vlo) / b.width)::BIGINT)
               END AS bin
        FROM events e, b),
      hist AS (SELECT bin, count(*)::BIGINT AS cnt FROM binned GROUP BY bin),
      cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM hist),
      ranked AS (
        SELECT value, row_number() OVER (ORDER BY value) AS rn FROM events),
      tgt AS (
        SELECT p, ceil(p * b.n)::BIGINT AS trn, b.n, b.vlo, b.width
        FROM (SELECT unnest([0.25, 0.5, 0.75, 0.9]::DOUBLE[]) AS p), b),
      ap AS (
        SELECT t.p, t.n, t.vlo, t.width, min(c.bin) AS bin
        FROM tgt t JOIN cum c ON c.cum >= t.trn
        GROUP BY t.p, t.n, t.vlo, t.width),
      ex AS (
        SELECT t.p, r.value AS exact_q
        FROM tgt t JOIN ranked r ON r.rn = t.trn)
      SELECT a.p, a.n AS n_total, a.bin,
        CASE WHEN a.width = 0 THEN a.vlo
             ELSE a.vlo + (a.bin + 1) * a.width END AS approx_q,
        e.exact_q,
        CASE WHEN abs((CASE WHEN a.width = 0 THEN a.vlo
                            ELSE a.vlo + (a.bin + 1) * a.width END) - e.exact_q)
               <= a.width
             THEN 1 ELSE 0 END::BIGINT AS approx_ok
      FROM ap a JOIN ex e ON a.p = e.p
      ORDER BY a.p""")
  )

  /** Audit quantile targets for [[qHistQuantiles]]. */
  val Quantiles = Seq(0.25, 0.5, 0.75, 0.9)

  /** CUSUM slack and alarm multiples (Page 1954 standard setting:
    * k = σ/2 detects ~1σ shifts fastest; h = 4σ the usual ARL trade). */
  val CusumSlackSigmas = 0.5
  val CusumAlarmSigmas = 4.0

  /** CUSUM changepoint detection of `value` per event_type — the
    * SEQUENTIAL drift monitor beside [[qPsiDrift]]'s distributional one
    * (PSI sees a shifted histogram; CUSUM sees WHEN the mean moved, and
    * fires on small persistent shifts long before they dent a histogram):
    *
    *   S⁺_t = max(0, S⁺_{t-1} + (x_t − μ₀ − k)),  alarm when S⁺ > h
    *   S⁻_t = max(0, S⁻_{t-1} + (μ₀ − k − x_t)),  alarm when S⁻ > h
    *
    * with μ₀/σ from the older time half (the reference period, PSI's
    * split) and k = σ/2, h = 4σ. The max(0,·) reset recursion is not a
    * window aggregate, but the classic prefix identity
    *   S_t = P_t − min(0, min_{j≤t} P_j),   P = running Σ of deviations
    * turns it into TWO stacked windows over the SAME (event_type;
    * ts, event_id) partitioning — one exchange, one sort, however long
    * the series. Deviations are summed as DECIMAL(38,9) (exact,
    * order-independent), so the recursion is bit-identical in both
    * engines; μ₀/σ/k/h are identical IEEE ops over decimal-exact sums
    * (sqrt is correctly rounded in both engines — the q_mixture_weights
    * precedent). Event types first seen in the monitoring half have no
    * reference and drop (inner join), the monitor's standard cold-start
    * rule.
    */
  /** CUSUM reference parameters (mu0, k, h) per event_type from a
    * calibration relation (event_type, value) — decimal-exact raw sums,
    * identical-IEEE mean/variance/sigma. Shared by [[qCusumDrift]] (older
    * time half) AND the streaming monitor (graft.streaming.StreamCusum
    * freezes THIS relation's output), so the two surfaces parameterize
    * identically. */
  private[graft] def cusumRef(calib: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = calib.sparkSession
    import spark.implicits._
    calib.groupBy($"event_type")
      .agg(count(lit(1)).as("n0"),
        sum($"value".cast(DecimalType(38, Det.Scale))).cast(DoubleType).as("s1"),
        sum(($"value" * $"value").cast(DecimalType(38, Det.Scale)))
          .cast(DoubleType).as("s2"))
      .select($"event_type", ($"s1" / $"n0").as("mu0"),
        sqrt(greatest($"s2" / $"n0" - ($"s1" / $"n0") * ($"s1" / $"n0"),
          lit(0.0))).as("sigma"))
      .select($"event_type", $"mu0",
        (lit(CusumSlackSigmas) * $"sigma").as("k"),
        (lit(CusumAlarmSigmas) * $"sigma").as("h"))
  }

  val qCusumDrift = GraftQuery(
    "q_cusum_drift",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"event_type", $"ts_us", $"event_id", $"value")
      val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) div 2").as("mid"))
      val halves = ev.crossJoin(broadcast(mid))
      val ref = cusumRef(halves.filter($"ts_us" <= $"mid"))
      val w = Window.partitionBy($"event_type").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      halves.filter($"ts_us" > $"mid")
        .join(broadcast(ref), Seq("event_type"))
        // qround BEFORE the decimal cast: a raw double->DECIMAL(38,9)
        // cast can differ by 1 ulp at digit 9 between engines, and a
        // RUNNING sum surfaces every such addend (unlike dsum, which
        // rounds once at the end); a 6-dp-prerounded double casts to the
        // same exact decimal in both
        .withColumn("p_pos", sum(Det.qround($"value" - $"mu0" - $"k")
          .cast(DecimalType(38, Det.Scale))).over(w))
        .withColumn("p_neg", sum(Det.qround($"mu0" - $"k" - $"value")
          .cast(DecimalType(38, Det.Scale))).over(w))
        .withColumn("s_pos_d", $"p_pos" - least(min($"p_pos").over(w), lit(0)))
        .withColumn("s_neg_d", $"p_neg" - least(min($"p_neg").over(w), lit(0)))
        .select($"event_type", $"ts_us", $"event_id", $"value",
          round($"s_pos_d", 6).cast(DoubleType).as("s_pos"),
          round($"s_neg_d", 6).cast(DoubleType).as("s_neg"),
          ($"s_pos_d".cast(DoubleType) > $"h" ||
            $"s_neg_d".cast(DoubleType) > $"h").as("alarm"))
        .orderBy($"event_type", $"ts_us", $"event_id")
    },
    Some(s"""
      WITH src AS (
        SELECT event_type, epoch_us(ts) AS ts_us, event_id, value FROM events),
      b AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS mid FROM src),
      ref AS (
        SELECT event_type,
          (sum(CAST(value AS DECIMAL(38,9)))::DOUBLE / count(*)) AS mu0,
          sqrt(greatest(
            sum(CAST(value * value AS DECIMAL(38,9)))::DOUBLE / count(*)
              - (sum(CAST(value AS DECIMAL(38,9)))::DOUBLE / count(*))
                * (sum(CAST(value AS DECIMAL(38,9)))::DOUBLE / count(*)),
            0e0)) AS sigma
        FROM src, b WHERE ts_us <= b.mid
        GROUP BY event_type),
      mon AS (
        SELECT s.event_type, s.ts_us, s.event_id, s.value,
          r.mu0, $CusumSlackSigmas * r.sigma AS k,
          $CusumAlarmSigmas * r.sigma AS h
        FROM src s JOIN ref r ON s.event_type = r.event_type, b
        WHERE s.ts_us > b.mid),
      pre AS (
        SELECT event_type, ts_us, event_id, value, h,
          sum(CAST(${Oracle.qround("value - mu0 - k")} AS DECIMAL(38,9))) OVER wf AS p_pos,
          sum(CAST(${Oracle.qround("mu0 - k - value")} AS DECIMAL(38,9))) OVER wf AS p_neg
        FROM mon
        WINDOW wf AS (PARTITION BY event_type ORDER BY ts_us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      cus AS (
        SELECT event_type, ts_us, event_id, value, h,
          p_pos - least(min(p_pos) OVER wf, 0) AS s_pos_d,
          p_neg - least(min(p_neg) OVER wf, 0) AS s_neg_d
        FROM pre
        WINDOW wf AS (PARTITION BY event_type ORDER BY ts_us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_type, ts_us, event_id, value,
        round(s_pos_d, 6)::DOUBLE AS s_pos,
        round(s_neg_d, 6)::DOUBLE AS s_neg,
        (s_pos_d::DOUBLE > h OR s_neg_d::DOUBLE > h) AS alarm
      FROM cus
      ORDER BY event_type, ts_us, event_id""")
  )

  /** t-closeness threshold (Li, Li & Venkatasubramanian 2007): a class
    * whose sensitive-attribute distribution sits farther than t from the
    * global distribution leaks attribute information even when k-anonymity
    * and l-diversity hold (the "skewness attack" — a k-large, l-diverse
    * class that is 90% one source still discloses). */
  val TClose = 0.25

  /** t-closeness audit over the same quasi-identifier frame as
    * [[qKAnonymity]] (QID = (lang, n_chars div 100), sensitive = source),
    * completing the privacy-audit ladder: k-anonymity (class size) →
    * l-diversity (distinct sensitive values) → t-closeness (distributional
    * distance). Two distances per class, both from the paper:
    *
    *  - `vd`  — variational distance ½·Σ_v |P_v − Q_v| (the unordered-
    *    categorical EMD with equal ground distance);
    *  - `emd` — ordered EMD Σ_{i<m} |CumP_i − CumQ_i| / (m−1) with the
    *    sensitive values in lexical order (stand-in for a real ordinal
    *    domain — income bands, age buckets).
    *
    * Exactness: the cumulative distributions are built from INTEGER
    * running counts (windowed sum of longs — exact, order-independent, so
    * DuckDB's segment-tree window and Spark's running frame cannot
    * diverge the way a float prefix sum can — the q_cusum_drift lesson);
    * every P/Q is a long/long→double division (identical IEEE tree in
    * both engines); the per-class |·| sums go through [[Det.dsum]].
    *
    * Scale shape: ONE corpus scan → (class, value) counts; the global
    * distribution and the class sizes are RE-aggregations of that
    * relation (two-level re-agg, no second scan). The scored grid is
    * #classes × m rows — class-level, never corpus-level — with the
    * m-row-per-class window running over it. */
  /** (lang, chars_bucket, source, cnt) class-value counts from a documents
    * relation — the ADDITIVE base of the t-closeness audit (counts over
    * disjoint row slices sum to counts over the union), shared by
    * [[qTCloseness]] and the streaming maintainer
    * graft.streaming.StreamTclose. */
  private[graft] def tcloseClassCounts(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    kanonClasses(docs)
      .groupBy(col("lang"), col("chars_bucket"), col("source"))
      .agg(count(lit(1)).as("cnt"))

  /** Score a (lang, chars_bucket, source, cnt) count relation into the
    * t-closeness report — shared by batch and stream so the two surfaces
    * can never drift. Callers should persist `cv`: FOUR consumers derive
    * from it (class sizes, global dist, the grid's left side, totals) —
    * without the cache each one re-plans its own upstream scan (the
    * q_contamination lesson). */
  private[graft] def tcloseReport(cv: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = cv.sparkSession
    import spark.implicits._
    val glob = cv.groupBy($"source").agg(sum($"cnt").as("g_cnt"))
    val tot = glob.agg(sum($"g_cnt").as("n_total"),
      count(lit(1)).as("m"))
    val classes = cv.groupBy($"lang", $"chars_bucket")
      .agg(sum($"cnt").as("class_n"))
    val grid = classes
      .crossJoin(broadcast(glob))
      .join(cv, Seq("lang", "chars_bucket", "source"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(tot))
    val wOrd = Window.partitionBy($"lang", $"chars_bucket")
      .orderBy($"source")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = grid
      .withColumn("cumcnt", sum($"cnt").over(wCum))
      .withColumn("cumg", sum($"g_cnt").over(wCum))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("diff",
        $"cnt" / $"class_n" - $"g_cnt" / $"n_total")
      .withColumn("cdiff",
        $"cumcnt" / $"class_n" - $"cumg" / $"n_total")
      .groupBy($"lang", $"chars_bucket", $"class_n", $"m")
      .agg(Det.dsum(abs($"diff")).as("sad"),
        Det.dsum(when($"rn" < $"m", abs($"cdiff")).otherwise(lit(0.0)))
          .as("scum"))
    scored
      .withColumn("vd", Det.qround($"sad" * lit(0.5)))
      .select($"lang", $"chars_bucket", $"class_n", $"vd",
        when($"m" > 1, Det.qround($"scum" / ($"m" - 1)))
          .otherwise(lit(0.0)).as("emd"),
        ($"vd" > TClose).as("t_violation"))
      .orderBy($"lang", $"chars_bucket")
  }

  val qTCloseness = GraftQuery(
    "q_t_closeness",
    (spark, dir) =>
      tcloseReport(
        tcloseClassCounts(Tables.documents(spark, dir)).persist()),
    Some(s"""
      WITH cv AS (
        SELECT lang, n_chars // 100 AS chars_bucket, source, count(*) AS cnt
        FROM documents GROUP BY 1, 2, 3),
      gdist AS (
        SELECT source, sum(cnt)::BIGINT AS g_cnt FROM cv GROUP BY 1),
      tot AS (
        SELECT sum(g_cnt)::BIGINT AS n_total, count(*)::BIGINT AS m
        FROM gdist),
      classes AS (
        SELECT lang, chars_bucket, sum(cnt)::BIGINT AS class_n
        FROM cv GROUP BY 1, 2),
      grid AS (
        SELECT c.lang, c.chars_bucket, c.class_n, g.source, g.g_cnt,
          coalesce(v.cnt, 0)::BIGINT AS cnt, t.n_total, t.m
        FROM classes c
        CROSS JOIN gdist g
        LEFT JOIN cv v ON v.lang = c.lang AND v.chars_bucket = c.chars_bucket
          AND v.source = g.source
        CROSS JOIN tot t),
      cum AS (
        SELECT *,
          (sum(cnt) OVER w)::BIGINT AS cumcnt,
          (sum(g_cnt) OVER w)::BIGINT AS cumg,
          row_number() OVER (PARTITION BY lang, chars_bucket
            ORDER BY source) AS rn
        FROM grid
        WINDOW w AS (PARTITION BY lang, chars_bucket ORDER BY source
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      scored AS (
        SELECT lang, chars_bucket, class_n, m,
          ${Oracle.dsum("abs(cnt / class_n - g_cnt / n_total)")} AS sad,
          ${Oracle.dsum(
            "CASE WHEN rn < m THEN abs(cumcnt / class_n - cumg / n_total) ELSE 0e0 END")}
            AS scum
        FROM cum GROUP BY 1, 2, 3, 4)
      SELECT lang, chars_bucket, class_n,
        ${Oracle.qround("sad * 0.5e0")} AS vd,
        CASE WHEN m > 1 THEN ${Oracle.qround("scum / (m - 1)")}
          ELSE 0e0 END AS emd,
        (${Oracle.qround("sad * 0.5e0")} > $TClose) AS t_violation
      FROM scored
      ORDER BY lang, chars_bucket""")
  )

  /** Metadata-association bias audit: is `source` confounded with `lang`?
    * A training corpus whose provenance predicts language (or any other
    * stratum) smuggles spurious correlations into everything sampled from
    * it — the contingency-table independence test is the standard screen.
    * One row: Pearson χ² with dof, mutual information (nats), and
    * Cramér's V effect size over the (lang, source) contingency table.
    *
    * Exactness: expected counts e = row·col/N are double expressions over
    * exact integer margins (identical IEEE trees); zero cells contribute
    * (0−e)²/e = e to χ² (the FULL margin grid is materialized — it is
    * |langs|×|sources|, class-level) and 0 to MI by the 0·ln 0 = 0
    * convention (explicit CASE, not NaN); the cell sums run through
    * [[Det.dsum]]. Scale shape: ONE corpus aggregate to the contingency
    * table; margins, totals and the grid are re-aggregations of it
    * (broadcast, class-level). */
  val qChi2Bias = GraftQuery(
    "q_chi2_bias",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.documents(spark, dir)
        .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
        .persist()
      val rl = o.groupBy($"lang").agg(sum($"o").as("rl"))
      val cs = o.groupBy($"source").agg(sum($"o").as("cs"))
      val tot = o.agg(sum($"o").as("n"))
      val dims = rl.agg(count(lit(1)).as("n_lang"))
        .crossJoin(cs.agg(count(lit(1)).as("n_source")))
      val grid = rl.crossJoin(broadcast(cs))
        .join(o, Seq("lang", "source"), "left")
        .na.fill(0L, Seq("o"))
        .crossJoin(broadcast(tot))
        .withColumn("e", $"rl" * $"cs" / $"n")
      val sums = grid.agg(
        Det.dsum(($"o" - $"e") * ($"o" - $"e") / $"e").as("chi2"),
        Det.dsum(when($"o" > 0,
          ($"o" / $"n") * log($"o" * $"n" / ($"rl" * $"cs")))
          .otherwise(lit(0.0))).as("mi"))
      sums.crossJoin(broadcast(tot)).crossJoin(broadcast(dims))
        .select($"n", $"n_lang", $"n_source",
          (($"n_lang" - 1) * ($"n_source" - 1)).as("dof"),
          $"chi2", $"mi",
          when(($"n_lang" > 1) && ($"n_source" > 1),
            Det.qround(sqrt($"chi2" /
              ($"n" * least($"n_lang" - 1, $"n_source" - 1)))))
            .otherwise(lit(0.0)).as("cramers_v"))
    },
    Some(s"""
      WITH o AS (
        SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      rl AS (SELECT lang, sum(o)::BIGINT AS rl FROM o GROUP BY 1),
      cs AS (SELECT source, sum(o)::BIGINT AS cs FROM o GROUP BY 1),
      tot AS (SELECT sum(o)::BIGINT AS n FROM o),
      dims AS (
        SELECT (SELECT count(*) FROM rl)::BIGINT AS n_lang,
               (SELECT count(*) FROM cs)::BIGINT AS n_source),
      grid AS (
        SELECT r.rl, c.cs, coalesce(o.o, 0)::BIGINT AS o, t.n,
          r.rl * c.cs / t.n AS e
        FROM rl r CROSS JOIN cs c
        LEFT JOIN o ON o.lang = r.lang AND o.source = c.source
        CROSS JOIN tot t),
      sums AS (
        SELECT
          ${Oracle.dsum("(o - e) * (o - e) / e")} AS chi2,
          ${Oracle.dsum(
            "CASE WHEN o > 0 THEN (o / n) * ln(o * n / (rl * cs)) ELSE 0e0 END")}
            AS mi
        FROM grid)
      SELECT n, n_lang, n_source,
        (n_lang - 1) * (n_source - 1) AS dof, chi2, mi,
        CASE WHEN n_lang > 1 AND n_source > 1 THEN
          ${Oracle.qround("sqrt(chi2 / (n * least(n_lang - 1, n_source - 1)))")}
        ELSE 0e0 END AS cramers_v
      FROM sums CROSS JOIN tot CROSS JOIN dims
      ORDER BY n""")
  )

  /** Benford first-significant-digit expectations, log10(1 + 1/d), as
    * 6-dp literals (they sum to exactly 1.000000) — hardcoded rather than
    * computed so both engines use byte-identical constants. */
  private[graft] val BenfordExpected: Seq[(Int, Double)] = Seq(
    1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  /** Per-first-digit counts of the positive event values — the additive
    * core of [[qBenford]], shared with the streaming maintenance twin
    * (graft.streaming.StreamBenford) so the two surfaces cannot drift.
    *
    * Digit extraction is exact integer arithmetic: `value` is a positive
    * 2-dp grid, so floor(v·100 + 0.5) is the exact integer cents and the
    * first character of that integer's decimal representation IS the first
    * significant digit of v (integer→string formatting is unambiguous in
    * both engines — no float log10, no locale). */
  private[graft] def benfordCounts(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.filter($"value" > 0)
      .select(substring(floor($"value" * 100 + lit(0.5)).cast(LongType)
        .cast(StringType), 1, 1).cast(IntegerType).as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
  }

  /** Full-spine Benford report over a (digit, n) count relation — also the
    * streaming twin's fold-at-query readout. */
  private[graft] def benfordReport(counts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val spine = BenfordExpected.toDF("digit", "exp_p")
    val w = Window.partitionBy()
    spine.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("tot", sum($"n").over(w))
      .filter($"tot" > 0)
      .withColumn("obs_p", Det.qround($"n" / $"tot"))
      .withColumn("abs_dev", Det.qround(abs($"n" / $"tot" - $"exp_p")))
      .withColumn("chi2_term", Det.qround($"tot" *
        ($"n" / $"tot" - $"exp_p") * ($"n" / $"tot" - $"exp_p") / $"exp_p"))
      .withColumn("chi2", round(sum($"chi2_term".cast(DecimalType(38, 9)))
        .over(w), 6).cast(DoubleType))
      .withColumn("mad", Det.qround(
        sum($"abs_dev".cast(DecimalType(38, 9))).over(w)
          .cast(DoubleType) / 9))
      .select($"digit", $"n", $"exp_p", $"obs_p", $"abs_dev", $"chi2", $"mad")
      .orderBy($"digit")
  }

  /** Benford's-law first-digit audit of the event values — the forensic
    * data-quality screen a financial/transactional pipeline runs to catch
    * fabricated or truncated value columns (Nigrini's digit-analysis
    * practice): observed first-significant-digit shares vs log10(1+1/d),
    * with the χ² statistic (dof 8) and the mean absolute deviation
    * (Nigrini's MAD conformity measure) on every row of the 9-digit spine.
    * On the driver's near-uniform synthetic values the audit HONESTLY
    * reports non-conformity (huge χ²) — that is the audit working, exactly
    * like q_mrl_recall's near-zero recall on random embeddings.
    *
    * Exactness: digit buckets are exact integer arithmetic (see
    * [[benfordCounts]]); expected shares are byte-identical 6-dp literals;
    * the cross-digit χ²/MAD reductions pre-round each addend and sum in
    * decimal (the q_anova_f discipline). Scale shape: ONE partial+final
    * aggregate collapses the corpus to ≤9 rows; the unpartitioned windows
    * run above that bounded aggregate (the q_psi_drift discipline). */
  val qBenford = GraftQuery(
    "q_benford",
    (spark, dir) => benfordReport(benfordCounts(Tables.events(spark, dir))),
    Some(s"""
      WITH c AS (
        SELECT substr(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
            AS VARCHAR), 1, 1)::INTEGER AS digit,
          count(*) AS n
        FROM events WHERE value > 0
        GROUP BY 1),
      spine(digit, exp_p) AS (VALUES ${BenfordExpected
        .map { case (d, p) => s"($d, $p)" }.mkString(", ")}),
      j AS (
        SELECT s.digit, s.exp_p::DOUBLE AS exp_p, coalesce(c.n, 0)::BIGINT AS n
        FROM spine s LEFT JOIN c USING (digit)),
      t AS (
        SELECT *, (sum(n) OVER ())::BIGINT AS tot FROM j),
      terms AS (
        SELECT digit, n, exp_p, tot,
          ${Oracle.qround("n / tot")} AS obs_p,
          ${Oracle.qround("abs(n / tot - exp_p)")} AS abs_dev,
          ${Oracle.qround(
            "tot * (n / tot - exp_p) * (n / tot - exp_p) / exp_p")}
            AS chi2_term
        FROM t WHERE tot > 0)
      SELECT digit, n, exp_p, obs_p, abs_dev,
        round(sum(CAST(chi2_term AS DECIMAL(38,9))) OVER (), 6)::DOUBLE
          AS chi2,
        ${Oracle.qround(
          "(sum(CAST(abs_dev AS DECIMAL(38,9))) OVER ())::DOUBLE / 9")}
          AS mad
      FROM terms
      ORDER BY digit""")
  )

  /** HLL set-INTERSECTION estimate via inclusion–exclusion — the audience-
    * overlap readout ("how many users both click AND purchase?") that
    * sketch stores answer without a second scan: HLLs union natively but
    * do not intersect, so the standard practice is
    * |A∩B| ≈ est(A) + est(B) − est(A∪B), whose error compounds all three
    * sketches' errors — exactly why this ships as a bounded-tolerance
    * audit (the q_subreddit_stats_approx discipline): the output carries
    * the EXACT overlap numbers plus an `approx_ok` flag the oracle pins
    * to 1, with bound = max(3, 3·rsd·(A + B + U)) over the exact values
    * (rsd ≈ 1.04/√2¹² for the datasketches default) — a drifting sketch
    * FAILS the hash check instead of being skipped.
    *
    * Scale shape: ONE aggregate builds all three sketches (filtered
    * hll_sketch_agg inputs — nulls are skipped); the exact side is one
    * per-user partial+final aggregate plus a 1-row reduction. At 100 TB
    * the sketches come from the stored per-day sketch table
    * (q_hll_sketch_merge / StreamSketch) instead of a scan — this query
    * pins the estimator the readers of that table use. */
  val qHllIntersect = GraftQuery(
    "q_hll_intersect",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val est = ev.agg(
        hll_sketch_estimate(hll_sketch_agg(
          when($"event_type" === "click", $"user_id"))).as("est_a"),
        hll_sketch_estimate(hll_sketch_agg(
          when($"event_type" === "purchase", $"user_id"))).as("est_b"),
        hll_sketch_estimate(hll_sketch_agg(
          when($"event_type".isin("click", "purchase"), $"user_id")))
          .as("est_u"))
      val exact = ev
        .groupBy($"user_id")
        .agg(max(when($"event_type" === "click", 1L).otherwise(0L)).as("c"),
          max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("p"))
        .agg(sum($"c").as("exact_a"), sum($"p").as("exact_b"),
          sum($"c" * $"p").as("exact_inter"),
          sum(greatest($"c", $"p")).as("exact_union"))
        .na.fill(0L)
      exact.crossJoin(broadcast(est))
        .select($"exact_a", $"exact_b", $"exact_union", $"exact_inter",
          when(
            abs($"est_a" + $"est_b" - $"est_u"
              - $"exact_inter".cast(DoubleType))
              <= greatest(lit(3.0), lit(3.0 * 1.04 / 64.0) *
                ($"exact_a" + $"exact_b" + $"exact_union")
                  .cast(DoubleType)), 1L)
            .otherwise(0L).as("approx_ok"))
        .orderBy($"exact_a")
    },
    Some("""
      WITH per AS (
        SELECT user_id,
          max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        FROM events GROUP BY 1)
      SELECT coalesce(sum(c), 0)::BIGINT AS exact_a,
        coalesce(sum(p), 0)::BIGINT AS exact_b,
        coalesce(sum(greatest(c, p)), 0)::BIGINT AS exact_union,
        coalesce(sum(c * p), 0)::BIGINT AS exact_inter,
        1::BIGINT AS approx_ok
      FROM per
      ORDER BY exact_a""")
  )

  /** Privacy budget for [[qDpRelease]] — the release's ε, as exact
    * literal text shared between both engines' formula trees. */
  val DpEpsilon = "1.0"

  /** Differentially-private count release (Dwork et al. 2006) — the
    * publication side of the privacy ladder whose AUDIT side k-anonymity
    * / t-closeness already cover: per-language document counts released
    * with Laplace(1/ε) noise (sensitivity 1 — one document moves one
    * count by one), plus the 95% noise bound ln(20)/ε a consumer reads
    * as the release's error bar. True counts deliberately do NOT appear
    * in the output — that is the point of the mechanism.
    *
    * Determinism discipline: the uniform driving the inverse-CDF is the
    * salted-u32 hash of the released key mapped to (0,1) — the
    * q_bootstrap_ci precedent (deterministic Poisson weights) applied to
    * Laplace: noise = −(1/ε)·sgn(u−½)·ln(1−2|u−½|), a fixed double tree
    * over the same u in both engines, so the release replays exactly.
    * (A production deployment swaps the hash for a CSPRNG draw per
    * release; the relational shape — one map-side transform per released
    * cell — is unchanged.) u = (h+½)/2³² is strictly inside (0,1) and
    * |u−½| < ½ exactly, so the log never sees 0.
    *
    * Scale shape: one corpus aggregate to the released-domain counts;
    * the noise is a scalar expression on that ≤|langs|-row relation. */
  val qDpRelease = GraftQuery(
    "q_dp_release",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .groupBy($"lang").agg(count(lit(1)).as("n_true"))
        .withColumn("u", expr(
          "(CAST(" + graft.operators.PipelineOps.u32Expr("concat('dp:', lang)") +
            " AS DOUBLE) + 0.5) / 4294967296.0"))
        .select($"lang",
          Det.qround(expr(s"""CAST(n_true AS DOUBLE) -
              (1.0 / $DpEpsilon) * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
              * ln(1.0 - 2.0 * abs(u - 0.5))""")).as("n_released"),
          expr(s"CAST($DpEpsilon AS DOUBLE)").as("epsilon"),
          Det.qround(expr(s"ln(20.0) / $DpEpsilon")).as("noise_bound_95"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH g AS (
        SELECT lang, count(*)::BIGINT AS n_true FROM documents GROUP BY 1),
      u AS (
        SELECT lang, n_true,
          (CAST(${graft.operators.PipelineOps.u32Sql("'dp:' || lang")}
            AS DOUBLE) + 0.5) / 4294967296.0 AS u
        FROM g)
      SELECT lang,
        ${Oracle.qround(s"""CAST(n_true AS DOUBLE) -
          (1.0 / $DpEpsilon) * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
          * ln(1.0 - 2.0 * abs(u - 0.5))""")} AS n_released,
        CAST($DpEpsilon AS DOUBLE) AS epsilon,
        ${Oracle.qround(s"ln(20.0) / $DpEpsilon")} AS noise_bound_95
      FROM u
      ORDER BY lang""")
  )

  /** Jensen–Shannon divergence of the event-type MIX between the two time
    * halves — the symmetric, bounded (≤ ln 2) companion of [[qPsiDrift]]:
    * PSI bins the continuous `value`; this compares the CATEGORICAL
    * composition (did the traffic mix shift?), the drift readout a
    * training-data pipeline reads per ingest window before trusting a new
    * snapshot (Lin 1991). JSD needs no smoothing — the mixture
    * m = (p+q)/2 is positive wherever either side has mass, and a
    * zero-mass side simply contributes nothing (`when` guards in both
    * engines keep 0·ln(0) out of the tree).
    *
    * Exactness: category counts are exact BIGINTs; p, q are single IEEE
    * divisions; each term is qrounded and the total rides the decimal
    * window sum (the psiOfCounts discipline). Scale shape: ONE
    * partial+final corpus aggregate to the |types|-row count relation
    * (the time-half split reuses q_psi_drift's div-2 midpoint, bounds
    * broadcast); every window below runs on the bounded category
    * domain. */
  val qJsdDrift = GraftQuery(
    "q_jsd_drift",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir).select($"ts_us", $"event_type")
      val bounds = ev.agg(min($"ts_us").as("tmin"), max($"ts_us").as("tmax"))
      val counts = ev.crossJoin(broadcast(bounds))
        // same truncating-div midpoint as q_psi_drift (pre-epoch-safe)
        .withColumn("is_old", $"ts_us" <= expr("(tmin + tmax) div 2"))
        .groupBy($"event_type")
        .agg(sum(when($"is_old", 1L).otherwise(0L)).as("n_old"),
          sum(when(!$"is_old", 1L).otherwise(0L)).as("n_new"))
      val w = Window.partitionBy()
      val sided = counts
        .withColumn("p", $"n_old".cast(DoubleType) /
          sum($"n_old").over(w).cast(DoubleType))
        .withColumn("q", $"n_new".cast(DoubleType) /
          sum($"n_new").over(w).cast(DoubleType))
        .withColumn("m", ($"p" + $"q") / lit(2.0))
      sided
        .withColumn("jsd_term", Det.qround(lit(0.5) *
          (coalesce(when($"p" > 0, $"p" * log($"p" / $"m")), lit(0.0)) +
            coalesce(when($"q" > 0, $"q" * log($"q" / $"m")), lit(0.0)))))
        .withColumn("jsd_total",
          round(sum($"jsd_term".cast(DecimalType(38, 9))).over(w), 6)
            .cast(DoubleType))
        .select($"event_type", $"n_old", $"n_new", $"jsd_term",
          $"jsd_total")
        .orderBy($"event_type")
    },
    Some(s"""
      WITH b AS (
        SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        FROM events),
      counts AS (
        SELECT event_type,
          sum(CASE WHEN epoch_us(ts) <= b.mid THEN 1 ELSE 0 END)::BIGINT
            AS n_old,
          sum(CASE WHEN epoch_us(ts) > b.mid THEN 1 ELSE 0 END)::BIGINT
            AS n_new
        FROM events, b GROUP BY event_type),
      p AS (
        SELECT event_type, n_old, n_new,
          n_old::DOUBLE / (sum(n_old) OVER ())::DOUBLE AS p,
          n_new::DOUBLE / (sum(n_new) OVER ())::DOUBLE AS q
        FROM counts),
      terms AS (
        SELECT event_type, n_old, n_new,
          ${Oracle.qround("""0.5e0 *
            (coalesce(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2e0)) END,
               0e0) +
             coalesce(CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2e0)) END,
               0e0))""")} AS jsd_term
        FROM p)
      SELECT event_type, n_old, n_new, jsd_term,
        round(sum(CAST(jsd_term AS DECIMAL(38,9))) OVER (), 6)::DOUBLE
          AS jsd_total
      FROM terms
      ORDER BY event_type""")
  )

  /** DP-SGD noise multiplier assumed by [[qDpAccountant]]. */
  val DpSgdSigma = 4.0

  /** DP-SGD logical batch size (sampling rate q = batch / corpus). */
  val DpSgdBatch = 64

  /** Training epochs the [[qDpAccountant]] ledger composes over. */
  val DpSgdEpochs = 3

  /** Highest integer Rényi order in the [[qDpAccountant]] grid. */
  val DpSgdAlphaMax = 32

  /** (α, j, ln C(α,j)) grid rows for every integer order 2..[[DpSgdAlphaMax]]
    * — binomials are exact BigInts (≤ C(32,16) < 2⁵³, so the double is the
    * exact integer) logged once driver-side and inlined as literals in BOTH
    * engines, keeping libm out of the cross-engine contract for the
    * combinatorial part. */
  private[graft] val dpGrid: Seq[(Int, Int, Double)] = {
    def choose(n: Int, k: Int): BigInt =
      (BigInt(1) to BigInt(k)).foldLeft(BigInt(1))((acc, i) =>
        acc * (n - k + i.toInt) / i)
    for { a <- 2 to DpSgdAlphaMax; j <- 0 to a }
      yield (a, j, math.log(choose(a, j).toDouble))
  }

  // Shared IEEE expression strings (the MlEval.DetM discipline): `expr()`ed
  // Spark-side and interpolated into the DuckDB oracle verbatim.
  private val DpQ = s"least($DpSgdBatch.0 / nd, 0.5)"
  private val DpSteps = s"ceil(nd * $DpSgdEpochs.0 / $DpSgdBatch.0)"
  private val DpTerm = "exp(lc + (ad - jd)*ln(1.0 - q) + jd*ln(q)" +
    s" + jd*(jd - 1.0)/(2.0*$DpSgdSigma*$DpSgdSigma))"
  private val DpEpsStep = "ln(msum) / (ad - 1.0)"
  private val DpEpsTotal = s"sd * ($DpEpsStep)"
  private val DpEpsDelta = s"$DpEpsTotal + ln(nd * nd) / (ad - 1.0)"

  /** DP-SGD privacy ledger by Rényi-DP accounting — the privacy budget a
    * training run on THIS corpus would spend, the governance companion to
    * [[qDpRelease]] (which privatizes a release; this prices the training
    * itself). For each integer order α ∈ [2, [[DpSgdAlphaMax]]], the RDP of
    * the subsampled Gaussian mechanism at sampling rate q = batch/n and
    * noise σ uses Mironov–Talwar–Zhang 2019 ("Rényi Differential Privacy of
    * the Sampled Gaussian Mechanism", arXiv:1908.10530, Thm 9's integer-α
    * upper bound): ε(α) = ln(Σⱼ C(α,j)(1−q)^{α−j} qʲ e^{j(j−1)/2σ²})/(α−1);
    * composition over the corpus-derived step count multiplies, and the
    * (ε, δ)-DP conversion adds ln(1/δ)/(α−1) with δ = 1/n². The row
    * minimizing ε(δ) is the ledger's quote — flagged `is_best`.
    *
    * Exactness: binomial logs are exact literals; each per-(α,j) term is
    * ONE shared exp/ln expression tree; the per-α sum is decimal-cast
    * (order-free) and rounded once ([[Det.dsum]] — the 6-dp quantization
    * bounds the smallest resolvable per-step ε, documented trade); the ε
    * arithmetic above that is shared textually.
    *
    * Scale shape: the ONLY corpus-priced op is count(documents) — one
    * partial+final count; the ledger itself is a ~560-row literal grid
    * crossed with the broadcast 1-row stats, entirely model-scale. At
    * 100 TB nothing changes: the accountant's cost is the count. */
  val qDpAccountant = GraftQuery(
    "q_dp_accountant",
    (spark, dir) => {
      import spark.implicits._
      val base = Tables.documents(spark, dir)
        .agg(count(lit(1)).as("n"))
        // an empty corpus prices no training run: emit an empty ledger
        // instead of dividing the sampling rate by zero (ANSI throws)
        .filter($"n" > 0)
        .withColumn("nd", $"n".cast(DoubleType))
        .withColumn("q", expr(DpQ))
        .withColumn("sd", expr(DpSteps))
      val grid = dpGrid.toDF("alpha", "j", "lc")
      val perA = grid.crossJoin(broadcast(base))
        .withColumn("ad", $"alpha".cast(DoubleType))
        .withColumn("jd", $"j".cast(DoubleType))
        .withColumn("t", expr(DpTerm))
        .groupBy($"alpha", $"ad", $"sd", $"nd")
        .agg(Det.dsum($"t").as("msum"))
      perA
        .withColumn("eps_q", Det.qround(expr(DpEpsDelta)))
        .withColumn("rn", row_number().over(
          Window.orderBy($"eps_q", $"alpha")))
        .select($"alpha", $"sd".cast(LongType).as("steps"),
          Det.qround(expr(DpEpsStep)).as("rdp_step"),
          Det.qround(expr(DpEpsTotal)).as("rdp_total"),
          $"eps_q".as("eps_at_delta"),
          ($"rn" === 1).as("is_best"))
        .orderBy($"alpha")
    },
    Some {
      val values = dpGrid
        .map { case (a, j, l) => s"($a, $j, ${f"$l%.17e"})" }
        .mkString(", ")
      s"""
      WITH base AS (
        SELECT count(*)::BIGINT AS n, count(*)::DOUBLE AS nd
        FROM documents),
      b2 AS (SELECT *, $DpQ AS q, $DpSteps AS sd FROM base WHERE n > 0),
      grid(alpha, j, lc) AS (VALUES $values),
      rows_ AS (
        SELECT alpha, CAST(alpha AS DOUBLE) AS ad, CAST(j AS DOUBLE) AS jd,
          lc, q, sd, nd
        FROM grid CROSS JOIN b2),
      pera AS (
        SELECT alpha, ad, sd, nd, ${Oracle.dsum("t")} AS msum
        FROM (SELECT *, $DpTerm AS t FROM rows_)
        GROUP BY alpha, ad, sd, nd),
      fin AS (
        SELECT alpha, sd, nd, msum, ad,
          ${Oracle.qround(DpEpsDelta)} AS eps_q
        FROM pera)
      SELECT alpha, CAST(sd AS BIGINT) AS steps,
        ${Oracle.qround(DpEpsStep)} AS rdp_step,
        ${Oracle.qround(DpEpsTotal)} AS rdp_total,
        eps_q AS eps_at_delta,
        (row_number() OVER (ORDER BY eps_q, alpha) = 1) AS is_best
      FROM fin
      ORDER BY alpha"""
    }
  )

  /** Four-fifths-rule threshold for [[qFairnessAudit]]'s disparate-impact
    * flag (EEOC Uniform Guidelines §4D — selection rate under 80% of the
    * most-favored group's is adverse-impact evidence). */
  val FairnessImpactFloor = 0.8

  /** Core of [[qFairnessAudit]] over any (source, kept, correct) per-doc
    * relation — factored so specs can plant group rates exactly. */
  private[graft] def fairnessAuditOf(base: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    // per-group counts: the one corpus collapse; referenced three ways
    // below (per-row readout, totals, max selection rate) — persist the
    // model-sized relation (the differently-pruned-aggregate law)
    val g = base.groupBy($"source")
      .agg(count(lit(1)).as("n"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"correct", 1L).otherwise(0L)).as("n_correct"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = g.agg(sum($"n").as("tn"), sum($"n_kept").as("tk"),
      sum($"n_correct").as("tc"))
    val mx = g.agg(max(Det.qround($"n_kept".cast(DoubleType) /
      $"n".cast(DoubleType))).as("max_sel"))
    g.crossJoin(broadcast(tot)).crossJoin(broadcast(mx))
      .withColumn("sel_rate",
        Det.qround($"n_kept".cast(DoubleType) / $"n".cast(DoubleType)))
      .withColumn("acc",
        Det.qround($"n_correct".cast(DoubleType) / $"n".cast(DoubleType)))
      .select($"source", $"n".as("n_docs"), $"sel_rate",
        Det.qround($"sel_rate" -
          Det.qround($"tk".cast(DoubleType) / $"tn".cast(DoubleType)))
          .as("parity_gap"),
        Det.qround($"sel_rate" / $"max_sel").as("impact_ratio"),
        (Det.qround($"sel_rate" / $"max_sel") < FairnessImpactFloor)
          .as("below_80pct"),
        $"acc",
        Det.qround($"acc" -
          Det.qround($"tc".cast(DoubleType) / $"tn".cast(DoubleType)))
          .as("acc_gap"))
      .orderBy($"source")
  }

  /** Provenance-group fairness audit of the curation pipeline — the
    * disparate-impact readout a governance review runs over the SAME two
    * decisions the pipeline already makes per document: the quality-gate
    * selection (kept = quality ≥ [[PipelineOps.QualityThreshold]], the
    * q_corpus_prep gate) and the language-ID classifier's per-doc
    * correctness (the q_lang_id predictions). Per source: selection rate,
    * statistical-parity gap vs the corpus rate, the four-fifths
    * disparate-impact ratio vs the most-favored group (flagged under
    * [[FairnessImpactFloor]] — the EEOC 80% rule), and
    * accuracy/predictive-parity gap (Hardt et al. 2016's
    * equalized-odds family, collapsed to multi-class accuracy since every
    * document carries its true lang).
    *
    * Exactness: group counts are exact longs; every rate is ONE qround'd
    * quotient and every gap/ratio is qround arithmetic on those rounded
    * rates (shared textually), so the 0.8 comparison is on identical
    * doubles in both engines.
    *
    * Scale shape: the corpus collapses ONCE to per-source counts (the
    * quality column and the lang prediction are both map-side; the join
    * of the two per-doc relations is one doc_id hash join of thin
    * columns — bucketize both sides by doc_id at 100 TB); totals and the
    * max rate are broadcast 1-row reads of the persisted group table. */
  val qFairnessAudit = GraftQuery(
    "q_fairness_audit",
    (spark, dir) => {
      import spark.implicits._
      val scored = Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", $"source",
          (TextAnalytics.qualityCol >= PipelineOps.QualityThreshold)
            .as("kept"))
      val preds = TextAnalytics.langPredictions(spark, dir)
        .select($"doc_id", $"correct")
      fairnessAuditOf(scored.join(preds, Seq("doc_id")))
    },
    Some {
      val selRate = Oracle.qround("n_kept / n")
      val acc = Oracle.qround("n_correct / n")
      s"""
      WITH ${TextAnalytics.langPredCtes},
      q AS (
        SELECT doc_id, source,
          (${TextAnalytics.qualitySqlExpr} >= ${PipelineOps.QualityThreshold})
            AS kept
        FROM documents),
      b AS (
        SELECT q.source, q.kept, p.correct
        FROM q JOIN preds p USING (doc_id)),
      g AS MATERIALIZED (
        SELECT source, count(*)::BIGINT AS nl,
          sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS nk,
          sum(CASE WHEN correct THEN 1 ELSE 0 END)::BIGINT AS nc
        FROM b GROUP BY 1),
      gg AS (
        SELECT source, nl, nk, nc, nl::DOUBLE AS n, nk::DOUBLE AS n_kept,
          nc::DOUBLE AS n_correct
        FROM g),
      tot AS (
        SELECT sum(nl)::DOUBLE AS tn, sum(nk)::DOUBLE AS tk,
          sum(nc)::DOUBLE AS tc
        FROM g),
      mx AS (SELECT max($selRate) AS max_sel FROM gg),
      r AS (
        SELECT source, nl, $selRate AS sel_rate, $acc AS acc, tn, tk, tc,
          max_sel
        FROM gg CROSS JOIN tot CROSS JOIN mx)
      SELECT source, nl AS n_docs, sel_rate,
        ${Oracle.qround(s"sel_rate - ${Oracle.qround("tk / tn")}")}
          AS parity_gap,
        ${Oracle.qround("sel_rate / max_sel")} AS impact_ratio,
        (${Oracle.qround("sel_rate / max_sel")} < $FairnessImpactFloor)
          AS below_80pct,
        acc,
        ${Oracle.qround(s"acc - ${Oracle.qround("tc / tn")}")} AS acc_gap
      FROM r
      ORDER BY source"""
    }
  )

  val all: Seq[GraftQuery] =
    Seq(qScd2History, qKAnonymity, qDqRules, qPsiDrift, qJsdDrift,
      qHllSketchMerge, qHistQuantiles, qCusumDrift, qTCloseness, qChi2Bias,
      qBenford, qHllIntersect, qDpRelease, qDpAccountant, qFairnessAudit)
}
