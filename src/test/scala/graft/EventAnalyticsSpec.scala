package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions.expr

/** Dashboard analytics on the fixture events (one event per 6h bucket,
  * values 1..6): rolling(5) null semantics + sample stddev, keep-last dedup,
  * trailing window filter, top-k, json props. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling(5): first 4 rows null, then mean and ddof=1 stddev with ±2σ band") {
    val rows = EventAnalytics.qRollingMetric.run(spark, fixtureDir)
      .select($"bucket", $"ma5", $"sd5", $"upper", $"lower")
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(rows.map(_._1) === (0L to 5L))
    assert(rows.take(4).forall(r => r._2.isEmpty && r._3.isEmpty))
    // bucket 4: window values 1..5 => mean 3, stddev_samp sqrt(2.5)
    val b4 = rows(4)
    val sd = math.sqrt(2.5)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(b4._2 === Some(3.0))
    assert(b4._3 === Some(r6(sd)))
    assert(b4._4 === Some(r6(3.0 + 2 * sd)))
    assert(b4._5 === Some(r6(3.0 - 2 * sd)))
    // bucket 5: values 2..6 => mean 4, same spread
    assert(rows(5)._2 === Some(4.0))
    assert(rows(5)._3 === Some(r6(sd)))
  }

  test("dedup keep-last: latest event per user") {
    val r = EventAnalytics.qDedupKeepLast.run(spark, fixtureDir)
      .select($"user_id", $"event_id").as[(Long, Long)].collect().toMap
    assert(r === Map(0L -> 4L, 1L -> 5L))  // user 0: events 0,2,4; user 1: 1,3,5
  }

  test("trailing 6h window keeps only the last two buckets") {
    val r = EventAnalytics.qWindowFilter6h.run(spark, fixtureDir)
      .select($"event_type", $"n_events", $"sum_value")
      .as[(String, Long, Double)].collect().toSet
    assert(r === Set(("click", 1L, 5.0), ("signup", 1L, 6.0)))
  }

  test("top-3 event types by count with name tiebreak") {
    val r = EventAnalytics.qTop3EventTypes.run(spark, fixtureDir)
      .select($"event_type", $"n_events").as[(String, Long)].collect().toSeq
    assert(r === Seq(("click", 3L), ("view", 2L), ("signup", 1L)))
  }

  test("latest metric is the single newest event") {
    val r = EventAnalytics.qLatestMetric.run(spark, fixtureDir)
      .select($"event_id", $"value").as[(Long, Double)].collect().toSeq
    assert(r === Seq((5L, 6.0)))
  }

  test("json props extraction buckets k into deciles") {
    val r = EventAnalytics.qJsonProps.run(spark, fixtureDir)
      .select($"k_decile", $"n_events").as[(Long, Long)].collect().toMap
    // k = 0,10,20,30,40,50 => deciles 0..5, one event each
    assert(r === (0L to 5L).map(_ -> 1L).toMap)
  }

  test("union of metric slices preserves both branches") {
    val r = EventAnalytics.qUnionMetrics.run(spark, fixtureDir)
      .select($"kind", $"n_events").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(r === Map("click" -> 3L, "view" -> 2L))
  }

  test("gap fill densifies to the full day x type spine with zero rows") {
    // fixture: 6 events on days 0-1; only 4 (day, type) combos have data
    val rows = EventAnalytics.qGapFill.run(spark, fixtureDir)
      .select($"day", $"event_type", $"n_events", $"sum_value")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(rows.size === 10) // 2 days x 5 pinned types
    assert(rows.count(_._3 == 0L) === 6)
    val byKey = rows.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(byKey((0L, "click")) === ((2L, 4.0)))   // values 1 + 3
    assert(byKey((1L, "click")) === ((1L, 5.0)))
    assert(byKey((1L, "signup")) === ((1L, 6.0)))
    assert(byKey((0L, "error")) === ((0L, 0.0)))   // zero-filled gap
  }

  test("upsert merge: update wins for matched users, new users insert") {
    // cutoff = 30h - 24h = 6h: base = {event 0 (user 0)};
    // updates = events 1-5 -> latest per user: user 0 -> 4, user 1 -> 5
    val r = EventAnalytics.qUpsertMerge.run(spark, fixtureDir)
      .select($"user_id", $"event_id", $"action")
      .as[(Long, Long, String)].collect().toSet
    assert(r === Set((0L, 4L, "update"), (1L, 5L, "insert")))
  }

  test("event paths: ordered per-user journeys from the fixture") {
    val r = EventAnalytics.qEventPaths.run(spark, fixtureDir)
      .select($"user_id", $"path", $"n_steps")
      .as[(Long, String, Long)].collect().toSet
    // user 0: events 0,2,4 (click,click,click); user 1: 1,3,5 (view,view,signup)
    assert(r === Set((0L, "click>click>click", 3L),
      (1L, "view>view>signup", 3L)))
  }

  test("value trend: hand-computed least-squares over the click series") {
    // click revenue: day 0 -> 4.0, day 1 -> 5.0 => slope 1, intercept 4
    val r = EventAnalytics.qValueTrend.run(spark, fixtureDir)
      .filter($"event_type" === "click")
      .select($"n_days", $"slope", $"intercept")
      .as[(Long, Double, Double)].collect().toSeq
    assert(r === Seq((2L, 1.0, 4.0)))
  }

  test("ewma: hand-computed half-life decay per type on the fixture") {
    // click values 1,3,5; view 2,4; signup 6 (ts order)
    val r = EventAnalytics.qEwmaMetric.run(spark, fixtureDir)
      .select($"event_type", $"value", $"ewma")
      .as[(String, Double, Double)].collect().toSeq
    assert(r.filter(_._1 == "click").map(_._3) === Seq(1.0, 2.333333, 3.857143))
    assert(r.filter(_._1 == "view").map(_._3) === Seq(2.0, 3.333333))
    assert(r.filter(_._1 == "signup").map(_._3) === Seq(6.0))
  }


  test("winsorized stats: hand-computed p5/p95 clip on the fixture") {
    // click [1,3,5]: p05 = 1.2, p95 = 4.8 -> clipped mean 3.0
    // view [2,4]:   p05 = 2.1, p95 = 3.9 -> clipped mean 3.0
    // signup [6]:   both bounds 6 -> mean 6
    val got = EventAnalytics.qWinsorizedStats.run(spark, fixtureDir)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      ("click", 3L, 1.2, 4.8, 3.0),
      ("signup", 1L, 6.0, 6.0, 6.0),
      ("view", 2L, 2.1, 3.9, 3.0)))
  }

  test("q_incremental_agg: base+delta refresh equals hand-computed recompute") {
    // fixture events: click values {1,3,5}, view {2,4}, signup {6}
    val got = graft.operators.EventAnalytics.qIncrementalAgg
      .run(spark, fixtureDir)
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      ("click", 3L, 9.0, 3.0, 1.0, 5.0),
      ("signup", 1L, 6.0, 6.0, 6.0, 6.0),
      ("view", 2L, 6.0, 3.0, 2.0, 4.0)))
  }

  test("q_time_weighted_avg: hand-computed trapezoids; single-event days vanish") {
    // fixture: events every 6h, value b+1, types [click,view,click,view,click,signup].
    // Day 0 holds b=0..3; day 1 holds b=4,5.
    //   click day 0: (v1 @0h, v3 @12h)  -> one segment, (1+3)/2 = 2.0 over 12h
    //   view  day 0: (v2 @6h, v4 @18h)  -> one segment, (2+4)/2 = 3.0 over 12h
    //   click day 1 (b=4) and signup day 1 (b=5) are single-event days -> excluded
    val halfDayUs = 12L * 3600 * 1000000
    val got = EventAnalytics.qTimeWeightedAvg.run(spark, fixtureDir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("click", 0L, 1L, halfDayUs, 2.0),
      ("view", 0L, 1L, halfDayUs, 3.0)))
  }

  test("q_incremental_agg invariance at sf0.001: refresh == one-shot recompute") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val direct = Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Det.dsum($"value").as("total_value"),
        graft.functions.Det.davg($"value").as("mean_value"),
        min($"value").as("min_value"), max($"value").as("max_value"))
      .orderBy($"event_type")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    val refreshed = graft.operators.EventAnalytics.qIncrementalAgg
      .run(spark, dir)
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(refreshed === direct)
  }

  test("q_hourly_profile: hand-computed diurnal buckets on the fixture") {
    // fixture events at t = b·6h, b = 0..5: hours 0, 6, 12, 18, 0 (24h
    // wraps), 6 (30h); types cycle click/view/click/view/click/signup,
    // value = b+1 → (0, click) holds b = 0 and 4 with mean (1+5)/2 = 3
    val rows = EventAnalytics.qHourlyProfile.run(spark, fixtureDir)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(rows === Seq(
      (0L, "click", 2L, 3.0),
      (6L, "signup", 1L, 6.0),
      (6L, "view", 1L, 2.0),
      (12L, "click", 1L, 3.0),
      (18L, "view", 1L, 4.0)))
  }

  test("q_hourly_profile floor-mods pre-epoch timestamps into 0..23") {
    // Spark div/% truncate toward zero, DuckDB // floors — pmod on the
    // Spark side and the oracle's double-mod keep negative ts_us agreeing:
    // ts_us = -1 (1 µs before epoch) is 23:59:59.999999 → hour 23, never
    // the truncate-toward-zero 0 or a negative hour
    val dir = java.nio.file.Files.createTempDirectory("hourneg").toString
    Seq((-1000L, "click", 1.0), (-3600000001000L, "click", 3.0),
        (5000L, "view", 2.0))  // ns: -1 µs → h23; -(1h + 1 µs) → h22; +5 µs → h0
      .toDF("ts", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val rows = EventAnalytics.qHourlyProfile.run(spark, dir)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(rows === Seq(
      (0L, "view", 1L, 2.0),
      (22L, "click", 1L, 3.0),
      (23L, "click", 1L, 1.0)))
  }

  test("autocorr: two-day click series gives acf(1) = -0.5, singletons drop") {
    // daily sums: click d0=1+3=4, d1=5 (m=4.5, dd=-0.5/+0.5, den=0.5,
    // num(1)=-0.25); view and signup have single-day series -> no pairs
    val rows = EventAnalytics.qAutocorr.run(spark, fixtureDir)
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(rows === Seq(("click", 1L, 1L, Some(-0.5))))
  }

  test("cross corr: fixture has no purchases -> NULL ccf, pair counts exact") {
    // y-series is all zeros (no purchase events): syy = 0 -> the NULL
    // guard must fire for every lag; activity days are {0, 1} so only
    // lags -1/0/1 produce aligned pairs
    val rows = EventAnalytics.qCrossCorr.run(spark, fixtureDir)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(rows === Seq((-1L, 1L, None), (0L, 2L, None), (1L, 1L, None)))
  }

  test("cross corr at sf0.001: all 15 lags aligned, ccf bounded") {
    val rows = EventAnalytics.qCrossCorr.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(rows.map(_._1) === (-7L to 7L))
    rows.foreach { case (_, nPairs, ccf) =>
      assert(nPairs > 0L)
      assert(ccf.exists(c => c >= -1.0 && c <= 1.0))
    }
  }

  test("stl decompose: short fixture series never earns a trend window") {
    // 7-day centered MA needs 7 days; the fixture spans 2 -> the
    // decomposition columns must be NULL everywhere, values intact
    val rows = EventAnalytics.qStlDecompose.run(spark, fixtureDir)
      .as[(String, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._3)) === Seq(
      ("click", 0L, 4.0), ("click", 1L, 5.0),
      ("signup", 1L, 6.0), ("view", 0L, 6.0)))
    rows.foreach { case (_, _, _, t, se, re) =>
      assert(t.isEmpty && se.isEmpty && re.isEmpty)
    }
  }

  test("stl decompose at sf0.001: reconstruction v = trend+seasonal+resid") {
    val rows = EventAnalytics.qStlDecompose.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().toSeq
    val full = rows.filter(_._4.isDefined)
    assert(full.nonEmpty) // the sf corpus spans enough days
    full.foreach { case (_, _, v, Some(t), se, re) =>
      assert(se.isDefined && re.isDefined)
      assert(math.abs(v - t - se.get - re.get) < 1e-6)
    case r => fail(r.toString)
    }
    // interior days have trend; the 3-day edges of each series don't
    assert(rows.exists(_._4.isEmpty))
  }

  test("seasonal forecast: 2-day fixture has no lag-7 holdout -> empty") {
    assert(EventAnalytics.qSeasonalForecast.run(spark, fixtureDir)
      .count() === 0L)
  }

  test("seasonal forecast at sf0.001: independent plain-Scala replica") {
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def decSum(xs: Seq[Double]): Double = {
      val s = xs.map(BigDecimal.valueOf(_)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      (BigDecimal(math.floor((s * 1000000).toDouble + 0.5)) / 1000000).toDouble
    }
    val dayUs = 24L * 3600 * 1000000
    val H = EventAnalytics.ForecastHorizon
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_type", $"ts_us", $"value")
      .as[(String, Long, Double)].collect()
    val daily = ev.groupBy(e => (e._1, e._2 / dayUs)).map { case (k, g) =>
      k -> decSum(g.map(_._3).toSeq)
    }
    val d0 = daily.keys.map(_._2).min; val d1 = daily.keys.map(_._2).max
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    val expected = types.flatMap { t =>
      val series = (d0 to d1).map(d => daily.getOrElse((t, d), 0.0))
      val n = series.size
      val test = (H until n).filter(i => (d0 + i) > d1 - H)
        .map(i => (series(i), series(i - H)))
      val train = (1 until n).filter(i => (d0 + i) <= d1 - H)
        .map(i => (series(i), series(i - 1)))
      if (test.isEmpty || train.isEmpty) None else {
        val mae = qr(decSum(test.map { case (v, f) => math.abs(v - f) }) /
          test.size)
        val rmse = qr(math.sqrt(
          decSum(test.map { case (v, f) => qr((v - f) * (v - f)) }) /
            test.size))
        val nm = qr(decSum(train.map { case (v, f) => math.abs(v - f) }) /
          train.size)
        val mase = if (nm > 0) Some(qr(mae / nm)) else None
        Some((t, train.size.toLong, test.size.toLong, mae, rmse, nm, mase))
      }
    }
    val rows = EventAnalytics.qSeasonalForecast
      .run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double, Double, Double, Option[Double])]
      .collect().toSeq
    assert(rows === expected)
    assert(rows.nonEmpty && rows.forall(_._3 === H.toLong))
  }

  test("ljung-box at sf0.001: replica from q_autocorr's own acf rows") {
    val sf = "/root/testdata/sf0.001"
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def d9(x: Double) = BigDecimal.valueOf(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(s: BigDecimal) =
      s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val acf = EventAnalytics.qAutocorr.run(spark, sf)
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    val nDays = Tables.events(spark, sf)
      .select($"event_type", expr("ts_us div 86400000000").as("day"))
      .distinct().groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    val expRows = acf.groupBy(_._1).toSeq.map { case (t, rows) =>
      val n = nDays(t)
      val ts = rows.filter(r => r._4.isDefined && n - r._2 > 0)
        .map(r => d9(qr(r._4.get * r._4.get / (n - r._2))))
      val df = ts.size
      val q = qr(n * (n + 2) * r6(ts.sum))
      val crit = EventAnalytics.Chi2Crit95(df - 1)
      (t, n, df.toLong, q, crit, q > crit)
    }.sortBy(_._1)
    val got = EventAnalytics.qLjungBox.run(spark, sf)
      .as[(String, Long, Long, Double, Double, Boolean)].collect().toSeq
    assert(got === expRows && got.nonEmpty)
  }

  test("session paths: trigrams respect session boundaries, hand-traced") {
    // user 1: A B C A B in ONE session (1-min spacing) -> trigrams
    // ABC, BCA, CAB; user 2: A B C | gap > 30 min | A B C -> two sessions,
    // one ABC each. Totals: ABC x3, BCA x1, CAB x1 (no cross-gap trigram).
    val dir = java.nio.file.Files.createTempDirectory("graft-paths").toString
    val min = 60L * 1000000
    val u1 = Seq("A", "B", "C", "A", "B").zipWithIndex.map { case (t, i) =>
      (i.toLong, i * min, 1L, t, 1.0, "{}")
    }
    val u2 = Seq(0, 1, 2, 40, 41, 42).zipWithIndex.map { case (m, i) =>
      (10L + i, m * min, 2L, Seq("A", "B", "C")(i % 3), 1.0, "{}")
    }
    (u1 ++ u2).toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros($"ts_us")
          .cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventAnalytics.qSessionPaths.run(spark, dir)
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("A", "B", "C", 3L, 0.6),
      ("B", "C", "A", 1L, 0.2),
      ("C", "A", "B", 1L, 0.2)))
  }

  test("changepoint: planted level shift found at the true split") {
    // days 0-5 at value 1, days 6-9 at value 10: AMOC must flag day 5.
    // hand: n=10, m=4.6; split@5: bss = 6*3.6^2 + 4*5.4^2 = 194.4
    val dir = java.nio.file.Files.createTempDirectory("graft-cpt").toString
    val dayUs = 24L * 3600 * 1000000
    (0 to 9).map { d =>
      (d.toLong, d * dayUs, d.toLong, "click",
        if (d <= 5) 1.0 else 10.0, "{}")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros($"ts_us")
          .cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventAnalytics.qChangepoint.run(spark, dir)
      .as[(Long, Long, Long, Double, Double, Double, Boolean)]
      .collect().toSeq
    assert(got.size === 9) // 10 days, last split excluded
    val best = got.filter(_._7)
    assert(best === Seq((5L, 6L, 4L, 1.0, 10.0, 194.4, true)))
    // the scan profile peaks at the true split
    assert(got.forall(r => r._6 <= 194.4))
  }
}
