package graft

import graft.operators.BehaviorAnalytics
import org.apache.spark.sql.functions.{expr, lit, timestamp_micros}

/** Behavior analytics: funnel / cohort / outlier expectations hand-computed
  * on the 6-event fixture (users 0,1 alternate; the one signup is user 1's
  * LAST event, so later funnel stages are empty by construction). */
class BehaviorAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("q_event_funnel hand-computed stages") {
    // fixture: clicks all belong to user 0; the only signup is user 1's
    // final event → stage 1 = {user 1}, stages 2 and 3 empty
    val out = BehaviorAnalytics.qEventFunnel.run(spark, fixtureDir)
      .as[(Int, String, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      (1, "signup", 1L, Some(1.0)),
      (2, "click", 0L, Some(0.0)),
      (3, "purchase", 0L, Some(0.0))))
  }

  test("q_event_funnel on sf0.001: monotone non-increasing stages") {
    val rows = BehaviorAnalytics.qEventFunnel.run(spark, "/root/testdata/sf0.001")
      .as[(Int, String, Long, Option[Double])].collect().toSeq
    assert(rows.map(_._1) === Seq(1, 2, 3))
    assert(rows.sliding(2).forall { case Seq(a, b) => a._3 >= b._3 })
    assert(rows.head._4 === Some(1.0))
  }

  test("q_retention_cohorts hand-computed matrix") {
    // fixture events: both users active on day 0 AND day 1 → one cohort
    // (day 0, size 2) fully retained at offset 1
    val out = BehaviorAnalytics.qRetentionCohorts.run(spark, fixtureDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 2L, 2L, 1.0)))
  }

  test("q_retention_cohorts: offset-0 cell equals the cohort size") {
    val rows = BehaviorAnalytics.qRetentionCohorts
      .run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.filter(_._2 == 0L).foreach { r => assert(r._3 === r._4, r) }
    rows.foreach { r => assert(r._3 <= r._4, r) }
  }

  test("q_outlier_events: fixture groups are tiny or degenerate → empty") {
    // click values 1,3,5 (max |z| ≈ 1.22), view 2,4 (|z| = 1), signup is a
    // single event (σ = 0, excluded by the guard)
    assert(BehaviorAnalytics.qOutlierEvents.run(spark, fixtureDir).count() === 0L)
  }

  test("q_outlier_events on sf0.001: flagged rows really exceed 3σ") {
    val rows = BehaviorAnalytics.qOutlierEvents
      .run(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r => assert(math.abs(r._4) > 3.0 - 1e-6, r) }
  }

  test("q_anomaly_mad fixture: no modified-z beyond 3.5, zero-MAD excluded") {
    // click {1,3,5}: med 3, MAD 2 → max |mz| = 0.6745; view {2,4}: ±0.67;
    // signup {6}: MAD 0 → excluded by the guard. Nothing flags.
    assert(BehaviorAnalytics.qAnomalyMad.run(spark, fixtureDir).count() === 0L)
  }

  test("q_anomaly_mad on sf0.001: flagged rows exceed the modified-z bound") {
    val rows = BehaviorAnalytics.qAnomalyMad
      .run(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r._4) > BehaviorAnalytics.MadThreshold - 1e-6, r)
    }
    // robustness: MAD flags at least the extreme z-outliers' magnitude
    // class without being masked by them (same corpus, both screens fire)
    val z = BehaviorAnalytics.qOutlierEvents
      .run(spark, "/root/testdata/sf0.001").count()
    assert(z > 0 && rows.length > 0)
  }

  test("q_interarrival hand-computed fixture gaps") {
    // fixture: one event per 6h bucket b=0..5, user = b % 2 → each user has
    // 3 events exactly 12h apart (gap = 2 × SixHoursUs)
    val rows = BehaviorAnalytics.qInterarrival.run(spark, fixtureDir)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    val twelveH = 2 * SparkSpec.SixHoursUs
    assert(rows === Seq(
      (0L, 3L, 2L, Some(twelveH), Some(twelveH), Some(twelveH)),
      (1L, 3L, 2L, Some(twelveH), Some(twelveH), Some(twelveH))))
  }

  test("q_interarrival on sf0.001: gaps positive, mean within min/max, counts consistent") {
    val rows = BehaviorAnalytics.qInterarrival.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, g, mn, mx, avg) =>
      assert(g === n - 1 || (n === 1L && g === 0L))
      if (g > 0) {
        assert(mn.get >= 0L && mn.get <= mx.get)
        assert(avg.get >= mn.get && avg.get <= mx.get)
      } else assert(mn.isEmpty && mx.isEmpty && avg.isEmpty)
    }
  }

  test("markov transitions: fixture journeys row-normalize per prev state") {
    // user 0: click->click->click (2 click->click pairs);
    // user 1: view->view->signup (view->view, view->signup)
    val rows = BehaviorAnalytics.qMarkovTransitions.run(spark, fixtureDir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(rows === Seq(
      ("click", "click", 2L, 1.0),
      ("view", "signup", 1L, 0.5),
      ("view", "view", 1L, 0.5)))
  }

  test("ab welch: fixture has no purchase arm -> empty readout, no crash") {
    assert(BehaviorAnalytics.qAbWelch.run(spark, fixtureDir).count() === 0L)
  }

  test("ab welch at sf0.001: independent plain-Scala replica of t and df") {
    def decSum(xs: Seq[Double]): Double = {
      val s = xs.map(BigDecimal.valueOf(_)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      (BigDecimal(math.floor((s * 1000000).toDouble + 0.5)) / 1000000).toDouble
    }
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_type", $"value").as[(String, Double)].collect()
    def arm(t: String) = {
      val xs = ev.filter(_._1 == t).map(_._2).toSeq
      val n = xs.size.toDouble
      val sx = decSum(xs); val sxx = decSum(xs.map(x => x * x))
      (n, qr(sx / n), qr((sxx - sx * sx / n) / (n - 1)))
    }
    val (n1, m1, v1) = arm("click"); val (n2, m2, v2) = arm("purchase")
    val (se1, se2) = (v1 / n1, v2 / n2)
    val expT = qr((m1 - m2) / math.sqrt(se1 + se2))
    val expDf = qr((se1 + se2) * (se1 + se2) /
      (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)))
    val rows = BehaviorAnalytics.qAbWelch.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Double, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(rows.size === 1)
    val r = rows.head
    assert((r._1.toDouble, r._2, r._3) === ((n1, m1, v1)))
    assert((r._4.toDouble, r._5, r._6) === ((n2, m2, v2)))
    assert(r._7 === expT)
    assert(r._8 === expDf)
  }

  test("anova f: hand-computed fixture readout (3 arms)") {
    // arms: click {1,3,5}, view {2,4}, signup {6} -> k=3, N=6
    // SSB = (27+18+36) - 21^2/6 = 7.5; SSW = 8+2+0 = 10
    // F = (7.5/2)/(10/3) = 1.125; eta^2 = 7.5/17.5 = 0.428571 (6dp)
    val rows = BehaviorAnalytics.qAnovaF.run(spark, fixtureDir)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().toSeq
    assert(rows === Seq((3L, 6L, 7.5, 10.0, Some(1.125), Some(0.428571))))
  }

  test("anova f at sf0.001: independent plain-Scala replica of F/eta2") {
    def decSum(xs: Seq[Double]): Double = {
      val s = xs.map(BigDecimal.valueOf(_)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      (BigDecimal(math.floor((s * 1000000).toDouble + 0.5)) / 1000000).toDouble
    }
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_type", $"value").as[(String, Double)].collect()
    val arms = ev.groupBy(_._1).values.map { g =>
      val xs = g.map(_._2).toSeq
      val n = xs.size; val sx = decSum(xs); val sxx = decSum(xs.map(x => x * x))
      (n, sx, sxx, qr(sx * sx / n), qr(sxx - sx * sx / n))
    }.toSeq
    val k = arms.size; val n = arms.map(_._1).sum
    val sxAll = decSum(arms.map(_._2))
    val s1 = decSum(arms.map(_._4)); val ssw = decSum(arms.map(_._5))
    val ssb = qr(s1 - sxAll * sxAll / n)
    val expF = qr((ssb / (k - 1)) / (ssw / (n - k)))
    val expEta = qr(ssb / (ssb + ssw))
    val rows = BehaviorAnalytics.qAnovaF.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().toSeq
    assert(rows === Seq(
      (k.toLong, n.toLong, ssb, ssw, Some(expF), Some(expEta))))
  }

  test("kaplan-meier: fixture has no purchase -> one all-censored row at " +
      "the observation horizon, empty curve") {
    // both fixture users never purchase: censored at 48h, d_t = 0
    // everywhere -> no conversion-time rows survive the d_t > 0 filter
    assert(BehaviorAnalytics.qKaplanMeier.run(spark, fixtureDir).count() === 0L)
  }

  test("kaplan-meier at sf0.001: independent plain-Scala replica") {
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val hourUs = 3600L * 1000000
    val obsH = BehaviorAnalytics.KmObsHours
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"ts_us", $"event_type")
      .as[(Long, Long, String)].collect()
    val durs = ev.groupBy(_._1).values.map { g =>
      val first = g.map(_._2).min
      val purch = g.filter(_._3 == "purchase").map(_._2)
      val latH = if (purch.isEmpty) None
        else Some(math.floor((purch.min - first).toDouble / hourUs).toLong)
      latH match {
        case Some(h) if h < obsH => (h, true)
        case _ => (obsH, false)
      }
    }.toSeq
    val byDur = durs.groupBy(_._1).map { case (d, g) =>
      (d, g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    // suffix at-risk counts, then the ln-space survival recursion
    val total = byDur.map(r => r._2 + r._3).sum
    var before = 0L
    var lnSum = BigDecimal(0)
    val expected = byDur.flatMap { case (d, dT, cT) =>
      val nRisk = total - before
      before += dT + cT
      if (dT > 0) {
        if (dT < nRisk)
          lnSum += BigDecimal.valueOf(
            qr(math.log((nRisk - dT).toDouble / nRisk.toDouble)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        val surv = if (dT == nRisk) 0.0 else qr(math.exp(lnSum.toDouble))
        Some((d, nRisk, dT, cT, surv))
      } else None
    }
    val rows = BehaviorAnalytics.qKaplanMeier
      .run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows === expected)
    assert(rows.nonEmpty)
    // the censoring design is non-vacuous on this corpus: some users are
    // administratively censored AND some convert inside the window
    assert(durs.exists(!_._2) && durs.exists(_._2))
    // the curve is a survival function: monotone non-increasing from <=1
    assert(rows.map(_._5).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true })
    assert(rows.head._5 <= 1.0 && rows.last._5 >= 0.0)
  }

  test("bootstrap ci: fixture interval brackets the point mean") {
    val rows = BehaviorAnalytics.qBootstrapCi.run(spark, fixtureDir)
      .as[(Long, Double, Long, Double, Double)].collect().toSeq
    assert(rows.size === 1)
    val (n, mean, b, lo, hi) = rows.head
    assert(n === 6L && mean === 3.5)
    assert(b === BehaviorAnalytics.BootReplicas.toLong)
    assert(lo <= mean && mean <= hi && lo < hi)
  }

  test("bootstrap ci at sf0.001 vs sf0.01: interval shrinks with n") {
    def run(sf: String) = BehaviorAnalytics.qBootstrapCi
      .run(spark, s"/root/testdata/sf$sf")
      .as[(Long, Double, Long, Double, Double)].collect().head
    val small = run("0.001"); val big = run("0.01")
    assert(small._4 <= small._2 && small._2 <= small._5)
    assert(big._4 <= big._2 && big._2 <= big._5)
    assert(big._5 - big._4 < small._5 - small._4)
  }

  test("ks/mwu: fixture has no purchase arm -> empty readout, no crash") {
    assert(BehaviorAnalytics.qKsTest.run(spark, fixtureDir).count() === 0L)
    assert(BehaviorAnalytics.qMwuTest.run(spark, fixtureDir).count() === 0L)
  }

  test("ks test at sf0.001: independent plain-Scala replica of D/lambda/p") {
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_type", $"value").as[(String, Double)].collect()
    val a = ev.filter(_._1 == "click").map(_._2).sorted
    val b = ev.filter(_._1 == "purchase").map(_._2).sorted
    val (n1, n2) = (a.length.toLong, b.length.toLong)
    // exact-integer ECDF difference at every distinct observed value
    val dnum = (a ++ b).distinct.map { v =>
      math.abs(a.count(_ <= v).toLong * n2 - b.count(_ <= v).toLong * n1)
    }.max
    val d = qr(dnum.toDouble / (n1 * n2).toDouble)
    val lam = qr(math.sqrt(n1.toDouble * n2.toDouble /
      (n1.toDouble + n2.toDouble)) * d)
    val p = qr(2.0 * math.exp(-2.0 * lam * lam))
    val r = BehaviorAnalytics.qKsTest.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(r === Seq((n1, n2, d, lam, p)))
  }

  test("mwu test at sf0.001: independent plain-Scala replica of U/sigma/z") {
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_type", $"value").as[(String, Double)].collect()
    val a = ev.filter(_._1 == "click").map(_._2)
    val b = ev.filter(_._1 == "purchase").map(_._2)
    val (n1, n2) = (a.length.toLong, b.length.toLong)
    val all = (a ++ b).sorted
    // average rank per distinct value, as the exact doubled integer
    val groups = all.groupBy(identity).map { case (v, g) =>
      val cb = all.count(_ < v).toLong
      (v, 2 * cb + g.length + 1) // = 2 * average 1-based rank
    }
    val r1x2 = a.map(v => groups(v)).sum
    val u1x2 = 2 * n1 * n2 + n1 * (n1 + 1) - r1x2
    val tieSum = all.groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * t * t - t }).sum
    val nn = (n1 + n2).toDouble
    val mu = n1.toDouble * n2.toDouble / 2.0
    val sigma = qr(math.sqrt(n1.toDouble * n2.toDouble / 12.0 *
      ((nn + 1.0) - tieSum.toDouble / (nn * (nn - 1.0)))))
    val z = qr((u1x2.toDouble / 2.0 - mu) / sigma)
    val r = BehaviorAnalytics.qMwuTest.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Long, Double, Double, Double)]
      .collect().toSeq
    assert(r === Seq((n1, n2, u1x2.toDouble / 2.0, tieSum, mu, sigma, z)))
  }

  test("assoc rules: planted baskets give exact support/confidence/lift") {
    // 10 (user, day-0) baskets: click in 1-6, purchase in 1-3 and 7,
    // view in 8-10. Only the click/purchase pair co-occurs (3 baskets):
    //   supp = 3/10, conf(click->purchase) = 3/6, conf(purchase->click)
    //   = 3/4, lift = 3*10/(6*4) = 1.25 both ways.
    val rows =
      (1 to 6).map(u => (u.toLong * 100 + 1, u.toLong, "click")) ++
      Seq(1L, 2L, 3L, 7L).map(u => (u * 100 + 2, u, "purchase")) ++
      Seq(8L, 9L, 10L).map(u => (u * 100 + 3, u, "view"))
    val dir = java.nio.file.Files.createTempDirectory("graft-assoc").toString
    rows.toDF("event_id", "user_id", "event_type")
      .withColumn("ts", timestamp_micros($"event_id" * 1000L))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet")
    val got = BehaviorAnalytics.qAssocRules.run(spark, dir)
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got === Seq(
      ("click", "purchase", 3L, 6L, 4L, 0.3, 0.5, 1.25),
      ("purchase", "click", 3L, 4L, 6L, 0.3, 0.75, 1.25)))
  }

  test("overdispersion: dispersion = var/mean and nb only when var > mean") {
    val rows = BehaviorAnalytics.qOverdispersion
      .run(spark, "/root/testdata/sf0.001")
      .select($"mean_count", $"var_count", $"dispersion", $"nb_size")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, v, d) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(m > 0 && v >= 0)
      assert(math.abs(d - v / m) < 1e-5) // 6-dp rounding slack
      if (v <= m) assert(r.isNullAt(3)) else assert(r.getDouble(3) > 0)
    }
  }

  test("ab power: detecting a smaller effect needs more samples") {
    val r = BehaviorAnalytics.qAbPower.run(spark, "/root/testdata/sf0.01")
      .select($"n1", $"delta", $"s2_pooled", $"n_per_arm_required",
        $"mde_at_current_n")
      .collect().head
    val (n1, delta, s2p, req, mde) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4))
    assert(s2p > 0 && mde > 0)
    // consistency: an experiment sized at n_required can detect ~|delta|
    // (mde shrinks like 1/sqrt(n)); at the current n the observed delta
    // is below the detectable threshold exactly when req > n1
    val zsum2 = { val z = 1.959964 + 0.841621; z * z }
    val mdeAtReq = math.sqrt(2.0 * s2p * zsum2 / req)
    assert(mdeAtReq <= math.abs(delta) * 1.01)
    assert((req > n1) === (mde > math.abs(delta)))
  }

  test("cuped: identity var_adjusted = var_y*(1 - reduction); honest null") {
    val r = BehaviorAnalytics.qCuped.run(spark, "/root/testdata/sf0.01")
      .as[(Long, Double, Double, Double, Double)].collect().head
    val (n, theta, vy, vadj, red) = r
    assert(n > 0 && vy > 0 && vadj > 0 && vadj <= vy)
    assert(math.abs(vadj - vy * (1 - red)) < 1e-3) // 6-dp rounding slack
    // the generator draws values i.i.d. across days: pre behavior must
    // predict ~nothing (the honest-null pattern, like AUC ~ 0.5)
    assert(math.abs(theta) < 0.2 && red < 0.05)
  }

  test("markov entropy: hand-computed fixture entropies") {
    // fixture transitions: click->click x2, view->view, view->signup (N=4)
    // H_cond = [2 ln(2/2) + ln(2/1) + ln(2/1)] / 4
    // H_marg over next counts {click:2, view:1, signup:1}
    //        = [2 ln(4/2) + ln(4/1) + ln(4/1)] / 4
    def dec9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def qr(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val hcs = (dec9(2.0 * math.log(2.0 / 2)) + dec9(1.0 * math.log(2.0 / 1)) +
      dec9(1.0 * math.log(2.0 / 1))).toDouble
    val hms = (dec9(2.0 * math.log(4.0 / 2)) + dec9(1.0 * math.log(4.0 / 1)) +
      dec9(1.0 * math.log(4.0 / 1))).toDouble
    val got = BehaviorAnalytics.qMarkovEntropy.run(spark, fixtureDir)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq((4L, qr(hcs / 4), qr(hms / 4), qr((hms - hcs) / 4))))
    // [2 ln2 + ln4 + ln4] / 4 = 3 ln2 · 4/4 /... = 1.039721 — all three
    // addends are 1.386294: 2·ln(4/2) = ln4
    assert(qr(hcs / 4) === 0.346574 && qr(hms / 4) === 1.039721)
  }

  test("bh fdr at sf0.001: independent plain-Scala replica of the step-up") {
    def decSum(xs: Seq[Double]): Double = {
      val s = xs.map(BigDecimal.valueOf(_)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      (BigDecimal(math.floor((s * 1000000).toDouble + 0.5)) / 1000000).toDouble
    }
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_type",
        org.apache.spark.sql.functions
          .expr("pmod(ts_us, 86400000000) div 3600000000").as("hour"),
        $"value")
      .as[(String, Long, Double)].collect().toSeq
    val cells = ev.groupBy(e => (e._1, e._2)).toSeq.map { case (k, rows) =>
      val xs = rows.map(_._3)
      (k, xs.size.toLong, decSum(xs), decSum(xs.map(x => x * x)))
    }
    val gn = cells.map(_._2).sum
    // glob re-aggregates the CELL sums through decimal addends (no round)
    val gx = cells.map(c => BigDecimal.valueOf(c._3)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val gMean = qr(gx / gn)
    val tested = cells.flatMap { case ((typ, hour), n, sx, sxx) =>
      val mean = qr(sx / n)
      if (n <= 1) None else {
        val variance = qr((sxx - sx * sx / n) / (n - 1))
        if (variance <= 0) None else {
          val z = qr((mean - gMean) / math.sqrt(variance / n))
          val x = math.abs(z) / math.sqrt(2.0)
          val t = 1.0 / (1.0 + 0.3275911 * x)
          val p = qr(t * (0.254829592 + t * (-0.284496736 + t *
            (1.421413741 + t * (-1.453152027 + t * 1.061405429)))) *
            math.exp(-(x * x)))
          Some((typ, hour, n, mean, z, p))
        }
      }
    }
    val ranked = tested.sortBy(r => (r._6, r._1, r._2)).zipWithIndex
      .map { case (r, i) => (r, (i + 1).toLong) }
    val m = ranked.size
    val withCrit = ranked.map { case (r, i) => (r, i, qr(i * 0.1 / m)) }
    val k = withCrit.collect { case (r, i, c) if r._6 <= c => i }
      .foldLeft(0L)(math.max)
    val expect = withCrit.map { case (r, i, c) =>
      (r._1, r._2, r._3, r._4, r._5, r._6, i, c,
        if (i <= k) 1L else 0L)
    }
    val got = BehaviorAnalytics.qBhFdr.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double, Double, Double, Long, Double, Long)]
      .collect().toSeq
    assert(got === expect)
    // structural BH invariants: dense 1..m ranking, ascending p, and the
    // rejected set is exactly a prefix of that ranking
    assert(got.map(_._7) === (1L to m.toLong))
    assert(got.map(_._6).sliding(2).forall {
      case Seq(a, b) => a <= b; case _ => true })
    assert(got.map(_._9).dropWhile(_ == 1L).forall(_ == 0L))
  }

  test("q_did: fixture is all-pre (epoch-0 days) -> empty readout") {
    assert(BehaviorAnalytics.qDid.run(spark, fixtureDir).count() === 0L)
  }

  test("q_did at sf0.001: plain-Scala replica, honest null") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .select($"user_id" % 2,
        expr(s"ts_us div ${BehaviorAnalytics.DayUs}") >=
          BehaviorAnalytics.CupedCutoffDay, $"value")
      .as[(Long, Boolean, Double)].collect().toSeq
    def d9(x: Double) = BigDecimal.valueOf(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(s: BigDecimal) =
      s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    case class M(n: Long, sx: Double, sxx: Double)
    val cells = ev.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      k -> M(es.size.toLong, r6(es.map(e => d9(e._3)).sum),
        r6(es.map(e => d9(e._3 * e._3)).sum))
    }
    val keys = Seq((1L, false), (1L, true), (0L, false), (0L, true))
    val (tp, tq, cp, cq) =
      (cells(keys(0)), cells(keys(1)), cells(keys(2)), cells(keys(3)))
    def m(x: M) = qr(x.sx / x.n)
    def se2(x: M) = (x.sxx - x.sx * x.sx / x.n) / (x.n - 1) / x.n
    val did = qr((m(tq) - m(tp)) - (m(cq) - m(cp)))
    val v0 = se2(tp) + se2(tq) + se2(cp) + se2(cq)
    val exp = (tp.n + tq.n + cp.n + cq.n, m(tp), m(tq), m(cp), m(cq),
      did, qr(math.sqrt(v0)), qr(did / math.sqrt(v0)))
    val got = BehaviorAnalytics.qDid.run(spark, sf)
      .as[(Long, Double, Double, Double, Double, Double, Double, Double)]
      .head()
    assert(got === exp)
    assert(math.abs(got._8) < 3.0) // honest null
  }

  test("q_msprt: fixture has no purchase arm -> empty readout") {
    assert(BehaviorAnalytics.qMsprt.run(spark, fixtureDir).count() === 0L)
  }

  test("q_msprt at sf0.001: Lambda consistent with Welch inputs; null p_av") {
    val sf = "/root/testdata/sf0.001"
    // replicate from the welch readout's own (n, m, v) row — the two
    // queries share armFinish, so this pins cross-readout consistency
    val (n1, m1, v1, n2, m2, v2, _, _) =
      BehaviorAnalytics.qAbWelch.run(spark, sf)
        .as[(Long, Double, Double, Long, Double, Double, Double, Double)]
        .head()
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val delta = qr(m1 - m2)
    val vv = v1 / n1 + v2 / n2
    val tau = BehaviorAnalytics.MsprtTauSq
    val lambda = qr(math.sqrt(vv / (vv + tau)) *
      math.exp(delta * delta * tau / (2.0 * vv * (vv + tau))))
    val exp = (n1, n2, delta, qr(vv), lambda,
      qr(math.min(1.0, 1.0 / lambda)))
    val got = BehaviorAnalytics.qMsprt.run(spark, sf)
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(got === exp)
    // honest null: identical arm distributions -> Lambda < 1, p capped at 1
    assert(got._5 < 1.0 && got._6 === 1.0)
  }

  test("q_auc_delong: fixture has no purchase arm -> empty readout") {
    assert(BehaviorAnalytics.qAucDelong.run(spark, fixtureDir).count() === 0L)
  }

  test("q_auc_delong at sf0.001: AUC == U/(n1*n2); null CI covers 0.5") {
    val sf = "/root/testdata/sf0.001"
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val (n1, n2, u, _, _, _, _) = BehaviorAnalytics.qMwuTest.run(spark, sf)
      .as[(Long, Long, Double, Long, Double, Double, Double)].head()
    val got = BehaviorAnalytics.qAucDelong.run(spark, sf)
      .as[(Long, Long, Double, Option[Double], Option[Double],
        Option[Double], Option[Double])].head()
    // cross-readout consistency: AUC = P(X1 > X2) + P(=)/2 is exactly the
    // COMPLEMENT orientation of q_mwu_test's U (U + U' = n1*n2)
    assert(got._1 === n1 && got._2 === n2)
    assert(got._3 === qr((n1.toDouble * n2.toDouble - u) /
      (n1.toDouble * n2.toDouble)))
    // honest split: the 95% CI covers 1/2
    assert(got._6.get <= 0.5 && 0.5 <= got._7.get)
  }

  test("q_logrank: fixture has no conversions -> empty readout") {
    assert(BehaviorAnalytics.qLogrank.run(spark, fixtureDir).count() === 0L)
  }

  test("q_logrank at sf0.001: plain-Scala replica, honest null") {
    val sf = "/root/testdata/sf0.001"
    val obs = BehaviorAnalytics.KmObsHours
    val hourUs = 3600L * 1000000L
    val pu = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.min($"ts_us").as("f"),
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.when(
            $"event_type" === "purchase", $"ts_us")).as("p"))
      .select($"user_id" % 2, $"f", $"p")
      .as[(Long, Long, Option[Long])].collect().toSeq
    val durs = pu.map { case (g, f, p) =>
      val lat = p.map(x => math.floor((x - f).toDouble / hourUs).toLong)
      val conv = lat.exists(_ < obs)
      (g, if (conv) lat.get else obs, conv)
    }
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def d9(x: Double) = BigDecimal.valueOf(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(s: BigDecimal) =
      s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val times = durs.filter(_._3).map(_._2).distinct.sorted
    val rows = times.map { t =>
      val n1r = durs.count(d => d._1 == 0 && d._2 >= t).toLong
      val n2r = durs.count(d => d._1 == 1 && d._2 >= t).toLong
      val d1 = durs.count(d => d._1 == 0 && d._3 && d._2 == t).toLong
      val d2 = durs.count(d => d._1 == 1 && d._3 && d._2 == t).toLong
      val (d, n) = (d1 + d2, n1r + n2r)
      (d1, qr(d.toDouble * n1r / n),
        qr(d.toDouble * (n1r.toDouble / n) * (n2r.toDouble / n) *
          ((n - d).toDouble / (n - 1))))
    }
    val o1 = rows.map(_._1).sum
    val e1 = r6(rows.map(r => d9(r._2)).sum)
    val vs = r6(rows.map(r => d9(r._3)).sum)
    val exp = (times.size.toLong, o1, e1, vs,
      Some(qr((o1 - e1) / math.sqrt(vs))),
      Some(qr((o1 - e1) * (o1 - e1) / vs)))
    val got = BehaviorAnalytics.qLogrank.run(spark, sf)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .head()
    assert(got === exp)
    assert(math.abs(got._5.get) < 3.0) // honest null
  }

  test("q_cox_hr: fixture has no conversions -> empty readout") {
    assert(BehaviorAnalytics.qCoxHr.run(spark, fixtureDir).count() === 0L)
  }

  test("q_cox_hr at sf0.001: plain-Scala Newton replica; honest-null HR ~ 1") {
    val sf = "/root/testdata/sf0.001"
    // rebuild the risk-set relation exactly as the engine does
    val obs = BehaviorAnalytics.KmObsHours
    val hourUs = 3600L * 1000000L
    val pu = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.min($"ts_us").as("f"),
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.when(
            $"event_type" === "purchase", $"ts_us")).as("p"))
      .select($"user_id" % 2, $"f", $"p")
      .as[(Long, Long, Option[Long])].collect().toSeq
    val durs = pu.map { case (g, f, p) =>
      val lat = p.map(x => math.floor((x - f).toDouble / hourUs).toLong)
      val conv = lat.exists(_ < obs)
      (g, if (conv) lat.get else obs, conv)
    }
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def d9(x: Double) = BigDecimal.valueOf(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(s: BigDecimal) =
      s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val times = durs.filter(_._3).map(_._2).distinct.sorted
    case class T(d1: Long, d: Long, n1r: Long, n2r: Long)
    val rows = times.map { t =>
      T(durs.count(x => x._1 == 0 && x._3 && x._2 == t).toLong,
        durs.count(x => x._3 && x._2 == t).toLong,
        durs.count(x => x._1 == 0 && x._2 >= t).toLong,
        durs.count(x => x._1 == 1 && x._2 >= t).toLong)
    }
    def ui(beta: Double): (Double, Double) = {
      val eb = math.exp(beta)
      (r6(rows.map(r => d9(qr(
        r.d1 - r.d * (r.n1r * eb) / (r.n1r * eb + r.n2r)))).sum),
        r6(rows.map(r => d9(qr(
          r.d * (r.n1r * eb) * r.n2r /
            ((r.n1r * eb + r.n2r) * (r.n1r * eb + r.n2r))))).sum))
    }
    var beta = 0.0
    for (_ <- 1 to BehaviorAnalytics.CoxIters) {
      val (u, i) = ui(beta); beta += u / i
    }
    val iFin = ui(beta)._2
    val o1 = rows.map(_.d1).sum
    val exp0 = (times.size.toLong, o1, qr(beta), qr(math.exp(beta)),
      Some(qr(1.0 / math.sqrt(iFin))), Some(qr(beta * math.sqrt(iFin))))
    val got = BehaviorAnalytics.qCoxHr.run(spark, sf)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .head()
    assert(got === exp0)
    // honest null: hazard ratio near 1, |z| small
    assert(got._4 > 0.5 && got._4 < 2.0 && math.abs(got._6.get) < 3.0)
    // effect direction agrees with the log-rank z
    val lrZ = BehaviorAnalytics.qLogrank.run(spark, sf)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .head()._5.get
    assert(lrZ.sign === got._6.get.sign)
  }

  test("q_emd_drift: fixture has no purchase arm -> empty readout") {
    assert(BehaviorAnalytics.qEmdDrift.run(spark, fixtureDir).count() === 0L)
  }

  test("q_emd_drift at sf0.001: plain-Scala replica; EMD <= range * KS D") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_type", $"value").as[(String, Double)].collect().toSeq
    val vals = ev.map(_._2).distinct.sorted
    val (a, b) = (ev.filter(_._1 == "click").map(_._2),
      ev.filter(_._1 == "purchase").map(_._2))
    val (n1, n2) = (a.size.toLong, b.size.toLong)
    def d12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val terms = vals.zip(vals.tail).map { case (v, nv) =>
      val (cum1, cum2) = (a.count(_ <= v).toLong, b.count(_ <= v).toLong)
      d12(math.abs(cum1 * n2 - cum2 * n1).toDouble /
        (n1.toDouble * n2.toDouble) * (nv - v))
    }
    val w1 = terms.sum.toDouble
    val exp = (n1, n2, qr(w1), Some(qr(w1 / (vals.last - vals.head))))
    val got = BehaviorAnalytics.qEmdDrift.run(spark, sf)
      .as[(Long, Long, Double, Option[Double])].head()
    assert(got === exp)
    // the integral is bounded by range x the KS max: W1 <= (vhi-vlo) * D
    val d = BehaviorAnalytics.qKsTest.run(spark, sf)
      .as[(Long, Long, Double, Double, Double)].head()._3
    assert(got._3 <= (vals.last - vals.head) * d + 1e-6)
  }

  test("q_strata_ate: fixture strata are all one-armed -> empty output") {
    // fixture users alternate with event_type, so every stratum has only
    // one arm and the common-support filter drops them all
    assert(BehaviorAnalytics.qStrataAte.run(spark, fixtureDir).count() === 0L)
  }

  test("q_strata_ate at sf0.001: plain-Scala replica, honest null") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"user_id" % 2, $"value")
      .as[(String, Long, Double)].collect().toSeq
    def d9(x: Double) = BigDecimal.valueOf(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(s: BigDecimal) =
      s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    case class M(n: Long, sx: Double, sxx: Double)
    val cells = ev.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      k -> M(es.size.toLong, r6(es.map(e => d9(e._3)).sum),
        r6(es.map(e => d9(e._3 * e._3)).sum))
    }
    val strata = cells.keys.map(_._1).toSeq.distinct
      .filter(s => cells.contains((s, 1L)) && cells.contains((s, 0L)))
    val (nt, nc) = (strata.map(s => cells((s, 1L)).n).sum,
      strata.map(s => cells((s, 0L)).n).sum)
    val nn = nt + nc
    val sxt = r6(strata.map(s => d9(cells((s, 1L)).sx)).sum)
    val sxc = r6(strata.map(s => d9(cells((s, 0L)).sx)).sum)
    def v(m: M) = (m.sxx - m.sx * m.sx / m.n) / (m.n - 1)
    val wds = strata.map { s =>
      val (m1, m0) = (cells((s, 1L)), cells((s, 0L)))
      val w = (m1.n + m0.n).toDouble / nn
      (qr(qr(m1.sx / m1.n - m0.sx / m0.n) * w),
        qr((v(m1) / m1.n + v(m0) / m0.n) * w * w))
    }
    val ate = r6(wds.map(x => d9(x._1)).sum)
    val varSum = r6(wds.map(x => d9(x._2)).sum)
    val exp = (strata.size.toLong, nn, nt, nc, qr(sxt / nt - sxc / nc),
      ate, qr(math.sqrt(varSum)), qr(ate / math.sqrt(varSum)))
    val got = BehaviorAnalytics.qStrataAte.run(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .head()
    assert(got === exp)
    // honest null: user_id%2 is independent of value by construction
    assert(math.abs(got._8) < 3.0)
  }

  test("powerReport degrades to nulls on single-row arms") {
    // one event per arm: variance is undefined (n−1 = 0), so the pooled
    // s2, required n and MDE must all come out null — not a division
    // error and not Infinity/NaN leaking out of the double lane
    val g0 = Seq(("click", 1L, 5.0, 25.0), ("purchase", 1L, 3.0, 9.0))
      .toDF("event_type", "n", "sx", "sxx")
    val row = BehaviorAnalytics.powerReport(g0).collect().head
    assert(row.getLong(0) === 1L && row.getLong(1) === 1L)
    assert(row.getAs[Double]("delta") === 2.0)
    assert(row.isNullAt(row.fieldIndex("s2_pooled")))
    assert(row.isNullAt(row.fieldIndex("n_per_arm_required")))
    assert(row.isNullAt(row.fieldIndex("mde_at_current_n")))
    // welchReport shares the guard: same fixture, null t/df readout
    val w = BehaviorAnalytics.welchReport(g0).collect().head
    assert(w.isNullAt(w.fieldIndex("v1")) && w.isNullAt(w.fieldIndex("v2")))
  }

  test("q_funnel_lag: hand-traced lags, interpolated percentiles") {
    // user 1: signup@0, click@100, purchase@400  -> d12 = 100, d23 = 300
    // user 2: signup@0, click@50                 -> d12 = 50
    // user 3: signup@0 only
    // l1 = {50, 100}: mean 75, p50 = 75, p90 = 95 (linear interpolation)
    // l2 = {300}: all stats 300
    val rows = Seq(
      (1L, 1L, "signup", 0L), (2L, 1L, "click", 100L),
      (3L, 1L, "purchase", 400L),
      (4L, 2L, "signup", 0L), (5L, 2L, "click", 50L),
      (6L, 3L, "signup", 0L))
    val dir = java.nio.file.Files.createTempDirectory("graft-flag").toString
    rows.toDF("event_id", "user_id", "event_type", "ts_us")
      .withColumn("ts", timestamp_micros($"ts_us"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
        $"props")
      .write.parquet(s"$dir/events.parquet")
    val got = BehaviorAnalytics.qFunnelLag.run(spark, dir)
      .as[(Int, String, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      (1, "signup->click", 2L, 75.0, 75.0, 95.0),
      (2, "click->purchase", 1L, 300.0, 300.0, 300.0)))
  }

  test("q_qte: empty without a control arm; monotone quantiles + internal consistency") {
    import spark.implicits._
    // the hand fixture has no 'purchase' events -> no control arm -> no rows
    assert(graft.operators.BehaviorAnalytics.qQte
      .run(spark, fixtureDir).collect().isEmpty)

    val rows = graft.operators.BehaviorAnalytics.qQte
      .run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double])]
      .collect().toSeq
    assert(rows.map(_._1) === (1 to 9).map(_ * 10L))
    // per-arm quantiles are nondecreasing in the percentile
    assert(rows.map(_._4).sliding(2).forall { case Seq(a, b) => b >= a })
    assert(rows.map(_._5).sliding(2).forall { case Seq(a, b) => b >= a })
    // arm sizes constant across deciles
    assert(rows.map(_._2).distinct.size === 1)
    assert(rows.map(_._3).distinct.size === 1)
    // qte consistent with the emitted per-arm quantiles (to the grid)
    assert(rows.forall(r => math.abs(r._6 - (r._4 - r._5)) <= 2e-6))
  }
}
