package graft

import graft.operators.EventAnalytics

/** Rollup hierarchy and exact percentiles on the fixture events
  * (types click/view/click/view/click/signup, values 1..6; buckets 0-3 fall
  * on day 0, buckets 4-5 on day 1). */
class RollupQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("rollup emits detail, subtotal, and grand-total levels") {
    val rows = EventAnalytics.qRollupActivity.run(spark, fixtureDir)
      .select($"event_type", $"day", $"g_type", $"g_day", $"n_events", $"sum_value")
      .as[(Option[String], Option[Long], Long, Long, Long, Double)]
      .collect().toSeq
    assert(rows.length === 8)   // 4 detail + 3 per-type subtotals + 1 grand
    val detail = rows.filter(r => r._3 == 0 && r._4 == 0)
      .map(r => (r._1.get, r._2.get) -> ((r._5, r._6))).toMap
    assert(detail === Map(
      ("click", 0L) -> ((2L, 4.0)), ("click", 1L) -> ((1L, 5.0)),
      ("view", 0L) -> ((2L, 6.0)), ("signup", 1L) -> ((1L, 6.0))))
    val subtotals = rows.filter(r => r._3 == 0 && r._4 == 1)
      .map(r => r._1.get -> ((r._5, r._6))).toMap
    assert(subtotals === Map(
      "click" -> ((3L, 9.0)), "view" -> ((2L, 6.0)), "signup" -> ((1L, 6.0))))
    val grand = rows.filter(r => r._3 == 1 && r._4 == 1)
    assert(grand.map(r => (r._5, r._6)) === Seq((6L, 21.0)))
  }

  test("approx_percentile twin: rank flags pass and sketch values track exact") {
    // the query now emits its ε-rank audit; on the fixture all flags pass
    val audit = EventAnalytics.qValueQuantilesApprox.run(spark, fixtureDir)
      .select($"event_type", $"n_events", $"p50_rank_ok", $"p90_rank_ok")
      .as[(String, Long, Long, Long)].collect().toSeq
    val exact = EventAnalytics.qValueQuantiles.run(spark, fixtureDir)
      .select($"event_type", $"p50", $"p90").as[(String, Double, Double)]
      .collect().map { case (t, a, b) => t -> ((a, b)) }.toMap
    assert(audit.map(_._1).toSet === exact.keySet)
    assert(audit.forall(r => r._3 == 1L && r._4 == 1L), audit.toString)
    // and the raw sketch VALUES still track the exact twin: GK at accuracy
    // 10000 returns an actual data value within rank error n/10000; on these
    // tiny groups that is an adjacent sorted value, so the gap is bounded by
    // the group's value spread (values 1..6).
    val approx = Tables.events(spark, fixtureDir)
      .groupBy($"event_type")
      .agg(
        org.apache.spark.sql.functions.expr("approx_percentile(value, 0.5, 10000)").as("a50"),
        org.apache.spark.sql.functions.expr("approx_percentile(value, 0.9, 10000)").as("a90"))
      .as[(String, Double, Double)]
      .collect().map { case (t, a, b) => t -> ((a, b)) }.toMap
    for ((t, (p50e, p90e)) <- exact) {
      val (p50a, p90a) = approx(t)
      assert(math.abs(p50a - p50e) <= 2.0, s"p50 for $t")
      assert(math.abs(p90a - p90e) <= 2.0, s"p90 for $t")
    }
  }

  test("percentiles interpolate linearly within each group") {
    val r = EventAnalytics.qValueQuantiles.run(spark, fixtureDir)
      .select($"event_type", $"p50", $"p90").as[(String, Double, Double)]
      .collect().map { case (t, a, b) => t -> ((a, b)) }.toMap
    assert(r("click") === ((3.0, 4.6)))   // [1,3,5]: p90 = 3 + 0.8*(5-3)
    assert(r("view") === ((3.0, 3.8)))    // [2,4]:  p90 = 2 + 0.9*2
    assert(r("signup") === ((6.0, 6.0)))
  }
}
