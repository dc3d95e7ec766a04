package graft

import graft.operators.TemporalJoins

/** AS-OF and range joins on the fixture events (one event per 6h bucket,
  * user 0 owns buckets 0/2/4, user 1 owns 1/3/5; types
  * click,view,click,view,click,signup; values 1..6). */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private val SixHUs = SparkSpec.SixHoursUs

  test("asof join: latest at-or-before right row per user, null when none") {
    // right side = views: event 1 (6h, user1, v=2) and event 3 (18h, user1, v=4)
    val r = TemporalJoins.asofJoin(Tables.events(spark, fixtureDir), "view")
      .select($"event_id", $"asof_ts_us", $"asof_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // user 0 never views: all unmatched
    assert(r(0L) === ((None, None)))
    assert(r(2L) === ((None, None)))
    assert(r(4L) === ((None, None)))
    // user 1: the 6h view matches itself; 18h view matches itself; the 30h
    // signup matches the latest preceding view at 18h
    assert(r(1L) === ((Some(1 * SixHUs), Some(2.0))))
    assert(r(3L) === ((Some(3 * SixHUs), Some(4.0))))
    assert(r(5L) === ((Some(3 * SixHUs), Some(4.0))))
  }

  test("range join: events land in their covering campaign half-interval") {
    // t0=0, t1=30h => delta=1.5h, campaign k = [k*1.5h, k*1.5h+0.75h);
    // events at 0,6h,...,24h hit campaigns 0,4,8,12,16; the 30h event is
    // past campaign 19's window
    val rows = TemporalJoins.qRangeJoin.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows === Seq(
      (0L, 1L, 1.0), (4L, 1L, 2.0), (8L, 1L, 3.0),
      (12L, 1L, 4.0), (16L, 1L, 5.0)))
  }

  test("asof query at sf0.001 matches every event and is total") {
    val n = Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(TemporalJoins.qAsofJoin.run(spark, "/root/testdata/sf0.001").count() === n)
  }

  test("interval join: daily sessions overlap campaigns exactly once each") {
    // sessions (user, day): u0d0 [0, 12h+1), u1d0 [6h, 18h+1),
    // u0d1 [24h, 24h+1), u1d1 [30h, 30h+1);
    // campaigns k = [1.5h*k, 1.5h*k + 0.75h), k = 0..19
    val H = 3600L * 1000000
    val rows = TemporalJoins.qIntervalJoin.run(spark, fixtureDir)
      .as[(Long, Long, Long)].collect().toSeq
    val expected =
      (0L to 3L).map(k => (k, 1L, (3 * H) / 4)) ++       // u0d0 fully covers
      (4L to 7L).map(k => (k, 2L, 2 * ((3 * H) / 4))) ++ // both day-0 sessions
      Seq((8L, 2L, (3 * H) / 4 + 1)) ++                  // u0d0 grazes 1us
      (9L to 11L).map(k => (k, 1L, (3 * H) / 4)) ++      // u1d0 only
      Seq((12L, 1L, 1L),                                 // u1d0 grazes 1us
          (16L, 1L, 1L))                                 // u0d1 point session
    assert(rows === expected)
  }
}
