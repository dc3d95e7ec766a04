package graft

import graft.operators.EventAnalytics
import graft.streaming.Sessionize

/** Event-time windows + batch sessionization on the fixture events (one
  * event per 6h bucket, values 1..6, users alternating 0/1). */
class WindowSessionSpec extends SparkSpec {
  import spark.implicits._

  private val SixHUs = SparkSpec.SixHoursUs

  test("tumbling 1h window: each fixture event in its own aligned window") {
    val rows = EventAnalytics.qTumblingWindow.run(spark, fixtureDir)
      .select($"win_start_us", $"event_type", $"n_events", $"sum_value")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(rows.length === 6)
    assert(rows.map(_._1) === (0 to 5).map(_ * SixHUs))
    assert(rows.forall(_._3 == 1L))
    assert(rows.map(_._4) === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("sliding 1h/30m window: every event lands in exactly two windows") {
    val rows = EventAnalytics.qSlidingWindow.run(spark, fixtureDir)
      .select($"win_start_us", $"n_events").as[(Long, Long)].collect().toSeq
    assert(rows.length === 12)
    val expected = (0 to 5).flatMap(b =>
      Seq(b * SixHUs - 1800000000L, b * SixHUs.toLong)).sorted
    assert(rows.map(_._1) === expected)
    assert(rows.forall(_._2 == 1L))
  }

  test("batch sessionize: 6h gaps split every fixture event into its own session") {
    val rows = EventAnalytics.qSessionize.run(spark, fixtureDir)
      .select($"user_id", $"sess_seq", $"n_events", $"duration_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // user 0 has events in buckets 0,2,4; user 1 in 1,3,5 — all 6h apart
    assert(rows === Seq(
      (0L, 1L, 1L, 0L), (0L, 2L, 1L, 0L), (0L, 3L, 1L, 0L),
      (1L, 1L, 1L, 0L), (1L, 2L, 1L, 0L), (1L, 3L, 1L, 0L)))
  }

  test("sessionize update fn: gap splits; sessions emit only once watermark-final") {
    // pure-function check of the streaming state transition (no Spark)
    val evs = Seq(
      Sessionize.Ev(7L, 0L, 0L),
      Sessionize.Ev(7L, 10L * 60 * 1000000, 1L),
      Sessionize.Ev(7L, 2L * 3600 * 1000000, 2L))
    // watermark 0: NOTHING is final yet — both the gap-closed [0, 10min]
    // and the open [2h] session stay pending (early emission was the
    // round-11 review bug: a late in-watermark event could still extend
    // the emitted session, splitting one batch session into two)
    val state = new FakeGroupState[Seq[Sessionize.SessionState]]
    val out = Sessionize.update(EventAnalytics.SessionGapUs)(7L, evs.iterator, state).toSeq
    assert(out === Seq.empty)
    assert(state.value.contains(Seq(
      Sessionize.SessionState(0L, 600000000L, 2L),
      Sessionize.SessionState(7200000000L, 7200000000L, 1L))))
    // timer armed at the EARLIEST pending flush: 10min + gap, in ceil-ms
    assert(state.timeoutTs === (600000000L + EventAnalytics.SessionGapUs + 999) / 1000)
    // watermark past BOTH ends + gap, timer fires: the followed session
    // closes as "gap", the trailing one as "timeout"
    val state2 = new FakeGroupState[Seq[Sessionize.SessionState]]
    state2.value = state.value
    state2.timedOut = true
    state2.watermarkMs = 4L * 3600 * 1000
    val out2 = Sessionize.update(EventAnalytics.SessionGapUs)(7L, Iterator.empty, state2).toSeq
    assert(out2 === Seq(
      Sessionize.Session(7L, 0L, 600000000L, 2L, "gap"),
      Sessionize.Session(7L, 7200000000L, 7200000000L, 1L, "timeout")))
    assert(state2.value.isEmpty)
  }

  test("sessionize update fn: in-watermark reorder across batches keeps batch parity") {
    val gapUs = 10L * 1000000
    def s(start: Long, last: Long, n: Long) =
      Sessionize.SessionState(start * 1000000, last * 1000000, n)
    def ev(tsSec: Long, id: Long) = Sessionize.Ev(1L, tsSec * 1000000, id)
    def run(state: Seq[Sessionize.SessionState], wmSec: Long,
        evs: Sessionize.Ev*) = {
      val gs = new FakeGroupState[Seq[Sessionize.SessionState]]
      if (state.nonEmpty) gs.value = Some(state)
      gs.watermarkMs = wmSec * 1000
      (Sessionize.update(gapUs)(1L, evs.iterator, gs).toSeq,
        gs.value.getOrElse(Seq.empty))
    }
    // late-but-in-watermark event EXTENDS the open session backwards
    assert(run(Seq(s(100, 100, 1)), 0, ev(95, 2)) === ((Seq(), Seq(s(95, 100, 2)))))
    // ...and a later event continues the MERGED session (the old
    // last := ts update emitted an inverted 100..95 session here)
    assert(run(Seq(s(95, 100, 2)), 0, ev(106, 3)) === ((Seq(), Seq(s(95, 106, 3)))))
    // an event older than start - gap forms its own earlier session,
    // PENDING until the watermark passes its end + gap (the review fix:
    // emitting it immediately would freeze it against later in-watermark
    // neighbors the batch query would merge)
    assert(run(Seq(s(100, 100, 1)), 0, ev(80, 4)) ===
      ((Seq(), Seq(s(80, 80, 1), s(100, 100, 1)))))
    // ...a later event inside ITS gap still merges into the pending one
    assert(run(Seq(s(80, 80, 1), s(100, 100, 1)), 0, ev(85, 8)) ===
      ((Seq(), Seq(s(80, 85, 2), s(100, 100, 1)))))
    // ...and once the watermark passes end + gap it emits as "gap"
    assert(run(Seq(s(80, 80, 1), s(100, 100, 1)), 95) ===
      ((Seq(Sessionize.Session(1L, 80000000L, 80000000L, 1, "gap")),
        Seq(s(100, 100, 1)))))
    // an event INSIDE the open span counts without moving the bounds
    assert(run(Seq(s(90, 100, 2)), 0, ev(95, 5)) === ((Seq(), Seq(s(90, 100, 3)))))
    // two late events merge into ONE earlier pending session, batch-style
    assert(run(Seq(s(100, 100, 1)), 0, ev(80, 6), ev(82, 7)) ===
      ((Seq(), Seq(s(80, 82, 2), s(100, 100, 1)))))
  }
}

/** Minimal GroupState stub for unit-testing state-transition functions. */
class FakeGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var value: Option[S] = None
  var timedOut: Boolean = false
  var timeoutTs: Long = -1
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(newState: S): Unit = value = Some(newState)
  override def remove(): Unit = value = None
  override def hasTimedOut: Boolean = timedOut
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = timeoutTs = timestampMs
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  var watermarkMs: Long = 0L
  override def getCurrentWatermarkMs(): Long = watermarkMs
  override def getCurrentProcessingTimeMs(): Long = 0L
}
