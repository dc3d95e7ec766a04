package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Streaming stateful operators end-to-end: gap-sessionization via
  * flatMapGroupsWithState and a watermarked event-time window aggregate,
  * both over a JSON file source replayed with Trigger.AvailableNow. */
class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  private val eventSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_id", LongType),
    StructField("ts", TimestampType)))

  private def ev(user: Long, id: Long, minute: Long): String =
    s"""{"user_id": $user, "event_id": $id, "ts": "2024-01-01T${"%02d".format(minute / 60)}:${"%02d".format(minute % 60)}:00.000Z"}"""

  private def eventStream(srcDir: String) =
    spark.readStream.format("text")
      .option("maxFilesPerTrigger", "1")
      .load(srcDir)
      .select(from_json($"value", eventSchema).as("e"))
      .select($"e.user_id", $"e.event_id", $"e.ts")

  test("flatMapGroupsWithState sessionization emits watermark-final sessions, keeps the open one in state") {
    val srcDir = Files.createTempDirectory("graft-sess-src").toString
    // user 1: events at 0,10,20 min (one session), then 120 min (gap => close)
    // user 2: single event at 0 min (stays open in state)
    Files.write(Paths.get(srcDir, "b0.txt"), Seq(
      ev(1, 1, 0), ev(1, 2, 10), ev(1, 3, 20), ev(1, 4, 120), ev(2, 5, 0))
      .mkString("\n").getBytes("UTF-8"))

    val out = Sessionize.sessions(
      eventStream(srcDir), gapUs = 30L * 60 * 1000000)
    val q = out.writeStream
      .format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val base = 1704067200000000L  // 2024-01-01T00:00:00Z in epoch micros
    val got = spark.table("sessions")
      .as[Sessionize.Session].collect().toSet
    // the followed session emits as "gap" once the watermark passes its
    // end + gap (the engine runs a timer batch after the data batch);
    // user 2's trailing session flushes by timer with no successor
    assert(got.contains(Sessionize.Session(1L, base, base + 20L * 60 * 1000000, 3L, "gap")))
    assert(got.contains(Sessionize.Session(2L, base, base, 1L, "timeout")))
    // user 1's open [120min] session (flush at 150min > watermark 110min)
    // stays in state — never emitted in this run
    assert(!got.exists(s => s.user_id == 1L && s.n_events == 1L))
  }

  test("checkpoint restart: an open session's state survives the kill and closes correctly") {
    // the flatMapGroupsWithState session state lives in the checkpoint's
    // state store: open a session, kill the query, restart from the SAME
    // checkpoint, extend the session, then advance the watermark past its
    // flush point — the emitted session must START at the pre-kill first
    // event (proving the restored state merged with the post-restart
    // event; a reset would emit a 1-event session starting at min 20).
    // The emitted row equals the batch q_sessionize twin's session for the
    // same concatenated event log.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def tstamp(minute: Long): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.parse(
        f"2024-01-01T${minute / 60}%02d:${minute % 60}%02d:00Z"))
    val in = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val ckpt = Files.createTempDirectory("graft-sess-restart").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Sessionize.Session]()
    def start() = Sessionize.sessions(
        in.toDF().toDF("user_id", "event_id", "ts"), gapUs = 30L * 60 * 1000000)
      .writeStream
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Sessionize.Session],
          _: Long) =>
        ds.collect().foreach(emitted.add); ()
      }
      .outputMode("append").option("checkpointLocation", ckpt).start()

    val q1 = start()
    try { in.addData((1L, 1L, tstamp(0)), (1L, 2L, tstamp(10))); q1.processAllAvailable() }
    finally q1.stop()   // kill with user 1's session open in state

    val q2 = start()
    try {
      // extend the restored session; the far event pushes the watermark to
      // ~110 min, past the session's flush point (end 20 + gap 30 = 50 min)
      in.addData((1L, 3L, tstamp(20)), (99L, 4L, tstamp(120)))
      q2.processAllAvailable()
      // one more batch so the armed event-time timer actually fires
      in.addData((99L, 5L, tstamp(121)))
      q2.processAllAvailable()
    } finally q2.stop()

    import scala.jdk.CollectionConverters._
    val base = 1704067200000000L  // 2024-01-01T00:00:00Z in epoch micros
    val got = emitted.asScala.toSet
    assert(got.contains(Sessionize.Session(
      1L, base, base + 20L * 60 * 1000000, 3L, "timeout")),
      s"expected the restored-and-extended 3-event session, got $got")
    // user 99's trailing session stays open in state — never emitted here
    assert(!got.exists(_.user_id == 99L))
  }

  test("watermarked tumbling-window streaming aggregate (complete mode)") {
    val srcDir = Files.createTempDirectory("graft-win-src").toString
    Files.write(Paths.get(srcDir, "b0.txt"), Seq(
      ev(1, 1, 5), ev(1, 2, 20), ev(2, 3, 61), ev(2, 4, 62), ev(1, 5, 130))
      .mkString("\n").getBytes("UTF-8"))

    val counts = eventStream(srcDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"window.start").as("start_us"), $"n")
    val q = counts.writeStream
      .format("memory").queryName("wincounts")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val base = 1704067200000000L
    val hourUs = 3600000000L
    val got = spark.table("wincounts").as[(Long, Long)].collect().toMap
    assert(got === Map(base -> 2L, (base + hourUs) -> 2L, (base + 2 * hourUs) -> 1L))
  }
}
