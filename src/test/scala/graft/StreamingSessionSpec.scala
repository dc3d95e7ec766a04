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
