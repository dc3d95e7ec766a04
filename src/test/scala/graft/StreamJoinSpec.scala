package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Watermarked stream-stream attribution join end-to-end: inner matches
  * within the window, left-outer emits never-clicked impressions once the
  * watermark closes their window (multi-batch replay via maxFilesPerTrigger
  * so the watermark actually advances between micro-batches). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val impSchema = StructType(Seq(
    StructField("imp_id", LongType),
    StructField("user_id", LongType),
    StructField("imp_ts", TimestampType)))
  private val clickSchema = StructType(Seq(
    StructField("click_id", LongType),
    StructField("user_id", LongType),
    StructField("click_ts", TimestampType)))

  private def ts(minute: Long): String =
    f"2024-01-01T${minute / 60}%02d:${minute % 60}%02d:00.000Z"
  private def imp(id: Long, user: Long, minute: Long): String =
    s"""{"imp_id": $id, "user_id": $user, "imp_ts": "${ts(minute)}"}"""
  private def clk(id: Long, user: Long, minute: Long): String =
    s"""{"click_id": $id, "user_id": $user, "click_ts": "${ts(minute)}"}"""

  private def jsonStream(dir: String, schema: StructType, cols: Seq[String]): DataFrame =
    spark.readStream.format("text").option("maxFilesPerTrigger", "1").load(dir)
      .select(from_json($"value", schema).as("r"))
      .select(cols.map(c => $"r.$c"): _*)

  /** imp 1 (user 1, t=0) is clicked at t=5 (inside the 10-minute window);
    * imp 2 (user 2, t=0) is clicked only at t=25 (outside); flush rows at
    * t=120/121 on unmatched users push the watermark forward in later
    * micro-batches.
    *
    * The file source replays files OLDEST-MTIME-FIRST; same-millisecond
    * writes tie nondeterministically, and a flush file replayed before b0
    * would advance the watermark past the t=0 events — which would then be
    * dropped as late data (an empty join, seen as a real flake). Explicit
    * strictly-increasing mtimes pin the replay order. */
  private def writeFixture(impDir: String, clickDir: String): Unit = {
    def writeAt(dir: String, fname: String, lines: Seq[String], seq: Int): Unit = {
      val p = Paths.get(dir, fname)
      Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + seq * 60000L))
    }
    writeAt(impDir, "b0.txt", Seq(imp(1, 1, 0), imp(2, 2, 0)), 0)
    writeAt(clickDir, "b0.txt", Seq(clk(11, 1, 5), clk(12, 2, 25)), 0)
    for (i <- 1 to 2) {
      writeAt(impDir, s"b$i.txt", Seq(imp(900L + i, 98, 120 + i)), i)
      writeAt(clickDir, s"b$i.txt", Seq(clk(800L + i, 99, 120 + i)), i)
    }
  }

  private def run(joinType: String, name: String): DataFrame = {
    val impDir = Files.createTempDirectory("graft-ssj-imp").toString
    val clickDir = Files.createTempDirectory("graft-ssj-clk").toString
    writeFixture(impDir, clickDir)
    val joined = StreamJoin.attribution(
      jsonStream(impDir, impSchema, Seq("imp_id", "user_id", "imp_ts")),
      jsonStream(clickDir, clickSchema, Seq("click_id", "user_id", "click_ts")),
      window = "10 minutes", joinType = joinType)
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    // AvailableNow terminates after the planned batches commit; a false
    // return means timeout, not empty data — fail loudly in that case
    // (do NOT call processAllAvailable() here: it deadlocks against the
    // AvailableNow trigger's own termination path)
    assert(q.awaitTermination(180000), "stream-stream join query did not terminate")
    assert(q.exception.isEmpty, q.exception)
    spark.table(name)
  }

  test("inner stream-stream join matches only clicks inside the window") {
    val got = run("inner", "ssj_inner")
      .select($"imp_id", $"click_id").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 11L)))          // in-window attribution
    assert(!got.exists(_._1 == 2L))          // out-of-window click: no match
    assert(!got.exists(p => p._1 >= 900L && p._2 >= 800L)) // flush rows don't cross-match
  }

  test("left-outer emits never-clicked impressions after the watermark closes them") {
    val got = run("left_outer", "ssj_outer")
      .select($"imp_id", $"click_id").as[(Long, Option[Long])].collect().toSet
    assert(got.contains((1L, Some(11L))))
    // imp 2's window [0, 10min] is far behind the flushed watermark (~110min)
    assert(got.contains((2L, None)))
  }

  test("checkpoint restart: buffered impression state survives the kill and still matches") {
    // the stream-stream join buffers each side in the checkpoint's state
    // store until the watermark evicts it: deliver an impression, kill the
    // query BEFORE its click arrives, restart from the SAME checkpoint,
    // then deliver the click — the attribution must come from the RESTORED
    // impression state (a reset would silently lose the billable match)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def tstamp(minute: Long): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.parse(f"2024-01-01T00:$minute%02d:00Z"))
    val impIn = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val clkIn = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val ckpt = Files.createTempDirectory("graft-ssj-restart").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = StreamJoin.attribution(
        impIn.toDF().toDF("imp_id", "user_id", "imp_ts"),
        clkIn.toDF().toDF("click_id", "user_id", "click_ts"),
        window = "10 minutes", joinType = "inner")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("imp_id", "click_id").as[(Long, Long)]
          .collect().foreach(emitted.add); ()
      }
      .outputMode("append").option("checkpointLocation", ckpt).start()

    val q1 = start()
    try { impIn.addData((1L, 7L, tstamp(0)), (2L, 8L, tstamp(1))); q1.processAllAvailable() }
    finally q1.stop()   // kill with the impressions buffered, no clicks yet

    // in-window click for user 7 + an unmatched-user click, pending across
    // the restart
    clkIn.addData((11L, 7L, tstamp(5)), (12L, 99L, tstamp(6)))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSet === Set((1L, 11L)))
  }
}
