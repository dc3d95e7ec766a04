package graft

import graft.streaming.StreamSmooth
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** transformWithState end-to-end: the per-key ValueState EWMA must apply
  * rows in event order within a batch AND resume from persisted state in
  * the next micro-batch (the whole point of the arbitrary-state API). */
class StreamSmoothSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState EWMA carries per-key state across micro-batches") {
    val in = MemoryStream[(String, Long, Long, Double)](spark)
    val events = in.toDF().toDF("event_type", "ts_us", "event_id", "value")
      .select($"event_type", timestamp_micros($"ts_us").as("ts"),
        $"event_id", $"value")
    val ckpt = Files.createTempDirectory("graft-smooth-ckpt").toString
    val q = StreamSmooth.smoothed(events)
      .writeStream.format("memory").queryName("smooth_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // batch 1 — deliberately out of event order within the batch
      in.addData(("click", 2L, 2L, 3.0), ("click", 1L, 1L, 1.0),
        ("view", 3L, 3L, 2.0))
      q.processAllAvailable()
      // batch 2 — state from batch 1 must carry over
      in.addData(("click", 4L, 4L, 5.0), ("view", 5L, 5L, 4.0))
      q.processAllAvailable()
      val got = spark.table("smooth_out")
        .as[StreamSmooth.SmoothOut].collect().toSeq
        .sortBy(r => (r.event_type, r.ts_us))
        .map(r => (r.event_type, r.ts_us, r.ewma))
      assert(got === Seq(
        ("click", 1L, 1.0),   // first observation seeds the state
        ("click", 2L, 2.0),   // (3 + 1) / 2 — applied in ts order
        ("click", 4L, 3.5),   // (5 + 2) / 2 — state crossed the batch
        ("view", 3L, 2.0),
        ("view", 5L, 3.0)))   // (4 + 2) / 2
    } finally q.stop()
  }
}
