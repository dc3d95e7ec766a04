package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamKm
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming Kaplan–Meier maintainer end-to-end: the retraction-delta
  * output, folded, must equal the batch (dur_hours, d_t, c_t) counters
  * EXACTLY, and the folded report must bit-match q_kaplan_meier — on
  * deliberately time-shuffled replay slices (min-state makes the twin
  * arrival-order-free; this spec exercises exactly that). */
class StreamKmSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("hand-built batches: retraction moves a user between buckets") {
    val in = MemoryStream[(Long, String, Long)](spark)
    val log = in.toDF().toDF("user_id", "event_type", "ts_us")
    val ckpt = Files.createTempDirectory("graft-km-ckpt").toString
    val q = StreamKm.deltas(log)
      .writeStream.format("memory").queryName("km_hand")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val hourUs = 3600L * 1000000
    // u1: view@h0 -> censored@48; purchase@h2 arrives later -> retract
    // censored, convert at dur 2; an even EARLIER first event (h-3... use
    // 0-based: view@h0 already first) u2: purchase@h1 first-ever event ->
    // dur 0 converted immediately; then view@h0 arrives LATE and
    // stretches the latency to 1h -> retract dur 0, add dur 1
    val batches = Seq(
      Seq((1L, "view", 0L), (2L, "purchase", 1L * hourUs)),
      Seq((1L, "purchase", 2L * hourUs)),
      Seq((2L, "view", 0L)))
    try {
      for (b <- batches) { in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val folded = StreamKm.fold(spark.table("km_hand"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // u1 converted at 2h, u2 converted at 1h; no censored mass remains
    assert(folded === Seq((1L, 1L, 0L), (2L, 1L, 0L)))
    // the raw delta log actually contains retractions (not just adds)
    assert(spark.table("km_hand").filter($"n" < 0).count() >= 2)
  }

  test("time-shuffled sf0.001 replay folds to the batch curve bit-for-bit") {
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"ts_us")
    val in = MemoryStream[(Long, String, Long)](spark)
    val log = in.toDF().toDF("user_id", "event_type", "ts_us")
    val ckpt = Files.createTempDirectory("graft-km-ckpt2").toString
    val q = StreamKm.deltas(log)
      .writeStream.format("memory").queryName("km_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    // slices by event hash — each slice spans the WHOLE time range, so
    // later batches constantly deliver events older than the state minima
    val slices = (0 until 3).map(s =>
      ev.filter(abs(hash($"user_id", $"ts_us")) % 3 === s)
        .as[(Long, String, Long)].collect().toSeq)
    try {
      for (b <- slices) { in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val folded = StreamKm.fold(spark.table("km_out"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val batch = BehaviorAnalytics.kmDurations(ev)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(folded === batch && batch.nonEmpty)

    val streamedReport = StreamKm.report(spark.table("km_out"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val batchReport = BehaviorAnalytics.qKaplanMeier.run(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(streamedReport === batchReport && batchReport.nonEmpty)
  }
}
