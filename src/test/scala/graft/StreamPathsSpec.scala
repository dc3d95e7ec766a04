package graft

import graft.operators.EventAnalytics
import graft.streaming.StreamPaths
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.timestamp_micros
import java.nio.file.Files

/** Streaming session-path maintainer end-to-end: the O(1)-state trigram
  * detector (last two session events + gap clock per user) over replayed
  * micro-batches must reproduce the batch query's session-windowed
  * trigram profile exactly — including sessions that SPAN batch
  * boundaries, which is what the persisted per-user state exists for. */
class StreamPathsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed per-user session state reproduces the batch path profile") {
    // planted corpus: 4 users x 3 sessions x 4-6 one-minute-spaced events
    // (the real sf0.001 log holds only TWO session trigrams — far too few
    // to exercise bridging); interleaved session starts guarantee the
    // count-based slicing cuts sessions mid-flight
    val minUs = 60L * 1000000
    val fixDir = Files.createTempDirectory("graft-paths-fix").toString
    val types = Seq("view", "click", "cart")
    val rows = for {
      u <- 1L to 4L; s <- 0L to 2L
      start = u * 7 * minUs + s * 120 * minUs
      k <- 0L until (4L + (u + s) % 3)
    } yield (u * 100 + s * 10 + k, start + k * minUs, u,
      types(((u + s + k) % 3).toInt), 1.0, """{"k":1}""")
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ts_us"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
        $"props")
      .write.parquet(s"$fixDir/events.parquet")

    val ev = Tables.events(spark, fixDir)
      .select($"user_id", $"event_type", $"ts_us", $"event_id")
      .as[(Long, String, Long, Long)].collect().toSeq
      .sortBy(r => (r._3, r._4)) // time-ordered replay (CDC contract)
    val slices = ev.grouped(math.max(1, (ev.size + 2) / 3)).toSeq
    assert(slices.size === 3)
    // the state is genuinely exercised: at some slice boundary a user's
    // consecutive in-gap events land in different slices
    val gap = EventAnalytics.SessionGapUs
    val bridges = slices.sliding(2).exists { case Seq(a, b) =>
      a.groupBy(_._1).exists { case (u, evsA) =>
        b.filter(_._1 == u).take(1).exists(nb =>
          nb._3 - evsA.map(_._3).max <= gap)
      }
    }
    assert(bridges, "no session straddles a batch boundary")

    val in = MemoryStream[(Long, String, Long, Long)](spark)
    val stream = in.toDF().toDF("user_id", "event_type", "ts_us", "event_id")
    val ckpt = Files.createTempDirectory("graft-paths-ckpt").toString
    val q = StreamPaths.trigrams(stream)
      .writeStream.format("memory").queryName("paths_deltas")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      for (s <- slices) { in.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = StreamPaths.report(spark.table("paths_deltas"))
      .as[(String, String, String, Long, Double)].collect().toSeq
    val batch = EventAnalytics.qSessionPaths.run(spark, fixDir)
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(streamed === batch) // bit-for-bit, support doubles included
    assert(batch.nonEmpty)

    // the tiny real log agrees too (2 trigrams at sf0.001 — parity only)
    val realCounts = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"ts_us", $"event_id")
      .as[(Long, String, Long, Long)].collect().toSeq
      .sortBy(r => (r._3, r._4))
    val in2 = MemoryStream[(Long, String, Long, Long)](spark)
    val ckpt2 = Files.createTempDirectory("graft-paths-ckpt-real").toString
    val q2 = StreamPaths.trigrams(
        in2.toDF().toDF("user_id", "event_type", "ts_us", "event_id"))
      .writeStream.format("memory").queryName("paths_deltas_real")
      .outputMode("append").option("checkpointLocation", ckpt2).start()
    try {
      for (s <- realCounts.grouped(
          math.max(1, (realCounts.size + 2) / 3)).toSeq) {
        in2.addData(s: _*); q2.processAllAvailable()
      }
    } finally q2.stop()
    val streamedReal = StreamPaths.report(spark.table("paths_deltas_real"))
      .as[(String, String, String, Long, Double)].collect().toSeq
    val batchReal = EventAnalytics.qSessionPaths.run(spark, dir)
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(streamedReal === batchReal)
  }

  test("a session bridges batches AND a restart; gap resets the chain") {
    val gap = EventAnalytics.SessionGapUs
    val in = MemoryStream[(Long, String, Long, Long)](spark)
    val stream = in.toDF().toDF("user_id", "event_type", "ts_us", "event_id")
    val ckpt = Files.createTempDirectory("graft-paths-ckpt2").toString
    // foreachBatch sink (supports checkpoint recovery, unlike memory)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, String, String, Long)]()
    def start() = StreamPaths.trigrams(stream)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamPaths.PsDelta],
          _: Long) =>
        df.collect().foreach(d =>
          emitted.add((d.step1, d.step2, d.step3, d.n)))
        ()
      }
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // batch 1: two in-gap events — one trigram short of emitting
    val q1 = start()
    try {
      in.addData((7L, "a", 0L, 1L), (7L, "b", gap, 2L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(emitted.isEmpty)

    // restart from the checkpoint: the third in-gap event completes the
    // trigram from PERSISTED state; the next event sits past the gap and
    // must RESET the chain (no (b, c, d) trigram), then two more in-gap
    // events complete a fresh one
    val q2 = start()
    try {
      in.addData((7L, "c", 2 * gap, 3L),
        (7L, "d", 3 * gap + 1L, 4L),
        (7L, "e", 4 * gap, 5L), (7L, "f", 5 * gap, 6L))
      q2.processAllAvailable()
    } finally q2.stop()

    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSet ===
      Set(("a", "b", "c", 1L), ("d", "e", "f", 1L)))
  }
}
