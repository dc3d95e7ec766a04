package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamRetention
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming cohort-retention maintainer end-to-end: the O(1)-state
  * per-user cohort clock over replayed micro-batches must reproduce the
  * batch (user, day)-distinct cohort table exactly — including return
  * visits that land in LATER batches, which is what the persisted
  * (cohort_day, last_day) state exists for. */
class StreamRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed per-user cohort clock reproduces the batch cohort table") {
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"ts_us", $"event_id")
      .as[(Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._2, r._3)) // time-ordered replay (CDC contract)
    val slices = ev.grouped(math.max(1, (ev.size + 2) / 3)).toSeq
    assert(slices.size === 3)

    val in = MemoryStream[(Long, Long, Long)](spark)
    val stream = in.toDF().toDF("user_id", "ts_us", "event_id")
    val ckpt = Files.createTempDirectory("graft-ret-ckpt").toString
    val q = StreamRetention.activity(stream)
      .writeStream.format("memory").queryName("ret_deltas")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      for (s <- slices) { in.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()

    val deltas = spark.table("ret_deltas")
    // cross-batch return visits exist (otherwise the state is untested):
    // some (cohort_day, day_offset) cell accumulates across >= 2 batches
    assert(deltas.groupBy("cohort_day", "day_offset").count()
      .filter($"count" > 1).count() > 0)

    val streamed = StreamRetention.report(deltas)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val batch = BehaviorAnalytics.qRetentionCohorts.run(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(streamed === batch) // bit-for-bit, retention doubles included
    assert(batch.nonEmpty)
  }

  test("a return visit bridges a restart; same-day repeats never re-count") {
    val day = BehaviorAnalytics.DayUs
    val in = MemoryStream[(Long, Long, Long)](spark)
    val stream = in.toDF().toDF("user_id", "ts_us", "event_id")
    val ckpt = Files.createTempDirectory("graft-ret-ckpt2").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long)]()
    def start() = StreamRetention.activity(stream)
      .writeStream
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamRetention.RtDelta],
            _: Long) =>
          df.collect().foreach(d =>
            emitted.add((d.cohort_day, d.day_offset, d.n)))
          ()
      }
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // batch 1: user first seen on day 5, twice the same day (one delta)
    val q1 = start()
    try {
      in.addData((3L, 5 * day + 100, 1L), (3L, 5 * day + 200, 2L))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart: a day-7 return counts offset 2 from PERSISTED cohort
    // state; another day-7 event is a same-day repeat and emits nothing
    val q2 = start()
    try {
      in.addData((3L, 7 * day + 50, 3L), (3L, 7 * day + 60, 4L))
      q2.processAllAvailable()
    } finally q2.stop()

    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSeq.sorted === Seq((5L, 0L, 1L), (5L, 2L, 1L)))
    // the folded readout: cohort of size 1 with day-0 and day-2 rows
    val rep = StreamRetention.report(
        Seq((5L, 0L, 1L), (5L, 2L, 1L)).toDF("cohort_day", "day_offset", "n"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(rep === Seq((5L, 0L, 1L, 1L, 1.0), (5L, 2L, 1L, 1L, 1.0)))
  }
}
