package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamLogrank
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming log-rank maintainer: time-shuffled replay of per-arm
  * survival deltas must fold to the batch per-arm counters and reproduce
  * the batch Mantel readout bit-for-bit, surviving a checkpoint restart
  * mid-replay (per-user minima resume from persisted state). */
class StreamLogrankSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("time-shuffled replay with a restart folds to the batch log-rank") {
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"ts_us")
    val in = MemoryStream[(Long, String, Long)](spark)
    val log = in.toDF().toDF("user_id", "event_type", "ts_us")
    val ckpt = Files.createTempDirectory("graft-lr-ckpt").toString
    // foreachBatch sink (supports checkpoint recovery, unlike memory)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Boolean, Long)]()
    def start() = StreamLogrank.deltas(log)
      .writeStream
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[StreamLogrank.LrDelta], _: Long) =>
          df.collect().foreach(d =>
            emitted.add((d.g, d.dur_hours, d.converted, d.n)))
          ()
      }
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // slices by event hash — each slice spans the whole time range, so
    // later batches deliver events older than the state minima
    val slices = (0 until 3).map(s =>
      ev.filter(abs(hash($"user_id", $"ts_us")) % 3 === s)
        .as[(Long, String, Long)].collect().toSeq)
    val q1 = start()
    try {
      for (b <- slices.take(2)) { in.addData(b: _*); q1.processAllAvailable() }
    } finally q1.stop()

    // restart from the checkpoint: retractions for slice 3 must be issued
    // against the PERSISTED minima, not reset state
    val q2 = start()
    try { in.addData(slices(2): _*); q2.processAllAvailable() }
    finally q2.stop()

    import scala.jdk.CollectionConverters._
    val allDeltas = emitted.asScala.toSeq
      .toDF("g", "dur_hours", "converted", "n")
    val folded = StreamLogrank.fold(allDeltas)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val batch = BehaviorAnalytics.kmArmDurations(ev)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(folded === batch && batch.nonEmpty)
    // the replay genuinely exercised the retraction path
    assert(allDeltas.filter($"n" < 0).count() > 0)

    val streamed = StreamLogrank.report(allDeltas)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().toSeq
    val batchReport = BehaviorAnalytics.qLogrank.run(spark, dir)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().toSeq
    assert(streamed === batchReport && batchReport.nonEmpty)

    // second readout from the SAME log: the live Cox hazard ratio
    val coxS = StreamLogrank.coxReport(allDeltas)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().toSeq
    val coxB = BehaviorAnalytics.qCoxHr.run(spark, dir)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().toSeq
    assert(coxS === coxB && coxB.nonEmpty)
  }
}
