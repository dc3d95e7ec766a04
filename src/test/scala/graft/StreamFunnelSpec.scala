package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamFunnel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming funnel maintainer end-to-end: the O(1)-state per-user funnel
  * clock over replayed micro-batches must reproduce the batch query's
  * three-stage conversion counts exactly — including funnels whose stages
  * arrive in DIFFERENT batches, which is what the persisted (t1, t2, t3)
  * state exists for. */
class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed per-user funnel clock reproduces the batch funnel") {
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"ts_us", $"event_id")
      .as[(Long, String, Long, Long)].collect().toSeq
      .sortBy(r => (r._3, r._4)) // time-ordered replay (CDC contract)
    val slices = ev.grouped(math.max(1, (ev.size + 2) / 3)).toSeq
    assert(slices.size === 3)

    val in = MemoryStream[(Long, String, Long, Long)](spark)
    val stream = in.toDF().toDF("user_id", "event_type", "ts_us", "event_id")
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt").toString
    val q = StreamFunnel.stages(stream)
      .writeStream.format("memory").queryName("funnel_deltas")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      for (s <- slices) { in.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = StreamFunnel.report(spark.table("funnel_deltas"))
      .as[(Int, String, Long, Double)].collect().toSeq
    val batch = BehaviorAnalytics.qEventFunnel.run(spark, dir)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(streamed === batch) // bit-for-bit, conv_frac doubles included
    assert(batch.head._3 > 0L)

    // SECOND readout from the SAME delta log: the carried entry lags
    // reproduce q_funnel_lag bit-for-bit (percentile doubles included)
    def lagRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq)
    assert(lagRows(StreamFunnel.lagReport(spark.table("funnel_deltas")))
      === lagRows(BehaviorAnalytics.qFunnelLag.run(spark, dir)))
  }

  test("a funnel progresses across batches AND a restart; ties don't count") {
    val in = MemoryStream[(Long, String, Long, Long)](spark)
    val stream = in.toDF().toDF("user_id", "event_type", "ts_us", "event_id")
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt2").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Long, Option[Long])]()
    def start() = StreamFunnel.stages(stream)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamFunnel.FnDelta],
          _: Long) =>
        df.collect().foreach(d => emitted.add((d.stage, d.n, d.d_us)))
        ()
      }
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // batch 1: user 9 signs up at t=100; a click at the SAME ts must NOT
    // advance (the batch rule is strictly t2 > t1)
    val q1 = start()
    try {
      in.addData((9L, "signup", 100L, 1L), (9L, "click", 100L, 2L))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the checkpoint: the click at t=200 advances from
    // PERSISTED state, the purchase completes; a second signup does
    // nothing (t1 is one-shot)
    val q2 = start()
    try {
      in.addData((9L, "click", 200L, 3L), (9L, "signup", 250L, 4L),
        (9L, "purchase", 300L, 5L))
      q2.processAllAvailable()
    } finally q2.stop()

    import scala.jdk.CollectionConverters._
    // entry lags carried on the deltas: click at 200 − signup at 100,
    // purchase at 300 − click at 200 (the same-ts click never counted)
    assert(emitted.asScala.toSeq.sorted === Seq(
      (1, 1L, None), (2, 1L, Some(100L)), (3, 1L, Some(100L))))
    // sparse-stage densification: a log holding only stage-1 deltas still
    // reports all three spine rows (and an empty lag readout densifies)
    val partial = Seq((1, 1L, None: Option[Long])).toDF("stage", "n", "d_us")
    val rep = StreamFunnel.report(partial)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(rep.map(r => (r._1, r._3)) === Seq((1, 1L), (2, 0L), (3, 0L)))
    assert(rep.map(_._4) === Seq(1.0, 0.0, 0.0))
    val lag = StreamFunnel.lagReport(partial).collect().toSeq
    assert(lag.map(_.getAs[Long]("n_users")) === Seq(0L, 0L))
    assert(lag.forall(_.isNullAt(3)))
  }
}
