package graft

import graft.operators.Governance
import graft.streaming.StreamScd2
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming SCD2 end-to-end: the transformWithState maintainer's CDC
  * output, upsert-reconciled, must match the batch q_scd2_history build
  * ROW-FOR-ROW on the same change log replayed in micro-batches — no-op
  * collapse, within-batch reordering, cross-batch version closes, and
  * still-open is_current versions included. */
class StreamScd2Spec extends SparkSpec {
  import spark.implicits._

  // (user_id, event_type, ts_us, event_id) per micro-batch. Covers:
  //  - no-op collapse within a batch (u1: A@10 then A@20),
  //  - a change within a batch (u1: B@30),
  //  - a no-op ACROSS batches (u1: B@40 arrives next batch),
  //  - a change across batches (u1: C@50; u2: X@5 -> Y@15),
  //  - a key first seen mid-stream (u3),
  //  - scrambled within-batch arrival order (the processor must sort).
  private val batches: Seq[Seq[(Long, String, Long, Long)]] = Seq(
    Seq((1L, "B", 30L, 3L), (1L, "A", 10L, 1L), (2L, "X", 5L, 10L),
      (1L, "A", 20L, 2L)),
    Seq((1L, "C", 50L, 5L), (1L, "B", 40L, 4L), (2L, "Y", 15L, 11L),
      (3L, "Z", 7L, 20L)),
    Seq((2L, "Y", 25L, 12L)))

  test("reconciled CDC output equals the batch scd2 build row-for-row") {
    val in = MemoryStream[(Long, String, Long, Long)](spark)
    val log = in.toDF().toDF("user_id", "event_type", "ts_us", "event_id")
    val ckpt = Files.createTempDirectory("graft-scd2-ckpt").toString
    val q = StreamScd2.versions(log)
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      for (b <- batches) { in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, String, Long, Long, Option[Long], Boolean)]
      .collect().toSeq.sorted

    val streamed = rows(StreamScd2.reconcile(spark.table("scd2_out"))
      .select($"user_id", $"event_type", $"valid_from_us", $"event_id",
        $"valid_to_us", $"is_current"))
    val batch = rows(Governance.scd2(
      batches.flatten.toDF("user_id", "event_type", "ts_us", "event_id")))
    assert(streamed === batch)

    // and the expected history, hand-computed: no-ops collapsed, each
    // close at the next change's ts, last version per user open
    assert(batch === Seq(
      (1L, "A", 10L, 1L, Some(30L), false),
      (1L, "B", 30L, 3L, Some(50L), false),
      (1L, "C", 50L, 5L, None, true),
      (2L, "X", 5L, 10L, Some(15L), false),
      (2L, "Y", 15L, 11L, None, true),
      (3L, "Z", 7L, 20L, None, true)))

    // CDC shape: exactly one OPEN row per version, one CLOSE per closed
    // version — 6 opens + 3 closes = 9 emitted rows
    assert(spark.table("scd2_out").count() === 9)
  }

  test("state carries the open version across an idle batch and a restart") {
    val in = MemoryStream[(Long, String, Long, Long)](spark)
    val log = in.toDF().toDF("user_id", "event_type", "ts_us", "event_id")
    val ckpt = Files.createTempDirectory("graft-scd2-ckpt2").toString
    // foreachBatch sink (supports checkpoint recovery, unlike memory)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Option[Long], Boolean)]()
    def start() = StreamScd2.versions(log)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamScd2.Scd2Ver],
          _: Long) =>
        df.collect().foreach(v =>
          emitted.add((v.event_type, v.valid_to_us, v.is_current)))
        ()
      }
      .outputMode("append").option("checkpointLocation", ckpt).start()

    val q1 = start()
    try { in.addData((7L, "A", 100L, 1L)); q1.processAllAvailable() }
    finally q1.stop()

    // restart against the same checkpoint: the open A version must close
    // from PERSISTED state, not reset
    val q2 = start()
    try { in.addData((7L, "B", 200L, 2L)); q2.processAllAvailable() }
    finally q2.stop()

    import scala.jdk.CollectionConverters._
    // upsert semantics: the A close supersedes the A open
    val got = emitted.asScala.toSeq.groupBy(_._1)
      .map { case (t, vs) => vs.minBy(_._3) }.toSet
    assert(got === Set(("A", Some(200L), false), ("B", None, true)))
  }
}
