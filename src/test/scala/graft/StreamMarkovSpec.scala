package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamMarkov
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming Markov maintainer end-to-end: the O(1)-state transition
  * detector over replayed micro-batches must reproduce the batch lag
  * window's transition matrix exactly — including chains that SPAN batch
  * boundaries, which is what the per-user last-event state exists for. */
class StreamMarkovSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed per-user state reproduces the batch transition matrix") {
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"ts_us", $"event_id")
      .as[(Long, String, Long, Long)].collect().toSeq
      .sortBy(r => (r._3, r._4)) // time-ordered replay (CDC contract)
    val slices = ev.grouped(math.max(1, (ev.size + 2) / 3)).toSeq
    assert(slices.size === 3)

    val in = MemoryStream[(Long, String, Long, Long)](spark)
    val stream = in.toDF().toDF("user_id", "event_type", "ts_us", "event_id")
    val ckpt = Files.createTempDirectory("graft-markov-ckpt").toString
    val q = StreamMarkov.transitions(stream)
      .writeStream.format("memory").queryName("markov_deltas")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      for (s <- slices) { in.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()

    val deltas = spark.table("markov_deltas")
    // cross-batch chains exist (otherwise the state is untested): some
    // (prev, next) pair must be split across >= 2 emission batches
    assert(deltas.groupBy("prev_type", "next_type").count()
      .filter($"count" > 1).count() > 0)

    val streamed = StreamMarkov.report(deltas)
      .as[(String, String, Long, Double)].collect().toSeq
    val batch = BehaviorAnalytics.qMarkovTransitions.run(spark, dir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
