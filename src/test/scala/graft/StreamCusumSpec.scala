package graft

import graft.operators.Governance
import graft.streaming.StreamCusum
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming CUSUM end-to-end: reference frozen from the older corpus
  * half via the shared cusumRef relation, the newer half replayed in
  * time-ordered micro-batches — the O(1)-state integer recursion must
  * equal the batch prefix-identity windows BIT-FOR-BIT. */
class StreamCusumSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed O(1)-state recursion equals the batch q_cusum_drift bit-for-bit") {
    val ev = Tables.events(spark, dir)
      .select($"event_type", $"ts_us", $"event_id", $"value")
    val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) div 2")).head().getLong(0)
    val ref = Governance.cusumRef(ev.filter($"ts_us" <= mid))

    // replay the newer half in 3 TIME-ORDERED slices (per-key order must
    // hold across batches — the monitor's CDC arrival contract)
    val newer = ev.filter($"ts_us" > mid)
      .as[(String, Long, Long, Double)].collect().toSeq
      .sortBy(r => (r._2, r._3))
    val slices = newer.grouped(math.max(1, (newer.size + 2) / 3)).toSeq
    assert(slices.size === 3 && newer.nonEmpty)

    val in = MemoryStream[(String, Long, Long, Double)](spark)
    val stream = in.toDF().toDF("event_type", "ts_us", "event_id", "value")
    val ckpt = Files.createTempDirectory("graft-cusum-ckpt").toString
    val q = StreamCusum.monitored(stream, ref)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      for (s <- slices) { in.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_type", $"ts_us", $"event_id", $"value", $"s_pos",
        $"s_neg", $"alarm")
      .as[(String, Long, Long, Double, Double, Double, Boolean)]
      .collect().toSeq.sorted

    val streamed = rows(spark.table("cusum_out"))
    val batch = rows(Governance.qCusumDrift.run(spark, dir))
    assert(streamed === batch)   // bit-for-bit, including the doubles
    assert(batch.nonEmpty)
  }
}
