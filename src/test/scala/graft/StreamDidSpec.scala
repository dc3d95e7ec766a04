package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamDid
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming DiD maintainer end-to-end: events replayed in micro-batches,
  * 4-cell moment deltas folded at query time — the live readout must
  * bit-match the batch q_did. */
class StreamDidSpec extends SparkSpec {
  import spark.implicits._

  test("folded cell-moment log reproduces the batch DiD bit-for-bit") {
    val sf = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, sf)
    val logDir = Files.createTempDirectory("graft-did-log").toString

    val srcDir = Files.createTempDirectory("graft-did-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"user_id", $"ts_us", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamDid.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Double, Double, Double, Double, Double, Double, Double)]
        .collect().toSeq
    val live = rows(StreamDid.report(spark, logDir))
    val batch = rows(BehaviorAnalytics.qDid.run(spark, sf))
    assert(live === batch && batch.nonEmpty)

    // recovery replay of batch 0: fixed-path overwrite is correctness
    StreamDid.processBatch(
      ev.filter($"event_id" % 3 === 0)
        .select($"event_id", $"user_id", $"ts_us", $"value"),
      0L, logDir)
    assert(rows(StreamDid.report(spark, logDir)) === batch)
  }
}
