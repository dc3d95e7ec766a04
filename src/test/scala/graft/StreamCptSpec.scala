package graft

import graft.operators.EventAnalytics
import graft.streaming.StreamCpt
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming changepoint monitor end-to-end: events replayed in
  * micro-batches, daily decimal-mass deltas folded at query time — the
  * live AMOC scan must bit-match the batch q_changepoint. */
class StreamCptSpec extends SparkSpec {
  import spark.implicits._

  test("folded daily-mass log reproduces the batch AMOC scan bit-for-bit") {
    val sf = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, sf)
    val logDir = Files.createTempDirectory("graft-cpt-log").toString

    val srcDir = Files.createTempDirectory("graft-cpt-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"ts_us", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamCpt.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Double, Double, Double, Boolean)]
        .collect().toSeq
    val live = rows(StreamCpt.report(spark, logDir))
    val batch = rows(EventAnalytics.qChangepoint.run(spark, sf))
    assert(live === batch && batch.nonEmpty)

    // recovery replay of batch 0: fixed-path overwrite is correctness
    StreamCpt.processBatch(
      ev.filter($"event_id" % 3 === 0).select($"event_id", $"ts_us", $"value"),
      0L, logDir)
    assert(rows(StreamCpt.report(spark, logDir)) === batch)
  }
}
