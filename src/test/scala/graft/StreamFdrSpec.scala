package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamFdr
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming BH-FDR maintainer end-to-end: events replayed in
  * micro-batches, bounded cell-moment deltas folded at query time — the
  * live step-up screen must bit-match the batch q_bh_fdr. */
class StreamFdrSpec extends SparkSpec {
  import spark.implicits._

  test("folded cell-moment log reproduces the batch BH screen bit-for-bit") {
    val sf = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, sf)
    val logDir = Files.createTempDirectory("graft-fdr-log").toString

    val srcDir = Files.createTempDirectory("graft-fdr-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"event_type", $"ts_us", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamFdr.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Double, Double, Double, Long, Double, Long)]
        .collect().toSeq
    val live = rows(StreamFdr.report(spark, logDir))
    val batch = rows(BehaviorAnalytics.qBhFdr.run(spark, sf))
    assert(live === batch && batch.nonEmpty)

    // recovery replay of batch 0: fixed-path overwrite is correctness —
    // re-processing the same delta must not double-count any cell
    StreamFdr.processBatch(
      ev.filter($"event_id" % 3 === 0)
        .select($"event_id", $"event_type", $"ts_us", $"value"),
      0L, logDir)
    assert(rows(StreamFdr.report(spark, logDir)) === batch)
  }
}
