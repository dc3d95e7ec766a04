package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamAte
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming stratified-ATE maintainer end-to-end: events replayed in
  * micro-batches, bounded cell-moment deltas folded at query time — the
  * live causal readout must bit-match the batch q_strata_ate. */
class StreamAteSpec extends SparkSpec {
  import spark.implicits._

  test("folded cell-moment log reproduces the batch ATE bit-for-bit") {
    val sf = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, sf)
    val logDir = Files.createTempDirectory("graft-ate-log").toString

    val srcDir = Files.createTempDirectory("graft-ate-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"event_type", $"user_id", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamAte.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long, Double, Double, Double, Double)]
        .collect().toSeq
    val live = rows(StreamAte.report(spark, logDir))
    val batch = rows(BehaviorAnalytics.qStrataAte.run(spark, sf))
    assert(live === batch && batch.nonEmpty)

    // recovery replay of batch 0: fixed-path overwrite is correctness —
    // re-processing the same delta must not double-count any cell
    StreamAte.processBatch(
      ev.filter($"event_id" % 3 === 0)
        .select($"event_id", $"event_type", $"user_id", $"value"),
      0L, logDir)
    assert(rows(StreamAte.report(spark, logDir)) === batch)
  }
}
