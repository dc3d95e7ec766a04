package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamWelch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming A/B maintainer end-to-end: events replayed in micro-batches,
  * ≤2-row arm-moment deltas folded at query time — BOTH readouts (the
  * Welch t/df and the power/MDE design row) must bit-match their batch
  * queries. */
class StreamWelchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded arm-moment log reproduces both batch readouts bit-for-bit") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val logDir = Files.createTempDirectory("graft-welch-log").toString

    val srcDir = Files.createTempDirectory("graft-welch-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"event_type", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamWelch.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val welchS = StreamWelch.report(spark, logDir)
      .as[(Long, Double, Double, Long, Double, Double, Double, Double)]
      .collect().toSeq
    val welchB = BehaviorAnalytics.qAbWelch.run(spark, "/root/testdata/sf0.01")
      .as[(Long, Double, Double, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(welchS === welchB && welchB.nonEmpty)

    val powerS = StreamWelch.powerReport(spark, logDir)
      .as[(Long, Long, Double, Double, Long, Double)].collect().toSeq
    val powerB = BehaviorAnalytics.qAbPower.run(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Double, Double, Long, Double)].collect().toSeq
    assert(powerS === powerB && powerB.nonEmpty)

    val msprtS = StreamWelch.msprtReport(spark, logDir)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    val msprtB = BehaviorAnalytics.qMsprt.run(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(msprtS === msprtB && msprtB.nonEmpty)

    // recovery replay of batch 0: fixed-path overwrite is correctness
    StreamWelch.processBatch(
      ev.filter($"event_id" % 3 === 0)
        .select($"event_id", $"event_type", $"value"),
      0L, logDir)
    assert(StreamWelch.report(spark, logDir)
      .as[(Long, Double, Double, Long, Double, Double, Double, Double)]
      .collect().toSeq === welchB)
  }
}
