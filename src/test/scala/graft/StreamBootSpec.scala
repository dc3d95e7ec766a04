package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamBoot
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming bootstrap-CI maintainer end-to-end: events replayed in
  * micro-batches, replica-sum deltas folded at query time — the full
  * 5-column readout (n, point mean, replica count, CI bounds) must
  * bit-match the batch q_bootstrap_ci. */
class StreamBootSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded replica log reproduces the batch CI bit-for-bit") {
    val ev = Tables.events(spark, dir)
    val logDir = Files.createTempDirectory("graft-boot-log").toString

    val srcDir = Files.createTempDirectory("graft-boot-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamBoot.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamBoot.report(spark, logDir)
      .as[(Long, Double, Long, Double, Double)].collect().toSeq
    val batch = BehaviorAnalytics.qBootstrapCi.run(spark, dir)
      .as[(Long, Double, Long, Double, Double)].collect().toSeq
    assert(streamed === batch && batch.nonEmpty)
    // every replica's sum was genuinely assembled from 3 partials
    val logRows = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$logDir/log").count()
    assert(logRows === 3L * (BehaviorAnalytics.BootReplicas + 1))

    // recovery replay of batch 0: fixed-path overwrite is correctness
    StreamBoot.processBatch(
      ev.filter($"event_id" % 3 === 0).select($"event_id", $"value"),
      0L, logDir)
    assert(StreamBoot.report(spark, logDir)
      .as[(Long, Double, Long, Double, Double)].collect().toSeq === batch)
  }
}
