package graft

import graft.operators.Clustering
import graft.streaming.StreamGmm
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming GMM maintainer end-to-end: events replayed in micro-batches,
  * value-domain count deltas folded at query time — the per-component fit
  * (component, weight, mu, sigma, avg_ll) must bit-match the batch
  * q_gmm_em. */
class StreamGmmSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded count log reproduces the batch mixture fit bit-for-bit") {
    val ev = Tables.events(spark, dir)
    val logDir = Files.createTempDirectory("graft-gmm-log").toString

    val srcDir = Files.createTempDirectory("graft-gmm-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamGmm.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamGmm.report(spark, logDir)
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    val batch = Clustering.qGmmEm.run(spark, dir)
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    assert(streamed === batch && batch.nonEmpty)

    // recovery replay of batch 1: fixed-path overwrite is correctness
    StreamGmm.processBatch(
      ev.filter($"event_id" % 3 === 1).select($"event_id", $"value"),
      1L, logDir)
    assert(StreamGmm.report(spark, logDir)
      .as[(Long, Double, Double, Double, Double)].collect().toSeq === batch)
  }
}
