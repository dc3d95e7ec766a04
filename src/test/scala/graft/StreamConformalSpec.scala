package graft

import graft.operators.MlEval
import graft.streaming.StreamConformal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming conformal maintainer end-to-end: events replayed in
  * micro-batches, (type, bucket, value) count deltas folded at query time
  * — the full readout (event_type, n_cal, qhat, n_test, coverage) must
  * bit-match the batch q_conformal_interval, including the
  * frequency-weighted percentile ≡ row-level percentile equivalence. */
class StreamConformalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded count log reproduces the batch conformal readout") {
    val ev = Tables.events(spark, dir)
    val logDir = Files.createTempDirectory("graft-conf-log").toString

    val srcDir = Files.createTempDirectory("graft-conf-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"event_type", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamConformal.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamConformal.report(spark, logDir)
      .as[(String, Long, Double, Long, Double)].collect().toSeq
    val batch = MlEval.qConformalInterval.run(spark, dir)
      .as[(String, Long, Double, Long, Double)].collect().toSeq
    assert(streamed === batch && batch.nonEmpty)

    // recovery replay of batch 0: fixed-path overwrite is correctness
    StreamConformal.processBatch(
      ev.filter($"event_id" % 3 === 0)
        .select($"event_id", $"event_type", $"value"),
      0L, logDir)
    assert(StreamConformal.report(spark, logDir)
      .as[(String, Long, Double, Long, Double)].collect().toSeq === batch)
  }
}
