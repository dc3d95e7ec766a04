package graft

import graft.operators.MlEval
import graft.streaming.StreamMi
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming MI maintainer end-to-end: events replayed in micro-batches,
  * contingency-cell deltas folded at query time — the full readout
  * (n, n_x, n_y, mi_nats, h_x, h_y, nmi) must bit-match the batch
  * q_mutual_info. */
class StreamMiSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded cell log reproduces the batch MI readout bit-for-bit") {
    val ev = Tables.events(spark, dir)
    val logDir = Files.createTempDirectory("graft-mi-log").toString

    val srcDir = Files.createTempDirectory("graft-mi-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"event_type", $"ts_us")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamMi.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamMi.report(spark, logDir)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    val batch = MlEval.qMutualInfo.run(spark, dir)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(streamed === batch && batch.nonEmpty)

    // recovery replay of batch 2: fixed-path overwrite is correctness
    StreamMi.processBatch(
      ev.filter($"event_id" % 3 === 2)
        .select($"event_id", $"event_type", $"ts_us"),
      2L, logDir)
    assert(StreamMi.report(spark, logDir)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq === batch)
  }
}
