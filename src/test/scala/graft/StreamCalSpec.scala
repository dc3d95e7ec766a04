package graft

import graft.operators.MlEval
import graft.streaming.StreamCal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming calibration monitor end-to-end: events replayed in
  * micro-batches, 10-bin decimal counter deltas folded at query time —
  * BOTH readouts (ECE bins and the Brier decomposition) must bit-match
  * their batch queries from the one maintained log. */
class StreamCalSpec extends SparkSpec {
  import spark.implicits._

  test("one folded bin log serves ECE and Brier bit-for-bit") {
    val sf = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, sf)
    val logDir = Files.createTempDirectory("graft-cal-log").toString

    val srcDir = Files.createTempDirectory("graft-cal-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"event_type", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamCal.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val calS = StreamCal.calibReport(spark, logDir)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    val calB = MlEval.qCalibrationBins.run(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(calS === calB && calB.nonEmpty)

    val brS = StreamCal.brierReport(spark, logDir)
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq
    val brB = MlEval.qBrierDecomp.run(spark, sf)
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq
    assert(brS === brB && brB.nonEmpty)

    // recovery replay of batch 0: fixed-path overwrite is correctness
    StreamCal.processBatch(
      ev.filter($"event_id" % 3 === 0)
        .select($"event_id", $"event_type", $"value"),
      0L, logDir)
    assert(StreamCal.calibReport(spark, logDir)
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq === calB)
  }
}
