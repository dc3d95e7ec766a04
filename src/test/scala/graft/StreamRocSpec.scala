package graft

import graft.operators.MlEval
import graft.streaming.StreamRoc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming ROC maintainer end-to-end: events replayed in micro-batches,
  * value-domain count deltas folded at query time — the full readout
  * (n_pos, n_neg, auc, gini, ks_sep) must bit-match the batch q_roc_auc. */
class StreamRocSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded value-domain log reproduces the batch readout bit-for-bit") {
    val ev = Tables.events(spark, dir)
    val logDir = Files.createTempDirectory("graft-roc-log").toString

    val srcDir = Files.createTempDirectory("graft-roc-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"event_type", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamRoc.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamRoc.report(spark, logDir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val batch = MlEval.qRocAuc.run(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(streamed === batch && batch.nonEmpty)
    // the readout was genuinely assembled from 3 per-batch deltas
    val parts = new java.io.File(s"$logDir/log").listFiles()
      .count(_.getName.startsWith("vc_b"))
    assert(parts === 3)

    // the SAME maintained log serves the gains table, bit-equal too
    val streamedLift = StreamRoc.liftReport(spark, logDir)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    val batchLift = MlEval.qLiftCurve.run(spark, dir)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(streamedLift === batchLift && batchLift.nonEmpty)

    // recovery replay of batch 1: fixed-path overwrite is correctness
    StreamRoc.processBatch(
      ev.filter($"event_id" % 3 === 1)
        .select($"event_id", $"event_type", $"value"),
      1L, logDir)
    assert(StreamRoc.report(spark, logDir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq === batch)
  }
}
