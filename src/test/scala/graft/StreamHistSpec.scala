package graft

import graft.operators.Governance
import graft.streaming.StreamHist
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming histogram quantiles end-to-end: bounds frozen from the
  * corpus, values replayed in micro-batches, folded bin-log report must
  * equal the batch q_hist_quantiles approx columns row-for-row (same
  * bucketing, same merged-histogram shape, same shared lookup). */
class StreamHistSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed bin-log quantiles equal the batch q_hist_quantiles approx") {
    val ev = Tables.events(spark, dir).select($"value")
    val refDir = Files.createTempDirectory("graft-hist-ref").toString + "/ref"
    val logDir = Files.createTempDirectory("graft-hist-log").toString
    // freeze bounds with the batch query's own formula (corpus min/max)
    StreamHist.writeReference(ev, refDir)

    val srcDir = Files.createTempDirectory("graft-hist-src").toString
    for (s <- 0 until 3)
      ev.filter(abs(hash($"value")) % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamHist.run(stream, refDir, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamHist.report(spark, refDir, logDir)
      .as[(Double, Long, Long, Double)].collect().toSeq
    val batch = Governance.qHistQuantiles.run(spark, dir)
      .select($"p", $"n_total", $"bin", $"approx_q")
      .as[(Double, Long, Long, Double)].collect().toSeq
    assert(streamed === batch)
    assert(batch.map(_._1) === Governance.Quantiles)

    // log bound: <= HistBins rows per batch
    val logRows = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$logDir/log").count()
    assert(logRows <= 3L * Governance.HistBins)

    // recovery replay: additive counts, sweep is correctness
    StreamHist.processBatch(ev.filter(abs(hash($"value")) % 3 === 0),
      refDir, 0L, logDir)
    val replayed = StreamHist.report(spark, refDir, logDir)
      .as[(Double, Long, Long, Double)].collect().toSeq
    assert(replayed === batch)
  }
}
