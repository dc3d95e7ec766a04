package graft

import graft.operators.Governance
import graft.streaming.StreamBenford
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming Benford maintainer end-to-end: events replayed in
  * micro-batches, digit-delta log folded at query time — the folded
  * counters must equal the batch counters EXACTLY (additive integers) and
  * the folded report must bit-match the batch q_benford readout. */
class StreamBenfordSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded digit log equals batch counts; report bit-matches q_benford") {
    val ev = Tables.events(spark, dir)
    val logDir = Files.createTempDirectory("graft-benford-log").toString

    // replay events as 3 disjoint files
    val srcDir = Files.createTempDirectory("graft-benford-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamBenford.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamBenford.counts(spark, logDir)
      .as[(Int, Long)].collect().toSeq.sorted
    val batch = Governance.benfordCounts(ev)
      .as[(Int, Long)].collect().toSeq.sorted
    assert(streamed === batch)
    assert(batch.map(_._2).sum > 0)

    // full readout (chi2/mad included) bit-matches the batch query
    val streamedReport = StreamBenford.report(spark, logDir)
      .as[(Int, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    val batchReport = Governance.qBenford.run(spark, dir)
      .as[(Int, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(streamedReport === batchReport)
    assert(batchReport.size === 9)

    // recovery replay of batch 0: additive counters -> fixed-path
    // overwrite is correctness on replay
    StreamBenford.processBatch(ev.filter($"event_id" % 3 === 0), 0L, logDir)
    assert(StreamBenford.counts(spark, logDir)
      .as[(Int, Long)].collect().toSeq.sorted === batch)
  }
}
