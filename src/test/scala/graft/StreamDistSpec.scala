package graft

import graft.operators.BehaviorAnalytics
import graft.streaming.StreamDist
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming distribution monitor end-to-end: events replayed in
  * micro-batches, value-domain count deltas folded at query time — ALL
  * THREE nonparametric readouts (KS, MWU, EMD) must bit-match their
  * batch queries from the one maintained log. */
class StreamDistSpec extends SparkSpec {
  import spark.implicits._

  test("one folded count log serves KS, MWU and EMD bit-for-bit") {
    val sf = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, sf)
    val logDir = Files.createTempDirectory("graft-dist-log").toString

    val srcDir = Files.createTempDirectory("graft-dist-src").toString
    for (s <- 0 until 3)
      ev.filter($"event_id" % 3 === s)
        .select($"event_id", $"event_type", $"value")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamDist.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val ksS = StreamDist.ksReport(spark, logDir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val ksB = BehaviorAnalytics.qKsTest.run(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(ksS === ksB && ksB.nonEmpty)

    val mwuS = StreamDist.mwuReport(spark, logDir)
      .as[(Long, Long, Double, Long, Double, Double, Double)].collect().toSeq
    val mwuB = BehaviorAnalytics.qMwuTest.run(spark, sf)
      .as[(Long, Long, Double, Long, Double, Double, Double)].collect().toSeq
    assert(mwuS === mwuB && mwuB.nonEmpty)

    val emdS = StreamDist.emdReport(spark, logDir)
      .as[(Long, Long, Double, Option[Double])].collect().toSeq
    val emdB = BehaviorAnalytics.qEmdDrift.run(spark, sf)
      .as[(Long, Long, Double, Option[Double])].collect().toSeq
    assert(emdS === emdB && emdB.nonEmpty)

    val aucS = StreamDist.aucReport(spark, logDir)
      .as[(Long, Long, Double, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().toSeq
    val aucB = BehaviorAnalytics.qAucDelong.run(spark, sf)
      .as[(Long, Long, Double, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().toSeq
    assert(aucS === aucB && aucB.nonEmpty)

    // recovery replay of batch 0: fixed-path overwrite is correctness
    StreamDist.processBatch(
      ev.filter($"event_id" % 3 === 0)
        .select($"event_id", $"event_type", $"value"),
      0L, logDir)
    assert(StreamDist.ksReport(spark, logDir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq === ksB)
  }
}
