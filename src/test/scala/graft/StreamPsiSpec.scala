package graft

import graft.operators.Governance
import graft.streaming.StreamPsi
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming PSI monitor end-to-end: freeze the reference histogram on the
  * corpus's older time half, replay the newer half through a real
  * file-source stream in micro-batches, and the folded bin-log report must
  * equal the batch q_psi_drift output ROW-FOR-ROW (same bucketing
  * expression, same smoothing, same exact-decimal total — shared
  * definitions, different execution shape). */
class StreamPsiSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("frozen-reference stream report equals the batch q_psi_drift") {
    val ev = Tables.events(spark, dir).select($"ts_us", $"value")
    val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) div 2")).head().getLong(0)

    val refDir = Files.createTempDirectory("graft-psi-ref").toString + "/ref"
    val logDir = Files.createTempDirectory("graft-psi-log").toString
    // reference: older half binned with CORPUS-wide bounds (the batch
    // query's bucketing population, so the twin is exact)
    StreamPsi.writeReference(
      ev.filter($"ts_us" <= mid).select($"value"),
      StreamPsi.bounds(ev.select($"value")), refDir)

    // replay the newer half as 3 disjoint files -> 3 micro-batches
    val srcDir = Files.createTempDirectory("graft-psi-src").toString
    val newer = ev.filter($"ts_us" > mid).select($"value")
    for (s <- 0 until 3)
      newer.filter(abs(hash($"value")) % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(newer.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamPsi.run(stream, refDir, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamPsi.report(spark, refDir, logDir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val batch = Governance.qPsiDrift.run(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(streamed === batch)

    // the log grows <= PsiBins rows per batch — the report's input is
    // O(batches x bins), never corpus-sized
    val logRows = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$logDir/log").count()
    assert(logRows <= 3L * Governance.PsiBins)

    // recovery replay of batch 1: sweep means same report (bin counts are
    // additive, NOT duplicate-insensitive — the sweep is correctness)
    val b1 = newer.filter(abs(hash($"value")) % 3 === 1)
    StreamPsi.processBatch(b1, refDir, 1L, logDir)
    val replayed = StreamPsi.report(spark, refDir, logDir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(replayed === batch)
  }

  test("drift detection: a shifted stream population raises psi_total") {
    val refDir = Files.createTempDirectory("graft-psi-ref2").toString + "/ref"
    val logDir = Files.createTempDirectory("graft-psi-log2").toString
    val base = (1 to 500).map(_ % 10 * 1.0).toDF("value")
    StreamPsi.writeReference(base, StreamPsi.bounds(base), refDir)

    // same distribution -> near-zero PSI
    StreamPsi.processBatch((1 to 500).map(_ % 10 * 1.0).toDF("value"),
      refDir, 0L, logDir)
    val same = StreamPsi.report(spark, refDir, logDir)
      .select(max($"psi_total")).head().getDouble(0)

    // shifted mass (all values in the top bin) -> large PSI
    val logDir2 = Files.createTempDirectory("graft-psi-log3").toString
    StreamPsi.processBatch(Seq.fill(500)(9.0).toDF("value"),
      refDir, 0L, logDir2)
    val shifted = StreamPsi.report(spark, refDir, logDir2)
      .select(max($"psi_total")).head().getDouble(0)

    assert(same < 0.01, s"same-population PSI should be ~0, got $same")
    assert(shifted > 0.5, s"shifted-population PSI should alarm, got $shifted")
    assert(shifted > same * 10)
  }

  test("downward drift below the frozen reference minimum lands in bin 0 and alarms") {
    // review catch: without the low clamp, below-vlo values binned
    // negative and the spine join silently dropped them — the monitor
    // was blind to downward drift
    val refDir = Files.createTempDirectory("graft-psi-ref4").toString + "/ref"
    val logDir = Files.createTempDirectory("graft-psi-log4").toString
    val base = (1 to 500).map(i => 10.0 + i % 10).toDF("value") // [10, 19]
    StreamPsi.writeReference(base, StreamPsi.bounds(base), refDir)

    // drifted population entirely BELOW the reference range
    StreamPsi.processBatch((1 to 500).map(i => i % 5 * 1.0).toDF("value"),
      refDir, 0L, logDir)
    val r = StreamPsi.report(spark, refDir, logDir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // every streamed row is accounted for (bin 0), none dropped
    assert(r.map(_._3).sum === 500L)
    assert(r.find(_._1 === 0L).get._3 === 500L)
    // and the monitor alarms hard
    assert(r.head._5 > 0.5, s"downward drift must alarm, got ${r.head._5}")
  }
}
