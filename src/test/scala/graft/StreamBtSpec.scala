package graft

import graft.operators.MlEval
import graft.streaming.StreamBt
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming Bradley–Terry maintainer end-to-end: documents replayed in
  * micro-batches, the additive histogram log folded at query time — the
  * strength ladder must equal the batch q_bradley_terry bit-for-bit on
  * the same corpus, INCLUDING wins decided between documents that arrived
  * in different batches (which no per-batch fit could count), plus
  * recovery replay. */
class StreamBtSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  test("folded strengths equal the batch twin at sf0.001; histogram bins " +
      "span batches; recovery replay is idempotent") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-bt").toString
    for (s <- 0 until 3)
      StreamBt.processBatch(
        docs.filter($"doc_id" % 3 === s).select($"source", $"text"),
        s.toLong, logDir)
    val want = rows(MlEval.qBradleyTerry.run(spark, dir))
    assert(want.nonEmpty)
    assert(rows(StreamBt.strengths(spark, logDir)) === want)

    // non-vacuity of the additive law: some (source, bin) cell carries
    // mass in MORE than one batch delta, so only the fold counts its
    // within-cell cross-batch wins correctly
    val histDirs = new java.io.File(s"$logDir/hist").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    val perBatch = histDirs.map(p => spark.read.parquet(p)
      .select($"source", $"v").as[(String, Double)].collect().toSet)
    val inTwo = perBatch.combinations(2).exists(c => (c(0) & c(1)).nonEmpty)
    assert(inTwo, "no histogram cell spans two batches: the fold is untested")

    // recovery replay of batch 1 (fixed-path overwrite): readout unchanged
    StreamBt.processBatch(
      docs.filter($"doc_id" % 3 === 1).select($"source", $"text"),
      1L, logDir)
    assert(rows(StreamBt.strengths(spark, logDir)) === want)
  }

  test("file-source replay via run(); fresh maintainer serves empty") {
    val fresh = Files.createTempDirectory("graft-bt-fresh").toString
    assert(StreamBt.strengths(spark, fresh).collect().isEmpty)

    val docs = Tables.documents(spark, fixtureDir)
    val logDir = Files.createTempDirectory("graft-bt-run").toString
    val srcDir = Files.createTempDirectory("graft-bt-src").toString
    for (s <- 0 until 2)
      docs.filter($"doc_id" % 2 === s)
        .select($"doc_id", $"source", $"text")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = StreamBt.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")
    assert(rows(StreamBt.strengths(spark, logDir))
      === rows(MlEval.qBradleyTerry.run(spark, fixtureDir)))
  }
}
