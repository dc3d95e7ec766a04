package graft

import graft.operators.CorpusQuality
import graft.streaming.StreamCanary
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming canary-exposure maintainer end-to-end: documents replayed in
  * micro-batches, both additive logs folded at query time — the exposure
  * readout must equal the batch q_canary_exposure bit-for-bit on the same
  * corpus, INCLUDING sequences whose occurrences span batches (a canary is
  * a UNION-corpus singleton, which no single batch can decide), plus
  * recovery replay. */
class StreamCanarySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  test("folded exposure equals the batch twin at sf0.001; cross-batch " +
      "occurrences de-canarize; recovery replay is idempotent") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-canary").toString
    for (s <- 0 until 3)
      StreamCanary.processBatch(
        docs.filter($"doc_id" % 3 === s).select($"doc_id", $"text"),
        s.toLong, logDir)
    val want = rows(CorpusQuality.qCanaryExposure.run(spark, dir))
    assert(want.nonEmpty)
    assert(rows(StreamCanary.exposure(spark, logDir)) === want)

    // non-vacuity of the additive law: some gram occurs in MORE than one
    // batch delta (so only the fold can rule it out as a canary), and the
    // union singleton set is smaller than the per-batch singleton union
    val gramDirs = new java.io.File(s"$logDir/grams").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    val perBatch = gramDirs.map(p => spark.read.parquet(p)
      .select($"canary").as[String].collect().toSet)
    val inTwo = perBatch.combinations(2).exists(c => (c(0) & c(1)).nonEmpty)
    assert(inTwo, "no gram spans two batches: the fold is untested")

    // recovery replay of batch 1 (fixed-path overwrite): readout unchanged
    StreamCanary.processBatch(
      docs.filter($"doc_id" % 3 === 1).select($"doc_id", $"text"),
      1L, logDir)
    assert(rows(StreamCanary.exposure(spark, logDir)) === want)
  }

  test("file-source replay via run(); fresh maintainer serves empty") {
    val fresh = Files.createTempDirectory("graft-canary-fresh").toString
    assert(StreamCanary.exposure(spark, fresh).collect().isEmpty)

    val docs = Tables.documents(spark, fixtureDir)
    val logDir = Files.createTempDirectory("graft-canary-run").toString
    val srcDir = Files.createTempDirectory("graft-canary-src").toString
    for (s <- 0 until 2)
      docs.filter($"doc_id" % 2 === s)
        .select($"doc_id", $"text")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = StreamCanary.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")
    assert(rows(StreamCanary.exposure(spark, logDir))
      === rows(CorpusQuality.qCanaryExposure.run(spark, fixtureDir)))
  }
}
