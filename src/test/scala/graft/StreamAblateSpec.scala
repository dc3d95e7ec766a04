package graft

import graft.operators.CorpusQuality
import graft.streaming.StreamAblate
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming filter-ablation maintainer end-to-end: documents replayed in
  * micro-batches, the (term, c_<variant>…, vtf) + kept-docs delta logs
  * folded at query time — the ablation table must equal q_filter_ablation
  * bit-for-bit on the same corpus (both the conditional token counts and
  * the doc counts are additive over slices), plus recovery replay. */
class StreamAblateSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  test("folded report equals q_filter_ablation via streaming replay (fixture)") {
    val docs = Tables.documents(spark, fixtureDir)
    val logDir = Files.createTempDirectory("graft-abl-log").toString
    val srcDir = Files.createTempDirectory("graft-abl-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .select($"doc_id", $"text")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = StreamAblate.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")
    assert(rows(StreamAblate.report(spark, logDir))
      === rows(CorpusQuality.qFilterAblation.run(spark, fixtureDir)))
  }

  test("real corpus: report bit-equal at sf0.001; recovery replay") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-abl-sf").toString
    for (s <- 0 until 3)
      StreamAblate.processBatch(
        docs.filter($"doc_id" % 3 === s).select($"doc_id", $"text"),
        s.toLong, logDir)
    val batch = rows(CorpusQuality.qFilterAblation.run(spark, dir))
    assert(rows(StreamAblate.report(spark, logDir)) === batch)

    // recovery replay of batch 1: fixed-path overwrite is correctness
    StreamAblate.processBatch(
      docs.filter($"doc_id" % 3 === 1).select($"doc_id", $"text"),
      1L, logDir)
    assert(rows(StreamAblate.report(spark, logDir)) === batch)
  }
}
