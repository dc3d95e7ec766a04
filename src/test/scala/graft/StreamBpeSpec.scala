package graft

import graft.operators.TextAnalytics
import graft.streaming.StreamBpe
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming BPE maintainer end-to-end: documents replayed in
  * micro-batches, the word-frequency delta log folded at read time — the
  * folded vocabulary must equal the batch word-frequency table EXACTLY,
  * the merge table learned from it must equal the batch q_bpe_train,
  * and a recovery replay of a batch must change neither. */
class StreamBpeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded vocabulary and learned merges equal the batch trainer") {
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-bpe-log").toString

    val srcDir = Files.createTempDirectory("graft-bpe-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .select($"doc_id", $"text")

    val q = StreamBpe.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")

    def freqs(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long)].collect().toSeq.sorted
    val batchFreqs = TextAnalytics.bpeWordFreqs(docs.select($"doc_id", $"text"))
    assert(freqs(StreamBpe.wordFreqs(spark, logDir)) === freqs(batchFreqs))

    val streamedMerges = StreamBpe.learn(spark, logDir)
    val batchMerges = TextAnalytics.bpeLearn(spark, dir)
    assert(streamedMerges === batchMerges)
    assert(batchMerges.size === TextAnalytics.BpeMerges)

    // recovery replay of batch 0: additive counters -> fixed-path
    // overwrite is correctness on replay, merges unchanged
    StreamBpe.processBatch(
      docs.filter($"doc_id" % 3 === 0).select($"doc_id", $"text"), 0L, logDir)
    assert(freqs(StreamBpe.wordFreqs(spark, logDir)) === freqs(batchFreqs))
    assert(StreamBpe.learn(spark, logDir) === batchMerges)
  }
}
