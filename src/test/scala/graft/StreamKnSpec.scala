package graft

import graft.operators.LexicalStats
import graft.streaming.StreamKn
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming Kneser–Ney maintainer end-to-end: documents replayed in
  * micro-batches, the bigram-count delta log folded at query time — the
  * folded model must equal the batch-built train counts EXACTLY (integer
  * counters), and per-doc scores read through it must bit-match the batch
  * q_kn_doc_surprisal, including after a recovery replay of a batch. */
class StreamKnSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded delta log equals the batch model; per-doc scores bit-match") {
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-kn-log").toString

    // replay documents as 3 disjoint slices — train membership is decided
    // per-document by the salted split inside the shared relation, so the
    // slicing is orthogonal to the model
    val srcDir = Files.createTempDirectory("graft-kn-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .select($"doc_id", $"text")

    val q = StreamKn.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")

    def counts(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Long)].collect().toSeq.sorted
    val batchModel = LexicalStats.knTrainCounts(
      LexicalStats.knDocBigrams(docs.select($"doc_id", $"text")))
    assert(counts(StreamKn.model(spark, logDir)) === counts(batchModel))
    assert(counts(batchModel).nonEmpty)

    // per-doc scores through the maintained model == the batch query
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Option[Double])].collect().toSeq
    val streamed = scores(StreamKn.scoreDocs(spark, logDir, docs))
    val batch = scores(LexicalStats.qKnDocSurprisal.run(spark, dir))
    assert(streamed === batch)

    // recovery replay of batch 0: additive counters -> fixed-path
    // overwrite is correctness on replay, scores unchanged
    StreamKn.processBatch(
      docs.filter($"doc_id" % 3 === 0).select($"doc_id", $"text"), 0L, logDir)
    assert(counts(StreamKn.model(spark, logDir)) === counts(batchModel))
    assert(scores(StreamKn.scoreDocs(spark, logDir, docs)) === batch)
  }
}
