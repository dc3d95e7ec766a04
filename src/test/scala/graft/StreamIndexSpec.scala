package graft

import graft.operators.Retrieval
import graft.streaming.StreamIndex
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming retrieval-index maintainer end-to-end: documents replayed in
  * micro-batches, the postings + stats delta logs folded at query time —
  * BOTH rankers (Okapi BM25 and Dirichlet query likelihood) must
  * bit-match their batch queries on the same corpus, including after a
  * recovery replay, and the maintained index must serve a query OTHER
  * than the pinned one (it is an index, not a materialized answer). */
class StreamIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  test("folded index serves BM25 and QL bit-equal to the batch rankers") {
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-index-log").toString

    // replay documents as 3 disjoint slices (append-only corpus: each doc
    // lives in exactly one micro-batch — the maintainer's contract)
    val srcDir = Files.createTempDirectory("graft-index-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .select($"doc_id", $"text")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamIndex.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")

    // the folded tf relation equals the batch reduction exactly
    def tfRows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Long, Int)].collect().toSeq.sorted
    val batchTf = Retrieval.tfOf(
      Retrieval.matchedToks(spark, dir, Retrieval.QueryTerms))
    assert(tfRows(StreamIndex.tf(spark, logDir, Retrieval.QueryTerms))
      === tfRows(batchTf))
    assert(tfRows(batchTf).nonEmpty)

    // both rankers bit-match their batch queries
    val bm25Batch = rows(Retrieval.qBm25Scores.run(spark, dir))
    val qlBatch = rows(Retrieval.qQlScores.run(spark, dir))
    assert(bm25Batch.nonEmpty && qlBatch.nonEmpty)
    assert(rows(StreamIndex.bm25(spark, logDir)) === bm25Batch)
    assert(rows(StreamIndex.ql(spark, logDir)) === qlBatch)

    // the SAME fold serves both offline evals bit-equal to their batch
    // twins (labels derive from the fold itself)
    val evalBatch = rows(Retrieval.qRankEval.run(spark, dir))
    val mapBatch = rows(Retrieval.qMapMrr.run(spark, dir))
    assert(evalBatch.nonEmpty && mapBatch.nonEmpty)
    assert(rows(StreamIndex.rankEval(spark, logDir)) === evalBatch)
    assert(rows(StreamIndex.mapMrr(spark, logDir)) === mapBatch)

    // the index serves a DIFFERENT query than the pinned one (non-vacuity:
    // the ad-hoc ranking is nonempty and bit-matches the batch plan run
    // with the same terms)
    val adhoc = Seq("data", "model")
    val bm25Adhoc = rows(StreamIndex.bm25(spark, logDir, adhoc))
    assert(bm25Adhoc.nonEmpty)
    assert(bm25Adhoc === rows(
      Retrieval.bm25RankedFromTf(
        Retrieval.tfOf(Retrieval.matchedToks(spark, dir, adhoc)),
        Retrieval.corpusDl(spark, dir)).orderBy("rank")))

    // recovery replay of batch 0: fixed-path overwrite is correctness —
    // both readouts unchanged
    StreamIndex.processBatch(
      docs.filter($"doc_id" % 3 === 0).select($"doc_id", $"text"),
      0L, logDir)
    assert(rows(StreamIndex.bm25(spark, logDir)) === bm25Batch)
    assert(rows(StreamIndex.ql(spark, logDir)) === qlBatch)
  }
}
