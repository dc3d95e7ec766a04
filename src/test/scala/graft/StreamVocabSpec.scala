package graft

import graft.operators.LexicalStats
import graft.streaming.StreamVocab
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming vocabulary maintainer end-to-end: documents replayed in
  * micro-batches, the (term, cnt) delta log folded at query time — all
  * THREE frequency-spectrum readouts (zipf, hill, chao1) must equal their
  * batch twins bit-for-bit on the same corpus, INCLUDING terms whose
  * occurrences arrive in different batches (the case the fold's
  * additivity exists for), plus recovery replay. */
class StreamVocabSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  test("folded readouts equal batch twins on the fixture; cross-batch terms fold") {
    // fixture: 'slow' occurs in docs 0, 2, 3 — doc_id % 3 spreads those
    // over all three micro-batches, so its corpus frequency (7) only
    // exists as a cross-batch sum
    val docs = Tables.documents(spark, fixtureDir)
    val logDir = Files.createTempDirectory("graft-vocab").toString
    val srcDir = Files.createTempDirectory("graft-vocab-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .select($"doc_id", $"text")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = StreamVocab.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")

    assert(rows(StreamVocab.zipf(spark, logDir))
      === rows(LexicalStats.qZipfFit.run(spark, fixtureDir)))
    assert(rows(StreamVocab.hill(spark, logDir))
      === rows(LexicalStats.qHillTail.run(spark, fixtureDir)))
    assert(rows(StreamVocab.chao1(spark, logDir))
      === rows(LexicalStats.qChao1.run(spark, fixtureDir)))

    // the cross-batch fold really happened: 'slow' = 1 + 3 + 3 across
    // slices, each batch is (at most) one slice part-file (the file
    // source may split a slice into several batches — list what landed),
    // and no single batch delta holds all 7
    val batchDirs = new java.io.File(s"$logDir/log").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    val perBatch = batchDirs.map { p =>
      spark.read.parquet(p).filter($"term" === "slow").collect()
        .map(_.getAs[Long]("cnt")).headOption.getOrElse(0L)
    }
    assert(perBatch.sum === 7L && perBatch.max < 7L)
  }

  test("real corpus: readouts bit-equal at sf0.001; recovery replay") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-vocab-sf").toString
    for (s <- 0 until 3)
      StreamVocab.processBatch(
        docs.filter($"doc_id" % 3 === s).select($"doc_id", $"text"),
        s.toLong, logDir)
    val zipf = rows(LexicalStats.qZipfFit.run(spark, dir))
    val hill = rows(LexicalStats.qHillTail.run(spark, dir))
    val chao = rows(LexicalStats.qChao1.run(spark, dir))
    assert(rows(StreamVocab.zipf(spark, logDir)) === zipf)
    assert(rows(StreamVocab.hill(spark, logDir)) === hill)
    assert(rows(StreamVocab.chao1(spark, logDir)) === chao)

    // recovery replay of batch 1: fixed-path overwrite is correctness
    // (the batch id <-> slice mapping is OURS here, per the
    // StreamExactDedup listing-order lesson)
    StreamVocab.processBatch(
      docs.filter($"doc_id" % 3 === 1).select($"doc_id", $"text"),
      1L, logDir)
    assert(rows(StreamVocab.zipf(spark, logDir)) === zipf)
    assert(rows(StreamVocab.chao1(spark, logDir)) === chao)
  }
}
