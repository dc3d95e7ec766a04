package graft

import graft.operators.Governance
import graft.streaming.StreamTclose
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming t-closeness end-to-end: documents replayed in micro-batches,
  * additive class-value count log folded at query time — must equal the
  * batch q_t_closeness audit row-for-row (the distances are pure
  * functions of the folded counts, so additivity of the base relation is
  * the whole correctness argument). */
class StreamTcloseSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed count-log report equals the batch q_t_closeness") {
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-tclose-log").toString

    // 3 disjoint files -> 3 micro-batches; doc_id % 3 slicing spreads
    // every (class, source) cell across batches so the fold is exercised,
    // not just pass-through
    val srcDir = Files.createTempDirectory("graft-tclose-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamTclose.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Double, Double, Boolean)].collect().toSeq

    val streamed = rows(StreamTclose.report(spark, logDir))
    val batch = rows(Governance.qTCloseness.run(spark, dir))
    assert(streamed === batch)
    assert(batch.nonEmpty)

    // the fold is real: some class-value cell spans batches (log carries
    // more rows than the folded relation)
    val logRows = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$logDir/log").count()
    val folded = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$logDir/log")
      .select("lang", "chars_bucket", "source").distinct().count()
    assert(logRows > folded, "expected some cell to span micro-batches")

    // recovery replay of batch 1: additive counters -> the fixed-path
    // overwrite sweep is correctness, not hygiene
    StreamTclose.processBatch(docs.filter($"doc_id" % 3 === 1), 1L, logDir)
    assert(rows(StreamTclose.report(spark, logDir)) === batch)
  }
}
