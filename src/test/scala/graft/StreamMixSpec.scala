package graft

import graft.operators.LexicalStats
import graft.streaming.StreamMix
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming mixture-rebalance maintainer end-to-end: documents replayed
  * in micro-batches, the (source, term, ctf, vtf) delta log folded at
  * query time — the rebalance table must equal q_mix_rebalance
  * bit-for-bit on the same corpus (the split counters are additive over
  * slices), plus recovery replay. */
class StreamMixSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  test("folded report equals q_mix_rebalance via streaming replay (fixture)") {
    val docs = Tables.documents(spark, fixtureDir)
    val logDir = Files.createTempDirectory("graft-mix-log").toString
    val srcDir = Files.createTempDirectory("graft-mix-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .select($"doc_id", $"text", $"source")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = StreamMix.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")
    assert(rows(StreamMix.report(spark, logDir))
      === rows(LexicalStats.qMixRebalance.run(spark, fixtureDir)))
  }

  test("real corpus: report bit-equal at sf0.001; recovery replay") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-mix-sf").toString
    for (s <- 0 until 3)
      StreamMix.processBatch(
        docs.filter($"doc_id" % 3 === s)
          .select($"doc_id", $"text", $"source"),
        s.toLong, logDir)
    val batch = rows(LexicalStats.qMixRebalance.run(spark, dir))
    assert(batch.nonEmpty)
    assert(rows(StreamMix.report(spark, logDir)) === batch)

    // recovery replay of batch 1: fixed-path overwrite is correctness
    StreamMix.processBatch(
      docs.filter($"doc_id" % 3 === 1)
        .select($"doc_id", $"text", $"source"),
      1L, logDir)
    assert(rows(StreamMix.report(spark, logDir)) === batch)
  }
}
