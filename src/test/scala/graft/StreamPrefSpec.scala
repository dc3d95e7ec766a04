package graft

import graft.operators.PipelineOps
import graft.streaming.StreamPref
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming preference-pair maintainer end-to-end: documents replayed in
  * micro-batches, the per-batch stratum-extrema log folded at query time —
  * the pair table must equal q_preference_pairs bit-for-bit on the same
  * corpus, INCLUDING strata whose chosen and rejected exemplars arrive in
  * different batches (the case the extrema fold's associativity exists
  * for), plus recovery replay. */
class StreamPrefSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  test("folded pairs equal q_preference_pairs via streaming replay (fixture)") {
    val docs = Tables.documents(spark, fixtureDir)
    val logDir = Files.createTempDirectory("graft-pref-log").toString
    val srcDir = Files.createTempDirectory("graft-pref-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .select($"doc_id", $"text", $"lang", $"source")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = StreamPref.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")
    assert(rows(StreamPref.pairs(spark, logDir))
      === rows(PipelineOps.qPreferencePairs.run(spark, fixtureDir)))
  }

  test("real corpus: bit-equal at sf0.001; cross-batch extrema; recovery replay") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-pref-sf").toString
    for (s <- 0 until 3)
      StreamPref.processBatch(
        docs.filter($"doc_id" % 3 === s)
          .select($"doc_id", $"text", $"lang", $"source"),
        s.toLong, logDir)
    val batch = rows(PipelineOps.qPreferencePairs.run(spark, dir))
    assert(rows(StreamPref.pairs(spark, logDir)) === batch)

    // the associativity leg is NON-vacuous on this data: at least one
    // stratum's chosen and rejected exemplars live in different batches
    val split = PipelineOps.qPreferencePairs.run(spark, dir)
      .select($"lang", $"source", $"chosen_id" % 3, $"rejected_id" % 3)
      .as[(String, String, Long, Long)].collect()
    assert(split.exists(r => r._3 != r._4),
      "every stratum's extrema landed in one batch — fold untested")

    // recovery replay of batch 1: fixed-path overwrite is correctness
    StreamPref.processBatch(
      docs.filter($"doc_id" % 3 === 1)
        .select($"doc_id", $"text", $"lang", $"source"),
      1L, logDir)
    assert(rows(StreamPref.pairs(spark, logDir)) === batch)
  }
}
