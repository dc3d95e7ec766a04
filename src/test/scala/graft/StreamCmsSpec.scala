package graft

import graft.functions.Text
import graft.operators.Profiling
import graft.streaming.StreamCms
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming CMS maintainer end-to-end: token stream replayed in
  * micro-batches, cell-delta log folded at query time — the folded sketch
  * must equal the batch-built sketch EXACTLY (integer counters, identical
  * md5 buckets), and estimates read from it must match the batch audit. */
class StreamCmsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded delta log equals the batch sketch; estimates bit-match") {
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-cms-log").toString

    // replay documents as 3 disjoint files; tokenization happens on the
    // STREAM side (the ingest shape: raw docs in, sketch deltas out)
    val srcDir = Files.createTempDirectory("graft-cms-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .select(explode(Text.tokens($"text")).as("term"))

    val q = StreamCms.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    def cells(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Long, Long)].collect().toSeq.sorted

    val streamed = cells(StreamCms.sketch(spark, logDir))
    val batch = cells(Profiling.cmsCells(Profiling.cmsTokens(spark, dir)))
    assert(streamed === batch)
    assert(batch.nonEmpty)

    // and a probe through the streamed sketch equals the batch audit
    val truth = Profiling.cmsTokens(spark, dir)
      .groupBy($"term").agg(count(lit(1)).as("true_n"))
    val streamedEst = Profiling
      .cmsEstimates(StreamCms.sketch(spark, logDir), truth)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq.sorted
    val batchEst = Profiling
      .cmsEstimates(Profiling.cmsCells(Profiling.cmsTokens(spark, dir)), truth)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq.sorted
    assert(streamedEst === batchEst)
    assert(streamedEst.forall(_._5)) // soundness survives the stream

    // recovery replay of batch 0: additive counters -> fixed-path
    // overwrite is correctness on replay
    StreamCms.processBatch(
      docs.filter($"doc_id" % 3 === 0)
        .select(explode(Text.tokens($"text")).as("term")), 0L, logDir)
    assert(cells(StreamCms.sketch(spark, logDir)) === batch)
  }
}
