package graft

import graft.operators.Governance
import graft.streaming.StreamKanon
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming k-anonymity end-to-end: documents replayed in micro-batches,
  * class log folded at query time — must equal the batch q_k_anonymity
  * audit row-for-row (counts are additive; the HLL source sketches are
  * exact at per-class cardinalities, so l_diversity matches the batch
  * countDistinct exactly). A source seen in MULTIPLE batches must count
  * once — the case additive counters would get wrong. */
class StreamKanonSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed class-log audit equals the batch q_k_anonymity") {
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-kanon-log").toString

    // replay as 3 disjoint files -> 3 micro-batches; doc_id % 3 slicing
    // guarantees most (lang, bucket, source) combinations span batches,
    // exercising the sketch-union (not just additive) path
    val srcDir = Files.createTempDirectory("graft-kanon-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamKanon.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamKanon.report(spark, logDir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    val batch = Governance.qKAnonymity.run(spark, dir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(streamed === batch)
    assert(batch.nonEmpty)

    // cross-batch distinct proof: at least one class's l_diversity is
    // below the naive per-batch sum (sources repeated across batches)
    val naiveSum = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$logDir/log")
      .groupBy($"lang", $"chars_bucket")
      .agg(sum(hll_sketch_estimate($"sk")).as("summed"))
    val joined = naiveSum.join(
      StreamKanon.report(spark, logDir), Seq("lang", "chars_bucket"))
      .filter($"summed" > $"l_diversity")
    assert(joined.count() > 0,
      "expected some class whose sources span batches (union < sum)")

    // recovery replay of batch 2: the additive count half makes the sweep
    // correctness, not hygiene
    StreamKanon.processBatch(docs.filter($"doc_id" % 3 === 2), 2L, logDir)
    val replayed = StreamKanon.report(spark, logDir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(replayed === batch)
  }
}
