package graft

import graft.operators.Similarity
import graft.streaming.StreamIso
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming embedding-health maintainer end-to-end: embeddings replayed
  * in micro-batches, norm + per-dimension deltas folded at query time —
  * the full readout (n_vecs, dims, mean_norm, norm_cv, anisotropy) must
  * bit-match the batch q_embed_isotropy. */
class StreamIsoSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded delta logs reproduce the batch readout bit-for-bit") {
    val emb = Tables.embeddings(spark, dir)
    val logDir = Files.createTempDirectory("graft-iso-log").toString

    val srcDir = Files.createTempDirectory("graft-iso-src").toString
    for (s <- 0 until 3)
      emb.filter($"vec_id" % 3 === s)
        .select($"vec_id", $"embedding")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamIso.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamIso.report(spark, logDir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val batch = Similarity.qEmbedIsotropy.run(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(streamed === batch && batch.nonEmpty)

    // recovery replay of batch 0: fixed-path overwrite is correctness
    StreamIso.processBatch(
      emb.filter($"vec_id" % 3 === 0).select($"vec_id", $"embedding"),
      0L, logDir)
    assert(StreamIso.report(spark, logDir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq === batch)
  }
}
