package graft

import graft.streaming._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Composite ingest end-to-end: ONE replayed document stream advances all
  * six corpus-level maintainers per batch; every readout must equal its
  * batch twin bit-for-bit on the same corpus — the six logs advance
  * together, none is starved or double-fed. Since round 16 the hub
  * derives the four token-based deltas from ONE shared token relation
  * (tokenize-once), so these asserts are also the parity net for that
  * rewrite, plus delta-schema pins against each module's DeltaDdl. */
class IngestHubSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  private def norm(ddl: String): String = ddl.replace(", ", ",")
  private def writtenDdl(dir: String): String =
    norm(spark.read.option("recursiveFileLookup", "true").parquet(dir)
      .schema.toDDL)

  test("one stream advances all six maintainers; every readout bit-equal") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val base = Files.createTempDirectory("graft-hub").toString
    val srcDir = Files.createTempDirectory("graft-hub-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .select($"doc_id", $"text", $"lang", $"source")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = IngestHub.run(stream, base, Trigger.AvailableNow())
    assert(q.awaitTermination(180000), "hub did not terminate")

    assert(rows(StreamVocab.zipf(spark, s"$base/vocab"))
      === rows(graft.operators.LexicalStats.qZipfFit.run(spark, dir)))
    assert(rows(StreamExactDedup.registry(spark, s"$base/exactdedup"))
      === rows(graft.operators.Dedup.qDedupExact.run(spark, dir)))
    assert(rows(StreamIndex.bm25(spark, s"$base/index"))
      === rows(graft.operators.Retrieval.qBm25Scores.run(spark, dir)))
    assert(rows(StreamAblate.report(spark, s"$base/ablate"))
      === rows(graft.operators.CorpusQuality.qFilterAblation
        .run(spark, dir)))
    assert(rows(StreamMix.report(spark, s"$base/mix"))
      === rows(graft.operators.LexicalStats.qMixRebalance.run(spark, dir)))
    assert(rows(StreamPref.pairs(spark, s"$base/pref"))
      === rows(graft.operators.PipelineOps.qPreferencePairs
        .run(spark, dir)))

    // the hub-written deltas carry each module's exact declared schema
    // (a tokenize-once drift in a column name/type fails HERE, not at a
    // later fold)
    assert(writtenDdl(s"$base/vocab/log") === norm(StreamVocab.DeltaDdl))
    assert(writtenDdl(s"$base/exactdedup/log")
      === norm(StreamExactDedup.DeltaDdl))
    assert(writtenDdl(s"$base/index/postings")
      === norm(StreamIndex.PostingsDdl))
    assert(writtenDdl(s"$base/index/stats") === norm(StreamIndex.StatsDdl))
    assert(writtenDdl(s"$base/ablate/counts")
      === norm(StreamAblate.CountsDdl))
    assert(writtenDdl(s"$base/ablate/docs") === norm(StreamAblate.DocsDdl))
    assert(writtenDdl(s"$base/mix/log") === norm(StreamMix.DeltaDdl))
    assert(writtenDdl(s"$base/pref/log") === norm(StreamPref.DeltaDdl))
  }
}
