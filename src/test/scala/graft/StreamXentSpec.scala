package graft

import graft.operators.LexicalStats
import graft.streaming.StreamXent
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming lexical-LM count maintainer end-to-end: documents replayed in
  * micro-batches, the (lang, term) split-count delta log folded at query
  * time — the fold must equal the batch xentTf relation EXACTLY (integer
  * counters), and both readouts (held-out xent, scaling ladder) must
  * bit-match their batch queries, including after a recovery replay. */
class StreamXentSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded counts equal batch xentTf; both readouts bit-match") {
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-xent-log").toString

    // replay documents as 3 disjoint slices — split membership is decided
    // per-document by the salted hash inside the shared relation, so the
    // slicing is orthogonal to the bucket ladder
    val srcDir = Files.createTempDirectory("graft-xent-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .select($"doc_id", $"lang", $"text")

    val q = StreamXent.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")

    def counts(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Long, Long, Long, Long, Long)]
        .collect().toSeq.sorted
    val batchTf = LexicalStats.xentTf(docs)
    assert(counts(StreamXent.tf(spark, logDir)) === counts(batchTf))
    assert(counts(batchTf).nonEmpty)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq)
    val heldBatch = rows(LexicalStats.qHeldoutXent.run(spark, dir))
    val ladderBatch = rows(LexicalStats.qScalingLaw.run(spark, dir))
    assert(rows(StreamXent.heldout(spark, logDir)) === heldBatch)
    assert(rows(StreamXent.scaling(spark, logDir)) === ladderBatch)

    // recovery replay of batch 0: additive counters -> fixed-path
    // overwrite is correctness on replay, both readouts unchanged
    StreamXent.processBatch(
      docs.filter($"doc_id" % 3 === 0).select($"doc_id", $"lang", $"text"),
      0L, logDir)
    assert(counts(StreamXent.tf(spark, logDir)) === counts(batchTf))
    assert(rows(StreamXent.heldout(spark, logDir)) === heldBatch)
    assert(rows(StreamXent.scaling(spark, logDir)) === ladderBatch)
  }

  test("fresh maintainer (no log dir yet) yields empty readouts, not errors") {
    // before any micro-batch appends (or when every batch was empty and
    // skipped), the log directory does not exist — tf must return the
    // empty relation in the delta schema and both readouts degrade to
    // empty reports instead of throwing AnalysisException
    val logDir = Files.createTempDirectory("graft-xent-fresh").toString
    val tf = StreamXent.tf(spark, logDir)
    assert(tf.columns.toSeq ===
      Seq("lang", "term", "ctf1", "ctf2", "ctf4", "ctf8", "vtf"))
    assert(tf.count() === 0)
    assert(StreamXent.heldout(spark, logDir).count() === 0)
    assert(StreamXent.scaling(spark, logDir).count() === 0)
  }
}
