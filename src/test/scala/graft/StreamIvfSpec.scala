package graft

import graft.operators.Similarity
import graft.streaming.StreamIvf
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming ANN-index maintainer end-to-end: embeddings replayed in
  * micro-batches against the FROZEN coarse codebook, the assignment +
  * probe delta logs folded at query time — the probe ranking must equal
  * q_ann_ivf and the recall audit q_ivf_recall_audit bit-for-bit on the
  * same corpus, including after a recovery replay.
  *
  * The replay/recovery leg drives the log MANUALLY (known batch-id ↔
  * slice mapping) — the file-source leg asserts only fold-level
  * equality, which is listing-order-independent here because batches
  * carry disjoint vec_ids (the StreamExactDedup replay discipline). */
class StreamIvfSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  test("maintained IVF index serves q_ann_ivf + q_ivf_recall_audit bit-equal; recovery replay") {
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val cents = StreamIvf.frozenCentroids(spark, dir)
    val pqCents = StreamIvf.frozenPqCents(spark, dir)
    val annBatch = rows(Similarity.qAnnIvf.run(spark, dir))
    val auditBatch = rows(Similarity.qIvfRecallAudit.run(spark, dir))
    val ivfpqBatch = rows(Similarity.qAnnIvfpq.run(spark, dir))
    assert(annBatch.nonEmpty && auditBatch.nonEmpty && ivfpqBatch.nonEmpty)

    // --- real stream: file source, one slice per trigger ---
    val logDir = Files.createTempDirectory("graft-ivf-log").toString
    val srcDir = Files.createTempDirectory("graft-ivf-src").toString
    for (s <- 0 until 3)
      emb.filter($"vec_id" % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = StreamIvf.run(stream, logDir, cents, pqCents,
      Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")

    assert(rows(StreamIvf.annTopk(spark, logDir)) === annBatch)
    assert(rows(StreamIvf.recallAudit(spark, logDir)) === auditBatch)
    assert(rows(StreamIvf.annTopkPq(spark, logDir, pqCents)) === ivfpqBatch)

    // cell-balance monitor: every corpus vector assigned exactly once
    val cc = StreamIvf.cellCounts(spark, logDir)
      .as[(Long, Long)].collect().toSeq
    assert(cc.map(_._2).sum === emb.count())
    assert(cc.forall(_._2 > 0) && cc.size > 1)

    // the TRAINED codebook (round 17) must be measurably flatter than
    // its first-NCells init: a Lloyd round pulls centroids toward the
    // data's actual modes, shrinking the biggest cell — the IVF failure
    // mode cellCounts exists to watch (a fat cell degrades its probes
    // toward brute force)
    val withNorm = Similarity.withNormOf(
      Tables.embeddings(spark, dir).select($"vec_id", $"embedding"))
    val initAssign = Similarity.ivfAssignOf(Similarity.ivfScored(
      withNorm, Similarity.ivfInitCentroids(withNorm)))
      .groupBy($"cell").count().as[(Long, Long)].collect().toSeq
    assert(cc.map(_._2).max < initAssign.map(_._2).max,
      s"trained max cell ${cc.map(_._2).max} not flatter than init " +
        s"${initAssign.map(_._2).max}")

    // --- manually-driven log: recovery replay with a KNOWN id↔slice
    // mapping (fixed-path overwrite is correctness) ---
    val logDir2 = Files.createTempDirectory("graft-ivf-log2").toString
    for (s <- 0 until 3)
      StreamIvf.processBatch(emb.filter($"vec_id" % 3 === s),
        s.toLong, logDir2, cents, pqCents)
    assert(rows(StreamIvf.annTopk(spark, logDir2)) === annBatch)
    StreamIvf.processBatch(emb.filter($"vec_id" % 3 === 1),
      1L, logDir2, cents, pqCents)
    assert(rows(StreamIvf.annTopk(spark, logDir2)) === annBatch)
    assert(rows(StreamIvf.recallAudit(spark, logDir2)) === auditBatch)
    assert(rows(StreamIvf.annTopkPq(spark, logDir2, pqCents)) === ivfpqBatch)
  }
}
