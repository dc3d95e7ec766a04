package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Composite document-ingest pipeline: ONE micro-batch stream feeding
  * every corpus-level maintainer — the production deployment shape (a
  * crawler lands one batch; the vocabulary spectrum, exact-dedup
  * registry, retrieval index, filter-ablation table, mixture weights,
  * and preference pairs must all advance together, not as six separate
  * re-reads of the batch).
  *
  * Each maintainer keeps its own delta log under `baseDir/<name>`, so
  * every readout stays bit-equal to its batch twin independently
  * (IngestHubSpec pins all six after one replayed stream). The batch
  * DataFrame is persisted across the six reducers — each one re-derives
  * only its own projection from the cached batch instead of re-reading
  * the source. (Tokenize-once across reducers is the next step at 100 TB
  * — the reducers' token conventions differ deliberately: the index is
  * stopword-free, the vocabulary spectrum is not — so a shared token
  * relation needs per-reducer filtering, not a shared aggregate.)
  *
  * Recovery: every underlying maintainer uses fixed per-batch paths in
  * overwrite mode, so a replayed foreachBatch re-lands every log
  * idempotently (their shared StreamDq discipline).
  */
object IngestHub {

  /** Advance every maintained log by one batch. Batches carry
    * (doc_id, text, lang, source). */
  def processBatch(docsBatch: DataFrame, batchId: Long,
      baseDir: String): Unit = {
    if (docsBatch.isEmpty) return
    val batch = docsBatch
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dt = batch.select("doc_id", "text")
      StreamVocab.processBatch(dt, batchId, s"$baseDir/vocab")
      StreamExactDedup.processBatch(dt, batchId, s"$baseDir/exactdedup")
      StreamIndex.processBatch(dt, batchId, s"$baseDir/index")
      StreamAblate.processBatch(dt, batchId, s"$baseDir/ablate")
      StreamMix.processBatch(batch.select("doc_id", "text", "source"),
        batchId, s"$baseDir/mix")
      StreamPref.processBatch(
        batch.select("doc_id", "text", "lang", "source"),
        batchId, s"$baseDir/pref")
    } finally batch.unpersist()
  }

  /** Wire a streaming documents DataFrame (doc_id, text, lang, source)
    * into all six maintainers. */
  def run(docStream: DataFrame, baseDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery =
    docStream.writeStream
      .foreachBatch((df: DataFrame, id: Long) =>
        processBatch(df, id, baseDir))
      .trigger(trigger)
      .option("checkpointLocation", s"$baseDir/checkpoint")
      .start()
}
