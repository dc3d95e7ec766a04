package graft.streaming

import graft.multimodal.Media
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming perceptual-hash screen for MEDIA ingest — the multimodal
  * member of the durable-index screen family (StreamSimhash screens text by
  * simhash32; this screens images/audio/video by the same `ahash16`
  * signature and 4×4-bit modality-scoped banding the batch
  * q_media_phash_dedup executes, Media.phashPostings' exact shape): each
  * micro-batch of media objects probes a persisted signature index, drops
  * objects with a near-duplicate (Hamming ≤ Media.PhashHamming) in the
  * SAME modality — a re-encoded thumbnail must never suppress an audio
  * clip that happens to share a signature — and appends the survivors'
  * signatures so later batches screen against everything kept so far.
  *
  * Banding is pigeonhole-complete at the batch query's radius (any pair
  * within Hamming 3 shares an intact 4-bit band), so the screen has NO
  * false negatives vs the batch dedup at the same threshold; candidates
  * come only from shared (kind, band, bkey) buckets — per-batch cost is
  * candidates, never batch × index.
  *
  * Ordering/replay contract is StreamSimhash's: survivors land in `outDir`
  * BEFORE their signatures land in `indexDir` (at-least-once output, never
  * silent drops); self-matches are excluded by media_id so a replayed
  * object cannot suppress itself. `compactEvery` bounds index file-count
  * growth the same way.
  */
object StreamPhash {

  /** Signature-index schema (the flat append dir screenBatch probes) —
    * [[DeltaLog.emptyOr]] serves the empty index on the first batch,
    * replacing the per-module fs.exists dance. */
  private[graft] val IndexDdl =
    "old_id BIGINT,kind STRING,old_sig BIGINT"

  /** 4 rows per object carrying (band, bkey) — the batch query's banding:
    * bkey = 4 bits of `sigCol`, bucket scoped by `kind`. */
  private def withBands(df: DataFrame, sigCol: String): DataFrame =
    df.select(col("*"), explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bkey", expr(s"($sigCol >> (band * 4)) & 15"))

  /** media_ids in `sigs` (media_id, kind, ah) with a same-modality near-dup
    * in `index` (old_id, kind, old_sig). */
  private def matchedAgainst(sigs: DataFrame, index: DataFrame): DataFrame =
    withBands(sigs, "ah")
      .join(withBands(index, "old_sig"), Seq("kind", "band", "bkey"))
      .filter(col("media_id") =!= col("old_id"))
      .filter(expr(s"bit_count(ah ^ old_sig) <= ${Media.PhashHamming}"))
      .select("media_id").distinct()

  /** Pure per-batch screen: survivors of `batch` (media_id, kind, text)
    * against `index`. Within the batch the KEEP-LOWEST rule, like the text
    * screen. */
  private[streaming] def screenBatch(batch: DataFrame, index: DataFrame): DataFrame = {
    val sigs = batch.withColumn("ah", call_function("ahash16", col("text")))
    val vsIndex = matchedAgainst(sigs, index)
    val nb = withBands(sigs.select(col("media_id"), col("kind"), col("ah")), "ah")
    val intra = nb
      .join(nb.select(col("media_id").as("old_id"), col("kind"),
        col("ah").as("old_sig"), col("band"), col("bkey")),
        Seq("kind", "band", "bkey"))
      .filter(col("old_id") < col("media_id"))
      .filter(expr(s"bit_count(ah ^ old_sig) <= ${Media.PhashHamming}"))
      .select("media_id").distinct()
    sigs.join(vsIndex.union(intra).distinct(), Seq("media_id"), "left_anti")
  }

  /** Start the screen on a stream with columns (media_id: long, kind:
    * string, text: string — the payload the decode stub signs): survivors
    * append to `outDir`, their signatures to `indexDir` (old_id, kind,
    * old_sig). An existing index (e.g. the batch pipeline's) is honored. */
  def run(stream: DataFrame, indexDir: String, outDir: String,
          checkpointDir: String, compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val index = DeltaLog.emptyOr(spark, indexDir, IndexDdl)
        val kept = screenBatch(batch, index)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          kept.select(col("media_id"), col("kind"), col("text"))
            .write.mode("append").parquet(outDir)
          kept.select(col("media_id").as("old_id"), col("kind"),
            col("ah").as("old_sig"))
            .write.mode("append").parquet(indexDir)
        } finally kept.unpersist()
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1).toLong)
          Compaction.compact(spark, indexDir)
        ()
      }
      .start()
}
