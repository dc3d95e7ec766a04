package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication for an ingest pipeline — the streaming twin of the
  * batch dedup family (graft.operators.Dedup): a training-data feed re-sends
  * documents (producer retries, at-least-once sources), and the ingest layer
  * must drop repeats without holding unbounded state.
  *
  * Both variants use `dropDuplicatesWithinWatermark`: the dedup state for a
  * key is dropped once the watermark passes its event time + delay, so
  * executor memory is bounded by the unique keys per watermark horizon —
  * |keys/hour| — not by the lifetime of the stream (plain `dropDuplicates`
  * on a stream grows state forever; at 100 TB/day that is the difference
  * between a working ingest and an OOM). The single shuffle is the exchange
  * on the dedup key that any keyed-state operator needs.
  */
object StreamDedup {

  /** Drop repeats of the key columns arriving within the watermark horizon. */
  def byKey(stream: DataFrame, tsCol: String, delay: String,
            keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Content-hash dedup: repeats are detected by an md5 fingerprint of the
    * payload column (the streaming analog of q_dedup_exact), so re-sent
    * documents dedup even when their surrogate ids differ. */
  def byContent(stream: DataFrame, tsCol: String, delay: String,
                payload: String): DataFrame =
    stream.withColumn("_fp", md5(col(payload)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Seq("_fp"))
      .drop("_fp")
}
