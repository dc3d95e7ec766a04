package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment with built-in data-quality observability.
  *
  * The static dimension joins each micro-batch as a BROADCAST hash join —
  * the planner never shuffles the stream, and for file-backed dimensions
  * Spark re-reads the static side per batch, so slowly-changing dims pick
  * up updates without restarting the query. `observe()` attaches named
  * aggregate metrics (row count, unmatched-key count) to the SAME pass —
  * no second scan, metrics surfaced per batch through
  * `StreamingQueryProgress.observedMetrics` — the idiomatic replacement
  * for the reference's per-batch count()+log pattern
  * (reddit_consumer.py:300-308), which re-executed the batch to count it.
  */
object Enrich {

  val MetricsName = "enrich_metrics"

  /** Left-join `stream` to broadcast `dim` on `key`; `probe` is a
    * dim-supplied column whose null count after the join measures
    * unmatched stream keys. */
  def withDim(stream: DataFrame, dim: DataFrame, key: String,
      probe: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
      .observe(MetricsName,
        count(lit(1)).as("rows"),
        // coalesce: sum() over an EMPTY micro-batch is SQL NULL, and a
        // metrics consumer reading a count must never see null
        coalesce(sum(when(col(probe).isNull, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("unmatched"))
}
