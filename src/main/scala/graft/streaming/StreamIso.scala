package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming embedding-health maintainer — the incremental twin of
  * q_embed_isotropy (graft.operators.Similarity): a maintained
  * SPACE-COLLAPSE monitor. Both partials are additive — the norm moments
  * (1 row of exact decimals) and the per-dimension vector sums (d rows) —
  * so each micro-batch appends a (1+d)-row delta and the live readout
  * folds the log and re-runs the shared report, bit-equal to the batch
  * query. A retrieval platform runs exactly this against its embedding
  * ingest to catch model regressions (norm drift, rising anisotropy) as
  * they stream in, without ever rescanning the corpus.
  *
  * Idempotent recovery: fixed `*_b<id>.parquet` paths in overwrite mode
  * (the StreamDq discipline).
  */
object StreamIso {

  /** Delta-log schemas as written by [[processBatch]] (norm moments and
    * per-dimension sums) — pinned against the writer by
    * FreshMaintainerSpec; [[DeltaLog.emptyOr]] serves the empty relation
    * in these schemas when the maintainer is fresh (no batch yet), so the
    * readout degrades to an empty report, never throws. */
  private[graft] val NormsDdl =
    "n BIGINT,sn_d DECIMAL(38,9),sn2_d DECIMAL(38,9)"
  private[graft] val PosDdl = "pos INT,cnt BIGINT,sv_d DECIMAL(38,12)"

  /** Append one micro-batch's norm-moment + per-dimension deltas. */
  def processBatch(embBatch: DataFrame, batchId: Long, logDir: String): Unit = {
    if (embBatch.isEmpty) return
    Similarity.isoNormsDec(embBatch)
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$logDir/norms/b$batchId.parquet")
    Similarity.isoPosDec(embBatch)
      .coalesce(1) // d rows
      .write.mode("overwrite")
      .parquet(s"$logDir/pos/b$batchId.parquet")
  }

  /** Wire a streaming embeddings DataFrame (vec_id, embedding) into the
    * maintainer. */
  def run(embStream: DataFrame, logDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery =
    embStream.writeStream
      .foreachBatch((df: DataFrame, id: Long) =>
        processBatch(df, id, logDir))
      .trigger(trigger)
      .option("checkpointLocation", s"$logDir/checkpoint")
      .start()

  /** The live readout from the delta logs alone: exact decimal folds,
    * then the shared report. */
  def report(spark: SparkSession, logDir: String): DataFrame = {
    val norms = DeltaLog.emptyOr(spark, s"$logDir/norms", NormsDdl)
      .agg(sum(col("n")).as("n"),
        sum(col("sn_d")).as("sn_d"), sum(col("sn2_d")).as("sn2_d"))
    val pos = DeltaLog.emptyOr(spark, s"$logDir/pos", PosDdl)
      .groupBy(col("pos"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sv_d")).as("sv_d"))
    Similarity.isoReport(norms, pos)
  }
}
