package graft.streaming

import graft.operators.BehaviorAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming difference-in-differences maintainer — the incremental twin
  * of q_did (graft.operators.BehaviorAnalytics): the maintained relation
  * is the 4-cell (arm × pre/post) UNROUNDED decimal moments n/Σx/Σx²
  * (plain addition per batch), and the DiD estimate, SE and z derive
  * entirely from that bounded fold — the live quasi-experimental readout
  * re-derived per batch without a corpus re-scan.
  *
  * The fold rounds once through [[BehaviorAnalytics.didFinish]] (the
  * StreamWelch/StreamFdr/StreamAte discipline), so the live readout is
  * bit-equal to the batch query; StreamDidSpec pins the equality plus an
  * idempotent recovery replay.
  *
  * Idempotent recovery: fixed `cells_b<id>.parquet` path in overwrite
  * mode (the StreamDq discipline).
  */
object StreamDid {

  /** Delta-log schema as written by [[processBatch]] — pinned against
    * the writer by FreshMaintainerSpec; [[DeltaLog.emptyOr]] serves the
    * empty relation in this schema when the maintainer is fresh (no
    * batch yet), so readouts degrade to empty reports, never throw. */
  private[graft] val DeltaDdl =
    "t BIGINT,post BOOLEAN,n BIGINT,sx_d DECIMAL(38,9)" +
      ",sxx_d DECIMAL(38,9)"

  /** Append one micro-batch's cell-moment delta (≤ 4 rows). */
  def processBatch(eventsBatch: DataFrame, batchId: Long,
      logDir: String): Unit = {
    if (eventsBatch.isEmpty) return
    BehaviorAnalytics.didCellMomentsDec(eventsBatch)
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$logDir/log/cells_b$batchId.parquet")
  }

  /** Wire a streaming events DataFrame (user_id, ts_us, value) into the
    * maintainer. */
  def run(eventStream: DataFrame, logDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery =
    eventStream.writeStream
      .foreachBatch((df: DataFrame, id: Long) =>
        processBatch(df, id, logDir))
      .trigger(trigger)
      .option("checkpointLocation", s"$logDir/checkpoint")
      .start()

  /** The live DiD readout from the cell-moment log alone. */
  def report(spark: SparkSession, logDir: String): DataFrame =
    BehaviorAnalytics.didReport(
      BehaviorAnalytics.didFinish(
        DeltaLog.emptyOr(spark, s"$logDir/log", DeltaDdl)
          .groupBy(col("t"), col("post"))
          .agg(sum(col("n")).as("n"),
            sum(col("sx_d")).as("sx_d"), sum(col("sxx_d")).as("sxx_d"))))
}
