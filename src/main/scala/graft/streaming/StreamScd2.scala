package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming type-2 SCD maintenance via `transformWithState` — the twin of
  * the batch q_scd2_history build (graft.operators.Governance.scd2).
  *
  * One `ValueState` per user carries the OPEN version (event_type,
  * valid_from_us, event_id). Each arriving change-log row either
  *   - collapses (same type as the open version — a no-op update),
  *   - or closes the open version and opens a new one.
  *
  * Output is CDC-style upserts in Append mode: a version row is emitted
  * when it OPENS (valid_to_us = None, is_current = true) and emitted AGAIN
  * when it CLOSES (valid_to_us set, is_current = false) — the classic
  * streaming-SCD2 shape whose downstream sink upserts on the version key
  * (user_id, valid_from_us, event_id). [[reconcile]] is that upsert as a
  * batch keep-last; StreamScd2Spec replays a log in micro-batches and pins
  * reconcile(streamed output) == Governance.scd2(same rows) ROW-FOR-ROW,
  * including the still-open is_current versions.
  *
  * Ordering contract: rows are applied in (ts_us, event_id) order WITHIN a
  * batch (the input iterator's order is not engine-guaranteed); ACROSS
  * batches per-key arrival must be in event order — the standard CDC
  * ingestion assumption. A row older than the open version's valid_from
  * would need retraction, which Append-mode state cannot express; batch
  * scd2 over the raw log is the replay path for out-of-order history.
  *
  * State is O(1) per user (one open version, ~3 fields) and never expires
  * (TTLConfig.NONE — a dimension's current version must survive idle
  * periods). Requires the RocksDB state store provider, like every
  * transformWithState surface here.
  */
object StreamScd2 {

  case class Scd2In(user_id: Long, event_type: String, ts_us: Long,
      event_id: Long)
  /** One emitted version row; matches batch scd2's column set exactly. */
  case class Scd2Ver(user_id: Long, event_type: String, valid_from_us: Long,
      event_id: Long, valid_to_us: Option[Long], is_current: Boolean)
  /** The open version held in state. */
  case class OpenVer(event_type: String, valid_from_us: Long, event_id: Long)

  class Scd2Processor extends StatefulProcessor[Long, Scd2In, Scd2Ver] {
    @transient private var open: ValueState[OpenVer] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenVer]("open", Encoders.product[OpenVer],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Scd2In],
        timerValues: TimerValues): Iterator[Scd2Ver] = {
      val ordered = rows.toSeq.sortBy(r => (r.ts_us, r.event_id))
      var cur = if (open.exists()) Option(open.get()) else None
      val out = Seq.newBuilder[Scd2Ver]
      for (r <- ordered) cur match {
        case Some(c) if c.event_type == r.event_type => // no-op collapse
        case c =>
          c.foreach { o => // close the open version at the change point
            out += Scd2Ver(key, o.event_type, o.valid_from_us, o.event_id,
              Some(r.ts_us), is_current = false)
          }
          out += Scd2Ver(key, r.event_type, r.ts_us, r.event_id, None,
            is_current = true)
          cur = Some(OpenVer(r.event_type, r.ts_us, r.event_id))
      }
      cur.foreach(open.update)
      out.result().iterator
    }
  }

  /** Wire a streaming change log (user_id, event_type, ts_us, event_id)
    * into the per-user SCD2 maintainer. */
  def versions(changeLog: DataFrame): Dataset[Scd2Ver] = {
    val spark = changeLog.sparkSession
    import spark.implicits._
    changeLog
      .select($"user_id".cast("long").as("user_id"), $"event_type",
        $"ts_us".cast("long").as("ts_us"),
        $"event_id".cast("long").as("event_id"))
      .as[Scd2In]
      .groupByKey(_.user_id)
      .transformWithState(new Scd2Processor, TimeMode.None(), OutputMode.Append())
  }

  /** The downstream upsert as a batch: keep ONE row per version key, a
    * CLOSE superseding its OPEN (is_current false sorts first). Applied to
    * the accumulated CDC output this yields the current SCD2 table —
    * exactly what a MERGE-capable sink maintains incrementally. */
  def reconcile(cdc: DataFrame): DataFrame = {
    val spark = cdc.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"valid_from_us", $"event_id")
      .orderBy($"is_current".asc)
    cdc.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
  }
}
