package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming EWMA via Spark 4's `transformWithState` — the arbitrary-state
  * API that succeeds `flatMapGroupsWithState` (typed per-key state handles,
  * composable column families, optional TTL). One `ValueState[Double]` per
  * event type carries the running average across micro-batches:
  *
  *   s ← (v + s) / 2        (α = 1/2 — the same half-life-one decay as the
  *                           batch q_ewma_metric, as the exact recursion
  *                           rather than its trailing-8 truncation)
  *
  * Within a batch, rows are applied in (ts_us, event_id) order — the input
  * iterator's order is not guaranteed by the engine. State is O(1) per key
  * (one double), the minimal footprint any smoothing needs, and never
  * expires (TTLConfig.NONE): a dashboard series should resume, not reset,
  * after an idle period.
  *
  * Requires the RocksDB state store provider (`transformWithState` needs
  * multi-column-family support):
  * `spark.sql.streaming.stateStore.providerClass=
  *  ...state.RocksDBStateStoreProvider`.
  *
  * (The reference's streaming layer is per-batch stateless — SURVEY.md
  * §2.11; this pins the newest stateful primitive a production topology
  * would adopt today, alongside the `flatMapGroupsWithState` sessionizer.)
  */
object StreamSmooth {

  case class SmoothIn(event_type: String, ts_us: Long, event_id: Long,
      value: Double)
  case class SmoothOut(event_type: String, ts_us: Long, event_id: Long,
      value: Double, ewma: Double)

  class EwmaProcessor extends StatefulProcessor[String, SmoothIn, SmoothOut] {
    @transient private var state: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Double]("ewma", Encoders.scalaDouble,
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SmoothIn],
        timerValues: TimerValues): Iterator[SmoothOut] = {
      val ordered = rows.toSeq.sortBy(r => (r.ts_us, r.event_id))
      var have = state.exists()
      var s = if (have) state.get() else 0.0
      val out = ordered.map { r =>
        s = if (have) (r.value + s) / 2 else r.value
        have = true
        SmoothOut(r.event_type, r.ts_us, r.event_id, r.value, s)
      }
      if (have) state.update(s)
      out.iterator
    }
  }

  /** Wire a streaming events DataFrame (event_type, ts TimestampType,
    * event_id, value) into the per-type EWMA. */
  def smoothed(events: DataFrame): Dataset[SmoothOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"event_type", unix_micros($"ts").as("ts_us"),
        $"event_id".cast("long").as("event_id"), $"value".cast("double").as("value"))
      .as[SmoothIn]
      .groupByKey(_.event_type)
      .transformWithState(new EwmaProcessor, TimeMode.None(), OutputMode.Append())
  }
}
