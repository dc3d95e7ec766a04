package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming conversion-funnel maintainer — the `transformWithState` twin
  * of q_event_funnel (graft.operators.BehaviorAnalytics): the batch query
  * chains three per-user min-time joins over the whole log; a stream only
  * needs each user's funnel clock — the (t1, t2, t3) stage-entry times,
  * O(1) ValueState per user — to recognize stage entries as they happen.
  *
  * Under the ts-ordered per-key arrival contract the state machine is
  * EXACTLY the batch semantics: the first stage-1 event a user shows is
  * their min-t1; the first stage-2 event with ts STRICTLY after the
  * now-final t1 is min-t2 (no earlier-ts event can still arrive); same
  * for t3. Each t_k is set at most once, so a stage entry is a ONE-SHOT
  * additive delta (stage, +1) — no upsert machinery needed, unlike
  * StreamScd2: the all-time funnel is one (stage) sum over the
  * O(batches · 3)-bounded delta log fed to the SAME shared
  * `funnelReport` readout the batch query runs.
  *
  * Ordering contract: rows are applied in (ts_us, event_id) order within
  * a batch; across batches per-key arrival must be in event order (the
  * StreamMarkov/StreamScd2 CDC assumption). Ties: a stage-k event at
  * ts EQUAL to t_{k-1} does not qualify (the batch rule is strict >).
  */
object StreamFunnel {

  case class FnIn(user_id: Long, event_type: String, ts_us: Long,
      event_id: Long)
  /** The user's funnel clock; None = stage not reached. Options (not a
    * sentinel) because event times may legitimately be negative
    * (pre-epoch timestamps exist in the test corpus). */
  case class FnState(t1: Option[Long], t2: Option[Long], t3: Option[Long])
  case class FnDelta(stage: Int, n: Long)

  class FunnelProcessor extends StatefulProcessor[Long, FnIn, FnDelta] {
    @transient private var st: ValueState[FnState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FnState]("funnel",
        Encoders.product[FnState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FnIn],
        timerValues: TimerValues): Iterator[FnDelta] = {
      val stages = graft.operators.BehaviorAnalytics.FunnelStages
      val ordered = rows.toSeq.sortBy(r => (r.ts_us, r.event_id))
      var s = if (st.exists()) st.get() else FnState(None, None, None)
      val deltas = scala.collection.mutable.Map.empty[Int, Long]
      ordered.foreach { r =>
        if (r.event_type == stages(0) && s.t1.isEmpty) {
          s = s.copy(t1 = Some(r.ts_us))
          deltas(1) = deltas.getOrElse(1, 0L) + 1L
        } else if (r.event_type == stages(1) && s.t2.isEmpty &&
            s.t1.exists(r.ts_us > _)) {
          s = s.copy(t2 = Some(r.ts_us))
          deltas(2) = deltas.getOrElse(2, 0L) + 1L
        } else if (r.event_type == stages(2) && s.t3.isEmpty &&
            s.t2.exists(r.ts_us > _)) {
          s = s.copy(t3 = Some(r.ts_us))
          deltas(3) = deltas.getOrElse(3, 0L) + 1L
        }
      }
      st.update(s)
      deltas.toSeq.sortBy(_._1)
        .iterator.map { case (stage, n) => FnDelta(stage, n) }
    }
  }

  /** Wire a streaming events DataFrame (user_id, event_type, ts_us,
    * event_id) into the per-user funnel clock. */
  def stages(events: DataFrame): Dataset[FnDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".cast("long").as("user_id"), $"event_type",
        $"ts_us".cast("long").as("ts_us"),
        $"event_id".cast("long").as("event_id"))
      .as[FnIn]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** All-time funnel from the emitted delta log: fold the additive stage
    * counts, then the shared batch readout. Runs on the delta log only —
    * never the raw stream. */
  def report(deltaLog: DataFrame): DataFrame = {
    val spark = deltaLog.sparkSession
    import spark.implicits._
    graft.operators.BehaviorAnalytics.funnelReport(
      deltaLog.groupBy($"stage").agg(sum($"n").as("n_users")))
  }
}
