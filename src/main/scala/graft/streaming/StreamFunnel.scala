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
  * additive delta (stage, +1, entry lag) — no upsert machinery needed,
  * unlike StreamScd2 — and ONE delta log serves TWO batch-bit-equal
  * readouts (the StreamDaily/StreamXent one-state-many-readouts
  * discipline): the q_event_funnel conversion counts (fold n by stage
  * through the shared `funnelReport`) AND the q_funnel_lag
  * time-to-convert percentiles (the carried d_us values are EXACTLY the
  * batch t2−t1 / t3−t2 multiset, fed to the shared `funnelLagReport`).
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
  /** One stage entry: `d_us` is the entry lag (t_k − t_{k−1}) for stages
    * 2/3, None for stage 1 — the per-user values whose multiset the lag
    * readout percentiles. */
  case class FnDelta(stage: Int, n: Long, d_us: Option[Long])

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
      val out = scala.collection.mutable.ListBuffer.empty[FnDelta]
      ordered.foreach { r =>
        if (r.event_type == stages(0) && s.t1.isEmpty) {
          s = s.copy(t1 = Some(r.ts_us))
          out += FnDelta(1, 1L, None)
        } else if (r.event_type == stages(1) && s.t2.isEmpty &&
            s.t1.exists(r.ts_us > _)) {
          out += FnDelta(2, 1L, Some(r.ts_us - s.t1.get))
          s = s.copy(t2 = Some(r.ts_us))
        } else if (r.event_type == stages(2) && s.t3.isEmpty &&
            s.t2.exists(r.ts_us > _)) {
          out += FnDelta(3, 1L, Some(r.ts_us - s.t2.get))
          s = s.copy(t3 = Some(r.ts_us))
        }
      }
      st.update(s)
      out.iterator
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

  /** Second readout over the SAME delta log: time-to-convert percentiles
    * — the carried entry lags are exactly the batch t2−t1 / t3−t2
    * multiset, so this is q_funnel_lag bit-equal (funnel stage k entry =
    * lag transition k−1). */
  def lagReport(deltaLog: DataFrame): DataFrame = {
    val spark = deltaLog.sparkSession
    import spark.implicits._
    graft.operators.BehaviorAnalytics.funnelLagReport(
      deltaLog.filter($"stage" >= 2)
        .select(($"stage" - 1).as("stage"), $"d_us".as("d")))
  }
}
