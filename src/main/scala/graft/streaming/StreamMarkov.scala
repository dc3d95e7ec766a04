package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming Markov transition maintainer — the `transformWithState` twin
  * of q_markov_transitions (graft.operators.BehaviorAnalytics): the batch
  * query detects per-user transitions with a lag window over the whole
  * log; a stream only needs each user's LAST event — O(1) ValueState per
  * user — to emit the same (prev → next) pairs as they happen.
  *
  * Emission is per-user per-batch transition-count DELTAS, not per-event
  * rows: deltas are additive, so the all-time transition matrix is one
  * (prev, next) sum over the O(batches · types²)-bounded delta log, fed
  * to the SAME shared `markovReport` normalization the batch query runs
  * (the StreamDq additive-counter discipline — the two surfaces cannot
  * drift).
  *
  * Ordering contract: rows are applied in (ts_us, event_id) order within
  * a batch; across batches per-key arrival must be in event order (the
  * StreamScd2 CDC assumption). State never expires — a user's chain
  * resumes, not resets, after idle periods.
  */
object StreamMarkov {

  case class MkIn(user_id: Long, event_type: String, ts_us: Long,
      event_id: Long)
  /** The user's last-seen event (the only state a transition needs). */
  case class MkState(ts_us: Long, event_id: Long, event_type: String)
  case class MkDelta(prev_type: String, next_type: String, n: Long)

  class MarkovProcessor extends StatefulProcessor[Long, MkIn, MkDelta] {
    @transient private var st: ValueState[MkState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MkState]("last",
        Encoders.product[MkState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[MkIn],
        timerValues: TimerValues): Iterator[MkDelta] = {
      val ordered = rows.toSeq.sortBy(r => (r.ts_us, r.event_id))
      val deltas = scala.collection.mutable.Map.empty[(String, String), Long]
      var last = if (st.exists()) Some(st.get()) else None
      ordered.foreach { r =>
        last.foreach { p =>
          val k = (p.event_type, r.event_type)
          deltas(k) = deltas.getOrElse(k, 0L) + 1L
        }
        last = Some(MkState(r.ts_us, r.event_id, r.event_type))
      }
      last.foreach(st.update)
      deltas.toSeq.sortBy(_._1)
        .iterator.map { case ((a, b), n) => MkDelta(a, b, n) }
    }
  }

  /** Wire a streaming events DataFrame (user_id, event_type, ts_us,
    * event_id) into the per-user transition detector. */
  def transitions(events: DataFrame): Dataset[MkDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".cast("long").as("user_id"), $"event_type",
        $"ts_us".cast("long").as("ts_us"),
        $"event_id".cast("long").as("event_id"))
      .as[MkIn]
      .groupByKey(_.user_id)
      .transformWithState(new MarkovProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** All-time transition matrix from the emitted delta log: fold the
    * additive counts, then the shared batch normalization. Runs on the
    * delta log only — never the raw stream. */
  def report(deltaLog: DataFrame): DataFrame = {
    val spark = deltaLog.sparkSession
    import spark.implicits._
    graft.operators.BehaviorAnalytics.markovReport(
      deltaLog.groupBy($"prev_type", $"next_type")
        .agg(sum($"n").as("n")))
  }
}
