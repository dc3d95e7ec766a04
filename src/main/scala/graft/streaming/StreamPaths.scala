package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming within-session trigram-path maintainer — the
  * `transformWithState` twin of q_session_paths
  * (graft.operators.EventAnalytics): the batch query assigns gap-sessions
  * with a lag window and reads consecutive event-type triples with two
  * lead frames over the whole log; a stream only needs each user's LAST
  * TWO session events plus the gap clock — O(1) ValueState per user — to
  * emit the same trigrams as they complete.
  *
  * This is the first maintained twin whose per-key state is SESSION-aware
  * (the Sessionize gap rule folded into the StreamMarkov last-event
  * pattern): a gap > SessionGapUs between consecutive events resets the
  * chain, so a trigram is emitted exactly when THREE consecutive events
  * each arrive within the gap of their predecessor — precisely the batch
  * window's "three consecutive rows of one (user, sess_seq)" condition.
  *
  * Emission is per-user per-batch trigram-count DELTAS (additive), so the
  * all-time path profile is one (step1, step2, step3) sum over the
  * O(batches · |types|³)-bounded delta log fed to the SAME shared
  * `sessionPathsReport` readout the batch query runs — the two surfaces
  * cannot drift (the StreamMarkov/StreamDq additive-counter discipline).
  *
  * Ordering contract: rows are applied in (ts_us, event_id) order within
  * a batch; across batches per-key arrival must be in event order (the
  * StreamScd2/StreamMarkov CDC assumption). State never expires on its
  * own — the gap CLOCK, not a state timeout, decides whether the next
  * event extends or resets the chain, so an idle user's chain resets
  * naturally when their next event arrives beyond the gap.
  */
object StreamPaths {

  case class PsIn(user_id: Long, event_type: String, ts_us: Long,
      event_id: Long)
  /** Last session event's clock + up to the last TWO event types of the
    * user's open session (`prev2` null while the session holds only one
    * event — exactly the state a completed-trigram detector needs). */
  case class PsState(ts_us: Long, prev2: String, prev1: String)
  case class PsDelta(step1: String, step2: String, step3: String, n: Long)

  class PathsProcessor extends StatefulProcessor[Long, PsIn, PsDelta] {
    @transient private var st: ValueState[PsState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[PsState]("sess",
        Encoders.product[PsState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[PsIn],
        timerValues: TimerValues): Iterator[PsDelta] = {
      val gap = graft.operators.EventAnalytics.SessionGapUs
      val ordered = rows.toSeq.sortBy(r => (r.ts_us, r.event_id))
      val deltas =
        scala.collection.mutable.Map.empty[(String, String, String), Long]
      var s = if (st.exists()) Option(st.get()) else None
      ordered.foreach { r =>
        s match {
          case Some(p) if r.ts_us - p.ts_us <= gap =>
            if (p.prev2 != null) {
              val k = (p.prev2, p.prev1, r.event_type)
              deltas(k) = deltas.getOrElse(k, 0L) + 1L
            }
            s = Some(PsState(r.ts_us, p.prev1, r.event_type))
          case _ => // first event ever, or gap exceeded: new session
            s = Some(PsState(r.ts_us, null, r.event_type))
        }
      }
      s.foreach(st.update)
      deltas.toSeq.sortBy(_._1)
        .iterator.map { case ((a, b, c), n) => PsDelta(a, b, c, n) }
    }
  }

  /** Wire a streaming events DataFrame (user_id, event_type, ts_us,
    * event_id) into the per-user trigram detector. */
  def trigrams(events: DataFrame): Dataset[PsDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".cast("long").as("user_id"), $"event_type",
        $"ts_us".cast("long").as("ts_us"),
        $"event_id".cast("long").as("event_id"))
      .as[PsIn]
      .groupByKey(_.user_id)
      .transformWithState(new PathsProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** All-time top-10 path profile from the emitted delta log: fold the
    * additive counts, then the shared batch readout. Runs on the delta
    * log only — never the raw stream. */
  def report(deltaLog: DataFrame): DataFrame = {
    val spark = deltaLog.sparkSession
    import spark.implicits._
    graft.operators.EventAnalytics.sessionPathsReport(
      deltaLog.groupBy($"step1", $"step2", $"step3")
        .agg(sum($"n").as("n")))
  }
}
