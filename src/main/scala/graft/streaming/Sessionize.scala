package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state (SURVEY.md §7 extension —
  * the stateful-op slot reserved beyond the reference's per-batch-stateless
  * model): gap > `gapUs` between a user's consecutive events closes a
  * session.
  *
  * Semantics are the streaming twin of the batch `q_sessionize` query
  * (graft.operators.EventAnalytics), with the emission rule that makes the
  * parity REAL under late arrivals: a session is emitted only once the
  * WATERMARK has passed its end + gap — before that, a late-but-in-
  * watermark event could still extend it or merge into it, and emitting
  * early would split one batch session into several streamed ones
  * (round-11 review catch: the earlier version emitted gap-closed sessions
  * immediately, so a late event adjacent to an already-emitted session
  * produced sessions the batch query never reports). State therefore holds
  * ALL not-yet-final sessions of a user (the open one plus any pending
  * earlier ones), and the event-time timer is armed at the EARLIEST
  * pending end + gap. `closed_by` reports "gap" when a later session of
  * the same user exists at emission time (the batch query's
  * followed-by-another case) and "timeout" for a trailing session flushed
  * with no successor.
  *
  * State is per-user and O(pending sessions) — pending sessions are
  * bounded by the watermark delay over the gap (a session older than the
  * delay is final by definition), so at 100 TB state scales with |active
  * users| × ⌈delay/gap⌉, not |events|; the shuffle is the single
  * groupByKey(user_id) exchange any keyed-state operator needs.
  */
object Sessionize {

  /** `ts` carries the watermark tag through to the stateful operator (a
    * typed map would reserialize and lose it); the logic uses `ts_us`. */
  final case class Ev(user_id: Long, ts_us: Long, event_id: Long,
                      ts: java.sql.Timestamp = null)
  final case class SessionState(startUs: Long, lastUs: Long, n: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long, closed_by: String)

  def update(gapUs: Long)(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[Seq[SessionState]]): Iterator[Session] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000
    // a session is FINAL once the watermark passed its end + gap: no
    // in-watermark event can extend or merge it any more
    def split(ss: Seq[SessionState]): (Seq[Session], Seq[SessionState]) = {
      val (fin, rest) = ss.partition(_.lastUs + gapUs <= wmUs)
      val out = fin.sortBy(_.startUs).map { s =>
        val followed = ss.exists(_.startUs > s.lastUs)
        Session(userId, s.startUs, s.lastUs, s.n,
          if (followed) "gap" else "timeout")
      }
      (out, rest.sortBy(s => (s.startUs, s.lastUs)))
    }
    // re-arm at the EARLIEST pending flush point; ceiling division
    // (micros → millis) so the timer can never fire early, and a timer
    // must sit strictly beyond the current watermark
    def arm(rest: Seq[SessionState]): Unit =
      state.setTimeoutTimestamp(
        math.max((rest.map(_.lastUs).min + gapUs + 999) / 1000,
          state.getCurrentWatermarkMs() + 1))
    def emit(ss: Seq[SessionState]): Iterator[Session] = {
      val (out, rest) = split(ss)
      if (rest.isEmpty) state.remove()
      else { state.update(rest); arm(rest) }
      out.iterator
    }

    if (state.hasTimedOut)
      return emit(state.getOption.getOrElse(Seq.empty))

    // Split THIS batch's (sorted) events into gap-sessions with the exact
    // batch rule, then merge the pending state sessions into that timeline
    // at their sorted positions — adjacent sessions within the gap
    // coalesce (min start / max last / summed counts). This keeps batch
    // parity for any IN-WATERMARK reordering across micro-batches: a late
    // event can extend a pending session backwards, sit inside it, or
    // form its own earlier session.
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    val batchSessions = sorted.foldLeft(List.empty[SessionState]) { (acc, e) =>
      acc match {
        case h :: t if e.ts_us - h.lastUs <= gapUs =>
          SessionState(h.startUs, math.max(h.lastUs, e.ts_us), h.n + 1) :: t
        case _ => SessionState(e.ts_us, e.ts_us, 1) :: acc
      }
    }.reverse
    val timeline = (state.getOption.getOrElse(Seq.empty) ++ batchSessions)
      .sortBy(s => (s.startUs, s.lastUs))
    val merged = timeline.foldLeft(List.empty[SessionState]) { (acc, s) =>
      acc match {
        case h :: t if s.startUs - h.lastUs <= gapUs =>
          SessionState(h.startUs, math.max(h.lastUs, s.lastUs), h.n + s.n) :: t
        case _ => s :: acc
      }
    }.reverse
    if (merged.isEmpty) return Iterator.empty
    emit(merged)
  }

  /** Wire a streaming events DataFrame (ts TimestampType, user_id, event_id)
    * into gap-sessionization. Watermark bounds state and drives timeouts. */
  def sessions(events: DataFrame, gapUs: Long,
               watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".cast("long").as("user_id"),
        unix_micros($"ts").as("ts_us"),
        $"event_id".cast("long").as("event_id"), $"ts")
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapUs))
  }
}
