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
  * (graft.operators.EventAnalytics): a session emitted with closedBy="gap"
  * here has exactly the (user_id, start_us, end_us, n_events) of a batch
  * session that is followed by another session of the same user; the
  * still-open trailing session lives in state and is flushed by event-time
  * timeout ("timeout") once the watermark passes end_us + gapUs.
  *
  * State is per-user and O(1) (start, last, count) — at 100 TB this scales
  * with |active users|, not |events|; the shuffle is the single
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
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(Session(userId, s.startUs, s.lastUs, s.n, "timeout"))
    }
    // Split THIS batch's (sorted) events into gap-sessions with the exact
    // batch rule, then merge the open state session into that timeline at
    // its sorted position — adjacent sessions within the gap coalesce
    // (min start / max last / summed counts). This keeps batch parity for
    // any IN-WATERMARK reordering across micro-batches: a late event can
    // extend the open session backwards, sit inside it, or form its own
    // earlier gap-closed session — a naive "ts - last <= gap ⇒ last := ts"
    // update instead REGRESSES lastUs and emits inverted sessions.
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    val batchSessions = sorted.foldLeft(List.empty[SessionState]) { (acc, e) =>
      acc match {
        case h :: t if e.ts_us - h.lastUs <= gapUs =>
          SessionState(h.startUs, math.max(h.lastUs, e.ts_us), h.n + 1) :: t
        case _ => SessionState(e.ts_us, e.ts_us, 1) :: acc
      }
    }.reverse
    val timeline = (state.getOption.toList ++ batchSessions)
      .sortBy(s => (s.startUs, s.lastUs))
    val merged = timeline.foldLeft(List.empty[SessionState]) { (acc, s) =>
      acc match {
        case h :: t if s.startUs - h.lastUs <= gapUs =>
          SessionState(h.startUs, math.max(h.lastUs, s.lastUs), h.n + s.n) :: t
        case _ => s :: acc
      }
    }.reverse
    if (merged.isEmpty) return Iterator.empty
    val open = merged.last
    state.update(open)
    // flush the open session once the watermark passes last + gap; ceiling
    // division (micros → millis) so the timeout can never fire early, and
    // a timeout must sit strictly beyond the current watermark
    state.setTimeoutTimestamp(
      math.max((open.lastUs + gapUs + 999) / 1000,
        state.getCurrentWatermarkMs() + 1))
    merged.init.map(s => Session(userId, s.startUs, s.lastUs, s.n, "gap"))
      .iterator
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
