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
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    val closed = Seq.newBuilder[Session]
    var cur = state.getOption
    for (e <- sorted) {
      cur = cur match {
        case Some(s) if e.ts_us - s.lastUs <= gapUs =>
          Some(SessionState(s.startUs, e.ts_us, s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.startUs, s.lastUs, s.n, "gap")
          Some(SessionState(e.ts_us, e.ts_us, 1))
        case None =>
          Some(SessionState(e.ts_us, e.ts_us, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // flush the open session once the watermark passes last + gap;
      // a timeout must sit strictly beyond the current watermark
      state.setTimeoutTimestamp(
        math.max(s.lastUs / 1000 + gapUs / 1000,
          state.getCurrentWatermarkMs() + 1))
    }
    closed.result().iterator
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
