package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming cohort-retention maintainer — the `transformWithState` twin
  * of q_retention_cohorts (graft.operators.BehaviorAnalytics): the batch
  * query distincts the whole (user, day) activity surface and joins it
  * to per-user min-day cohorts; a stream only needs each user's cohort
  * day and LAST ACTIVE day — O(1) ValueState per user — to recognize
  * first-activity-of-a-day as it happens.
  *
  * Under the ts-ordered per-key arrival contract the state machine is
  * EXACTLY the batch semantics: the first event a user ever shows fixes
  * their cohort day (ts order ⇒ day order, so the first day seen IS the
  * min day), and each event on a NEW day (day > last active day) is that
  * user's one distinct (user, day) row — a ONE-SHOT additive delta
  * (cohort_day, day_offset, +1); repeats within a day emit nothing.
  * The all-time cohort table is one (cohort_day, day_offset) sum over
  * the O(batches · |cohorts|·|offsets|)-bounded delta log fed to the
  * SAME shared `retentionReport` readout the batch query runs.
  *
  * Day arithmetic matches the batch column exactly: `ts_us div DayUs`
  * is Spark integral division (truncation toward zero) = Java `/` on
  * longs, used verbatim here.
  *
  * Ordering contract: rows are applied in (ts_us, event_id) order within
  * a batch; across batches per-key arrival must be in event order (the
  * StreamMarkov/StreamScd2 CDC assumption).
  */
object StreamRetention {

  case class RtIn(user_id: Long, ts_us: Long, event_id: Long)
  /** The user's cohort day + last active day. */
  case class RtState(cohort_day: Long, last_day: Long)
  case class RtDelta(cohort_day: Long, day_offset: Long, n: Long)

  class RetentionProcessor extends StatefulProcessor[Long, RtIn, RtDelta] {
    @transient private var st: ValueState[RtState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[RtState]("cohort",
        Encoders.product[RtState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[RtIn],
        timerValues: TimerValues): Iterator[RtDelta] = {
      val dayUs = graft.operators.BehaviorAnalytics.DayUs
      val ordered = rows.toSeq.sortBy(r => (r.ts_us, r.event_id))
      var s = if (st.exists()) Option(st.get()) else None
      val deltas = scala.collection.mutable.Map.empty[(Long, Long), Long]
      ordered.foreach { r =>
        val day = r.ts_us / dayUs // Spark `div` semantics (see scaladoc)
        s match {
          case None =>
            s = Some(RtState(day, day))
            deltas((day, 0L)) = deltas.getOrElse((day, 0L), 0L) + 1L
          case Some(p) if day > p.last_day =>
            s = Some(p.copy(last_day = day))
            val k = (p.cohort_day, day - p.cohort_day)
            deltas(k) = deltas.getOrElse(k, 0L) + 1L
          case _ => // same (or older in-watermark) day: already counted
        }
      }
      s.foreach(st.update)
      deltas.toSeq.sortBy(_._1)
        .iterator.map { case ((c, o), n) => RtDelta(c, o, n) }
    }
  }

  /** Wire a streaming events DataFrame (user_id, ts_us, event_id) into
    * the per-user cohort clock. */
  def activity(events: DataFrame): Dataset[RtDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".cast("long").as("user_id"),
        $"ts_us".cast("long").as("ts_us"),
        $"event_id".cast("long").as("event_id"))
      .as[RtIn]
      .groupByKey(_.user_id)
      .transformWithState(new RetentionProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** All-time cohort-retention table from the emitted delta log: fold the
    * additive (cohort_day, day_offset) counts, then the shared batch
    * readout. Runs on the delta log only — never the raw stream. */
  def report(deltaLog: DataFrame): DataFrame = {
    val spark = deltaLog.sparkSession
    import spark.implicits._
    graft.operators.BehaviorAnalytics.retentionReport(
      deltaLog.groupBy($"cohort_day", $"day_offset")
        .agg(sum($"n").as("n_users")))
  }
}
