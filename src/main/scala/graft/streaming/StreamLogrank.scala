package graft.streaming

import graft.operators.BehaviorAnalytics
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming log-rank maintainer — the incremental twin of q_logrank
  * (graft.operators.BehaviorAnalytics), on the RETRACTION pattern
  * StreamKm established for survival state: per-user minima (first
  * event, first purchase) in `transformWithState` ValueState, a bucket
  * change emitting a −1/+1 delta pair — here keyed additionally by the
  * ARM, which is a pure function of the grouping key (g = user_id % 2),
  * so the arm never needs to live in state and the order-invariance
  * argument is inherited verbatim: min is commutative and idempotent,
  * hence the folded per-arm counters — and therefore the Mantel z/χ² —
  * are invariant to arrival order within and across batches (no
  * ingestion contract at all; the spec replays time-shuffled slices).
  *
  * The readout runs the SAME logrankReport the batch query runs over the
  * folded (g, dur_hours, d_t, c_t) counters; StreamLogrankSpec pins fold
  * == batch relation and report == q_logrank.
  */
object StreamLogrank {

  /** A signed per-arm bucket delta: fold by (g, dur_hours, converted). */
  case class LrDelta(g: Long, dur_hours: Long, converted: Boolean, n: Long)

  class LrProcessor
      extends StatefulProcessor[Long, StreamKm.KmIn, LrDelta] {
    @transient private var minima: ValueState[StreamKm.KmMin] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      minima = getHandle.getValueState[StreamKm.KmMin]("minima",
        Encoders.product[StreamKm.KmMin], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[StreamKm.KmIn],
        timerValues: TimerValues): Iterator[LrDelta] = {
      val g = key % 2
      val batch = rows.toSeq
      val bFirst = batch.map(_.ts_us).min
      val bPurch = batch.filter(_.event_type == "purchase").map(_.ts_us)
        .minOption
      val old = if (minima.exists()) Option(minima.get()) else None
      val next = old match {
        case Some(o) => StreamKm.KmMin(math.min(o.first_us, bFirst),
          (o.purch_us.toSeq ++ bPurch.toSeq).minOption)
        case None => StreamKm.KmMin(bFirst, bPurch)
      }
      minima.update(next)
      val nb = StreamKm.bucketOf(next)
      old.map(StreamKm.bucketOf) match {
        case Some(ob) if ob == nb => Iterator.empty
        case Some(ob) => Iterator(
          LrDelta(g, ob._1, ob._2, -1L), LrDelta(g, nb._1, nb._2, 1L))
        case None => Iterator(LrDelta(g, nb._1, nb._2, 1L))
      }
    }
  }

  /** Wire a streaming events DataFrame (user_id, event_type, ts_us) into
    * the per-user maintainer; output is the signed per-arm delta stream. */
  def deltas(events: DataFrame): Dataset[LrDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".cast("long").as("user_id"), $"event_type",
        $"ts_us".cast("long").as("ts_us"))
      .as[StreamKm.KmIn]
      .groupByKey(_.user_id)
      .transformWithState(new LrProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Fold an accumulated delta log to the live (g, dur_hours, d_t, c_t)
    * counters — the batch kmArmDurations shape. */
  def fold(deltaLog: DataFrame): DataFrame = {
    val spark = deltaLog.sparkSession
    import spark.implicits._
    deltaLog.groupBy($"g", $"dur_hours")
      .agg(sum(when($"converted", $"n").otherwise(0L)).as("d_t"),
        sum(when(!$"converted", $"n").otherwise(0L)).as("c_t"))
      .filter($"d_t" =!= 0 || $"c_t" =!= 0)
  }

  /** The live log-rank readout from the delta log — identical machinery
    * (and, by the folded equality, identical values) to q_logrank. */
  def report(deltaLog: DataFrame): DataFrame =
    BehaviorAnalytics.logrankReport(fold(deltaLog))

  /** The live Cox hazard ratio from the SAME log — the effect-size
    * companion readout (q_cox_hr's batch twin). */
  def coxReport(deltaLog: DataFrame): DataFrame =
    BehaviorAnalytics.coxReport(fold(deltaLog))
}
