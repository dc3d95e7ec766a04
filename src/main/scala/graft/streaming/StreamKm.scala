package graft.streaming

import graft.operators.BehaviorAnalytics
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming Kaplan–Meier maintenance via `transformWithState` — the
  * incremental twin of q_kaplan_meier
  * (graft.operators.BehaviorAnalytics), and the engine's first
  * RETRACTION-pattern twin: unlike the additive-counter twins (StreamDq,
  * StreamCms, StreamBenford…), a user's duration bucket can CHANGE as
  * events arrive (an earlier first event stretches the latency; the first
  * purchase converts a censored subject), so each state transition emits a
  * −1 delta against the old bucket and a +1 against the new one. The
  * folded deltas equal the batch (dur_hours, d_t, c_t) counters EXACTLY,
  * and the report runs the SAME `kmReport` windows the batch query runs
  * (StreamKmSpec pins both equalities).
  *
  * State is O(1) per user — the two per-user MINIMA (first event ts,
  * first purchase ts) the batch aggregate computes. Because min is
  * commutative and idempotent, the final state — and therefore the folded
  * curve — is invariant to arrival order WITHIN and ACROSS batches: this
  * twin needs no in-order ingestion contract at all (stronger than
  * StreamScd2's CDC assumption; the spec replays deliberately
  * time-shuffled slices). Bucketing goes through the shared
  * `BehaviorAnalytics.kmBucket` columns evaluated in plain Scala with the
  * same floor/compare semantics (integer µs, IEEE floor division).
  *
  * State never expires (TTLConfig.NONE — a survival subject must survive
  * idle periods). Requires the RocksDB state store provider, like every
  * transformWithState surface here.
  */
object StreamKm {

  case class KmIn(user_id: Long, event_type: String, ts_us: Long)
  /** A signed bucket delta: fold by (dur_hours, converted) summing n. */
  case class KmDelta(dur_hours: Long, converted: Boolean, n: Long)
  /** Per-user minima held in state. */
  case class KmMin(first_us: Long, purch_us: Option[Long])

  private val HourUs = 3600L * 1000000

  /** The bucket function — plain-Scala twin of BehaviorAnalytics.kmBucket
    * (same integer-µs floor division; KmSpec cross-checks via the folded
    * equality against the batch relation). */
  private[streaming] def bucketOf(s: KmMin): (Long, Boolean) =
    s.purch_us match {
      case Some(p) =>
        val latH = math.floor((p - s.first_us).toDouble / HourUs).toLong
        if (latH < BehaviorAnalytics.KmObsHours) (latH, true)
        else (BehaviorAnalytics.KmObsHours, false)
      case None => (BehaviorAnalytics.KmObsHours, false)
    }

  class KmProcessor extends StatefulProcessor[Long, KmIn, KmDelta] {
    @transient private var minima: ValueState[KmMin] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      minima = getHandle.getValueState[KmMin]("minima",
        Encoders.product[KmMin], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KmIn],
        timerValues: TimerValues): Iterator[KmDelta] = {
      val batch = rows.toSeq
      val bFirst = batch.map(_.ts_us).min
      val bPurch = batch.filter(_.event_type == "purchase").map(_.ts_us)
        .minOption
      val old = if (minima.exists()) Option(minima.get()) else None
      val next = old match {
        case Some(o) => KmMin(math.min(o.first_us, bFirst),
          (o.purch_us.toSeq ++ bPurch.toSeq).minOption)
        case None => KmMin(bFirst, bPurch)
      }
      minima.update(next)
      val nb = bucketOf(next)
      old.map(bucketOf) match {
        case Some(ob) if ob == nb => Iterator.empty
        case Some(ob) => Iterator(
          KmDelta(ob._1, ob._2, -1L), KmDelta(nb._1, nb._2, 1L))
        case None => Iterator(KmDelta(nb._1, nb._2, 1L))
      }
    }
  }

  /** Wire a streaming events DataFrame (user_id, event_type, ts_us) into
    * the per-user maintainer; output is the signed bucket-delta stream. */
  def deltas(events: DataFrame): Dataset[KmDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".cast("long").as("user_id"), $"event_type",
        $"ts_us".cast("long").as("ts_us"))
      .as[KmIn]
      .groupByKey(_.user_id)
      .transformWithState(new KmProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Fold an accumulated delta log to the live (dur_hours, d_t, c_t)
    * counters — the batch kmDurations shape (zero-summed buckets drop:
    * a bucket everyone has retracted out of no longer exists). */
  def fold(deltaLog: DataFrame): DataFrame = {
    val spark = deltaLog.sparkSession
    import spark.implicits._
    deltaLog.groupBy($"dur_hours")
      .agg(sum(when($"converted", $"n").otherwise(0L)).as("d_t"),
        sum(when(!$"converted", $"n").otherwise(0L)).as("c_t"))
      .filter($"d_t" =!= 0 || $"c_t" =!= 0)
  }

  /** The live survival curve from the delta log — identical machinery
    * (and, by the folded equality, identical values) to q_kaplan_meier. */
  def report(deltaLog: DataFrame): DataFrame =
    BehaviorAnalytics.kmReport(fold(deltaLog))
}
