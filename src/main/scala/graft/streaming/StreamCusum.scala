package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming CUSUM changepoint monitor — the `transformWithState` twin of
  * q_cusum_drift (graft.operators.Governance.qCusumDrift).
  *
  * The batch query computes the max(0,·) reset recursion through the
  * prefix identity (two windows). A stream doesn't need the identity at
  * all: the recursion is O(1) state per key — exactly what ValueState is
  * for. Per event_type the state holds the two prefix sums and their
  * running minima IN MICRO-UNITS (Long): the batch side 6-dp-prerounds
  * every deviation before decimal-summing, and a 6-dp-rounded double is
  * exactly n/10⁶, so `math.rint(d · 10⁶).toLong` is lossless and the
  * whole recursion becomes exact integer arithmetic — the streamed
  * S⁺/S⁻ equal the batch outputs BIT-FOR-BIT, which StreamCusumSpec pins
  * row-for-row on a replayed corpus split.
  *
  * Reference parameters (μ₀, k, h) are frozen from a calibration window
  * via the SAME Governance.cusumRef relation the batch query derives its
  * older-half reference from, and joined onto the stream before keying
  * (stream-static broadcast join) — types with no reference drop, the
  * batch query's cold-start rule.
  *
  * Ordering contract: rows are applied in (ts_us, event_id) order within
  * a batch; across batches per-key arrival must be in event order (the
  * StreamScd2 CDC assumption). State never expires — a drift monitor
  * resumes, not resets, after idle periods.
  */
object StreamCusum {

  case class CusumIn(event_type: String, ts_us: Long, event_id: Long,
      value: Double, mu0: Double, k: Double, h: Double)
  case class CusumOut(event_type: String, ts_us: Long, event_id: Long,
      value: Double, s_pos: Double, s_neg: Double, alarm: Boolean)
  /** Prefix sums and running minima in micro-units. */
  case class CusumState(pPos: Long, minPos: Long, pNeg: Long, minNeg: Long)

  /** The batch side's qround (floor(x·10⁶ + 0.5)/10⁶) lands on an exact
    * n/10⁶; read n back losslessly. */
  private def micros(x: Double): Long =
    math.floor(x * 1e6 + 0.5).toLong

  class CusumProcessor extends StatefulProcessor[String, CusumIn, CusumOut] {
    @transient private var st: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CusumIn],
        timerValues: TimerValues): Iterator[CusumOut] = {
      val ordered = rows.toSeq.sortBy(r => (r.ts_us, r.event_id))
      var s = if (st.exists()) st.get() else CusumState(0L, 0L, 0L, 0L)
      val out = ordered.map { r =>
        val pPos = s.pPos + micros(r.value - r.mu0 - r.k)
        val pNeg = s.pNeg + micros(r.mu0 - r.k - r.value)
        s = CusumState(pPos, math.min(s.minPos, pPos),
          pNeg, math.min(s.minNeg, pNeg))
        // S = P − min(0, running min P); minima in state INCLUDE the
        // empty prefix (they start at 0), so min(minP, 0) = minP
        val sPos = (pPos - math.min(s.minPos, 0L)) / 1e6
        val sNeg = (pNeg - math.min(s.minNeg, 0L)) / 1e6
        CusumOut(r.event_type, r.ts_us, r.event_id, r.value, sPos, sNeg,
          sPos > r.h || sNeg > r.h)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Wire a streaming events DataFrame (event_type, ts_us, event_id,
    * value) against a frozen reference (event_type, mu0, k, h) into the
    * per-type monitor. */
  def monitored(events: DataFrame, reference: DataFrame): Dataset[CusumOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"event_type", $"ts_us".cast("long").as("ts_us"),
        $"event_id".cast("long").as("event_id"),
        $"value".cast("double").as("value"))
      .join(broadcast(reference), Seq("event_type")) // inner: no ref -> drop
      .as[CusumIn]
      .groupByKey(_.event_type)
      .transformWithState(new CusumProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
