package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming SpaceSaving heavy hitters (Metwally, Agrawal & El Abbadi
  * 2005) — the bounded-state ingest twin of the exact batch
  * q_heavy_hitters (graft.operators.TextAnalytics): per group (language),
  * track at most `capacity` term counters however many distinct terms the
  * stream carries. The batch query can afford an exact recount because the
  * sketch candidates bound it; an ingest screen cannot — SpaceSaving is
  * the standard O(m)-state answer, and its guarantees are ARRIVAL-ORDER
  * INDEPENDENT, which is what makes it honest under Spark's
  * nondeterministic within-batch row order:
  *
  *  - `est` never undercounts: est(t) ≥ true(t) for every tracked t, and
  *    est(t) − err(t) ≤ true(t) (err is the possible inherited
  *    overcount — 0 means the count is exact);
  *  - any term with true frequency > n/m is tracked after n arrivals;
  *  - with ≤ m distinct terms per group the table IS the exact count
  *    table (err ≡ 0) — the regime StreamTopKSpec pins as an equality
  *    against the batch group-by, across micro-batches and keyed state.
  *
  * Replacement rule: the evicted counter is the minimum by (est, term) —
  * the term tiebreak is not part of the published algorithm (any minimum
  * is valid) but makes replay deterministic GIVEN an input order.
  *
  * Emission: one snapshot of the table per group per micro-batch, stamped
  * with the group's total arrivals `n_seen`; the all-time report is
  * keep-last per (lang, term) on max n_seen — the same fold-at-query
  * discipline as the other streaming maintainers (no per-event output,
  * so emission volume is O(batches · m), never O(stream)). */
object StreamTopK {

  /** Default counter capacity per group. */
  val Capacity = 8

  case class TopkIn(lang: String, term: String)
  case class TopkEntry(term: String, est: Long, err: Long)
  case class TopkState(nSeen: Long, entries: Seq[TopkEntry])
  case class TopkOut(lang: String, term: String, est: Long, err: Long,
      n_seen: Long)

  class TopKProcessor(capacity: Int)
      extends StatefulProcessor[String, TopkIn, TopkOut] {
    @transient private var st: ValueState[TopkState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TopkState]("topk",
        Encoders.product[TopkState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TopkIn],
        timerValues: TimerValues): Iterator[TopkOut] = {
      val prev = if (st.exists()) st.get() else TopkState(0L, Nil)
      // the table is m-bounded — a mutable map keeps the per-arrival
      // update O(1)-ish without materializing the (unbounded) input
      val table = scala.collection.mutable.Map.empty[String, (Long, Long)]
      prev.entries.foreach(e => table(e.term) = (e.est, e.err))
      var n = prev.nSeen
      rows.foreach { r =>
        n += 1
        table.get(r.term) match {
          case Some((est, err)) => table(r.term) = (est + 1, err)
          case None if table.size < capacity => table(r.term) = (1L, 0L)
          case None =>
            val (minTerm, (minEst, _)) =
              table.minBy { case (t, (est, _)) => (est, t) }
            table.remove(minTerm)
            table(r.term) = (minEst + 1, minEst)
        }
      }
      val entries = table.toSeq
        .map { case (t, (est, err)) => TopkEntry(t, est, err) }
        .sortBy(e => (-e.est, e.term))
      st.update(TopkState(n, entries))
      entries.iterator.map(e => TopkOut(key, e.term, e.est, e.err, n))
    }
  }

  /** Wire a streaming (lang, term) DataFrame into the per-lang summary. */
  def tracked(terms: DataFrame, capacity: Int = Capacity)
      : Dataset[TopkOut] = {
    val spark = terms.sparkSession
    import spark.implicits._
    terms.select($"lang", $"term").as[TopkIn]
      .groupByKey(_.lang)
      .transformWithState(new TopKProcessor(capacity), TimeMode.None(),
        OutputMode.Append())
  }

  /** All-time report over the emitted snapshot log: the rows of each
    * group's LATEST snapshot (max n_seen), ranked. Runs on O(batches · m)
    * rows — never the raw stream. */
  def report(snapshots: DataFrame): DataFrame = {
    val spark = snapshots.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    snapshots
      .withColumn("max_seen",
        org.apache.spark.sql.functions.max($"n_seen")
          .over(Window.partitionBy($"lang")))
      .filter($"n_seen" === $"max_seen")
      .select($"lang", $"term", $"est", $"err", $"n_seen")
      .orderBy($"lang", $"est".desc, $"term")
  }
}
