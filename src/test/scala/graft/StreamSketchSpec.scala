package graft

import graft.operators.Governance
import graft.streaming.StreamSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Incremental HLL sketch maintenance end-to-end: the foreachBatch
  * day-sketch log, unioned at query time, must equal the batch
  * q_hll_sketch_merge build on the SAME replayed rows — the mergeability
  * property the 100 TB incremental pattern rests on — and a recovery
  * replay of a batch must overwrite its own sketches, not double them. */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  private val DayUs = 86400000000L

  /** 3 micro-batches × 100 events; users and days overlap across batches,
    * so the streamed union only matches the batch build if merge semantics
    * (not concatenation-with-double-count at the row level) hold. */
  private def batchRows(b: Int): Seq[(String, Long, Long)] =
    (0 until 100).map { i =>
      val t = if (i % 2 == 0) "click" else "view"
      (t, (i % 4) * DayUs + b * 1000L + i, (i % 53 + 17 * b % 11).toLong)
    }

  test("streamed sketch-union equals the batch q_hll_sketch_merge build") {
    val dir = Files.createTempDirectory("graft-sketch-log").toString
    val in = MemoryStream[(String, Long, Long)](spark)
    val events = in.toDF().toDF("event_type", "ts_us", "user_id")
    val q = StreamSketch.run(events, dir, Trigger.ProcessingTime(0L))
    try {
      for (b <- 0 until 3) {
        in.addData(batchRows(b): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // one sketch file per non-empty batch
    val logFiles = new java.io.File(s"$dir/log").listFiles()
      .map(_.getName).filter(_.startsWith("sketch_b")).sorted
    assert(logFiles.toSeq === Seq("sketch_b0.parquet", "sketch_b1.parquet",
      "sketch_b2.parquet"))

    val all = (0 until 3).flatMap(batchRows)
      .toDF("event_type", "ts_us", "user_id")
    val batchEst = Governance.sketchRollup(Governance.dailySketches(all))
      .as[(String, Double)].collect().toMap
    val streamEst = StreamSketch.rollup(spark, dir)
      .as[(String, Double)].collect().toMap
    // HLL union over same-lgK sketches is exact -> estimates are EQUAL,
    // not merely close, however the rows were partitioned into sketches
    assert(streamEst === batchEst)
    assert(batchEst.keySet === Set("click", "view"))

    // recovery replay: re-running batch 1 must land on the same file and
    // leave the rollup byte-identical (replace-my-batch, not append)
    StreamSketch.processBatch(
      batchRows(1).toDF("event_type", "ts_us", "user_id"), 1L, dir)
    val after = StreamSketch.rollup(spark, dir)
      .as[(String, Double)].collect().toMap
    assert(after === batchEst)
    assert(new java.io.File(s"$dir/log").listFiles()
      .count(_.getName.startsWith("sketch_b")) === 3)
  }

  test("rollup touches only the sketch log, and empty batches write nothing") {
    val dir = Files.createTempDirectory("graft-sketch-empty").toString
    // empty batch: no file, no failure
    StreamSketch.processBatch(
      Seq.empty[(String, Long, Long)].toDF("event_type", "ts_us", "user_id"),
      0L, dir)
    assert(!new java.io.File(s"$dir/log").exists())

    // a real batch, then: the rollup plan must scan ONLY parquet sketch
    // rows (no raw-events relation exists to rescan — the log IS the input)
    StreamSketch.processBatch(
      batchRows(0).toDF("event_type", "ts_us", "user_id"), 0L, dir)
    val plan = StreamSketch.rollup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hll_union_agg") || plan.contains("HllUnionAgg"),
      s"rollup must union stored sketches, got:\n$plan")
  }
}
