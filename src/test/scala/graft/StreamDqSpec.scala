package graft

import graft.operators.Governance
import graft.streaming.StreamDq
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming DQ gate end-to-end: lineitem replayed in micro-batches
  * through a real file-source stream (stream-static join against the
  * orders dim), counter log folded at query time — must equal the batch
  * q_dq_rules report on the same rows EXACTLY (counters are additive over
  * disjoint slices), and a recovery replay must overwrite, not
  * double-count, its batch. */
class StreamDqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed counter-log report equals the batch q_dq_rules report") {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate")
    val logDir = Files.createTempDirectory("graft-dq-log").toString

    // replay lineitem as 3 disjoint parquet files -> 3 micro-batches
    val srcDir = Files.createTempDirectory("graft-dq-src").toString
    for (s <- 0 until 3)
      li.filter($"l_orderkey" % 3 === s)
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val liStream = spark.readStream
      .schema(li.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamDq.run(liStream, ord, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamDq.report(spark, logDir)
      .as[(String, Long, Long, Double)].collect().toSeq
    val batch = Governance.qDqRules.run(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(streamed === batch)

    // recovery replay of one batch: same file, same report (sweep is
    // CORRECTNESS for additive counters, not hygiene)
    val files = new java.io.File(s"$logDir/log").listFiles()
      .map(_.getName).filter(_.startsWith("counters_b")).sorted
    assert(files.length === 3, files.mkString(", "))
    StreamDq.processBatch(li.filter($"l_orderkey" % 3 === 1), ord, 1L, logDir)
    val replayed = StreamDq.report(spark, logDir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(replayed === batch)
    assert(new java.io.File(s"$logDir/log").listFiles()
      .count(_.getName.startsWith("counters_b")) === 3)
  }

  test("per-batch audit plan: broadcast orders, one aggregate, no fact shuffle") {
    val li = Tables.lineitem(spark, dir).filter($"l_orderkey" % 3 === 0)
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate")
    val p = Governance.dqCounters(li, broadcast(ord))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("checkpoint restart resumes the gate where it left off (no double-count)") {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate")
    val logDir = Files.createTempDirectory("graft-dq-restart-log").toString
    val srcDir = Files.createTempDirectory("graft-dq-restart-src").toString

    def start() = StreamDq.run(
      spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true").parquet(srcDir),
      ord, logDir, Trigger.AvailableNow())

    // run 1: one slice, then the query terminates (AvailableNow)
    li.filter($"l_orderkey" % 3 === 0).write.parquet(s"$srcDir/slice_0.parquet")
    val q1 = start(); q1.awaitTermination(120000)

    // run 2 against the SAME checkpoint: only the new slices are consumed
    // (re-consuming slice 0 would double its additive counters)
    li.filter($"l_orderkey" % 3 === 1).write.parquet(s"$srcDir/slice_1.parquet")
    li.filter($"l_orderkey" % 3 === 2).write.parquet(s"$srcDir/slice_2.parquet")
    val q2 = start(); q2.awaitTermination(120000)

    val streamed = StreamDq.report(spark, logDir)
      .as[(String, Long, Long, Double)].collect().toSeq
    val batch = Governance.qDqRules.run(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(streamed === batch)
  }
}
