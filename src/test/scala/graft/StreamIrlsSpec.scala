package graft

import graft.operators.MlEval
import graft.streaming.StreamIrls
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming IRLS maintainer end-to-end: lineitem replayed in
  * micro-batches, feature-grid cell deltas folded at query time — the full
  * readout (n, n_pos, b0, b1, b2, log_loss) must bit-match the batch
  * q_logistic_irls. */
class StreamIrlsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded cell log reproduces the batch fit bit-for-bit") {
    val li = Tables.lineitem(spark, dir)
    val logDir = Files.createTempDirectory("graft-irls-log").toString

    val srcDir = Files.createTempDirectory("graft-irls-src").toString
    for (s <- 0 until 3)
      li.filter($"l_orderkey" % 3 === s)
        .select($"l_quantity", $"l_discount", $"l_returnflag")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamIrls.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamIrls.report(spark, logDir)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    val batch = MlEval.qLogisticIrls.run(spark, dir)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(streamed === batch && batch.nonEmpty)

    // recovery replay of batch 2: fixed-path overwrite is correctness
    StreamIrls.processBatch(
      li.filter($"l_orderkey" % 3 === 2)
        .select($"l_quantity", $"l_discount", $"l_returnflag"),
      2L, logDir)
    assert(StreamIrls.report(spark, logDir)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
      === batch)
  }
}
