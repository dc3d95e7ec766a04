package graft

import graft.operators.MlEval
import graft.streaming.StreamOls
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming OLS maintainer end-to-end: lineitem replayed in micro-batches,
  * 1-row moment deltas folded at query time — the full regression readout
  * (n, b0, b1, b2, r2, rmse) must bit-match the batch q_ols_fit. */
class StreamOlsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded moment log reproduces the batch fit bit-for-bit") {
    val li = Tables.lineitem(spark, dir)
    val logDir = Files.createTempDirectory("graft-ols-log").toString

    val srcDir = Files.createTempDirectory("graft-ols-src").toString
    for (s <- 0 until 3)
      li.filter($"l_orderkey" % 3 === s)
        .select($"l_quantity", $"l_discount", $"l_extendedprice")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)

    val q = StreamOls.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamOls.report(spark, logDir)
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq
    val batch = MlEval.qOlsFit.run(spark, dir)
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq
    assert(streamed === batch && batch.nonEmpty)
    // the fit was genuinely assembled from 3 one-row deltas
    val logRows = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$logDir/log").count()
    assert(logRows === 3L)

    // recovery replay of batch 0: fixed-path overwrite is correctness
    StreamOls.processBatch(
      li.filter($"l_orderkey" % 3 === 0)
        .select($"l_quantity", $"l_discount", $"l_extendedprice"),
      0L, logDir)
    assert(StreamOls.report(spark, logDir)
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq
      === batch)
  }
}
