package graft

import graft.operators.EventAnalytics
import graft.streaming.StreamDaily
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming daily-series maintainer end-to-end: events replayed in
  * micro-batches whose slices SPLIT days across batches (the partial-sum
  * path is genuinely exercised), folded series must bit-match the batch
  * dailyByType relation, and all four family readouts must bit-match
  * their batch queries. */
class StreamDailySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("folded series and the four readouts bit-match the batch family") {
    val ev = Tables.events(spark, dir)
    val logDir = Files.createTempDirectory("graft-daily-log").toString

    // slice by event hash so every day's rows are SPREAD over all three
    // batches — each day's decimal total is assembled from three partials
    val srcDir = Files.createTempDirectory("graft-daily-src").toString
    for (s <- 0 until 3)
      ev.filter(abs(hash($"event_id")) % 3 === s)
        .drop("ts_us") // physical schema: the stream re-derives it
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
      .withColumn("ts_us", unix_micros($"ts".cast("timestamp")))

    val q = StreamDaily.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val streamed = StreamDaily.series(spark, logDir)
      .as[(String, Long, Double)].collect().toSeq.sorted
    val batch = EventAnalytics.dailyByType(ev)
      .as[(String, Long, Double)].collect().toSeq.sorted
    assert(streamed === batch && batch.nonEmpty)
    // the split really happened: more delta rows than folded rows
    val logRows = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$logDir/log").count()
    assert(logRows > batch.size)

    def rows5(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq)
    assert(rows5(StreamDaily.autocorr(spark, logDir)) ===
      rows5(EventAnalytics.qAutocorr.run(spark, dir)))
    assert(rows5(StreamDaily.stl(spark, logDir)) ===
      rows5(EventAnalytics.qStlDecompose.run(spark, dir)))
    assert(rows5(StreamDaily.forecast(spark, logDir)) ===
      rows5(EventAnalytics.qSeasonalForecast.run(spark, dir)))
    assert(rows5(StreamDaily.ljungBox(spark, logDir)) ===
      rows5(EventAnalytics.qLjungBox.run(spark, dir)))

    // recovery replay of batch 0: partial sums -> fixed-path overwrite
    // is correctness on replay
    StreamDaily.processBatch(
      ev.filter(abs(hash($"event_id")) % 3 === 0), 0L, logDir)
    assert(StreamDaily.series(spark, logDir)
      .as[(String, Long, Double)].collect().toSeq.sorted === batch)
  }
}
