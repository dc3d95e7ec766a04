package graft.streaming

import graft.operators.TextAnalytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Runnable showcase of the full 3-process topology with no external feed:
  *
  *   DemoProducer (TCP, wire-format JSON + keepalives)
  *     → Structured Streaming socket source
  *     → foreachBatch pipeline (parse/clean/sentiment/stats/refs + retention)
  *     → metric parquet dirs
  *
  * Usage: runMain graft.streaming.StreamingDemo [outDir] [seconds]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val seconds = args.lift(1).map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // replay the sf0.001 documents as the producer wire format
    val lines = TextAnalytics.jsonLines(spark, "/root/testdata/sf0.001")
      .as[String].collect().toSeq
    val server = DemoProducer.serve(lines)
    println(s"[demo] producer on port ${server.port}, ${lines.size} lines; out=$outDir")

    val query = MicroBatchPipeline.run(
      MicroBatchPipeline.socketLines(spark, "localhost", server.port),
      outDir, Trigger.ProcessingTime("2 seconds"))
    Thread.sleep(seconds * 1000L)
    query.stop()
    server.close()

    for (d <- Seq("processed", "sentiment", "subreddit_stats", "references"))
      try {
        val df = spark.read.parquet(s"$outDir/$d")
        println(s"[demo] $d: ${df.count()} rows")
        df.show(5, truncate = false)
      } catch { case _: Throwable => println(s"[demo] $d: (no data)") }
    spark.stop()
  }
}
