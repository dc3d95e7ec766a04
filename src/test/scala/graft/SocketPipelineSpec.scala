package graft

import graft.streaming.{DemoProducer, MicroBatchPipeline}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Full 3-process parity e2e: demo producer serving the wire format over a
  * real TCP socket → Structured Streaming socket source → foreachBatch
  * pipeline → metric parquet. The reference's producer/consumer topology
  * with no external feed. */
class SocketPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("socket source through the demo producer to metric parquet") {
    val lines = Seq(
      """{"type": "submission", "subreddit": "s1", "id": "a", "text": "fast fast fast slow", "created_utc": 1700000000.5, "author": "u1"}""",
      """{"type": "submission", "subreddit": "s2", "id": "b", "text": "slow slow slow slow", "created_utc": 1700000002.0, "author": "u2"}""",
      """garbage {{{ not json""")
    val server = DemoProducer.serve(lines)
    val outDir = Files.createTempDirectory("graft-socket-out").toString
    val q = MicroBatchPipeline.run(
      MicroBatchPipeline.socketLines(spark, "localhost", server.port),
      outDir, Trigger.ProcessingTime("500 milliseconds"))
    try {
      val deadline = System.currentTimeMillis() + 120000
      def processedIds(): Set[String] =
        if (!Files.exists(Paths.get(outDir, "processed"))) Set.empty
        else try spark.read.parquet(s"$outDir/processed/processed_*")
          .select($"id").as[String].collect().toSet
        catch { case _: Throwable => Set.empty }
      while (processedIds() != Set("a", "b") && System.currentTimeMillis() < deadline)
        Thread.sleep(500)
      assert(processedIds() === Set("a", "b"))
      // keepalives and garbage lines reached raw storage but not processed
      assert(spark.read.parquet(s"$outDir/raw/*").count() >= 3)
    } finally {
      q.stop()
      server.close()
    }
  }
}
