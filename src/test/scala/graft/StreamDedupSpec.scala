package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Watermarked streaming dedup end-to-end over a file-source replay. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  private def doc(id: Long, text: String, minute: Long): String =
    s"""{"doc_id": $id, "text": "$text", "ts": "2024-01-01T00:${"%02d".format(minute)}:00.000Z"}"""

  private def docStream(srcDir: String) =
    spark.readStream.format("text").load(srcDir)
      .select(from_json($"value", schema).as("d"))
      .select($"d.doc_id", $"d.text", $"d.ts")

  test("key dedup drops re-sent doc ids within the watermark horizon") {
    val srcDir = Files.createTempDirectory("graft-sdedup-src").toString
    Files.write(Paths.get(srcDir, "b0.txt"), Seq(
      doc(1, "alpha", 0), doc(2, "beta", 1),
      doc(1, "alpha", 2),              // retry of doc 1 -> dropped
      doc(3, "gamma", 3)).mkString("\n").getBytes("UTF-8"))

    val q = StreamDedup.byKey(docStream(srcDir), "ts", "10 minutes", Seq("doc_id"))
      .writeStream.format("memory").queryName("dedup_key")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val ids = spark.table("dedup_key").select($"doc_id").as[Long].collect().toSeq
    assert(ids.sorted === Seq(1L, 2L, 3L))
  }

  test("content dedup drops identical payloads under different ids") {
    val srcDir = Files.createTempDirectory("graft-sdedup-fp-src").toString
    Files.write(Paths.get(srcDir, "b0.txt"), Seq(
      doc(1, "same text", 0), doc(2, "same text", 1),  // content dup -> dropped
      doc(3, "other text", 2)).mkString("\n").getBytes("UTF-8"))

    val q = StreamDedup.byContent(docStream(srcDir), "ts", "10 minutes", "text")
      .writeStream.format("memory").queryName("dedup_fp")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val texts = spark.table("dedup_fp").select($"text").as[String].collect().toSeq
    assert(texts.sorted === Seq("other text", "same text"))
    assert(spark.table("dedup_fp").columns.toSeq.sorted === Seq("doc_id", "text", "ts"))
  }

  test("checkpoint restart: dedup state survives the kill — a post-restart retry is dropped") {
    // the engine-managed dropDuplicatesWithinWatermark state lives in the
    // checkpoint's state store: kill the query with the retry delivery
    // pending, restart from the SAME checkpoint, and the retry must be
    // dropped against the RESTORED key state (a reset would re-emit doc 1
    // — exactly the double-ingest a 100 TB at-least-once feed cannot
    // absorb). Final output equals the batch dedup of the full replay.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def tstamp(minute: Long): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.parse(f"2024-01-01T00:$minute%02d:00Z"))
    val in = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val ckpt = Files.createTempDirectory("graft-sdedup-restart").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = StreamDedup.byKey(
        in.toDF().toDF("doc_id", "text", "ts"), "ts", "10 minutes", Seq("doc_id"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("doc_id").as[Long].collect().foreach(emitted.add); ()
      }
      .outputMode("append").option("checkpointLocation", ckpt).start()

    val q1 = start()
    try { in.addData((1L, "alpha", tstamp(0)), (2L, "beta", tstamp(1))); q1.processAllAvailable() }
    finally q1.stop()   // kill...

    // ...retry of doc 1 (within the watermark horizon) + a novel doc pending
    in.addData((1L, "alpha", tstamp(2)), (3L, "gamma", tstamp(3)))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSeq.sorted === Seq(1L, 2L, 3L))
  }
}
