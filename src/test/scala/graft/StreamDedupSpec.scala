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
}
