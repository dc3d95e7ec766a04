package graft

import graft.streaming.MicroBatchPipeline
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** End-to-end streaming test (SURVEY.md §5.4): the producer wire format —
  * including keepalives and malformed lines — replayed through a file source
  * with Trigger.AvailableNow into the foreachBatch pipeline; metric dirs
  * asserted afterwards. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch pipeline: file replay -> raw/processed/metric parquet") {
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    val outDir = Files.createTempDirectory("graft-stream-out").toString
    val lines = Seq(
      """{"type": "submission", "subreddit": "s1", "id": "a", "text": "fast fast fast slow", "created_utc": 1700000000.5, "author": "u1"}""",
      """{"type": "submission", "subreddit": "s2", "id": "b", "text": "slow slow slow slow", "created_utc": 1700000002.0, "author": "u2"}""",
      """{"type": "keepalive", "timestamp": 1700000003.0}""",
      """garbage {{{ not json""",
      """{"type": "submission", "subreddit": "s1", "id": "c", "text": "tiny", "created_utc": 1700000004.0, "author": "u3"}""")
    Files.write(Paths.get(srcDir, "batch0.txt"),
      lines.mkString("\n").getBytes("UTF-8"))

    val q = MicroBatchPipeline.run(
      MicroBatchPipeline.fileLines(spark, srcDir), outDir,
      Trigger.AvailableNow())
    q.awaitTermination(120000)

    // raw: every line persisted before parse (5 rows incl. bad ones)
    assert(spark.read.parquet(s"$outDir/raw/*").count() === 5)

    // processed: one timestamped per-batch snapshot (F12 naming parity:
    // processed_%Y%m%d_%H%M%S.parquet + idempotency batch suffix)
    val snapshots = new java.io.File(s"$outDir/processed").listFiles().map(_.getName)
    assert(snapshots.nonEmpty &&
      snapshots.forall(_.matches("processed_\\d{8}_\\d{6}_b\\d+\\.parquet")),
      s"unexpected snapshot names: ${snapshots.mkString(", ")}")

    // only the two valid long posts survive the cleaning filter
    val processed = spark.read.parquet(s"$outDir/processed/processed_*")
    assert(processed.select($"id").as[String].collect().toSet === Set("a", "b"))
    val sentById = processed.select($"id", $"sentiment").as[(String, Double)]
      .collect().toMap
    assert(sentById("a") === 0.375)   // (0.75*3 - 0.75) / 4
    assert(sentById("b") === -0.75)   // 4 * -0.75 / 4

    // sentiment metric: batch average over the two docs
    val avg = spark.read.parquet(s"$outDir/sentiment")
      .select($"average_sentiment").as[Double].head()
    assert(avg === -0.1875)

    // subreddit stats: one row per subreddit with counts
    val stats = spark.read.parquet(s"$outDir/subreddit_stats")
      .select($"subreddit", $"post_count").as[(String, Long)].collect().toMap
    assert(stats === Map("s1" -> 1L, "s2" -> 1L))

    // references: \bs\w+ matches "slow" x5 across both texts
    val refs = spark.read.parquet(s"$outDir/references")
      .select($"total_user_refs", $"total_sub_refs", $"total_urls")
      .as[(Long, Long, Long)].head()
    assert(refs === ((5L, 0L, 0L)))

    // checkpoint kept (the reference deletes it; we do not)
    assert(Files.exists(Paths.get(outDir, "checkpoint")))
  }

  test("checkpoint recovery: a restart resumes where the stream left off") {
    val srcDir = Files.createTempDirectory("graft-ckpt-src").toString
    val outDir = Files.createTempDirectory("graft-ckpt-out").toString
    def post(id: String): String =
      s"""{"type": "submission", "subreddit": "s", "id": "$id", "text": "fast fast fast slow", "created_utc": 1.7e9, "author": "a"}"""

    Files.write(Paths.get(srcDir, "b0.txt"), post("r1").getBytes("UTF-8"))
    val q1 = MicroBatchPipeline.run(
      MicroBatchPipeline.fileLines(spark, srcDir), outDir, Trigger.AvailableNow())
    q1.awaitTermination(120000)
    assert(spark.read.parquet(s"$outDir/processed/processed_*").count() === 1)

    // second run against the SAME checkpoint: only the new file is consumed
    Files.write(Paths.get(srcDir, "b1.txt"), post("r2").getBytes("UTF-8"))
    val q2 = MicroBatchPipeline.run(
      MicroBatchPipeline.fileLines(spark, srcDir), outDir, Trigger.AvailableNow())
    q2.awaitTermination(120000)
    val ids = spark.read.parquet(s"$outDir/processed/processed_*")
      .select($"id").as[String].collect().toSeq
    assert(ids.sorted === Seq("r1", "r2"))   // r1 not reprocessed
  }

  test("maxFilesPerTrigger drains a file backlog as bounded batches, not one catch-up batch") {
    val srcDir = Files.createTempDirectory("graft-throttle-src").toString
    for (i <- 0 until 3)
      Files.write(Paths.get(srcDir, s"f$i.txt"), s"line$i".getBytes("UTF-8"))

    val batchSizes = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = MicroBatchPipeline.fileLines(spark, srcDir, maxFilesPerTrigger = 1)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batchSizes.put(id, df.count()); ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-throttle-ckpt").toString)
      .start()
    q.awaitTermination(120000)

    import scala.jdk.CollectionConverters._
    val sizes = batchSizes.asScala.toSeq.sortBy(_._1).map(_._2)
    // 3 files, admission capped at 1 file/batch -> 3 batches of 1 row each
    // (an unbounded source would admit all 3 files into one batch)
    assert(sizes === Seq(1L, 1L, 1L), s"batch sizes: $sizes")
  }

  test("empty batches write nothing and do not fail") {
    val srcDir = Files.createTempDirectory("graft-stream-empty").toString
    val outDir = Files.createTempDirectory("graft-stream-empty-out").toString
    Files.write(Paths.get(srcDir, "b.txt"),
      """{"type": "keepalive", "timestamp": 1.0}""".getBytes("UTF-8"))
    val q = MicroBatchPipeline.run(
      MicroBatchPipeline.fileLines(spark, srcDir), outDir,
      Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(spark.read.parquet(s"$outDir/raw/*").count() === 1)
    assert(!Files.exists(Paths.get(outDir, "processed")))
    assert(!Files.exists(Paths.get(outDir, "sentiment")))
  }
}
