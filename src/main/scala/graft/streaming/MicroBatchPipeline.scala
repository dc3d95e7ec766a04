package graft.streaming

import graft.functions.{Det, SentimentLexicon, Text}
import graft.operators.TextAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** The reference's streaming shell (SURVEY.md §2.11, §3.1) rebuilt on
  * Structured Streaming:
  *
  *   source (socket / file / MemoryStream) → foreachBatch(processBatch) with
  *   Trigger.ProcessingTime + a kept (not deleted) checkpoint.
  *
  * Per batch — the reference's process_batch (reddit_consumer.py:282-444)
  * with its two defects fixed:
  *   - the batch is persisted once (the reference re-executes the whole
  *     parse+filter+UDF lineage for every one of its ~10 actions);
  *   - every metric row carries an explicit (timestamp, batch_id), making
  *     the dashboard's "keep-last" dedup deterministic (SURVEY.md §7.4.5).
  *
  * All analytics are per-batch and stateless across batches, exactly like
  * the reference — state lives only in the appended metric files.
  */
object MicroBatchPipeline {

  /** Parse wire JSON + cleaning filter + derived columns (P1/P2/P3). The
    * parse+clean step is TextAnalytics.parseClean — the same definition the
    * oracle-checked q_parse_clean runs, so the streaming path can never
    * drift from it. */
  def parseBatch(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    TextAnalytics.parseClean(batch)
      .withColumn("created_time", $"created_utc".cast(TimestampType))
      .withColumn("text_length", length($"text").cast(LongType))
  }

  /** Relational lexicon sentiment for a parsed batch (U1 tier (a)). */
  def withSentiment(parsed: DataFrame): DataFrame = {
    val spark = parsed.sparkSession
    import spark.implicits._
    val scores = parsed
      .select($"id", explode(Text.tokens($"text")).as("term"))
      .join(broadcast(SentimentLexicon.df(spark)), Seq("term"), "left")
      .groupBy($"id")
      .agg(Det.qround(sum(coalesce($"valence", lit(0.0)).cast(DecimalType(38, Det.Scale)))
        .cast(DoubleType) / count(lit(1))).as("sentiment"))
    parsed.join(scores, Seq("id"), "left")
      .na.fill(0.0, Seq("sentiment"))
  }

  /** Delete any file under `dir` that an earlier attempt of THIS batch
    * wrote (the replace-my-batch replay sweep) — resolved through the
    * Hadoop FileSystem API so idempotent recovery works on any supported
    * scheme (local, HDFS, S3A), not just java.io-visible paths. */
  private def sweepBatchFiles(spark: SparkSession, dir: String,
      namePattern: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      fs.listStatus(root)
        .filter(st => st.getPath.getName.matches(namePattern))
        .foreach(st => fs.delete(st.getPath, true))
  }

  /** One micro-batch: persist once, fan out to metric sinks, apply retention.
    * Mirrors reddit_consumer.py:282-444 action-for-action. */
  def processBatch(batch: DataFrame, batchId: Long, outDir: String,
                   retentionBytes: Long = 1L << 20): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    val stamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    // S4: raw batch persisted before parse — at a per-batch timestamped
    // path with the replay sweep, like the processed snapshots below: a
    // checkpoint-recovery replay overwrites its own raw data instead of
    // double-counting it (a flat append has no way to identify, much less
    // replace, a replayed batch's rows — the reference's defect).
    sweepBatchFiles(spark, s"$outDir/raw", s"raw_\\d{8}_\\d{6}_b$batchId\\.parquet")
    batch.write.mode("overwrite")
      .parquet(s"$outDir/raw/raw_${stamp}_b$batchId.parquet")

    val processed = withSentiment(parseBatch(batch))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!processed.isEmpty) {
        processed.createOrReplaceTempView("processed") // S10: SQL surface
        val now = current_timestamp()

        // S5/F12: per-batch processed snapshot at a timestamped path, the
        // reference's processed_%Y%m%d_%H%M%S.parquet naming
        // (reddit_consumer.py:321-326) — plus a batch-id suffix and the
        // replace-my-batch sweep so a checkpoint-recovery REPLAY of the same
        // batch overwrites its own snapshot instead of duplicating it (the
        // reference's pure-timestamp naming would duplicate on replay).
        // Every row still carries batch_id via the metric sinks below.
        sweepBatchFiles(spark, s"$outDir/processed",
          s"processed_\\d{8}_\\d{6}_b$batchId\\.parquet")
        processed.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/processed/processed_${stamp}_b$batchId.parquet")

        // sentiment metric (reddit_consumer.py:356-366)
        processed
          .agg(Det.davg($"sentiment").as("average_sentiment"))
          .select(now.as("timestamp"), lit(batchId).as("batch_id"), $"average_sentiment")
          .coalesce(1).write.mode("append").parquet(s"$outDir/sentiment")

        // per-subreddit stats (reddit_consumer.py:375-389)
        processed
          .groupBy($"subreddit")
          .agg(count(lit(1)).as("post_count"),
            approx_count_distinct($"author").as("unique_authors"),
            Det.davg($"text_length").as("avg_length"))
          .select(now.as("timestamp"), lit(batchId).as("batch_id"),
            $"subreddit", $"post_count", $"unique_authors", $"avg_length")
          .coalesce(1).write.mode("append").parquet(s"$outDir/subreddit_stats")

        // reference extraction totals (reddit_consumer.py:400-429)
        processed
          .select(
            Text.refCount($"text", Text.userRefPattern).cast(LongType).as("u"),
            Text.refCount($"text", Text.subRefPattern).cast(LongType).as("s"),
            Text.refCount($"text", Text.urlRefPattern).cast(LongType).as("l"))
          .agg(sum($"u").as("total_user_refs"), sum($"s").as("total_sub_refs"),
            sum($"l").as("total_urls"))
          .select(now.as("timestamp"), lit(batchId).as("batch_id"),
            $"total_user_refs", $"total_sub_refs", $"total_urls")
          .coalesce(1).write.mode("append").parquet(s"$outDir/references")

        // S11: size-based retention per metric dir
        for (d <- Seq("sentiment", "subreddit_stats", "references"))
          Retention.enforce(s"$outDir/$d", retentionBytes)
      }
    } finally processed.unpersist()
  }

  /** S7: optional JDBC sink (reference reddit_consumer.py:329-338 pushes
    * each batch to Postgres and tolerates failure). Disabled unless a URL is
    * configured — this environment has no egress, so the path is compiled
    * and flag-gated but intentionally outside the verified surface, exactly
    * as SURVEY.md §2.1/S7 prescribes. */
  def jdbcSink(df: DataFrame, urlOpt: Option[String], table: String): Unit =
    urlOpt.foreach { url =>
      try df.write.mode("append").format("jdbc")
        .option("url", url).option("dbtable", table).save()
      catch { case e: Throwable =>
        // parity: JDBC failure must not abort local storage
        System.err.println(s"[jdbc] sink failed (continuing): ${e.getMessage}")
      }
    }

  /** Wire a streaming source of JSON lines into the batch pipeline.
    * Checkpoint is kept across runs (the reference deletes it — S12 — and
    * thereby forfeits recovery; we do not reproduce that). */
  def run(lines: DataFrame, outDir: String,
          trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    lines.writeStream
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id, outDir))
      .trigger(trigger)
      .option("checkpointLocation", s"$outDir/checkpoint")
      .start()

  /** Socket source, parity with the reference consumer (S1). */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .load()
      .select(col("value"))

  /** File-drop source for deterministic replay (S1 test alternative).
    *
    * `maxFilesPerTrigger` > 0 bounds ingest admission: at most that many
    * files enter each micro-batch. This is the file-source backpressure
    * knob at scale — after downtime, an unbounded source admits the WHOLE
    * backlog as one giant catch-up batch (blowing the trigger budget and
    * executor memory at once); bounded admission drains the same backlog
    * as a sequence of normal-sized batches. (Kafka's twin is
    * `maxOffsetsPerTrigger`; `Trigger.AvailableNow` respects both while
    * still terminating when the backlog is drained.) */
  def fileLines(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream.format("text")
    (if (maxFilesPerTrigger > 0)
       reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
     else reader)
      .load(dir).select(col("value"))
  }
}
