package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming throughput measurement for the parity pipeline (dev harness,
  * like Prof): replays the sf documents table through the FULL
  * MicroBatchPipeline — wire-format JSON lines, file source throttled to
  * one file per trigger, foreachBatch with every metric sink and retention
  * — at a fixed records/batch, and reports per-micro-batch wall time
  * against the reference's 10 s ProcessingTime budget
  * (reddit_consumer.py:34, 499).
  *
  * This turns the batch-derived "parity families sum ~4-5 s at sf0.1"
  * claim into a DIRECTLY measured stream number: sustained records/s and
  * p50/p95 batch seconds over the replay. Batch times come from the
  * engine's own StreamingQueryProgress (triggerExecution duration), not
  * an outer stopwatch, so queue/admission time between triggers is not
  * miscounted as processing.
  *
  * Usage: runMain graft.streaming.StreamBench [recordsPerBatch] [replicate]
  *   recordsPerBatch (default 500): wire lines per replay file = per batch.
  *   replicate (default 1): replicate the corpus N× (distinct ids) to
  *     extend the run — at sf0.1's 5,000 docs, replicate=10 with 5,000
  *     records/batch exercises 10 batches of 10× the reference's volume.
  *
  * With NO arguments it runs the standard envelopes — 500 rec/batch ×1
  * (the reference consumer's configured volume, reddit_consumer.py:497)
  * and 5,000 rec/batch ×10 (10× volume), for the parity pipeline, the
  * [[IngestHub]] six-maintainer composite, the [[StreamIvf]]
  * maintained-ANN ingest, the [[StreamCanary]] memorization-audit
  * maintainer AND the [[StreamBt]] preference-ladder maintainer
  * (`runMain … StreamBench ingest|ann|canary|bt
  * [recordsPerBatch] [replicate]` drives one alone) — and, in addition
  * to printing each run's JSON line, writes
  * the combined artifact to `SPARK_GRAFT_STREAMBENCH_OUT` (default
  * `STREAMBENCH.json` in the working directory) so the per-round
  * envelope is machine-readable and trendable beside BENCH_r{N}.json
  * rather than living in NOTES prose.
  */
object StreamBench {

  /** Per-batch stats from a finished streaming query's own
    * recentProgress ring → one JSON line (shared by the parity-pipeline
    * and IngestHub envelopes). `rows` is the record count this harness
    * WROTE (the engine's numInputRows re-counts per foreachBatch
    * action). */
  private def progressLine(metric: String,
      q: org.apache.spark.sql.streaming.StreamingQuery, rows: Long,
      perBatch: Int, wall: Double): String = {
    val batches = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => (p.batchId, p.numInputRows,
        p.durationMs.getOrDefault("triggerExecution", 0L)))
      .sortBy(_._1)
    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) 0.0
      else xs(math.min(xs.size - 1, math.ceil(p * xs.size).toInt - 1))
    val secs = batches.map(_._3 / 1000.0)
    // batch 0 pays whole-pipeline codegen/JIT once per process; report it
    // separately from the steady state. Single-batch runs have no steady
    // state: fall back to the full set so the line never carries NaN.
    val steady = if (secs.size > 1) secs.drop(1).sorted else secs.sorted
    // steady rows = written rows minus batch 0's ACTUAL share (round-16
    // advice: the pmod slices are uneven and the tail slice is short, so
    // assuming batch 0 = perBatch misstated steadyRecPerSec). numInputRows
    // can be uniformly inflated by multi-action foreachBatch re-counts,
    // so take batch 0's SHARE of the engine total, scaled to the rows the
    // harness actually wrote.
    val inputTotal = batches.map(_._2).sum.toDouble
    val steadyRows =
      if (secs.size > 1 && inputTotal > 0)
        rows * (1.0 - batches.head._2 / inputTotal)
      else rows.toDouble
    val busy = secs.sum
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    s"""{"metric":"$metric","recordsPerBatch":$perBatch,"batches":${batches.size},""" +
      s""""rows":$rows,"recPerSec":${f(rows / busy)},""" +
      s""""steadyRecPerSec":${f(steadyRows / steady.sum)},""" +
      s""""firstBatchSec":${f(secs.headOption.getOrElse(0.0))},""" +
      s""""p50BatchSec":${f(pct(steady, 0.5))},"p95BatchSec":${f(pct(steady, 0.95))},""" +
      s""""maxBatchSec":${f(pct(steady, 1.0))},"busySec":${f(busy)},"wallSec":${f(wall)},""" +
      s""""triggerBudgetSec":10.0}"""
  }

  /** One replay at the given volume; returns the result as a JSON line. */
  def runOnce(spark: SparkSession, sfDir: String, perBatch: Int,
      replicate: Int): String = {
    import spark.implicits._

    // wire-format lines, the q_parse_clean mapping (FIXTURES.md §3)
    val docs = Tables.documents(spark, sfDir)
    val lines = (0 until replicate).map { r =>
      docs.select(to_json(struct(
        lit("submission").as("type"),
        $"lang".as("subreddit"),
        ($"doc_id" + lit(r.toLong * (1L << 40))).cast(StringType).as("id"),
        $"text",
        (lit(1.7e9) + $"doc_id" * lit(1.5)).as("created_utc"),
        $"source".as("author"))).as("value"))
    }.reduce(_ unionByName _).as[String].collect() // sf0.1: 5k docs × N, driver-side fan-in is the replay HARNESS, not the pipeline

    val srcDir = java.nio.file.Files.createTempDirectory("graft-sbench-src")
    val outDir = java.nio.file.Files.createTempDirectory("graft-sbench-out").toString
    val files = lines.grouped(perBatch).zipWithIndex.toSeq
    files.foreach { case (chunk, i) =>
      java.nio.file.Files.write(srcDir.resolve(f"replay_$i%05d.txt"),
        chunk.mkString("\n").getBytes("UTF-8"))
    }

    val t0 = System.nanoTime()
    val q = MicroBatchPipeline.run(
      MicroBatchPipeline.fileLines(spark, srcDir.toString, maxFilesPerTrigger = 1),
      outDir, Trigger.AvailableNow())
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9

    // per-batch durations from the query's own recentProgress ring
    // (synchronous — a StreamingQueryListener delivers through the async
    // listener bus and can still be missing the LAST batches when
    // awaitTermination returns, nondeterministically skewing the stats;
    // round-11 review catch). The ring holds the last
    // spark.sql.streaming.numRecentProgressUpdates (default 100) entries —
    // far above any replay size this harness drives.
    progressLine("stream", q, lines.length.toLong, perBatch, wall)
  }

  /** One IngestHub replay at the given volume (round-15 verdict item #3a:
    * the six-maintainer composite is the deployment shape, so it gets its
    * own measured envelope): the documents table replayed as parquet
    * slices of ~`perBatch` docs, one slice per trigger, through
    * [[IngestHub.run]] — every batch advances all six delta logs. Same
    * stats, same 10 s budget. */
  def runIngestOnce(spark: SparkSession, sfDir: String, perBatch: Int,
      replicate: Int): String = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"lang", $"source")
    val all = (0 until replicate).map { r =>
      docs.select(($"doc_id" + lit(r.toLong * (1L << 40))).as("doc_id"),
        $"text", $"lang", $"source")
    }.reduce(_ unionByName _)
    val rows = all.count()
    val nSlices = math.max(1, math.ceil(rows.toDouble / perBatch).toInt)

    val srcDir = java.nio.file.Files.createTempDirectory("graft-sbench-ing")
    for (s <- 0 until nSlices)
      all.filter(pmod($"doc_id", lit(nSlices.toLong)) === s)
        .coalesce(1) // one file per slice = one slice per trigger
        .write.parquet(f"$srcDir/slice_$s%05d.parquet")
    val baseDir = java.nio.file.Files
      .createTempDirectory("graft-sbench-hub").toString

    val stream = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir.toString)
    val t0 = System.nanoTime()
    val q = IngestHub.run(stream, baseDir, Trigger.AvailableNow())
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    progressLine("ingest", q, rows, perBatch, wall)
  }

  /** One StreamIvf replay at the given volume (round-16 verdict item #4:
    * the maintained-ANN ingest shape was the one stateful deployment
    * without a measured envelope): the embeddings table replayed as
    * parquet slices of ~`perBatch` vectors, one slice per trigger,
    * through [[StreamIvf.run]] against the codebook FROZEN from the
    * unreplicated base corpus (the production shape: the quantizer is
    * trained once, offline; ingest only scores against it). Same stats,
    * same 10 s budget. */
  def runAnnOnce(spark: SparkSession, sfDir: String, perBatch: Int,
      replicate: Int): String = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val cents = StreamIvf.frozenCentroids(spark, sfDir)
    val pqCents = StreamIvf.frozenPqCents(spark, sfDir)
    val all = (0 until replicate).map { r =>
      emb.select(($"vec_id" + lit(r.toLong * (1L << 40))).as("vec_id"),
        $"embedding")
    }.reduce(_ unionByName _)
    val rows = all.count()
    val nSlices = math.max(1, math.ceil(rows.toDouble / perBatch).toInt)

    val srcDir = java.nio.file.Files.createTempDirectory("graft-sbench-ann")
    for (s <- 0 until nSlices)
      all.filter(pmod($"vec_id", lit(nSlices.toLong)) === s)
        .coalesce(1) // one file per slice = one slice per trigger
        .write.parquet(f"$srcDir/slice_$s%05d.parquet")
    val logDir = java.nio.file.Files
      .createTempDirectory("graft-sbench-ivf").toString

    val stream = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir.toString)
    val t0 = System.nanoTime()
    val q = StreamIvf.run(stream, logDir, cents, pqCents,
      Trigger.AvailableNow())
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    progressLine("ann", q, rows, perBatch, wall)
  }

  /** One StreamCanary replay at the given volume — the memorization-audit
    * maintainer's ingest shape (two additive logs per batch: gram
    * occurrences + term counts). Same stats, same 10 s budget. */
  def runCanaryOnce(spark: SparkSession, sfDir: String, perBatch: Int,
      replicate: Int): String = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val all = (0 until replicate).map { r =>
      docs.select(($"doc_id" + lit(r.toLong * (1L << 40))).as("doc_id"),
        $"text")
    }.reduce(_ unionByName _)
    val rows = all.count()
    val nSlices = math.max(1, math.ceil(rows.toDouble / perBatch).toInt)

    val srcDir = java.nio.file.Files.createTempDirectory("graft-sbench-can")
    for (s <- 0 until nSlices)
      all.filter(pmod($"doc_id", lit(nSlices.toLong)) === s)
        .coalesce(1) // one file per slice = one slice per trigger
        .write.parquet(f"$srcDir/slice_$s%05d.parquet")
    val logDir = java.nio.file.Files
      .createTempDirectory("graft-sbench-canary").toString

    val stream = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir.toString)
    val t0 = System.nanoTime()
    val q = StreamCanary.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    progressLine("canary", q, rows, perBatch, wall)
  }

  /** One StreamBt replay at the given volume — the preference-ladder
    * maintainer's ingest shape (one additive histogram delta per batch).
    * Same stats, same 10 s budget. */
  def runBtOnce(spark: SparkSession, sfDir: String, perBatch: Int,
      replicate: Int): String = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
    val all = (0 until replicate).map { r =>
      docs.select(($"doc_id" + lit(r.toLong * (1L << 40))).as("doc_id"),
        $"source", $"text")
    }.reduce(_ unionByName _)
    val rows = all.count()
    val nSlices = math.max(1, math.ceil(rows.toDouble / perBatch).toInt)

    val srcDir = java.nio.file.Files.createTempDirectory("graft-sbench-bt")
    for (s <- 0 until nSlices)
      all.filter(pmod($"doc_id", lit(nSlices.toLong)) === s)
        .coalesce(1) // one file per slice = one slice per trigger
        .write.parquet(f"$srcDir/slice_$s%05d.parquet")
    val logDir = java.nio.file.Files
      .createTempDirectory("graft-sbench-btlog").toString

    val stream = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir.toString)
    val t0 = System.nanoTime()
    val q = StreamBt.run(stream, logDir, Trigger.AvailableNow())
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    progressLine("bt", q, rows, perBatch, wall)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.nonEmpty) {
      // dev mode: one run at the requested volume, line to stdout only;
      // leading "ingest" drives the IngestHub composite, leading "ann"
      // the StreamIvf maintainer, instead of the parity pipeline
      val mode = args.head match {
        case m @ ("ingest" | "ann" | "canary" | "bt") => m
        case _ => "stream"
      }
      val rest = if (mode == "stream") args else args.tail
      val perBatch = rest.headOption.flatMap(_.toIntOption).getOrElse(500)
      val replicate = rest.drop(1).headOption.flatMap(_.toIntOption).getOrElse(1)
      println(mode match {
        case "ingest" => runIngestOnce(spark, sfDir, perBatch, replicate)
        case "ann" => runAnnOnce(spark, sfDir, perBatch, replicate)
        case "canary" => runCanaryOnce(spark, sfDir, perBatch, replicate)
        case "bt" => runBtOnce(spark, sfDir, perBatch, replicate)
        case _ => runOnce(spark, sfDir, perBatch, replicate)
      })
    } else {
      // artifact mode: all ten standard envelopes (parity pipeline,
      // IngestHub composite, StreamIvf maintainer, StreamCanary
      // maintainer, StreamBt maintainer — each at reference and 10x
      // volume), combined JSON to disk
      val ref = runOnce(spark, sfDir, 500, 1)
      println(ref)
      val x10 = runOnce(spark, sfDir, 5000, 10)
      println(x10)
      val ing = runIngestOnce(spark, sfDir, 500, 1)
      println(ing)
      val ingX10 = runIngestOnce(spark, sfDir, 5000, 10)
      println(ingX10)
      val ann = runAnnOnce(spark, sfDir, 500, 1)
      println(ann)
      val annX10 = runAnnOnce(spark, sfDir, 5000, 10)
      println(annX10)
      val can = runCanaryOnce(spark, sfDir, 500, 1)
      println(can)
      val canX10 = runCanaryOnce(spark, sfDir, 5000, 10)
      println(canX10)
      val bt = runBtOnce(spark, sfDir, 500, 1)
      println(bt)
      val btX10 = runBtOnce(spark, sfDir, 5000, 10)
      println(btX10)
      val out = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_OUT", "STREAMBENCH.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (s"""{"metric":"streambench","sfDir":"$sfDir","reference":$ref,"x10":$x10,""" +
          s""""ingest":$ing,"ingest_x10":$ingX10,""" +
          s""""ann":$ann,"ann_x10":$annX10,""" +
          s""""canary":$can,"canary_x10":$canX10,""" +
          s""""bt":$bt,"bt_x10":$btX10}\n""").getBytes("UTF-8"))
      println(s"wrote $out")
    }
    spark.stop()
  }
}
