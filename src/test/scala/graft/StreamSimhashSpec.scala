package graft

import graft.streaming.StreamSimhash
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming SimHash near-dup screen end-to-end: multi-batch replay with
  * cross-batch suppression against the persisted signature index, plus the
  * shared-layout contract with the batch-built index. */
class StreamSimhashSpec extends SparkSpec {
  import spark.implicits._

  private val tA = "fast stream dedup keeps the first copy of every document"
  private val tB = "completely unrelated sentence about brown foxes and lazy dogs"
  private val tC = "the quick onyx goblin jumps over the silver query planner"
  private val tD = "spark partitions shuffle data across executors for joins"

  private def sig(text: String): Long =
    Seq(text).toDF("text")
      .select(call_function("simhash32", $"text").as("s"))
      .as[Long].head()

  test("distinct fixture texts are not near-dups of each other (precondition)") {
    val sigs = Seq(tA, tB, tC, tD).map(sig)
    for (Seq(a, b) <- sigs.combinations(2))
      assert(java.lang.Long.bitCount(a ^ b) > StreamSimhash.HammingMax,
        "fixture texts must be far apart for the suppression assertions to mean anything")
  }

  test("multi-batch replay: near-dups suppressed within and across batches") {
    val base = Files.createTempDirectory("graft-ssim").toString
    val (indexDir, outDir, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamSimhash.run(in.toDF().toDF("doc_id", "text"), indexDir, outDir, ckpt)
    try {
      // batch 1: doc 10 is an intra-batch dup of doc 0 -> keep-lowest drops it
      in.addData((0L, tA), (10L, tA), (1L, tB))
      q.processAllAvailable()
      // batch 2: doc 2 re-sends tA -> suppressed by the batch-1 index entry
      in.addData((2L, tA), (3L, tC))
      q.processAllAvailable()
      // batch 3: doc 4 re-sends tC (kept two batches earlier) -> suppressed
      in.addData((4L, tC), (5L, tD))
      q.processAllAvailable()

      val kept = spark.read.parquet(outDir)
        .select($"doc_id").as[Long].collect().toSeq.sorted
      assert(kept === Seq(0L, 1L, 3L, 5L))
      // the index holds exactly the survivors' signatures
      val idx = spark.read.parquet(indexDir)
        .as[(Long, Long)].collect().toMap
      assert(idx.keySet === Set(0L, 1L, 3L, 5L))
      assert(idx(0L) === sig(tA))
      assert(idx(3L) === sig(tC))
    } finally q.stop()
  }

  test("compactEvery folds the per-batch index appends into one file, content intact") {
    val base = Files.createTempDirectory("graft-ssim-compact").toString
    val (indexDir, outDir, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamSimhash.run(in.toDF().toDF("doc_id", "text"),
      indexDir, outDir, ckpt, compactEvery = 1)
    try {
      in.addData((0L, tA)); q.processAllAvailable()
      in.addData((1L, tB)); q.processAllAvailable()
      in.addData((2L, tC)); q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val dataFiles = java.nio.file.Files.list(java.nio.file.Paths.get(indexDir))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
      assert(dataFiles === 1, s"3 batch appends should compact to 1 file, found $dataFiles")
      val ids = spark.read.parquet(indexDir)
        .select($"old_id").as[Long].collect().toSeq.sorted
      assert(ids === Seq(0L, 1L, 2L))
      // and the probe path still works against the compacted index
      in.addData((3L, tA)); q.processAllAvailable()   // near-dup of doc 0
      val kept = spark.read.parquet(outDir)
        .select($"doc_id").as[Long].collect().toSeq.sorted
      assert(kept === Seq(0L, 1L, 2L))
    } finally q.stop()
  }

  test("stream screen agrees with the batch incremental dedup on driver data") {
    // Same split as q_dedup_incremental (index = first 90% of doc_ids,
    // fresh = last 10%): seed the index exactly like the batch side, stream
    // the fresh slice in one batch, and check consistency with the oracled
    // batch query. The stream screen ALSO dedups fresh-vs-fresh (keep-
    // lowest), which the batch probe deliberately does not, so:
    //   - every batch-detected dup (dup_of non-null) must be suppressed;
    //   - every stream survivor must be dup-free per the batch query.
    val dir = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft-ssim-inc").toString
    val (indexDir, outDir, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")

    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val n = docs.count()
    val cut = n - n / 10
    docs.filter($"doc_id" < cut)
      .select($"doc_id".as("old_id"),
        call_function("simhash32", $"text").as("old_sig"))
      .write.parquet(indexDir)

    val fresh = docs.filter($"doc_id" >= cut).as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamSimhash.run(in.toDF().toDF("doc_id", "text"), indexDir, outDir, ckpt)
    try {
      in.addData(fresh.toIndexedSeq)
      q.processAllAvailable()
      val survivors = spark.read.parquet(outDir)
        .select($"doc_id").as[Long].collect().toSet
      val inc = operators.Dedup.qDedupIncremental.run(spark, dir)
        .select($"doc_id", $"dup_of").as[(Long, Option[Long])].collect()
      val batchDups = inc.collect { case (id, Some(_)) => id }.toSet
      val batchClean = inc.collect { case (id, None) => id }.toSet
      assert(fresh.length === inc.length)
      assert(survivors.nonEmpty)
      assert(survivors.intersect(batchDups).isEmpty,
        "a batch-detected near-dup survived the stream screen")
      assert(survivors.subsetOf(batchClean))
    } finally q.stop()
  }

  test("a pre-existing batch-built index suppresses stream documents (shared layout)") {
    val base = Files.createTempDirectory("graft-ssim-seed").toString
    val (indexDir, outDir, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")
    // seed the index exactly like the batch pipeline would persist it
    Seq((100L, tA)).toDF("old_id", "text")
      .select($"old_id", call_function("simhash32", $"text").as("old_sig"))
      .write.parquet(indexDir)

    val in = MemoryStream[(Long, String)](spark)
    val q = StreamSimhash.run(in.toDF().toDF("doc_id", "text"), indexDir, outDir, ckpt)
    try {
      in.addData((0L, tA), (1L, tB))   // 0 collides with the seeded corpus
      q.processAllAvailable()
      val kept = spark.read.parquet(outDir)
        .select($"doc_id").as[Long].collect().toSeq.sorted
      assert(kept === Seq(1L))
    } finally q.stop()
  }
}
