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

  test("checkpoint restart: suppression state survives the kill, no double-emission") {
    // the round-11 twins' recovery discipline applied to the durable-index
    // screen: kill the query between micro-batches (with the next batch's
    // data already pending), restart from the SAME checkpoint, and the
    // restarted query must (a) not re-emit batch 1's survivors (offsets
    // committed) and (b) suppress batch 2's near-dups from the PERSISTED
    // index, not a reset one. The fixture is chain-free, so the final
    // survivor set equals the single-pass batch screen on the full input.
    val base = Files.createTempDirectory("graft-ssim-restart").toString
    val (indexDir, outDir, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")
    val in = MemoryStream[(Long, String)](spark)
    def start() =
      StreamSimhash.run(in.toDF().toDF("doc_id", "text"), indexDir, outDir, ckpt)

    val q1 = start()
    try { in.addData((0L, tA), (1L, tB)); q1.processAllAvailable() }
    finally q1.stop()   // kill mid-stream...

    in.addData((2L, tA), (3L, tC))   // ...with batch 2 already pending
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    // doc 2 suppressed by doc 0's RESTORED index entry; 0/1 emitted once
    val kept = spark.read.parquet(outDir)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(kept === Seq(0L, 1L, 3L))
    val idx = spark.read.parquet(indexDir)
      .as[(Long, Long)].collect().toMap
    assert(idx.keySet === Set(0L, 1L, 3L))
  }

  test("crash-window replay re-emits survivors, never self-suppresses") {
    // the documented crash window: survivors + signatures written, but the
    // checkpoint commit lost — on recovery the batch re-runs through
    // foreachBatch against an index that ALREADY holds its own rows.
    // Simulated by re-delivering the committed batch through a fresh
    // checkpoint (the metadata log refuses hand-deleted commit files as
    // concurrent use, so the replay is driven at the delivery layer — the
    // foreachBatch body cannot tell the difference). The contract: the
    // replayed docs RE-EMIT (at-least-once; self-matches excluded by
    // doc_id — index-first ordering would swallow them silently), and the
    // replay-duplicated index rows neither suppress novel documents nor
    // weaken suppression of true near-dups
    val base = Files.createTempDirectory("graft-ssim-crash").toString
    val (indexDir, outDir) = (s"$base/index", s"$base/out")
    val in = MemoryStream[(Long, String)](spark)
    def start(ckpt: String) =
      StreamSimhash.run(in.toDF().toDF("doc_id", "text"), indexDir, outDir,
        s"$base/$ckpt")

    val q1 = start("ckpt1")
    try { in.addData((0L, tA), (1L, tB)); q1.processAllAvailable() }
    finally q1.stop()

    // recovery replay: a fresh checkpoint makes the memory source replay
    // from offset 0, re-running the already-committed delivery
    val q2 = start("ckpt2")
    try {
      q2.processAllAvailable()
      in.addData((5L, tC))       // novel doc after the replay
      q2.processAllAvailable()
      in.addData((6L, tA))       // true near-dup of the twice-indexed doc
      q2.processAllAvailable()
    } finally q2.stop()

    val emitted = spark.read.parquet(outDir)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    // at-least-once: 0 and 1 appear TWICE (replayed), never zero times;
    // the novel doc survives; the near-dup (6) is still suppressed
    assert(emitted === Seq(0L, 0L, 1L, 1L, 5L))
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
