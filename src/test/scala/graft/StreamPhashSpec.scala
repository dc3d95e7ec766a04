package graft

import graft.multimodal.Media
import graft.streaming.StreamPhash
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming media pHash screen end-to-end: multi-batch replay with
  * cross-batch suppression against the persisted signature index, and the
  * MODALITY-SCOPING contract — an identical payload in a different kind
  * must never be suppressed. */
class StreamPhashSpec extends SparkSpec {
  import spark.implicits._

  private val pA = "fast stream dedup keeps the first copy of every object"
  private val pB = "completely unrelated payload about brown foxes and lazy dogs"
  private val pC = "the quick onyx goblin jumps over the silver query planner"

  private def sig(payload: String): Long =
    Seq(payload).toDF("text")
      .select(call_function("ahash16", $"text").as("s"))
      .as[Long].head()

  test("distinct fixture payloads are far apart in Hamming (precondition)") {
    val sigs = Seq(pA, pB, pC).map(sig)
    for (Seq(a, b) <- sigs.combinations(2))
      assert(java.lang.Long.bitCount(a ^ b) > Media.PhashHamming,
        "fixture payloads must be far apart for the suppression assertions to bite")
  }

  test("multi-batch replay: same-kind near-dups suppressed, other modalities untouched") {
    val base = Files.createTempDirectory("graft-sphash").toString
    val (indexDir, outDir, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")
    val in = MemoryStream[(Long, String, String)](spark)
    val q = StreamPhash.run(in.toDF().toDF("media_id", "kind", "text"),
      indexDir, outDir, ckpt)
    try {
      // batch 1: 10 is an intra-batch image dup of 0 (keep-lowest drops
      // it); 1 carries the SAME payload as audio — modality scoping keeps it
      in.addData((0L, "image", pA), (10L, "image", pA), (1L, "audio", pA),
        (2L, "image", pB))
      q.processAllAvailable()
      // batch 2: 3 re-sends pA as image (index hit), 4 as audio (index
      // hit), 5 as video (no video entry -> kept), 6 is a fresh image
      in.addData((3L, "image", pA), (4L, "audio", pA), (5L, "video", pA),
        (6L, "image", pC))
      q.processAllAvailable()

      val kept = spark.read.parquet(outDir)
        .select($"media_id").as[Long].collect().toSeq.sorted
      assert(kept === Seq(0L, 1L, 2L, 5L, 6L))
      // index: survivors' signatures under their own modality
      val idx = spark.read.parquet(indexDir)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(idx.keySet === Set(0L, 1L, 2L, 5L, 6L))
      assert(idx(0L) === (("image", sig(pA))))
      assert(idx(1L) === (("audio", sig(pA))))
      assert(idx(5L) === (("video", sig(pA))))
    } finally q.stop()
  }

  test("checkpoint restart: the signature index survives the kill, modality scoping intact") {
    // kill between micro-batches with the next delivery pending, restart
    // from the SAME checkpoint: batch 1's survivors must not re-emit, and
    // the restarted screen must suppress a same-kind near-dup from the
    // PERSISTED index while still keeping the same payload in a different
    // modality (the scoping contract must survive recovery too)
    val base = Files.createTempDirectory("graft-sphash-restart").toString
    val (indexDir, outDir, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")
    val in = MemoryStream[(Long, String, String)](spark)
    def start() = StreamPhash.run(in.toDF().toDF("media_id", "kind", "text"),
      indexDir, outDir, ckpt)

    val q1 = start()
    try { in.addData((0L, "image", pA), (1L, "image", pB)); q1.processAllAvailable() }
    finally q1.stop()   // kill...

    // ...pending across the restart: 2 = same-kind near-dup (suppress from
    // restored index), 3 = same payload as audio (modality scoping keeps it)
    in.addData((2L, "image", pA), (3L, "audio", pA))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val kept = spark.read.parquet(outDir)
      .select($"media_id").as[Long].collect().toSeq.sorted
    assert(kept === Seq(0L, 1L, 3L))
    val idx = spark.read.parquet(indexDir)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(idx === Map(0L -> "image", 1L -> "image", 3L -> "audio"))
  }

  test("crash-window replay re-emits survivors, never self-suppresses") {
    // lost-commit recovery: a fresh checkpoint replays the memory source
    // from offset 0 against an index already holding the batch's own
    // signatures — replayed objects must RE-EMIT (self-matches excluded by
    // media_id), and the duplicated index rows must neither suppress novel
    // media nor weaken suppression of true same-kind near-dups
    val base = Files.createTempDirectory("graft-sphash-crash").toString
    val (indexDir, outDir) = (s"$base/index", s"$base/out")
    val in = MemoryStream[(Long, String, String)](spark)
    def start(ckpt: String) = StreamPhash.run(
      in.toDF().toDF("media_id", "kind", "text"), indexDir, outDir, s"$base/$ckpt")

    val q1 = start("ckpt1")
    try { in.addData((0L, "image", pA), (1L, "audio", pB)); q1.processAllAvailable() }
    finally q1.stop()

    val q2 = start("ckpt2")
    try {
      q2.processAllAvailable()             // replay of the committed delivery
      in.addData((5L, "video", pC))        // novel object after the replay
      q2.processAllAvailable()
      in.addData((6L, "image", pA))        // true near-dup, twice-indexed kind
      q2.processAllAvailable()
    } finally q2.stop()

    val emitted = spark.read.parquet(outDir)
      .select($"media_id").as[Long].collect().toSeq.sorted
    assert(emitted === Seq(0L, 0L, 1L, 1L, 5L))
  }
}
