package graft

import graft.streaming.StreamSemDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming semantic near-dup screen end-to-end: multi-batch replay with
  * cross-batch suppression against the persisted sign-LSH index. Exact
  * duplicates (cosine 1.0, identical bucket by construction) drive the
  * suppression assertions; orthogonal vectors (cosine 0) the keeps — so no
  * assertion rides on LSH recall geometry. */
class StreamSemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def unit(d: Int): Array[Float] =
    Array.tabulate(8)(i => if (i == d) 1f else 0f)

  test("multi-batch replay: semantic dups suppressed within and across batches") {
    val base = Files.createTempDirectory("graft-ssem").toString
    val (indexDir, outDir, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")
    val in = MemoryStream[(Long, Array[Float])](spark)
    val q = StreamSemDedup.run(in.toDF().toDF("vec_id", "embedding"),
      indexDir, outDir, ckpt)
    try {
      // batch 1: vec 10 duplicates vec 0 -> intra-batch keep-lowest drops it
      in.addData((0L, unit(0)), (10L, unit(0)), (1L, unit(1)))
      q.processAllAvailable()
      // batch 2: vec 2 re-sends unit(0) -> suppressed by the batch-1 index
      in.addData((2L, unit(0)), (3L, unit(2)))
      q.processAllAvailable()
      // batch 3: vec 4 re-sends unit(2) (kept a batch earlier) -> suppressed
      in.addData((4L, unit(2)), (5L, unit(3)))
      q.processAllAvailable()

      val kept = spark.read.parquet(outDir)
        .select($"vec_id").as[Long].collect().toSeq.sorted
      assert(kept === Seq(0L, 1L, 3L, 5L))
      // the index carries exactly the survivors, in the batch query's layout
      val idx = spark.read.parquet(indexDir)
      assert(idx.columns.sorted === Seq("bucket", "old_emb", "old_id", "old_nrm"))
      assert(idx.select($"old_id").as[Long].collect().toSeq.sorted
        === Seq(0L, 1L, 3L, 5L))
    } finally q.stop()
  }

  test("checkpoint restart: the sign-LSH index survives the kill, no double-emission") {
    // kill the query between micro-batches with the next delivery already
    // pending, restart from the SAME checkpoint: batch 1's survivors must
    // not re-emit (offsets committed), and batch 2's exact duplicate must
    // be suppressed by the PERSISTED index — the durable state a 100 TB
    // ingest cannot afford to reset on restart. Chain-free fixture, so the
    // final survivor set equals the single-pass batch screen on all rows.
    val base = Files.createTempDirectory("graft-ssem-restart").toString
    val (indexDir, outDir, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")
    val in = MemoryStream[(Long, Array[Float])](spark)
    def start() = StreamSemDedup.run(in.toDF().toDF("vec_id", "embedding"),
      indexDir, outDir, ckpt)

    val q1 = start()
    try { in.addData((0L, unit(0)), (1L, unit(1))); q1.processAllAvailable() }
    finally q1.stop()   // kill...

    in.addData((2L, unit(0)), (3L, unit(2)))   // ...batch 2 pending across it
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val kept = spark.read.parquet(outDir)
      .select($"vec_id").as[Long].collect().toSeq.sorted
    assert(kept === Seq(0L, 1L, 3L))
    assert(spark.read.parquet(indexDir)
      .select($"old_id").as[Long].collect().toSeq.sorted === Seq(0L, 1L, 3L))
  }

  test("crash-window replay re-emits survivors, never self-suppresses") {
    // the lost-commit recovery path: a fresh checkpoint replays the memory
    // source from offset 0, re-running the committed batch against an index
    // that already holds its own rows — the replayed vectors must RE-EMIT
    // (self-matches excluded by vec_id; index-first ordering would swallow
    // them), and the duplicated index rows must not suppress novel vectors
    val base = Files.createTempDirectory("graft-ssem-crash").toString
    val (indexDir, outDir) = (s"$base/index", s"$base/out")
    val in = MemoryStream[(Long, Array[Float])](spark)
    def start(ckpt: String) = StreamSemDedup.run(
      in.toDF().toDF("vec_id", "embedding"), indexDir, outDir, s"$base/$ckpt")

    val q1 = start("ckpt1")
    try { in.addData((0L, unit(0)), (1L, unit(1))); q1.processAllAvailable() }
    finally q1.stop()

    val q2 = start("ckpt2")
    try {
      q2.processAllAvailable()           // replay of the committed delivery
      in.addData((5L, unit(2)))          // novel vector after the replay
      q2.processAllAvailable()
      in.addData((6L, unit(0)))          // true dup of the twice-indexed vec
      q2.processAllAvailable()
    } finally q2.stop()

    val emitted = spark.read.parquet(outDir)
      .select($"vec_id").as[Long].collect().toSeq.sorted
    assert(emitted === Seq(0L, 0L, 1L, 1L, 5L))
  }

  test("below-threshold vectors in the same bucket survive the exact-cosine gate") {
    val base = Files.createTempDirectory("graft-ssem-thr").toString
    val (indexDir, outDir, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")
    val in = MemoryStream[(Long, Array[Float])](spark)
    val q = StreamSemDedup.run(in.toDF().toDF("vec_id", "embedding"),
      indexDir, outDir, ckpt)
    try {
      in.addData((0L, unit(0)))
      q.processAllAvailable()
      // cosine(v, unit(0)) = 0.6 < 0.9: kept even if LSH buckets collide
      in.addData((1L, Array(0.6f, 0.8f, 0f, 0f, 0f, 0f, 0f, 0f)))
      q.processAllAvailable()
      val kept = spark.read.parquet(outDir)
        .select($"vec_id").as[Long].collect().toSeq.sorted
      assert(kept === Seq(0L, 1L))
    } finally q.stop()
  }
}
