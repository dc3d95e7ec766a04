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
