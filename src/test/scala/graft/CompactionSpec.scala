package graft

import graft.streaming.Compaction
import java.nio.file.Files

/** Small-file compaction: many per-batch files collapse to the computed
  * target count with identical data; an already-compact dir is untouched. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compacts many small files into the target count, data intact") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/metrics"
    // 12 single-file appends, like 12 micro-batches
    for (b <- 0 until 12)
      Seq((b.toLong, s"batch$b")).toDF("id", "tag")
        .coalesce(1).write.mode("append").parquet(dir)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(before.size === 12)

    // huge target => everything fits one file
    val (nBefore, nAfter) = Compaction.compact(spark, dir, targetBytes = 1L << 30)
    assert(nBefore === 12 && nAfter === 1)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet === before)

    // idempotent: already compact
    assert(Compaction.compact(spark, dir, targetBytes = 1L << 30) === ((1, 1)))
  }

  test("missing directory is a no-op") {
    assert(Compaction.compact(spark, "/tmp/graft-no-such-dir-xyz") === ((0, 0)))
  }
}
