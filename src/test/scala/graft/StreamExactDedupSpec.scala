package graft

import graft.operators.Dedup
import graft.streaming.StreamExactDedup
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming exact-dedup registry end-to-end: documents replayed in
  * micro-batches, the (fp, min_id, cnt) delta log folded at query time —
  * the registry must equal q_dedup_exact bit-for-bit on the same corpus,
  * INCLUDING duplicate groups whose copies arrive in different batches
  * (the case the fold's associativity exists for), plus the dashboard
  * summary and recovery replay. */
class StreamExactDedupSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  test("folded registry equals q_dedup_exact; cross-batch dups fold; recovery") {
    // fixture: docs 2 and 3 are EXACT duplicates and doc_id % 3 puts them
    // in DIFFERENT micro-batches — the cross-batch group must still fold
    // to keeper 2 with 2 copies
    val docs = Tables.documents(spark, fixtureDir)
    val logDir = Files.createTempDirectory("graft-exactdedup").toString
    val srcDir = Files.createTempDirectory("graft-exactdedup-src").toString
    for (s <- 0 until 3)
      docs.filter($"doc_id" % 3 === s)
        .select($"doc_id", $"text")
        .write.parquet(s"$srcDir/slice_$s.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/slice_0.parquet").schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = StreamExactDedup.run(stream, logDir, Trigger.AvailableNow())
    assert(q.awaitTermination(120000), "maintainer did not terminate")

    val batch = rows(Dedup.qDedupExact.run(spark, fixtureDir))
    assert(rows(StreamExactDedup.registry(spark, logDir)) === batch)
    // the cross-batch duplicate group really folded (keeper 2, 2 copies)
    val g = StreamExactDedup.registry(spark, logDir)
      .filter($"keep_id" === 2L).collect()
    assert(g.length === 1 && g.head.getAs[Long]("n_copies") === 2L)

    // summary = the same numbers derived from the batch registry
    val s = StreamExactDedup.summary(spark, logDir).collect().head
    assert(s.getAs[Long]("n_texts") === batch.size.toLong)
    assert(s.getAs[Long]("n_docs") === 6L)
    assert(s.getAs[Long]("dup_docs") === 1L)

  }

  test("real corpus: registry bit-equal to q_dedup_exact at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val logDir = Files.createTempDirectory("graft-exactdedup-sf").toString
    for (s <- 0 until 3)
      StreamExactDedup.processBatch(
        docs.filter($"doc_id" % 3 === s).select($"doc_id", $"text"),
        s.toLong, logDir)
    val batch = rows(Dedup.qDedupExact.run(spark, dir))
    assert(rows(StreamExactDedup.registry(spark, logDir)) === batch)

    // recovery replay of batch 1: fixed-path overwrite is correctness
    // (here the batch id <-> slice mapping is OURS, unlike the file
    // source's listing-order batches in the streaming test above)
    StreamExactDedup.processBatch(
      docs.filter($"doc_id" % 3 === 1).select($"doc_id", $"text"),
      1L, logDir)
    assert(rows(StreamExactDedup.registry(spark, logDir)) === batch)
  }
}
