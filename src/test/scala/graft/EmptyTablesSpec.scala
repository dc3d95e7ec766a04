package graft

import java.nio.file.Files

/** Engine robustness: EVERY declared query must run (not necessarily return
  * rows) against zero-row tables. Empty inputs are where operators break in
  * practice — empty aggregates feeding division, first-K inits with no
  * rows, sequence() spines over null min/max, windows over nothing — and a
  * library a user can switch to must degrade to empty results, not throw.
  * Schemas are cloned from the driver's sf0.001 layout so the empty dir is
  * exactly a zero-row rendition of the real one. */
class EmptyTablesSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables)
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.parquet(s"$dir/$t.parquet")
    dir
  }

  test("every declared query survives zero-row tables") {
    val failures = Queries.all.flatMap { q =>
      try { q.run(spark, emptyDir).collect(); None }
      catch { case e: Throwable => Some(q.name -> e.toString.linesIterator.next()) }
    }
    assert(failures.isEmpty,
      failures.map { case (n, e) => s"$n: $e" }.mkString("\n"))
  }

  /** sf0.001 with nulls INJECTED: every 7th document loses its text, every
    * 11th its lang, every 13th its source; every 5th event loses its props.
    * Real corpora have these holes; the driver's synthetic tables do not. */
  private lazy val nullsDir: String = {
    import org.apache.spark.sql.functions.{col, when}
    val src = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-nulls").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet").write.parquet(s"$dir/$t.parquet")
    spark.read.parquet(s"$src/documents.parquet")
      .withColumn("text", when(col("doc_id") % 7 === 0, null).otherwise(col("text")))
      .withColumn("lang", when(col("doc_id") % 11 === 0, null).otherwise(col("lang")))
      .withColumn("source", when(col("doc_id") % 13 === 0, null).otherwise(col("source")))
      .write.parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$src/events.parquet")
      .withColumn("props", when(col("event_id") % 5 === 0, null).otherwise(col("props")))
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("every declared query survives null text/lang/source/props") {
    val failures = Queries.all.flatMap { q =>
      try { q.run(spark, nullsDir).collect(); None }
      catch { case e: Throwable => Some(q.name -> e.toString.linesIterator.next()) }
    }
    assert(failures.isEmpty,
      failures.map { case (n, e) => s"$n: $e" }.mkString("\n"))
  }
}
