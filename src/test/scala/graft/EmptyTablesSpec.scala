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
}
