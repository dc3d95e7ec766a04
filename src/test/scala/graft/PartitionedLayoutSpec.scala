package graft

import graft.sources.TableSource
import java.nio.file.Files

/** Hive-partitioned parquet layout: round-trip parity and — the point —
  * planning-time partition pruning (`PartitionFilters` on the scan) for
  * queries filtering on the partition column. */
class PartitionedLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy layout round-trips and prunes partitions at planning time") {
    val dir = Files.createTempDirectory("graft-partlayout").toString
    val path = TableSource.writePartitioned(
      Tables.documents(spark, fixtureDir), dir, "documents_by_lang", Seq("lang"))

    val back = spark.read.parquet(path)
    assert(back.count() === SparkSpec.fixtureDocs.size.toLong)
    assert(back.groupBy($"lang").count().as[(String, Long)].collect().toMap
      === Map("en" -> 2L, "de" -> 2L, "fr" -> 2L))

    val q = back.filter($"lang" === "en").select($"doc_id")
    val plan = q.queryExecution.executedPlan.toString
    // the lang predicate must be a PARTITION filter (directory pruning),
    // not a data filter evaluated against row groups
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.replaceAll("#\\d+", "").contains("(lang = en)"), plan)
    // collect through q's own queryExecution so the scan metrics below
    // reflect THIS execution (q.as[...] would plan a fresh one)
    assert(q.collect().map(_.getLong(0)).toSet === Set(0L, 1L))

    // and the executed scan actually read only the lang=en directory's files
    import scala.jdk.CollectionConverters._
    def parquetFiles(p: String): Seq[String] =
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet")).toSeq
    val enFiles = parquetFiles(s"$path/lang=en").size
    val allFiles = parquetFiles(path).size
    val numFiles = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.get
    assert(allFiles > enFiles, s"layout should have >1 partition dir ($allFiles/$enFiles)")
    assert(numFiles === enFiles.toLong, s"scan read $numFiles files, lang=en holds $enFiles")
  }
}
