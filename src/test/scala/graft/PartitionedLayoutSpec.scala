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

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // The planning-time case above needs a LITERAL partition predicate; the
    // 100 TB star-join case doesn't have one — the partition values arrive
    // from the dimension side of a join. DPP closes that gap: Catalyst
    // plants a DynamicPruningSubquery on the fact scan (reusing the dim
    // broadcast), so only the partitions the dim selects are ever listed.
    // the fact must be big enough for DPP's pruning-benefit estimate to
    // clear (the fixture's 6 rows are below any sane threshold)
    import org.apache.spark.sql.functions.{concat, expr, lit, lpad}
    val dir = Files.createTempDirectory("graft-dpp").toString
    val docs = spark.range(0, 30000).select(
      $"id".as("doc_id"),
      concat(lit("x"), lpad($"id".cast("string"), 128, "0")).as("text"),
      expr("element_at(array('en','de','fr'), cast(id % 3 as int) + 1)").as("lang"))
    val path = TableSource.writePartitioned(docs, dir, "documents_by_lang", Seq("lang"))
    val fact = spark.read.parquet(path)
    // the dim must be FILE-based: a literal Seq dim gets constant-folded
    // into a LocalRelation (filter evaluated at optimization time), and
    // DPP's selective-predicate check needs the surviving Filter node
    Seq(("en", "keep"), ("de", "drop"), ("fr", "drop"))
      .toDF("lang", "verdict").write.parquet(s"$dir/dim.parquet")
    val dim = spark.read.parquet(s"$dir/dim.parquet")
    // AQE off for THIS query only: completed AQE query stages hide their
    // subtrees from plan.collect, which the scan-metric proof below needs;
    // DPP itself is independent of AQE
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = fact.join(dim.filter($"verdict" === "keep"), Seq("lang"))
        .select($"doc_id")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"), plan)
      assert(q.collect().length === 10000)
      // runtime proof, not just plan text: the fact scan opened only the
      // lang=en directory's files
      val numFiles = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.output.exists(_.name == "doc_id") => s.metrics("numFiles").value
      }.head
      import scala.jdk.CollectionConverters._
      val enFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$path/lang=en"))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
      assert(numFiles === enFiles.toLong,
        s"DPP should restrict the scan to lang=en's $enFiles files, read $numFiles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
