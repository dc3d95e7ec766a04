package graft

import graft.operators.TextAnalytics
import graft.sources.TableSource
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Format-agnostic ingestion: the fixture documents table exported to CSV
  * and JSONL, staged back into the parquet layout, must give every query
  * identical results to the native fixture dir. */
class TableSourceSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def stageThrough(format: String): String = {
    val exportDir = Files.createTempDirectory(s"graft-src-$format").toString
    val stagedDir = Files.createTempDirectory(s"graft-staged-$format").toString
    val docs = Tables.documents(spark, fixtureDir)
    format match {
      case "csv" => docs.coalesce(1).write.option("header", "true")
        .mode("overwrite").csv(s"$exportDir/documents")
      case "jsonl" => docs.coalesce(1).write.mode("overwrite")
        .json(s"$exportDir/documents")
    }
    val n = TableSource.ingest(spark, s"$exportDir/documents", format,
      docSchema, stagedDir, "documents")
    assert(n === SparkSpec.fixtureDocs.size)
    stagedDir
  }

  for (format <- Seq("csv", "jsonl")) {
    test(s"queries over a $format-landed table match the native parquet results") {
      val staged = stageThrough(format)
      val expected = TextAnalytics.qSubredditStats.run(spark, fixtureDir).collect()
      val got = TextAnalytics.qSubredditStats.run(spark, staged).collect()
      assert(got.toSeq === expected.toSeq)
    }
  }

  test("malformed rows degrade to nulls instead of failing the read") {
    val dir = Files.createTempDirectory("graft-src-bad").toString
    Files.write(java.nio.file.Paths.get(dir, "bad.jsonl"),
      Seq("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""",
          """not json at all {{{""").mkString("\n").getBytes("UTF-8"))
    val df = TableSource.read(spark, dir, "jsonl", docSchema)
    assert(df.count() === 2)
    assert(df.filter($"doc_id".isNull).count() === 1)
  }

  test("unsupported format is rejected explicitly") {
    intercept[IllegalArgumentException] {
      TableSource.read(spark, "/tmp/x", "avro", docSchema)
    }
  }

  test("schema evolution: mergeSchema unifies parts written before/after a column add") {
    // v1 part has no quality column; v2 adds it — the append-only layout
    // every long-lived table accumulates. mergeSchema reads must unify the
    // schema and null-fill the old part (and a plain read must still work
    // off the newest-part schema without scanning both footers).
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((0L, "en"), (1L, "de"))
      .toDF("doc_id", "lang").write.parquet(s"$dir/part=v1")
    Seq((2L, "fr", 0.9), (3L, "en", 0.4))
      .toDF("doc_id", "lang", "quality").write.parquet(s"$dir/part=v2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "lang", "quality", "part"))
    assert(merged.count() === 4)
    assert(merged.filter($"quality".isNull).count() === 2)
    val v2Only = merged.filter($"quality".isNotNull)
      .select($"doc_id").as[Long].collect().toSet
    assert(v2Only === Set(2L, 3L))
  }

  test("dynamic partition overwrite replaces only the incoming partitions") {
    val dir = Files.createTempDirectory("graft-dynover").toString
    val base = Seq((0L, "a", "en"), (1L, "b", "de"), (2L, "c", "fr"))
      .toDF("doc_id", "text", "lang")
    val path = TableSource.writePartitioned(base, dir, "docs", Seq("lang"))
    // re-land ONLY lang=de with corrected content
    TableSource.overwritePartitions(
      Seq((1L, "b-fixed", "de")).toDF("doc_id", "text", "lang"),
      path, Seq("lang"))
    val after = spark.read.parquet(path)
      .select($"doc_id", $"text", $"lang").as[(Long, String, String)]
      .collect().toSet
    assert(after === Set((0L, "a", "en"), (1L, "b-fixed", "de"), (2L, "c", "fr")))
  }

  test("static overwrite mode (the default) truncates the whole table — the hazard") {
    val dir = Files.createTempDirectory("graft-statover").toString
    val base = Seq((0L, "a", "en"), (1L, "b", "de"))
      .toDF("doc_id", "text", "lang")
    val path = TableSource.writePartitioned(base, dir, "docs", Seq("lang"))
    // same one-partition re-land through a DEFAULT-mode overwrite:
    // every other partition is dropped — why overwritePartitions exists
    Seq((1L, "b-fixed", "de")).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(path)
    val after = spark.read.parquet(path)
      .select($"doc_id").as[Long].collect().toSet
    assert(after === Set(1L))
  }
}
