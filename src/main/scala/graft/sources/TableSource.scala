package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source-format abstraction for batch ingestion: the engine's logical
  * tables can land as parquet (the native layout), CSV, or JSONL, and a
  * user keeps the same queries regardless of the landed format.
  *
  * Read path: schema is ENFORCED on read (no inference job — a schema
  * inference pass over 100 TB is a full extra scan), and malformed CSV/JSON
  * rows degrade to nulls (PERMISSIVE) exactly like the reference's
  * schema-on-read JSON parse (reddit_consumer.py:296-299) rather than
  * failing the job.
  *
  * Ingest path: foreign formats are staged into the engine's parquet layout
  * once, then every query runs against columnar storage — the standard
  * land-then-compact shape (row-format scans re-read and re-parse every
  * column on every query; one conversion pays for all downstream reads,
  * enables column pruning and predicate pushdown, and the `repartition`
  * before write sizes the output files for the cluster instead of
  * inheriting the source's file boundaries).
  */
object TableSource {

  /** Read a table in any supported format with the schema enforced. */
  def read(spark: SparkSession, path: String, format: String,
           schema: StructType): DataFrame = format match {
    case "parquet" =>
      spark.read.schema(schema).parquet(path)
    case "csv" =>
      spark.read.schema(schema)
        .option("header", "true").option("mode", "PERMISSIVE")
        .csv(path)
    case "jsonl" | "json" =>
      spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    case other =>
      throw new IllegalArgumentException(s"unsupported source format: $other")
  }

  /** Stage a foreign-format table into the engine's parquet layout at
    * `outDir/<name>.parquet`, so the whole query surface (graft.Tables)
    * runs on it unchanged. Returns the staged DataFrame's row count. */
  def ingest(spark: SparkSession, srcPath: String, format: String,
             schema: StructType, outDir: String, name: String,
             numFiles: Int = 0): Long = {
    val df = read(spark, srcPath, format, schema)
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    spark.read.parquet(s"$outDir/$name.parquet").count()
  }

  /** Stage a table into a hive-partitioned parquet layout
    * (`outDir/<name>.parquet/<col>=<value>/…`). At 100 TB this is the
    * difference between scanning everything and scanning one directory:
    * any query filtering on the partition column is pruned at PLANNING
    * time (`PartitionFilters` on the scan — asserted by
    * PartitionedLayoutSpec), and files below excluded directories are
    * never listed, opened, or read. Pick partition columns with bounded
    * cardinality (lang, source, date) — a high-cardinality partition col
    * creates a small-file explosion, the opposite failure. */
  def writePartitioned(df: DataFrame, outDir: String, name: String,
      partitionCols: Seq[String]): String = {
    val path = s"$outDir/$name.parquet"
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    path
  }

  /** Dynamic partition overwrite: replace ONLY the partitions present in
    * `df` inside an existing partitioned table, leaving every other
    * partition untouched — the daily re-land idiom (re-process one
    * day/language without rewriting the table). Spark's DEFAULT overwrite
    * mode is `static`, which TRUNCATES the whole table first; at 100 TB
    * that is the difference between rewriting one directory and rewriting
    * everything (TableSourceSpec pins both behaviors). The mode is scoped
    * via the per-write option, not the session conf, so concurrent writers
    * keep their own semantics. */
  def overwritePartitions(df: DataFrame, tablePath: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(tablePath)
}
