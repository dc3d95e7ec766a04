package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic tables (TESTDATA.md).
  *
  * All loaders take the scale-factor directory so the same query text can run
  * at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench). Reads go through
  * `spark.read.parquet` so Catalyst keeps predicate pushdown / column pruning.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** events.parquet stores `ts` as parquet INT64 TIMESTAMP(NANOS) which Spark
    * cannot map to TimestampType directly; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as nanosecond
    * bigint. We expose both:
    *   - `ts_us`  : epoch microseconds (bigint) — exact, used in arithmetic and
    *                in query outputs (robust to compare across engines;
    *                DuckDB twin is `epoch_us(ts)`).
    *   - `ts`     : TimestampType at microsecond precision.
    * NOTE `ts div 1000` must be integer division — ns epochs exceed the 53-bit
    * mantissa of a double, so `/ 1000` through DoubleType would corrupt values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  /** Spread a scan across the cluster ONLY when the scan itself cannot: the
    * driver's sf tables are single small parquet files (1 split), which
    * would pin every downstream per-row projection (md5 sketches, dot
    * products) to one thread. A real multi-split table already provides
    * scan parallelism, and an unconditional `repartition()` there would be
    * a full shuffle of the fact data — the opposite of the 100 TB shape.
    * Partition count comes from the planned file splits; no job runs. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
