package graft

import graft.streaming.MicroBatchPipeline
import java.nio.file.Files

/** S7 JDBC sink end-to-end (round-15 verdict item #4): the flag-gated
  * [[MicroBatchPipeline.jdbcSink]] path driven against EMBEDDED Derby
  * (`jdbc:derby:memory:…` — on the Spark classpath, zero egress), closing
  * the one code path that previously had no test of any kind. Pins the
  * reference semantics (reddit_consumer.py:329-338):
  *
  *  - a configured URL appends each batch to the table (created on first
  *    append), and the rows read back equal what the parquet sink stored;
  *  - a FAILING JDBC endpoint must not abort local storage — the sink
  *    swallows and logs (`psycopg2`-style tolerance in the reference);
  *  - no URL configured = no-op (the verified-surface default here).
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbcSink appends batches to embedded Derby; read-back matches parquet") {
    val outDir = Files.createTempDirectory("graft-jdbc").toString
    val b0 = Seq(("2026-01-01 00:00:00", 0L, 0.25, 4L),
                 ("2026-01-01 00:00:10", 0L, -0.5, 2L))
      .toDF("ts", "batch_id", "avg_sentiment", "n_rows")
    val b1 = Seq(("2026-01-01 00:00:20", 1L, 0.125, 8L))
      .toDF("ts", "batch_id", "avg_sentiment", "n_rows")

    // the pipeline's dual-sink shape: local parquet ALWAYS, JDBC when
    // configured — per batch
    for ((b, id) <- Seq(b0, b1).zipWithIndex) {
      b.write.mode("append").parquet(s"$outDir/metrics")
      MicroBatchPipeline.jdbcSink(b, Some(url), "graft_metrics")
    }

    val fromJdbc = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_metrics").load()
      .select($"ts", $"batch_id", $"avg_sentiment", $"n_rows")
      .as[(String, Long, Double, Long)].collect().toSeq.sorted
    val fromParquet = spark.read.parquet(s"$outDir/metrics")
      .select($"ts", $"batch_id", $"avg_sentiment", $"n_rows")
      .as[(String, Long, Double, Long)].collect().toSeq.sorted
    assert(fromJdbc === fromParquet)
    assert(fromJdbc.size === 3)
  }

  test("a failing JDBC endpoint is swallowed — local storage must proceed") {
    val df = Seq((0L, 1.0)).toDF("batch_id", "v")
    // unreachable host + no driver for the scheme: both failure shapes
    MicroBatchPipeline.jdbcSink(df,
      Some("jdbc:derby:/nonexistent-dir/deliberately/broken;create=false"),
      "graft_metrics")
    MicroBatchPipeline.jdbcSink(df,
      Some("jdbc:nosuchscheme://nowhere:1/x"), "graft_metrics")
    succeed // reaching here IS the assertion: no throw escaped the sink
  }

  test("no URL configured is a no-op") {
    MicroBatchPipeline.jdbcSink(
      Seq((0L, 1.0)).toDF("batch_id", "v"), None, "graft_metrics")
    succeed
  }
}
