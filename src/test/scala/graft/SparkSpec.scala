package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test SparkSession + a tiny hand-computable fixture directory laid
  * out exactly like the driver's sf dirs (documents/events/embeddings), so
  * every GraftQuery can run unchanged against it and be checked against
  * hand-computed expectations.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val fixtureDir: String = SparkSpec.fixtureDir
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions)
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // legacy-compat for old INT64(NANOS) events files; no-op on timestamp[us]
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    // the production-grade state store; also required by transformWithState
    // (multi-column-family state) — every stateful streaming spec runs on it
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Fixture corpus (doc_id, text, lang, source); n_chars = length(text).
    *  - docs 2 and 3 are exact duplicates;
    *  - docs 4 and 5 are 30-token near-duplicates differing in the last token.
    */
  val fixtureDocs: Seq[(Long, String, String, String)] = Seq(
    (0L, "fast fast slow", "en", "srcA"),
    (1L, "fast the big", "en", "srcB"),
    (2L, "slow slow slow big", "de", "srcA"),
    (3L, "slow slow slow big", "de", "srcC"),
    (4L, (1 to 30).map(i => s"w$i").mkString(" "), "fr", "srcB"),
    (5L, ((1 to 29).map(i => s"w$i") :+ "zz").mkString(" "), "fr", "srcC"))

  val SixHoursUs: Long = 6L * 3600 * 1000000

  lazy val fixtureDir: String = {
    val spark = session
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fixture").toString

    fixtureDocs
      .map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    // one event per 6h bucket b=0..5: value b+1, user b%2, props k=b*10.
    // ts is written as parquet timestamp[us] with isAdjustedToUTC=false
    // (TimestampNTZ), matching the driver's CURRENT events table; the
    // legacy INT64(NANOS) shape is covered by SchemaDriftSpec, which pins
    // both branches of the adaptive Tables.events loader to identical ts_us.
    (0 to 5).map { b =>
      val types = Seq("click", "view", "click", "view", "click", "signup")
      (b.toLong, b * SixHoursUs, (b % 2).toLong, types(b),
        (b + 1).toDouble, s"""{"k": ${b * 10}}""")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros($"ts_us").cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    // embeddings: 0 and 1 identical; 2 orthogonal; 3 between (cos 0.6 / 0.8)
    Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (1L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f), 1),
      (3L, Array(0.6f, 0.8f, 0f, 0f, 0f, 0f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    dir
  }
}
