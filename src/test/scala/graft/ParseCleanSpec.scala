package graft

import graft.streaming.MicroBatchPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P1/P2/P3 truth table (SURVEY.md §5.2): PERMISSIVE JSON parse, the
  * cleaning filter incl. the exactly-10-chars boundary, keepalive drop, and
  * the epoch-double→timestamp cast with fractional seconds. */
class ParseCleanSpec extends SparkSpec {
  import spark.implicits._

  private def post(id: String, text: String): String =
    s"""{"type": "submission", "subreddit": "s", "id": "$id", "text": "$text", "created_utc": 1700000000.5, "author": "a"}"""

  test("cleaning filter truth table") {
    val lines = Seq(
      post("keep", "exactly 11 chars of text here"),
      post("len10", "0123456789"),          // length 10 => dropped (> 10 strict)
      post("len11", "01234567890"),         // length 11 => kept
      """{"type": "keepalive", "timestamp": 1700000001.0}""",
      """not json at all {{{""",
      s"""{"type": "submission", "subreddit": "s", "id": "null_text", "created_utc": 1.0, "author": "a"}""",
      post("empty", ""))
      .toDF("value")
    val kept = MicroBatchPipeline.parseBatch(lines).select($"id").as[String].collect().toSet
    assert(kept === Set("keep", "len11"))
  }

  test("epoch-double cast preserves fractional seconds as microseconds") {
    val us = Seq(1700000000.5).toDF("created_utc")
      .select(unix_micros($"created_utc".cast(TimestampType)).as("us"))
      .as[Long].head()
    assert(us === 1700000000500000L)
  }

  test("q_parse_clean drops the injected keepalive/malformed/short rows") {
    val out = operators.TextAnalytics.qParseClean.run(spark, fixtureDir).collect()
    // all 6 fixture docs are >10 chars; the 3 injected bad lines must vanish
    assert(out.length === 6)
    assert(out.map(_.getLong(0)).toSeq === (0L to 5L))
    // created_us = (1.7e9 + doc_id * 1.5) * 1e6 exactly
    val row1 = out.find(_.getLong(0) == 1L).get
    assert(row1.getAs[Long]("created_us") === 1700000001500000L)
  }
}
