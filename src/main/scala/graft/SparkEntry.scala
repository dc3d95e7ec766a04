package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's subreddit-stats + avg-sentiment per-batch analytics
    * (reddit_consumer.py:356, 375-384) transposed onto `documents` —
    * tokenize → broadcast lexicon join sentiment → per-lang stats
    * (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    operators.TextAnalytics.qAvgSentimentByLang.run(spark, dir)
      .join(operators.TextAnalytics.qSubredditStats.run(spark, dir), Seq("lang"))
      .select($"lang", $"post_count", $"unique_sources", $"avg_chars",
        $"average_sentiment")
      .orderBy($"post_count".desc, $"lang")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-seeded / float-fold ops
    * (driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
