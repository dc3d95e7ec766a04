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
    * the same parquet tables. Since round 9 every query carries one — the
    * former rows-only ops (HLL++, GK sketch, VADER, float-fold ANN) are
    * re-expressed as bounded-tolerance audits the oracle can check
    * (RegistrySpec pins this). */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
