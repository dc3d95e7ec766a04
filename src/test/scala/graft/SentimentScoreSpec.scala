package graft

import graft.functions.SentimentScore
import graft.operators.TextAnalytics
import org.apache.spark.sql.functions._

/** The native sentiment_score expression: SQL registration via
  * GraftExtensions, agreement with the relational lexicon scorer, codegen
  * participation, and edge cases. */
class SentimentScoreSpec extends SparkSpec {
  import spark.implicits._

  test("registered in SQL and usable from expr()") {
    val r = spark.sql("SELECT sentiment_score('fast fast slow') AS s")
      .as[Double].head()
    assert(r === 0.25)  // (0.75 + 0.75 - 0.75) / 3
  }

  test("agrees with the relational lexicon scorer on the fixture corpus") {
    val native = TextAnalytics.qSentimentExpr.run(spark, fixtureDir)
      .as[(Long, Double)].collect().toMap
    val relational = TextAnalytics.qSentimentDocs.run(spark, fixtureDir)
      .select($"doc_id", $"sentiment").as[(Long, Double)].collect().toMap
    assert(native === relational)
  }

  test("stays inside whole-stage codegen (no fallback)") {
    val plan = Tables.documents(spark, fixtureDir)
      .select(expr("sentiment_score(text)"))
      .queryExecution.executedPlan.toString
    // the "*(n)" marker flags operators inside a WholeStageCodegen stage —
    // a CodegenFallback expression would strip it from the Project
    assert(plan.contains("*(1) Project [sentiment_score"))
  }

  test("null and empty inputs") {
    val r = Seq[Option[String]](None, Some(""), Some("unknown words only"))
      .toDF("text")
      .select(expr("sentiment_score(text)").as("s"))
      .as[Option[Double]].collect().toSeq
    assert(r === Seq(None, Some(0.0), Some(0.0)))
  }

  test("trailing whitespace counts an empty token, like the relational twin") {
    // split(lower(text), '\\s+') keeps the trailing empty token (limit -1);
    // the native scorer must divide by the SAME token count: 0.75 / 2
    val r = Seq("fast ", "fast").toDF("text")
      .select(expr("sentiment_score(text)").as("s"))
      .as[Double].collect().toSeq
    assert(r === Seq(0.375, 0.75))
  }
}
