package graft

import graft.operators.TfIdf

/** TF-IDF formula against hand-computed values (SURVEY.md §2.9, §5.2):
  * idf(t) = ln((m+1)/(df+1)), tfidf = tf * idf, vocabulary tie-break
  * (df desc, term asc). Fixture: m = 6 docs; stopwords removed first.
  *
  * df over the fixture: fast {0,1}, slow {0,2,3}, big {1,2,3},
  * w1..w29 {4,5}, w30 {4}, zz {5}  ("the" in doc 1 is a stopword).
  */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val ln7over4 = math.log(7.0 / 4.0)   // df=3 terms: slow, big
  private val ln7over3 = math.log(7.0 / 3.0)   // df=2 terms: fast, w1..w29
  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("tfidf matches the hand-computed MLlib formula") {
    val scores = TfIdf.scores(spark, fixtureDir)
      .select($"doc_id", $"term", $"tf", $"df", $"tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    assert(scores((0L, "fast")) === ((2L, 2L, r6(2 * ln7over3))))
    assert(scores((0L, "slow")) === ((1L, 3L, r6(ln7over4))))
    assert(scores((2L, "slow")) === ((3L, 3L, r6(3 * ln7over4))))
    assert(scores((2L, "big")) === ((1L, 3L, r6(ln7over4))))
    // "the" must have been removed by the stopword filter before tf
    assert(!scores.contains((1L, "the")))
  }

  test("top keywords: avg tfidf with deterministic (avg desc, term) tiebreak") {
    val top = operators.TfIdf.qTopKeywords.run(spark, fixtureDir)
      .select($"term", $"avg_score").as[(String, Double)].collect()
    assert(top.length === TfIdf.TopK)
    // sorted by avg_score desc then term asc
    val resorted = top.sortBy { case (t, s) => (-s, t) }.toSeq
    assert(top.toSeq === resorted)
    // slow: docs {0,2,3} tf 1,3,3 => avg = 7/3 * ln(7/4)
    val slow = top.find(_._1 == "slow").get._2
    assert(slow === r6((r6(ln7over4) + r6(3 * ln7over4) + r6(3 * ln7over4)) / 3))
  }
}
