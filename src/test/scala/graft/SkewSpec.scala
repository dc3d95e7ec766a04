package graft

import graft.operators.Skew

/** Salted skew patterns: identical results to their unsalted twins on the
  * fixture, and the salted join actually replicates the dim side. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation equals the plain group-by") {
    val salted = Skew.qSkewSaltedAgg.run(spark, fixtureDir)
      .as[(String, Long, Double)].collect().toSeq
    assert(salted === Seq(
      ("click", 3L, 9.0), ("signup", 1L, 6.0), ("view", 2L, 6.0)))
  }

  test("salted join equals the plain join") {
    val r = Skew.qSkewSaltedJoin.run(spark, fixtureDir)
      .as[(String, Long, Double)].collect().toSeq
    // weight = length(event_type): click 5, signup 6, view 4
    assert(r === Seq(
      ("click", 3L, 45.0),    // (1+3+5) * 5
      ("signup", 1L, 36.0),   // 6 * 6
      ("view", 2L, 24.0)))    // (2+4) * 4
  }

  test("saltedJoin replicates each dim row SaltBuckets times before the join") {
    val dim = Seq(("click", 1.0)).toDF("event_type", "w")
    val fact = Tables.events(spark, fixtureDir)
    val out = Skew.saltedJoin(fact, "event_id", dim, "event_type")
    assert(out.count() === 3)          // only click events survive
    assert(!out.columns.contains("_salt"))
  }
}
