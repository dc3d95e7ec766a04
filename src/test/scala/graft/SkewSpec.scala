package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

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

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** One hot key carrying ~90% of the rows, padded so its shuffle partition
    * dwarfs the (lowered) skew thresholds. */
  private def skewedFact = spark.range(0, 20000).select(
    when($"id" < 18000, lit(0L)).otherwise($"id" % 64).as("k"),
    concat(lit("x"), lpad($"id".cast("string"), 256, "0")).as("pad"))

  /** When salting is NEEDED vs when AQE already covers it: AQE's
    * OptimizeSkewedJoin splits oversized shuffle partitions of sort-merge /
    * shuffled-hash JOINS at runtime — for that shape, salting is redundant.
    * It cannot split a skewed AGGREGATION key (a grouped partial must see
    * the whole key), which is exactly where q_skew_salted_agg's two-phase
    * salt remains the right tool (and for joins under a shuffle reused by
    * several consumers, where AQE declines the split). Both paths pinned
    * here. */
  test("AQE splits the skewed sort-merge-join partition when enabled") {
    val dim = spark.range(0, 64).select($"id".as("k"), ($"id" * 2).as("w"))
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = skewedFact.join(dim, "k")
      // collect() executes THIS QueryExecution (a write would plan a fresh
      // one and leave this AdaptiveSparkPlan unfinalized)
      assert(joined.collect().length === 20000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join (isSkewJoin) in:\n$plan")
    }
  }

  test("with skew handling disabled the same join stays unsplit (salting territory)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val dim = spark.range(0, 64).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = skewedFact.join(dim, "k")
      assert(joined.collect().length === 20000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true") && !plan.contains("skew=true"))
    }
  }
}
