package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: two tables bucketed on the join key join
  * with ZERO exchanges — the pre-shuffle-once, join-many-times pattern that
  * matters at 100 TB (each bucketed write pays the shuffle one time; every
  * later join on that key is exchange-free). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joins between tables bucketed on the key plan no Exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, dir).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    Tables.customer(spark, dir).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
        s"orders side should be pre-bucketed:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
        s"customer side should be pre-bucketed:\n$plan")
      // and the result is still right
      val total = joined.agg(sum($"n")).as[Long].head()
      val expected = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey").count()
      assert(total === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
