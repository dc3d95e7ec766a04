package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Relational surface on the real sf0.001 tables: cross-query invariants
  * (counts must reconcile), determinism of the declared orderings, and the
  * physical plans we designed for — broadcast joins on dimensions, pushed
  * filters, top-k without a global sort. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("pricing summary groups cover exactly the distinct flag/status pairs") {
    val out = Relational.q1PricingSummary.run(spark, dir)
    val expected = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" < to_timestamp_ntz(lit("1998-09-01")))
      .select($"l_returnflag", $"l_linestatus").distinct().count()
    assert(out.count() === expected)
    assert(out.select(sum($"count_order")).as[Long].head() ===
      Tables.lineitem(spark, dir)
        .filter($"l_shipdate" < to_timestamp_ntz(lit("1998-09-01"))).count())
  }

  test("anti-join count reconciles with total customers") {
    val total = Tables.customer(spark, dir).count()
    val withOrders = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_semi")
      .count()
    val without = Relational.qCustomersWithoutOrders.run(spark, dir)
      .select(coalesce(sum($"n_customers"), lit(0L))).as[Long].head()
    assert(without === total - withOrders)
  }

  test("top customers: at most 10 rows, ordered by spend desc") {
    val rows = Relational.qTopCustomers.run(spark, dir)
      .select($"total_spent").as[Double].collect().toSeq
    assert(rows.length <= 10)
    assert(rows === rows.sortBy(-_))
  }

  test("physical plans: dimension joins broadcast; no shuffle of the dim table") {
    val brandPlan = Relational.qRevenueByBrand.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(brandPlan.contains("BroadcastHashJoin"))
    val regionPlan = Relational.qAcctbalByRegion.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(regionPlan.contains("BroadcastHashJoin"))
  }

  test("physical plans: the shipdate range predicate reaches the parquet scan") {
    val plan = Relational.q1PricingSummary.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"expected pushed filter in:\n${plan.take(2000)}")
  }

  test("physical plans: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = Relational.qTopCustomers.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("parquet scans prune columns to what the query needs") {
    val plan = Relational.qTopCustomers.run(spark, dir)
      .queryExecution.executedPlan.toString
    // the orders scan must read only custkey + totalprice
    assert(plan.contains("o_custkey") && plan.contains("o_totalprice"))
    assert(!plan.contains("o_orderpriority"))
  }

  test("correlated scalar subquery matches the independent group-average join") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val cust = Tables.customer(spark, dir)
    val avgs = cust.groupBy($"c_nationkey").agg(
      (sum($"c_acctbal".cast(DecimalType(38, 9))).cast(DoubleType) /
        count(lit(1))).as("nav"))
    val expected = cust.join(avgs, Seq("c_nationkey"))
      .filter($"c_acctbal" > $"nav")
      .select($"c_custkey").as[Long].collect().toSet
    val got = Relational.qCorrelatedScalar.run(spark, dir)
      .select($"c_custkey").as[Long].collect().toSet
    assert(got === expected && got.nonEmpty)
  }

  test("Catalyst decorrelation of the BI text still works and matches the manual CTE") {
    // the verified query runs the hand-decorrelated CTE (one nation
    // aggregate — PlanGuardSpec); this test keeps the optimizer's OWN
    // decorrelation surface exercised: the correlated oracle text must
    // still plan without a surviving ScalarSubquery node and produce
    // byte-identical rows to the manual form
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    val viaCatalyst = spark.sql(Relational.correlatedSql("customer_v"))
    val plan = viaCatalyst.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalarSubquery"), s"subquery not decorrelated:\n$plan")
    val manual = Relational.qCorrelatedScalar.run(spark, dir)
      .as[(Long, Double, Double)].collect().toSeq
    assert(viaCatalyst.as[(Long, Double, Double)].collect().toSeq === manual)
    assert(manual.nonEmpty)
  }


  test("Q5 shape: the fact table never shuffles — all five joins broadcast") {
    val plan = Relational.q5LocalSupplier.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") === 5)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
    // the date window reaches the orders scan
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"))
  }

  test("EXISTS / NOT EXISTS rewrite to semi + anti joins and match the set algebra") {
    val withBig = Tables.lineitem(spark, dir).filter($"l_quantity" >= 49)
      .select($"l_suppkey").distinct().as[Long].collect().toSet
    val aNations = Tables.nation(spark, dir).filter($"n_name".startsWith("A"))
      .select($"n_nationkey".cast("long")).as[Long].collect().toSet
    val inANation = Tables.supplier(spark, dir)
      .filter($"s_nationkey".cast("long").isin(aNations.toSeq: _*))
      .select($"s_suppkey").as[Long].collect().toSet
    val expected = withBig -- inANation
    val out = Relational.qExistsRewrite.run(spark, dir)
    val got = out.select($"s_suppkey").as[Long].collect().toSet
    assert(got === expected && got.nonEmpty)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"))
  }

  test("Q8 market share: laws, one fact-fact shuffle join, dims broadcast") {
    val out = Relational.qMarketShare.run(spark, dir)
    val rows = out.as[(Long, Double, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, nv, tv, share) =>
      assert(nv >= 0.0 && nv <= tv)
      assert(share >= 0.0 && share <= 1.0)
      // the share column IS the qround'd quotient of the emitted sums
      assert(share === math.floor(nv / tv * 1e6 + 0.5) / 1e6)
    }
    // independent recomputation: per-year volumes from first principles
    val nations = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".cast("long"), $"n_name", $"r_name")
      .as[(Long, String, String)].collect()
    val euro = nations.filter(_._3 == "EUROPE").map(_._1).toSet
    val nname = nations.map(n => n._1 -> n._2).toMap
    val euroCust = Tables.customer(spark, dir)
      .filter($"c_nationkey".cast("long").isin(euro.toSeq: _*))
      .select($"c_custkey").as[Long].collect().toSet
    val supN = Tables.supplier(spark, dir)
      .select($"s_suppkey".cast("long"), $"s_nationkey".cast("long"))
      .as[(Long, Long)].collect().map { case (s, n) => s -> nname(n) }.toMap
    val econ = Tables.part(spark, dir).filter($"p_type" === "ECONOMY")
      .select($"p_partkey").as[Long].collect().toSet
    val facts = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"l_partkey", $"l_suppkey", $"o_custkey",
        year($"o_orderdate").cast("long"),
        $"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .as[(Long, Long, Long, Long, Double)].collect()
      .filter(f => econ(f._1) && euroCust(f._3))
    val expected = facts.groupBy(_._4).map { case (y, fs) =>
      def dsum(vs: Seq[Double]) = (vs.map(v =>
        BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).toDouble
      val tv = dsum(fs.map(_._5))
      val nv = dsum(fs.map(f =>
        if (supN(f._2) == "NATION_3") f._5 else 0.0))
      (y, nv, tv, math.floor(nv / tv * 1e6 + 0.5) / 1e6)
    }.toSeq.sortBy(_._1)
    assert(rows === expected)
    // plan: both nation roles + part + customer keys broadcast; the only
    // non-broadcast join is lineitem ⋈ orders
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q3_shipping_priority: broadcast dim + TakeOrderedAndProject, filters pushed") {
    val df = graft.operators.Relational.q3ShippingPriority
      .run(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    // segment-filtered customer reaches orders as a broadcast; the top-10
    // is a TakeOrderedAndProject (never a full sort); both date
    // predicates sit in the scans' pushed/data filters
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    val rows = df.collect()
    assert(rows.length === 10)
    // descending revenue with the pinned tie-break
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sliding(2).forall { case Array(a, b) => a >= b })
  }
}
