package graft

/** Driver-contract smoke: the flagship entry query must return rows at
  * sf0.001, and the queries/oracleSql registries must stay consistent. */
class EntrySpec extends SparkSpec {

  test("entry returns rows at sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq === Seq(
      "lang", "post_count", "unique_sources", "avg_chars", "average_sentiment"))
  }

  test("every oracle key has a query; names are unique") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert(qs.size === Queries.all.size)
  }

  test("all queries run at sf0.001 and are non-degenerate") {
    val empties = Queries.all.filter { q =>
      q.run(spark, "/root/testdata/sf0.001").isEmpty
    }.map(_.name)
    // legitimately empty at the smallest sf: no embedding near-dups exist,
    // and every sf0.001 customer has at least one order
    val allowedEmpty = Set("q_embed_neardup_lsh", "q_customers_without_orders")
    assert(empties.toSet.subsetOf(allowedEmpty), s"unexpected empty: $empties")
  }
}
