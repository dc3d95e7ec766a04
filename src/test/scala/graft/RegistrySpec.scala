package graft

/** Authoring invariants of the verified query surface — guards against the
  * slips that silently weaken the correctness gate: a query without a total
  * ORDER BY hashes nondeterministically, a name drift breaks the driver's
  * per-round comparison, an unregistered oracle downgrades a query to
  * rows-only without anyone deciding that. */
class RegistrySpec extends SparkSpec {

  test("query names are unique, stable-format, and all registered") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(names.forall(n => n.matches("q[a-z0-9_]+")), names.filterNot(_.matches("q[a-z0-9_]+")))
    assert(Queries.byName.size === Queries.all.size)
    // SparkEntry mirrors the registry exactly
    assert(SparkEntry.queries.keySet === names.toSet)
    assert(SparkEntry.oracleSql.keySet === Queries.all.filter(_.oracle.isDefined).map(_.name).toSet)
  }

  test("every oracle carries a total ORDER BY (hash determinism contract)") {
    // single-ROW global aggregates are order-free by construction; anything
    // else without ORDER BY hashes nondeterministically
    val singleRowGlobalAggs = Set("q_refs_global", "q_event_timerange")
    val missing = Queries.all
      .filter(q => q.oracle.exists(sql => !sql.toUpperCase.contains("ORDER BY")))
      .map(_.name)
      .filterNot(singleRowGlobalAggs)
    assert(missing.isEmpty, s"oracles without ORDER BY: $missing")
  }

  test("every query carries a SQL oracle (no rows-only entries)") {
    // Round 9 closed the last four rows-only gaps by re-expressing each
    // approx/float query as its bounded-tolerance audit (HLL within 3·rsd,
    // GK within ε-rank, VADER in [−1,1], fast-ANN recall ≥ 0.9·k) — every
    // declared query now hash-compares against DuckDB.
    val rowsOnly = Queries.all.filter(_.oracle.isEmpty).map(_.name)
    assert(rowsOnly.isEmpty, s"queries without an oracle: $rowsOnly")
  }
}
