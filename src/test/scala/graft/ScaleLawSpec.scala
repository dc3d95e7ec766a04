package graft

/** Candidate-growth laws for the pair-join dedup families, on a salted
  * exact-replica blow-up of the real sf0.01 tables (the adversarial
  * everything-is-a-duplicate scale-up; see ScaleRehearsal).
  *
  * Candidate generation is purely text/vector-derived, so exact N×
  * replication must obey, PER FAMILY:
  *   postings(N×) == N · postings(1×)              — linear generation
  *   cands(N×)    == N²·cands(1×) + C(N,2)·docs⁺   — bounded pair growth
  * (docs⁺ = documents with ≥1 posting). Equality, not just a bound: any
  * excess means id-dependent or unbounded candidate generation, any
  * shortfall means the blow-up silently changed the feature sets (e.g. a
  * df-cap floor branch engaging where the divisor should scale). These
  * are the claims the VERDICT scale grades rest on; this spec is their
  * executable form, and `Prof -scale` measures the same relations at
  * sf0.1/10× for the NOTES.md table. */
class ScaleLawSpec extends SparkSpec {

  private val N = 3
  private val base = "/root/testdata/sf0.01"

  test(s"postings grow x$N and candidate pairs obey the replica law at sf0.01") {
    val scaled = java.nio.file.Files.createTempDirectory("scalelaw").toString
    ScaleRehearsal.build(spark, base, scaled, N)
    val rows = ScaleRehearsal.measure(spark, base, scaled, N, withTimes = false)
    for (r <- rows) {
      assert(r.postN === N * r.post1, s"${r.fam}: generation not linear")
      assert(r.candN === r.law,
        s"${r.fam}: pairs ${r.candN} != law N^2*${r.cand1} + C($N,2)*${r.docsPlus} = ${r.law}")
      // and the pair join is live at both scales (a zero would make the
      // equalities vacuous)
      assert(r.cand1 > 0, s"${r.fam}: no candidates at 1x")
    }
  }
}
