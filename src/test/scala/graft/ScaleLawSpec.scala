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
  import spark.implicits._


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

  test(s"cooccur-pmi is replica-INVARIANT at x$N: counts scale, scores don't") {
    // The PMI pair join pairs only WITHIN a document, so exact replication
    // obeys a stricter law than the cross-doc bucket families: no
    // cross-replica pairs exist at all. Per (term_a, term_b):
    //   n_ab(Nx) == N * n_ab(1x)    [linear, not quadratic]
    //   pmi(Nx)  == pmi(1x)         [N cancels: (N*n_ab*N*nd)/(N*df)^2]
    // df, n_docs and the median-df cap all scale by N, so the kept
    // vocabulary -- and therefore the pair SET -- is identical.
    val scaled = java.nio.file.Files.createTempDirectory("scalelaw-pmi").toString
    ScaleRehearsal.build(spark, base, scaled, N)
    def scores(d: String) = graft.operators.LexicalStats
      .cooccurScored(spark, d)
      .select("term_a", "term_b", "n_ab", "pmi")
      .as[(String, String, Long, Double)].collect().toSeq
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val one = scores(base)
    val n = scores(scaled)
    assert(one.nonEmpty && n.keySet === one.keySet)
    for ((pair, (nAb, pmi)) <- one) {
      assert(n(pair)._1 === N * nAb, s"$pair: pair count not linear")
      assert(n(pair)._2 === pmi, s"$pair: pmi drifted under replication")
    }
  }
}
