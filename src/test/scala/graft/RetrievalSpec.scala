package graft

import graft.operators.Retrieval

/** BM25 + RRF fusion on the hand-computable fixture.
  *
  * Fixture vocabulary (stopword-removed): d0 "fast fast slow" (dl 3),
  * d1 "fast big" (dl 2 — "the" removed), d2/d3 "slow slow slow big"
  * (dl 4, identical texts), d4/d5 30-token w-docs. With query terms
  * (fast, slow, big): df(fast)=2, df(slow)=df(big)=3, N=6, Σdl=73.
  * Working the BM25 formula: d0 ≈ 2.832 > d1 ≈ 2.643 > d2 = d3 ≈ 2.255
  * (identical texts tie exactly; the rank tie breaks to the lower id).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val FixtureTerms = Seq("fast", "slow", "big")

  test("bm25: rarer/denser terms outrank, duplicate texts tie to lower id") {
    val r = Retrieval.bm25Ranked(spark, fixtureDir, FixtureTerms)
      .orderBy("rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // only the docs containing a query term are retrieved, each matches 2
    assert(r.map(_._2) === Seq(0L, 1L, 2L, 3L))
    assert(r.forall(_._3 == 2L))
    val score = r.map(t => t._2 -> t._4).toMap
    assert(score(2L) === score(3L)) // identical text -> identical score
  }

  test("q_bm25_scores degrades to empty when no pinned term occurs") {
    assert(Retrieval.qBm25Scores.run(spark, fixtureDir).count() === 0L)
  }

  test("dual-ranker pass is bit-equal to the standalone rankers (r17)") {
    // the two-ranker evals (q_rank_eval, q_map_mrr, q_rbo_overlap) score
    // BM25 and QL in ONE aggregation pipeline; this pins the restructure's
    // equivalence claim against the lean single-ranker paths that
    // q_bm25_scores / q_ql_scores still run — scores must match
    // bit-for-bit (same addend trees, same decimal sums, same tie order)
    val m = Retrieval.matchedWithDl(spark, fixtureDir, FixtureTerms)
    val tf = Retrieval.tfOf(Retrieval.matchedOfMdl(m))
    val stats = Retrieval.statsOfMdl(m)
    val (bmDual, qlDual) = Retrieval.dualRankedFromTf(tf, stats, FixtureTerms)
    val bmSolo = Retrieval.bm25RankedFromTf(tf, stats)
    val qlSolo = Retrieval.qlRankedFromTf(tf, stats, FixtureTerms)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      df.orderBy("rank").as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows(bmDual) === rows(bmSolo))
    assert(rows(qlDual) === rows(qlSolo))
    assert(rows(bmDual).nonEmpty && rows(qlDual).nonEmpty)
  }

  test("rrf fusion: cosine evidence reorders the bm25 tie, agreement wins") {
    // bm25 ranks: d0,d1,d2,d3 -> 1/61,1/62,1/63,1/64
    // cosine ranks vs vec 0: d1 (cos 1.0), d3 (0.6), d2 (0.0) -> 1/61..1/63
    // fused: d1 .032522 > d3 .031754 > d2 .031746 > d0 .016393 — the
    // cosine ranker flips d3 above d2 (bm25 alone had them tied, id order)
    val rows = Retrieval.rrfFused(spark, fixtureDir, FixtureTerms)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) === Seq(1L, 3L, 2L, 0L))
    assert(rows.map(t => t._1 -> t._2).toMap ===
      Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("q_rrf_fusion with absent bm25 terms reduces to the cosine ranking") {
    val rows = Retrieval.qRrfFusion.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows === Seq(
      (1L, 1L, 0.016393), // 1/61
      (3L, 1L, 0.016129), // 1/62
      (2L, 1L, 0.015873)  // 1/63
    ))
  }

  /** Dirichlet QL on the fixture, worked by hand (μ=2000, |C|=73,
    * cf: fast 3, slow 7, big 3):
    * d0 (dl 3): ln(84.19/2003)+ln(192.78/2003)+ln(82.19/2003) ≈ −8.70356
    * d2/d3 (dl 4): ≈ −8.70680 (identical texts tie exactly)
    * d1 (dl 2): ≈ −8.70735
    * The zero-tf smoothing term is what puts d0 above d2/d3 — a tf-only
    * scorer has no cross-term mass to distinguish them this way. */
  test("ql: Dirichlet smoothing ranks d0 > d2=d3 > d1, ties to lower id") {
    val r = Retrieval.qlRanked(spark, fixtureDir, FixtureTerms)
      .orderBy("rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r.map(_._2) === Seq(0L, 2L, 3L, 1L))
    assert(r.forall(_._3 == 2L)) // each candidate matches exactly 2 terms
    val score = r.map(t => t._2 -> t._4).toMap
    assert(score(2L) === score(3L)) // identical text -> identical score
    assert(score(0L) > score(2L) && score(2L) > score(1L))
  }

  test("q_ql_scores degrades to empty when no pinned term occurs") {
    assert(Retrieval.qQlScores.run(spark, fixtureDir).count() === 0L)
  }

  test("rank eval: all-rel-2 candidates give both rankers a perfect nDCG") {
    // rels with (fast, slow, big): d0..d3 all rel 2 (each matches 2 terms),
    // d4/d5 rel 0. Ideal = any order of d0..d3 => idcg =
    // 3*(1 + 1/log2(3) + 1/2 + 1/log2(5)) = 7.684819 (6dp), and both
    // rankers retrieve exactly {d0..d3} => dcg == idcg, ndcg == 1.0.
    val rows = Retrieval.rankEval(spark, fixtureDir, FixtureTerms)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(rows.map(_._1) === Seq("bm25", "ql"))
    rows.foreach { case (_, nRel, dcg, idcg, ndcg) =>
      assert(nRel === 4L)
      assert(idcg === 7.684819)
      assert(dcg === idcg)
      assert(ndcg === 1.0)
    }
  }

  test("rank eval: no matching term -> zero-filled, not a crash") {
    val rows = Retrieval.rankEval(spark, fixtureDir, Seq("absent"))
      .as[(String, Long, Option[Double], Option[Double], Double)]
      .collect().toSeq
    assert(rows.map(_._1) === Seq("bm25", "ql"))
    rows.foreach { case (_, nRel, _, _, ndcg) =>
      assert(nRel === 0L && ndcg === 0.0)
    }
  }

  test("map/mrr: all four relevant docs at the top of both rankers") {
    // rels with (fast, slow, big): d0..d3 (R = 4), and both rankers
    // retrieve exactly those four at ranks 1..4 → every prefix precision
    // is 1 → AP = 1, MRR = 1/1, P@10 = 4/10, recall = 4/4
    val rows = Retrieval.mapMrr(spark, fixtureDir, FixtureTerms)
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(rows.map(_._1) === Seq("bm25", "ql"))
    rows.foreach { case (_, nRel, rTot, mapK, mrr, pAtK, rec) =>
      assert(nRel === 4L && rTot === 4L)
      assert(mapK === 1.0 && mrr === 1.0)
      assert(pAtK === 0.4 && rec === 1.0)
    }
  }

  test("map/mrr: no matching term -> zero-filled metrics, not a crash") {
    val rows = Retrieval.mapMrr(spark, fixtureDir, Seq("absent"))
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(rows.map(_._1) === Seq("bm25", "ql"))
    rows.foreach { case (_, nRel, rTot, mapK, mrr, pAtK, rec) =>
      assert(nRel === 0L && rTot === 0L)
      assert(mapK === 0.0 && mrr === 0.0 && pAtK === 0.0 && rec === 0.0)
    }
  }

  test("map/mrr at sf0.001: metric sanity against rank_eval's labels") {
    // every metric sits in [0, 1], counts are consistent, and P@K is the
    // exact n_rel/K quotient (6-dp replica)
    val rows = Retrieval.mapMrr(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(rows.map(_._1) === Seq("bm25", "ql"))
    rows.foreach { case (_, nRel, rTot, mapK, mrr, pAtK, rec) =>
      assert(nRel >= 0L && nRel <= Retrieval.EvalK && rTot >= nRel)
      Seq(mapK, mrr, pAtK, rec).foreach(v => assert(v >= 0.0 && v <= 1.0))
      assert(pAtK === math.floor(nRel.toDouble / Retrieval.EvalK * 1e6 + 0.5) / 1e6)
    }
  }

  test("prf expansion: feedback terms surface docs the query never matched") {
    // query {fast}: base ranking = docs 0,1 only. Feedback mines their
    // co-occurring vocabulary (slow, the, big), so the expanded pass must
    // surface at least one slow/big doc (2 or 3) with prev_rank NULL —
    // the recall PRF exists to buy
    val rows = Retrieval.prfExpanded(spark, fixtureDir, Seq("fast"))
      .as[(Long, Long, Long, Double, Option[Long])].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_._1) === (1L to rows.size))
    // scores non-increasing down the ranking
    assert(rows.map(_._4).sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true })
    // the original matches keep a prev_rank; expansion-only docs have none
    val byDoc = rows.map(r => r._2 -> r._5).toMap
    assert(byDoc(0L).isDefined && byDoc(1L).isDefined)
    assert(Seq(2L, 3L).exists(d => byDoc.get(d).exists(_.isEmpty)))
  }

  test("prf expansion degrades to empty when no pinned term occurs") {
    assert(Retrieval.qPrfExpansion.run(spark, fixtureDir).count() === 0L)
  }

  test("rbo: fixture has no query matches -> all-zero overlap profile") {
    val rows = Retrieval.qRboOverlap.run(spark, fixtureDir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows.size === Retrieval.FuseDepth)
    assert(rows.forall(r => r._2 === 0L && r._3 === 0.0 && r._5 === 0.0))
    // weights are the exact powers of two (p = 0.5)
    assert(rows.map(_._4) === (1 to Retrieval.FuseDepth)
      .map(d => math.floor(1e6 / math.pow(2, d) + 0.5) / 1e6))
  }

  test("rbo at sf0.001: plain-Scala replica from the two rankings") {
    val dir = "/root/testdata/sf0.001"
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "rank").as[(Long, Long)].collect().toMap
    val rb = ranks(Retrieval.bm25Ranked(spark, dir))
    val rq = ranks(Retrieval.qlRanked(spark, dir))
    val m = rb.keySet.intersect(rq.keySet).toSeq
      .map(d => math.max(rb(d), rq(d)))
    def d12(x: Double): BigDecimal = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var cum = BigDecimal(0)
    val expRows = (1 to Retrieval.FuseDepth).map { d =>
      val ad = m.count(_ <= d).toLong
      cum += d12((ad.toDouble / d) * (1.0 / (1L << d)))
      (d.toLong, ad, math.floor(ad.toDouble / d * 1e6 + 0.5) / 1e6,
        math.floor(1e6 / (1L << d) + 0.5) / 1e6,
        math.floor(cum.toDouble * 1e6 + 0.5) / 1e6)
    }
    val got = Retrieval.qRboOverlap.run(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === expRows)
    // the two rankers DO share top docs at this SF — non-degenerate
    assert(got.last._2 > 0L && got.last._5 > 0.0)
  }

  test("hard negatives: both roles mined, margins anchored to the weakest pos") {
    val out = Retrieval.qHardNegatives.run(spark, "/root/testdata/sf0.001")
      .collect()
    val (pos, neg) = out.partition(_.getAs[String]("role") == "pos")
    // both legs non-vacuous on real data (the Flesch lesson)
    assert(pos.nonEmpty && neg.nonEmpty)
    assert(pos.length <= Retrieval.PosK && neg.length <= Retrieval.HardNegK)
    // role semantics: positives match >= PosRel terms, negatives fewer
    pos.foreach(r => assert(r.getAs[Long]("n_terms") >= Retrieval.PosRel))
    neg.foreach(r => assert(r.getAs[Long]("n_terms") < Retrieval.PosRel))
    // within-role ranks are 1..k in score order
    def ranks(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("rank")).toSeq
    assert(ranks(pos) === (1L to pos.length))
    assert(ranks(neg) === (1L to neg.length))
    def scores(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("score")).toSeq
    assert(scores(neg) === scores(neg).sorted.reverse)
    // margin anchor: the weakest SELECTED positive has margin exactly 0;
    // every positive sits at >= 0
    val pMargins = pos.map(_.getAs[Double]("margin"))
    assert(pMargins.min === 0.0)
    assert(pMargins.forall(_ >= 0.0))
  }
}
