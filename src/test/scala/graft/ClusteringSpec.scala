package graft

import graft.operators.Clustering

/** Hand-traced farthest-point selection on planted 1-D embeddings (second
  * component 0): positions 0, 100, 40, 70, 10, 55, 25 for ids 0..6.
  * Greedy trace: seed id0(x=0) → id1(100, d²=10000) → id5(55, 2025) →
  * id6(25, 625) → id2(40, 225; ties id3 at 225, lower id wins) →
  * id3(70, 225); residual radius² = id4's 100. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("k-center: hand-traced selection order, radii and residual radius") {
    val xs = Seq(0f, 100f, 40f, 70f, 10f, 55f, 25f)
    val dir = java.nio.file.Files.createTempDirectory("graft-kc").toString
    xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, Array(x, 0f), i % 3)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Clustering.qKcenterSelect.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .toSeq
    assert(got === Seq(
      (0L, 0L, -1.0),
      (1L, 1L, 10000.0),
      (2L, 5L, 2025.0),
      (3L, 6L, 625.0),
      (4L, 2L, 225.0),
      (5L, 3L, 225.0),
      (6L, -1L, 100.0)))
  }

  test("gmm: fitted mixture is a valid two-component decomposition") {
    val rows = Clustering.qGmmEm.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L))
    val Array(c1, c2) = rows
    // weights form a distribution (6-dp rounding slack), components are
    // ordered and non-degenerate, one shared fit quality
    assert(math.abs(c1._2 + c2._2 - 1.0) < 2e-6)
    assert(c1._2 > 0 && c2._2 > 0)
    assert(c1._3 < c2._3) // init separation survives: bulk below tail
    assert(c1._4 > 0 && c2._4 > 0)
    assert(c1._5 === c2._5 && c1._5 < 0)
  }

  test("silhouette: hand-traced clusters on the fixture embeddings") {
    // All 4 fixture vectors seed as centroids (vec_id < K). Round-1 ties
    // send v0,v1 to c0 (lower cid), so c1 LOSES all members and vanishes
    // from the updated model — the empty-centroid path. Updated centroids:
    // c0=(1,0,..) (mean of two identical members), c2=v2, c3=v3. Every
    // vector then sits exactly ON its centroid (a=0, s=1).
    val got = Clustering.qSilhouette.run(spark, fixtureDir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 2L, 1.0, 1.0, 1.0),
      (2L, 1L, 1.0, 1.0, 1.0),
      (3L, 1L, 1.0, 1.0, 1.0)))
  }

  test("mauve frontier: hand-traced histograms on the fixture embeddings") {
    // clusters (silhouette trace): v0,v1 -> cell0 (labels 0,0 => P);
    // v2 -> cell2 (label 1 => Q); v3 -> cell3 (label 1 => Q).
    // smoothed: p = [2.5, .5, .5]/3.5, q = [.5, 1.5, 1.5]/3.5.
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def d9(x: Double) = BigDecimal.valueOf(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(s: BigDecimal) =
      s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val p = Seq(2.5 / 3.5, 0.5 / 3.5, 0.5 / 3.5)
    val q = Seq(0.5 / 3.5, 1.5 / 3.5, 1.5 / 3.5)
    val expRows = Clustering.MauveLambdas.map { lam =>
      val kl = (x: Seq[Double]) => r6(p.indices.map { i =>
        val m = lam * p(i) + (1.0 - lam) * q(i)
        d9(qr(x(i) * math.log(x(i) / m)))
      }.sum)
      (lam, kl(p), kl(q))
    }
    val got = Clustering.qMauveFrontier.run(spark, fixtureDir)
      .as[(Double, Double, Double)].collect().toSeq
    assert(got === expRows)
    // both KLs positive (the sets genuinely differ on the fixture)
    assert(got.forall(r => r._2 > 0 && r._3 > 0))
  }

  test("silhouette at sf0.001: bounded range, clusters partition the corpus") {
    val dir = "/root/testdata/sf0.001"
    val got = Clustering.qSilhouette.run(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.forall(r => r._4 >= -1.0 && r._5 <= 1.0 && r._4 <= r._3 &&
      r._3 <= r._5))
    val nVec = Tables.embeddings(spark, dir).count()
    assert(got.map(_._2).sum === nVec)
  }

  test("q_plsa_topics: EM likelihood is monotone over rounds; topics differentiate") {
    val dir = "/root/testdata/sf0.001"
    val tf = Clustering.plsaTf(Tables.documents(spark, dir))
    // EM's defining guarantee: each round cannot decrease the data
    // log-likelihood (up to the 1e-6 cross-engine preround grid)
    val lls = (0 to Clustering.PlsaRounds).map { r =>
      Clustering.plsaReport(tf, rounds = r)
        .select($"avg_ll").distinct().as[Double].collect().head
    }
    assert(lls.sliding(2).forall { case Seq(a, b) => b >= a - 1e-5 },
      s"EM likelihood decreased: $lls")
    assert(lls.last > lls.head, "EM vacuous: no likelihood gain over init")

    val rows = Clustering.qPlsaTopics.run(spark, dir)
      .as[(Long, Long, String, Double, Double, Double)].collect().toSeq
    // topic card shape: K topics x TopTerms ranks, total order
    assert(rows.map(r => (r._1, r._2)).toSet ===
      (for (t <- 1 to Clustering.PlsaK; k <- 1 to Clustering.PlsaTopTerms)
        yield (t.toLong, k.toLong)).toSet)
    // masses are a distribution (one mass per topic, summing to ~1)
    val masses = rows.groupBy(_._1).map(_._2.head._5)
    assert(math.abs(masses.sum - 1.0) <= 3e-6)
    assert(masses.forall(m => m > 0 && m < 1))
    // non-vacuity: the hash init broke symmetry -- the per-topic p(w|z)
    // over the shared top-term vocabulary are NOT identical across topics
    val byTopic = rows.groupBy(_._1).view
      .mapValues(_.map(r => r._3 -> r._4).toMap).toMap
    assert(byTopic.values.toSeq.distinct.size > 1,
      "all topics carry identical term distributions")
  }
}
