package graft

import graft.operators.Similarity

/** Similarity search on hand-built vectors: vecs 0/1 identical, 2 orthogonal
  * to them, 3 at cos 0.6 from vec 0 and 0.8 from vec 2. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def topk(q: GraftQuery): Map[(Long, Long), (Long, Double)] =
    q.run(spark, fixtureDir)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap

  test("exact cosine top-k ranks by cosine desc with tid tiebreak") {
    val r = topk(Similarity.qAnnCosineTopk)
    assert(r((0L, 1L)) === ((1L, 1.0)))    // identical vector first
    assert(r((0L, 2L)) === ((3L, 0.6)))    // then cos 0.6
    assert(r((0L, 3L)) === ((2L, 0.0)))    // orthogonal last
    assert(r((2L, 1L)) === ((3L, 0.8)))
  }

  test("fast HOF-dot-product variant clears its recall contract vs the exact plan") {
    // q_ann_cosine_fast now emits its bounded check (overlap_ok per qid);
    // on the fixture's clean values the fast fold matches exactly → all 1
    val r = Similarity.qAnnCosineFast.run(spark, fixtureDir)
      .as[(Long, Long)].collect().toSeq
    assert(r.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(r.forall(_._2 == 1L))
  }

  test("sign-LSH near-dup finds exactly the identical pair at threshold 0.9") {
    val pairs = Similarity.qEmbedNeardupLsh.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs === Seq((0L, 1L, 1.0)))
  }

  test("IVF probe search returns only candidates from probed cells") {
    // with 4 vectors every vector is its own centroid (self-cosine 1), so
    // cells are {0: [0,1], 2: [2], 3: [3]} (vecs 0,1 tie at cid 0).
    // probes (2 nearest centroids): q0,q1 -> {0,1}; q2 -> {2,3}; q3 -> {3,2}
    val rows = Similarity.qAnnIvf.run(spark, fixtureDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows === Seq(
      (0L, 1L, 1L, 1.0),   // q0 sees only cell-0 member 1
      (1L, 1L, 0L, 1.0),
      (2L, 1L, 3L, 0.8),   // q2 sees cell-3 member 3, never vecs 0/1
      (3L, 1L, 2L, 0.8)))
  }

  test("semantic dedup: only the identical pair shares a cell above threshold") {
    // fixture: v0 == v1 (cos 1.0); with first-K init both land in cell 0
    // (d2 = 0 to centroids 0 AND 1, tie to the lower cid); v2, v3 stay in
    // their own cells, so the cross-cell cos(v2, v3) = 0.8 pair is NOT a
    // candidate — cluster scoping is the point of SemDeDup.
    val got = Similarity.qSemanticDedup.run(spark, fixtureDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((0L, 0L, 1L, 1.0)))
  }

  test("pq distortion audit: ADC error is finite and pairs are complete (sf0.001)") {
    // the fixture's 8-dim vectors can't exercise the 64-dim PQ subspace
    // layout, so this pins invariants on the real driver table: every
    // query audits exactly its TopK selected pairs, distances are
    // positive, and the ADC approximation error is bounded by the exact
    // distance scale (a degenerate codebook would blow err past d2)
    val rows = Similarity.qPqDistortion.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows.map(_._1) === (0L until 10L))
    assert(rows.forall(_._2 == Similarity.TopK.toLong))
    assert(rows.forall { case (_, _, d2, ad2, err) =>
      d2 > 0 && ad2 > 0 && err >= 0 && err < d2 })
  }

  test("semdedup cell audit: hand-computed stats on the fixture") {
    // cells: {v0, v1} (tie to cid 0), {v2}, {v3} -> 3 non-empty cells,
    // max 2, C(2,2)=1 candidate pair, 1 verified dup (cos 1.0 >= 0.35);
    // skew = max_cell / (n/n_cells) = 2 / (4/3) = 1.5
    val r = Similarity.qSemdedupCellAudit.run(spark, fixtureDir)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(r === Seq((3L, 2L, 1L, 1L, 1.0, 1.5)))
  }

  test("upper_products: row-major upper triangle, F wrapper == SQL") {
    val df = Seq(Tuple1(Array(1f, 2f, 3f))).toDF("v")
    val viaF = df.select(graft.functions.F.upperProducts($"v"))
      .as[Seq[(Int, Int, Double)]].head()
    val viaSql = df.selectExpr("upper_products(v)")
      .as[Seq[(Int, Int, Double)]].head()
    val expected = Seq((0, 0, 1.0), (0, 1, 2.0), (0, 2, 3.0),
      (1, 1, 4.0), (1, 2, 6.0), (2, 2, 9.0))
    assert(viaF === expected)
    assert(viaSql === expected)
  }

  test("q_embed_covariance equals a plain-Scala dec12 model on the fixture") {
    def dec12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def qround(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val vecs = Tables.embeddings(spark, fixtureDir).orderBy("vec_id")
      .as[(Long, Array[Float], Int)].collect().map(_._2)
    val n = vecs.length.toDouble
    val d = vecs.head.length
    val expected = for {
      i <- 0 until d; j <- i until d
      sxy = vecs.map(v => dec12(v(i).toDouble * v(j).toDouble)).sum.toDouble
      sx = vecs.map(v => dec12(v(i).toDouble)).sum.toDouble
      sy = vecs.map(v => dec12(v(j).toDouble)).sum.toDouble
    } yield (i.toLong, j.toLong, qround((sxy - sx * sy / n) / n))
    val got = Similarity.qEmbedCovariance.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === expected)
    // diagonal = variances, never negative; full upper triangle present
    assert(got.size === d * (d + 1) / 2)
    assert(got.filter(r => r._1 == r._2).forall(_._3 >= 0.0))
  }

  test("q_pca_power equals a plain-Scala dec12 power-iteration model") {
    def dec12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def qround(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // iterate on the SAME rounded covariance the query starts from
    val cov = Similarity.qEmbedCovariance.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect()
    val d = 8
    val m = Array.ofDim[Double](d, d)
    cov.foreach { case (i, j, c) =>
      m(i.toInt)(j.toInt) = c; m(j.toInt)(i.toInt) = c
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lam = 0.0
    for (_ <- 1 to Similarity.PowerIters) {
      val w = Array.tabulate(d)(i =>
        dsumModel((0 until d).map(j => m(i)(j) * v(j)), dec12))
      lam = math.sqrt(dsumModel(w.toSeq.map(x => x * x), dec12))
      v = w.map(_ / lam)
    }
    val got = Similarity.qPcaPower.run(spark, fixtureDir)
      .as[(Long, Double, Double)].collect().toSeq
    val expected = (0 until d).map(i => (i.toLong, qround(v(i)), qround(lam)))
    assert(got === expected)
    // fixture's active 2×2 block [[.1675,-.1725],[-.1725,.2075]] has
    // λ₁ = (0.375 + √0.120625)/2 ≈ 0.361156 — 4 iterations land within 1e-3
    assert(math.abs(got.head._3 - 0.361156) < 1e-3)
    // dims 2..7 carry no variance: loadings exactly 0
    assert(got.drop(2).forall(_._2 === 0.0))
  }

  private def dsumModel(vs: Seq[Double], dec12: Double => BigDecimal): Double =
    vs.map(dec12).sum.toDouble

  test("q_embed_label_profile equals a plain-Scala dec12 model on the fixture") {
    def dec12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def qround(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val byLabel = Tables.embeddings(spark, fixtureDir)
      .as[(Long, Array[Float], Int)].collect().toSeq
      .groupBy(_._3)
    val d = 8
    val expected = (for {
      (label, rows) <- byLabel.toSeq
      vecs = rows.sortBy(_._1).map(_._2)
      n = vecs.length.toDouble
      normAvg = qround(vecs.map(v =>
          math.sqrt(dsumModel(v.map(x => x.toDouble * x.toDouble).toSeq, dec12)))
        .map(x => BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / vecs.length)
      dim <- 0 until d
      sx = dsumModel(vecs.map(_(dim).toDouble).toSeq, dec12)
      sxx = dsumModel(vecs.map(v => v(dim).toDouble * v(dim).toDouble).toSeq, dec12)
    } yield (label, dim.toLong, vecs.length.toLong,
      qround(sx / n), qround((sxx - sx * sx / n) / n), normAvg))
      .sortBy(r => (r._1, r._2))
    val got = Similarity.qEmbedLabelProfile.run(spark, fixtureDir)
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === expected)
    // spot-check hand values: label 0 = two copies of e1 → mean 1 at dim 0,
    // zero variance everywhere, unit norms
    val l0 = got.filter(_._1 == 0)
    assert(l0.head === ((0, 0L, 2L, 1.0, 0.0, 1.0)))
    assert(l0.forall(_._5 === 0.0))
  }

  test("q_label_centroid_dist: hand-computed fixture cosine") {
    // centroid 0 = (1,0,...); centroid 1 = mean of e2 and (0.6,0.8,...)
    // → (0.3, 0.9, 0, ...) at float-widened precision, qrounded.
    // cos = 0.3 / sqrt(0.3² + 0.9²) = 0.3 / (1 · sqrt(0.9)) ≈ 0.316228
    def qround(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val c0 = qround((0.6f.toDouble + 0.0) / 2)   // dim-0 of centroid 1
    val c1 = qround((1.0 + 0.8f.toDouble) / 2)   // dim-1 of centroid 1
    val expected = qround(c0 / (math.sqrt(1.0) * math.sqrt(
      BigDecimal(c0 * c0).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + BigDecimal(c1 * c1).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    val got = Similarity.qLabelCentroidDist.run(spark, fixtureDir)
      .as[(Int, Int, Double)].collect().toSeq
    assert(got === Seq((0, 1, expected)))
    assert(got.head._3 > 0.31 && got.head._3 < 0.32)
  }

  test("mrl recall: truncation beyond the vector length is a no-op audit") {
    // fixture embeddings are 8-dim < MrlDims=32, so slice() keeps the
    // whole vector: the truncated ranking MUST equal the full ranking and
    // recall must read n_hit = all (n-1)=3 neighbors for every query
    val rows = Similarity.qMrlRecall.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) === Seq(0L, 1L, 2L, 3L))
    rows.foreach { case (_, nHit, recall) =>
      assert(nHit === 3L)
      assert(recall === 0.6) // 3 of TopK=5 possible neighbors exist
    }
  }

  test("mrl recall at sf0.001: one audit row per query vector, bounded") {
    val rows = Similarity.qMrlRecall.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.size === Similarity.NQueryVecs)
    rows.foreach { case (_, nHit, recall) =>
      assert(nHit >= 0L && nHit <= Similarity.TopK)
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("isotropy: collapsed cloud reads 1, orthonormal basis reads 1/d") {
    def run(vecs: Seq[Array[Float]]): (Double, Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-iso").toString
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, i % 2) }
        .toDF("vec_id", "embedding", "label")
        .write.parquet(s"$dir/embeddings.parquet")
      val r = graft.operators.Similarity.qEmbedIsotropy.run(spark, dir)
        .select($"mean_norm", $"norm_cv", $"anisotropy").collect().head
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    // five copies of one unit vector: total collapse
    val one = Array.tabulate(4)(i => if (i == 0) 1f else 0f)
    val (mn1, cv1, an1) = run(Seq.fill(5)(one))
    assert(mn1 === 1.0 && cv1 === 0.0 && an1 === 1.0)
    // the 4 orthonormal basis vectors: anisotropy = 1/d = 0.25
    val basis = (0 until 4).map(i => Array.tabulate(4)(j => if (i == j) 1f else 0f))
    val (mn2, cv2, an2) = run(basis)
    assert(mn2 === 1.0 && cv2 === 0.0 && an2 === 0.25)
  }

  test("q_geomedian: Weiszfeld replica on the fixture; robust vs mean pull") {
    // fixture: 2x(1,0,..), 1x(0,1,..), 1x(.6,.8,..) — the duplicated
    // point should pull the MEDIAN harder than the mean in dim 0
    val pts = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0), Array(1.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 0, 0, 0), Array(0.6, 0.8, 0, 0, 0, 0, 0, 0))
    def d12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val mean = (0 until 8).map(j =>
      (pts.map(p => d12(p(j))).sum.toDouble) / pts.size)
    var est = mean
    for (_ <- 1 to Similarity.GmIters) {
      val ws = pts.flatMap { p =>
        val dd2 = p.indices.map(j => d12((p(j) - est(j)) * (p(j) - est(j))))
          .sum.toDouble
        if (dd2 > 0) Some(p -> 1.0 / math.sqrt(dd2)) else None
      }
      est = (0 until 8).map { j =>
        ws.map { case (p, w) => d12(w * p(j)) }.sum.toDouble /
          ws.map { case (_, w) => d12(w) }.sum.toDouble
      }
    }
    val got = Similarity.qGeomedian.run(spark, fixtureDir)
      .as[(Long, Double, Double)].collect().toSeq
    assert(got === (0 until 8).map(j => (j.toLong, qr(est(j)), qr(mean(j)))))
    // robustness direction: the gm sits closer to the duplicated point
    assert(got(0)._2 > got(0)._3 && got(1)._2 < got(1)._3)
  }

  test("semantic contamination: a planted cross-split duplicate leaks") {
    // split membership is a pure function of vec_id (salted md5) — find a
    // holdout id and a train id, give both the e_0 basis vector: same
    // cell, cosine 1 >= tau, so the train copy is a leaked document
    def hold(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"semsplit:$id".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 10 == 9
    }
    val h = (8L to 200L).find(hold).get
    val t = (8L to 200L).find(id => !hold(id) && id != h).get
    val e0 = Array.tabulate(8)(i => if (i == 0) 1f else 0f)
    val basis = (0 until 8).map(i =>
      i.toLong -> Array.tabulate(8)(j => if (i == j) 1f else 0f))
    val dir = java.nio.file.Files.createTempDirectory("graft-semcon").toString
    (basis ++ Seq(t -> e0, h -> e0))
      .map { case (id, v) => (id, v, (id % 2).toInt) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.qSemanticContamination.run(spark, dir).collect()
    // mass balance over the whole corpus
    assert(out.map(_.getAs[Long]("n_train")).sum +
      out.map(_.getAs[Long]("n_holdout")).sum === 10L)
    out.foreach { r =>
      assert(r.getAs[Long]("n_leaked") <= r.getAs[Long]("n_train"))
      assert(r.getAs[Long]("n_leaked") <= r.getAs[Long]("n_pairs"))
    }
    // the planted pair lands in e_0's cell (cell 0) and leaks
    val cell0 = out.find(_.getAs[Long]("cell") === 0L).get
    assert(cell0.getAs[Long]("n_pairs") >= 1L)
    assert(cell0.getAs[Long]("n_leaked") >= 1L)
    assert(cell0.getAs[Double]("leak_rate") > 0.0)
    // orthogonal cells cannot leak (cosine 0 < tau)
    out.filter(_.getAs[Long]("cell") != 0L).foreach { r =>
      assert(r.getAs[Long]("n_pairs") === 0L)
    }
  }

  test("q_sq8_recall: lossless on the {0,1}-component fixture; lossy on real data") {
    // fixture vectors 0/1/2 have only 0/1 components (exactly representable
    // after int8 round-trip) and 3 = (0.6, 0.8) stays order-preserving --
    // every one of the 3 candidates per query survives quantization
    // (n_hit = 3 of 3 possible; recall = 3/TopK = 0.6 only because the
    // fixture has fewer candidates than K)
    val fx = Similarity.qSq8Recall.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(fx.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(fx.forall(_._2 === 3L))
    assert(fx.forall(_._3 === 0.6))
    // real data: quantization genuinely perturbs at least one ranking at
    // sf0.001 (recall < 1 somewhere), and never catastrophically (>= 3/5)
    val real = Similarity.qSq8Recall.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect().toSeq
    assert(real.size === Similarity.NQueryVecs)
    assert(real.exists(_._3 < 1.0), "SQ8 audit vacuous: all recalls 1.0")
    assert(real.forall(_._2 >= 3L))
  }

  test("q_ivf_tune: production row matches the audit; sweep monotone in nprobe") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = graft.operators.Similarity.qIvfTune.run(spark, dir)
      .as[(Long, Long, Double, Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) ===
      graft.operators.Similarity.IvfTuneTiers.map(_.toLong))
    // nested probe sets: candidates and hits nondecreasing in depth
    assert(rows.map(_._2).sliding(2).forall { case Seq(a, b) => b >= a })
    assert(rows.map(_._4).sliding(2).forall { case Seq(a, b) => b >= a })
    assert(rows.forall(r => r._4 <= r._5))
    // the production tier's totals equal q_ivf_recall_audit's sums --
    // witnessing the membership identity the tune's join-count recall
    // relies on (exact-topk hit in candidates <=> hit in candidate topk)
    val audit = graft.operators.Similarity.qIvfRecallAudit.run(spark, dir)
      .select($"n_cand", $"n_hit").as[(Long, Long)].collect()
    val prod = rows.find(_._1 ==
      graft.operators.Similarity.NProbe.toLong).get
    assert(prod._2 === audit.map(_._1).sum)
    assert(prod._4 === audit.map(_._2).sum)
  }

  test("ivf-pq: ranks only probed-cell candidates; recall decomposition well-formed") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val S = graft.operators.Similarity
    val topk = S.ivfPqTopk(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(topk.nonEmpty)
    // the probe bound: every ranked pair is an IVF candidate pair (the
    // composite may never score a vector outside the query's probed
    // cells — that is the whole point of the coarse quantizer)
    val emb = S.withNormOf(
      Tables.embeddings(spark, dir).select($"vec_id", $"embedding"))
    val scored = S.ivfScored(emb, S.ivfTrainedCentroids(emb))
    val cand = S.ivfCandOf(S.ivfProbesOf(scored, S.NProbe),
        S.ivfAssignOf(scored))
      .select($"qid", $"tid").as[(Long, Long)].collect().toSet
    assert(topk.forall(r => cand((r._1, r._3))))
    // per-query rank lists: dense ranks from 1, ad2 nondecreasing
    for ((_, rs) <- topk.groupBy(_._1)) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.size.toLong))
      assert(sorted.map(_._4).sliding(2).forall {
        case Seq(a, b) => b >= a; case _ => true })
    }
    // the decomposition audit: one row per query vector, hits bounded by
    // k, recalls the rounded hit quotients
    val rec = S.qIvfpqRecall.run(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(rec.size === S.NQueryVecs)
    assert(rec.forall(r => r._2 >= 0 && r._2 <= S.TopK
      && r._3 >= 0 && r._3 <= S.TopK))
    assert(rec.forall(r => r._4 >= 0.0 && r._4 <= 1.0
      && r._5 >= 0.0 && r._5 <= 1.0))
  }

  test("mmd drift: pure variance shift shows in the quadratic kernel " +
      "only; single-group corpus degrades to NULL") {
    // two labels, both mean-zero on axis 0: linear MMD is exactly 0;
    // second moments M0 = diag(1, 0) vs M1 = diag(4, 0), so one-vs-rest
    // quadratic MMD^2 = (1-4)^2 = 9 for both labels
    val emb = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(-1.0f, 0.0f)),
      (1, Array(2.0f, 0.0f)), (1, Array(-2.0f, 0.0f)))
      .toDF("label", "embedding")
    val out = Similarity.mmdDriftOf(emb).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(0, 1))
    assert(out.forall(_.getAs[Long]("n_vecs") === 2L))
    assert(out.forall(_.getAs[Double]("mmd2_lin") === 0.0))
    assert(out.forall(_.getAs[Double]("mmd2_quad") === 9.0))

    // mean shift shows in BOTH kernels
    val emb2 = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(1.0f, 0.0f)),
      (1, Array(-1.0f, 0.0f)), (1, Array(-1.0f, 0.0f)))
      .toDF("label", "embedding")
    val out2 = Similarity.mmdDriftOf(emb2).collect()
    // mu diff = 2 on axis 0 -> lin = 4; M identical -> quad = 0
    assert(out2.forall(_.getAs[Double]("mmd2_lin") === 4.0))
    assert(out2.forall(_.getAs[Double]("mmd2_quad") === 0.0))

    // single group: no rest to compare against -> NULL metrics, row kept
    val solo = Similarity.mmdDriftOf(
      Seq((7, Array(1.0f, 2.0f))).toDF("label", "embedding")).collect()
    assert(solo.length === 1)
    assert(solo.head.isNullAt(solo.head.fieldIndex("mmd2_lin")))
    assert(solo.head.isNullAt(solo.head.fieldIndex("mmd2_quad")))
  }

  test("q_mmd_drift on sf0.001: a row per label, nonnegative metrics") {
    val out = Similarity.qMmdDrift.run(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_vecs")).sum === 500L)
    assert(out.forall(_.getAs[Double]("mmd2_lin") >= 0.0))
    assert(out.forall(_.getAs[Double]("mmd2_quad") >= 0.0))
  }
}
