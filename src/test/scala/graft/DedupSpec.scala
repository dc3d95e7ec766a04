package graft

import graft.operators.Dedup

/** Dedup family on the fixture corpus: docs 2/3 are exact duplicates, docs
  * 4/5 are 30-token near-duplicates (one token changed). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups identical texts, keeps min doc_id") {
    val r = Dedup.qDedupExact.run(spark, fixtureDir)
      .select($"keep_id", $"n_copies").as[(Long, Long)].collect().toMap
    assert(r(2L) === 2L)            // docs 2+3 collapse into keeper 2
    assert(r.values.sum === 6L)     // every doc accounted for
    assert(r.keys.toSet === Set(0L, 1L, 2L, 4L, 5L))
  }

  test("minhash LSH finds the exact-dup pair with jaccard 1.0") {
    val pairs = Dedup.qDedupMinhash.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.contains((2L, 3L, 1.0)))
    // near-dup pair: 2-shingle jaccard 28/30
    assert(pairs.contains((4L, 5L, 0.933333)))
    assert(pairs.forall(_._3 >= Dedup.JaccardThreshold))
  }

  test("lsh candidate audit: internal consistency on the fixture") {
    val r = Dedup.qLshCandidateAudit.run(spark, fixtureDir)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().head
    val (nBuckets, maxBucket, bandPairs, nCand, nVerified, precision, expRecall) = r
    assert(nBuckets > 0 && maxBucket >= 1)
    // distinct-pair dedup across bands can only shrink the band-pair count
    assert(nCand <= bandPairs)
    assert(nVerified <= nCand)
    // both planted pairs (2,3) jaccard 1.0 and (4,5) 0.933 must be verified
    assert(nVerified >= 2)
    assert(precision > 0.0 && precision <= 1.0)
    // j=1.0 contributes p=1; j=0.933 contributes p≈0.9998 — avg near 1
    assert(expRecall > 0.99 && expRecall <= 1.0)
  }

  test("simhash: identical docs have hamming 0; all pairs within radius") {
    val pairs = Dedup.qDedupSimhash.run(spark, fixtureDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.contains((2L, 3L, 0L)))
    assert(pairs.forall(_._3 <= 3L))
  }

  test("ngram jaccard: exact 3-shingle similarity") {
    val pairs = Dedup.qNgramJaccard.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq
    // docs 4/5: 27 shared 3-shingles of a 29-shingle union
    assert(pairs.toSet === Set((2L, 3L, 1.0), (4L, 5L, 0.931034)))
  }

  test("cluster assignment labels every doc with its component's min id") {
    val clusters = Dedup.qDedupClusters.run(spark, fixtureDir)
      .as[(Long, Long)].collect().toMap
    // near-dup pairs (2,3) and (4,5) collapse; 0/1 are singletons
    assert(clusters === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L,
      4L -> 4L, 5L -> 4L))
  }

  test("native simhash32 matches the declarative explode/aggregate twin") {
    val docs = Tables.documents(spark, fixtureDir)
    val native = docs.select($"doc_id",
      org.apache.spark.sql.functions.call_function("simhash32", $"text").as("simhash"))
      .as[(Long, Long)].collect().toMap
    val declarative = Dedup.simhashSigDeclarative(docs)
      .as[(Long, Long)].collect().toMap
    assert(native === declarative)
  }

  test("native word_shingles matches the declarative zip_with twin") {
    // texts with ≥ n-1 tokens: the declarative slice() formulation throws on
    // shorter inputs (negative slice length) — an edge the native expression
    // handles (returns []) and the corpus never exercises
    val texts = Seq(
      "a b c d", "a  b\tc", " leading space", "x y x y x y",
      "the the the", (1 to 40).map(i => s"t$i").mkString(" "))
    for (n <- Seq(2, 3)) {
      val df = texts.toDF("text").select(
        org.apache.spark.sql.functions.call_function(
          "word_shingles", $"text", org.apache.spark.sql.functions.lit(n)).as("native"),
        Dedup.shingleArray($"text", n).as("declarative"))
      df.as[(Seq[String], Seq[String])].collect().zip(texts).foreach {
        case ((nat, dec), t) =>
          assert(nat.toSet === dec.toSet, s"n=$n text='$t'")
      }
    }
  }

  test("edit distance audit: exact-dup candidates measure 0") {
    // docs 2,3 are exact duplicates -> same bands -> candidate pair at 0;
    // docs 4,5 differ only past the 96-char prefix -> also 0
    val r = Dedup.qEditDistance.run(spark, fixtureDir)
      .select($"ia", $"ib", $"edit_dist").as[(Long, Long, Long)]
      .collect().map { case (a, b, d) => (a, b) -> d }.toMap
    assert(r.get((2L, 3L)) === Some(0L))
    assert(r.values.forall(_ >= 0L))
  }

  test("prefix-filtered jaccard join is lossless vs the unpruned full join") {
    import org.apache.spark.sql.functions.{call_function, lit}
    // the gate's oracle re-checks this at sf0.01/sf0.1; here: the fixture
    // (planted pairs) AND sf0.001 against a driver-side brute-force over
    // the FULL shingle sets — every J ≥ 0.7 pair must survive the pruning
    for (d <- Seq(fixtureDir, "/root/testdata/sf0.001")) {
      val got = Dedup.qJaccardPrefix.run(spark, d)
        .as[(Long, Long, Double)].collect().toSeq
      val sh = Tables.documents(spark, d)
        .select($"doc_id", call_function("word_shingles", $"text", lit(3)))
        .as[(Long, Seq[String])].collect().map { case (id, s) => (id, s.toSet) }
      val expected = (for {
        (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
        inter = sa.intersect(sb).size
        un = sa.size + sb.size - inter
        if un > 0
        j = math.floor(inter.toDouble / un * 1e6 + 0.5) / 1e6
        if j >= Dedup.PrefixThreshold
      } yield (ia, ib, j)).toSeq.sortBy(p => (p._1, p._2))
      assert(got === expected, d)
    }
    // fixture sanity: both planted near-dup pairs survive at t = 0.7
    val fx = Dedup.qJaccardPrefix.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(fx === Set((2L, 3L, 1.0), (4L, 5L, 0.931034)))
  }

  test("keep-best: quality-ranked keeper per cluster, identical docs tie to lower id") {
    val rows = Dedup.qDedupKeepBest.run(spark, fixtureDir)
      .as[(Long, Long, Double, Long, Boolean)].collect().toSeq.sortBy(_._1)
    // clusters {2,3} (identical text → equal quality → tie to 2) and {4,5}
    // (doc 4's text is one char longer → higher avg_token_len → higher
    // quality → keeper 4); singletons keep themselves
    assert(rows.map(r => (r._1, r._2, r._4, r._5)) === Seq(
      (0L, 0L, 0L, true), (1L, 1L, 1L, true),
      (2L, 2L, 2L, true), (3L, 2L, 2L, false),
      (4L, 4L, 4L, true), (5L, 4L, 4L, false)))
    // identical texts carry identical quality
    assert(rows(2)._3 === rows(3)._3)
    assert(rows(4)._3 > rows(5)._3)
  }

  test("minhash estimate audit: identical docs agree on every hash, near-dups stay consistent") {
    val rows = Dedup.qMinhashEstimate.run(spark, fixtureDir)
      .as[(Long, Long, Double, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // identical texts → identical signatures → perfect estimate
    assert(rows((2L, 3L)) === ((1.0, 12L, 1.0, 0.0)))
    // near-dup pair: estimate = agree/12 within [0,1], error consistent
    val (j, agree, est, err) = rows((4L, 5L))
    assert(j === 0.933333)
    assert(agree >= 0L && agree <= 12L)
    assert(est === math.floor(agree / 12.0 * 1e6 + 0.5) / 1e6)
    assert(err === math.floor(math.abs(agree / 12.0 - j) * 1e6 + 0.5) / 1e6)
  }

  test("quality-dedup calibration: deciles partition the corpus, dup mass = the two clusters") {
    val rows = Dedup.qQualityDedupCalibration.run(spark, fixtureDir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // 6 docs over 10 deciles: ntile gives 6 non-empty buckets of 1
    assert(rows.map(_._2).sum === 6L)
    assert(rows.forall(_._2 === 1L))
    // exactly 4 documents (clusters {2,3} and {4,5}) are dup-flagged
    assert(rows.map(_._3).sum === 4L)
    rows.foreach { case (_, n, d, rate, _) =>
      assert(rate === math.floor(d * 1.0 / n * 1e6 + 0.5) / 1e6)
    }
    // avg_quality is non-decreasing across deciles (the ordering law)
    val qs = rows.sortBy(_._1).map(_._5)
    assert(qs === qs.sorted)
  }

  test("pair evidence: rarest shared shingles, rank-1 strictly rarest") {
    val rows = Dedup.qPairEvidence.run(spark, fixtureDir)
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    val byPair = rows.groupBy(r => (r._1, r._2))
    // both verified pairs carry evidence, at most EvidenceTopK rows each
    assert(byPair.keySet === Set((2L, 3L), (4L, 5L)))
    byPair.values.foreach { ev =>
      assert(ev.size <= Dedup.EvidenceTopK)
      val sorted = ev.sortBy(_._3)
      // df non-decreasing in rank; ties broken by shingle ascending
      assert(sorted.map(_._5) === sorted.map(_._5).sorted)
    }
    // docs 2/3 are identical and unique in the corpus: every shared
    // shingle has df = 2 (the pair itself)
    assert(byPair((2L, 3L)).forall(_._5 === 2L))
  }

  test("near-dup source rollup: the two planted pairs land on their source pairs") {
    val rows = Dedup.qNeardupSources.run(spark, fixtureDir)
      .as[(String, String, Long, Double)].collect().toSeq
    // (2,3) = srcA×srcC with jaccard 1.0; (4,5) = srcB×srcC with 28/30
    assert(rows === Seq(
      ("srcA", "srcC", 1L, 1.0),
      ("srcB", "srcC", 1L, 0.933333)))
  }

  test("split leakage: classes partition the verified pairs, flags mark off-diagonal") {
    val nPairs = Dedup.qDedupMinhash.run(spark, fixtureDir).count()
    val rows = Dedup.qSplitLeakage.run(spark, fixtureDir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // every verified pair lands in exactly one (split_a, split_b) class
    assert(rows.map(_._3).sum === nPairs)
    // leaked flags exactly the cross-split classes
    assert(rows.forall(r => (r._4 == 1L) == (r._1 != r._2)))
    // split labels agree with q_train_split's assignment for the planted
    // pair members (one shared hash definition — this pins the wiring)
    val split = graft.operators.PipelineOps.qTrainSplit.run(spark, fixtureDir)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._3).toMap
    val expected = Seq((2L, 3L), (4L, 5L))
      .map { case (a, b) => (split(a), split(b)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap === expected)
  }

  test("containment dedup catches subset pairs symmetric Jaccard is blind to") {
    // d0 (10 tokens) is the PREFIX of d1 (34 tokens): every d0 shingle is
    // a d1 shingle -> containment 1.0, while Jaccard = 8/32 = 0.25 is far
    // below the 0.6 dedup threshold AND q_ngram_jaccard's length filter
    // (min/max = 8/32 < 0.6) never even pairs them. d2 is unrelated.
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    val short = (1 to 10).map(i => s"t$i").mkString(" ")
    val long = ((1 to 10).map(i => s"t$i") ++ (1 to 24).map(i => s"u$i"))
      .mkString(" ")
    Seq((0L, short, "en", "srcA", short.length.toLong),
        (1L, long, "en", "srcB", long.length.toLong),
        (2L, "x1 x2 x3 x4 x5", "en", "srcC", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val r = graft.operators.Dedup.qContainmentDedup.run(spark, dir)
      .as[(Long, Long, Double, Double, Boolean)].collect().toSeq
    assert(r === Seq((0L, 1L, 1.0, 0.25, true)))

    // and the symmetric pass indeed misses the pair entirely
    val jac = graft.operators.Dedup.qNgramJaccard.run(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(!jac.exists(p => p._1 == 0L && p._2 == 1L))
  }

  test("snm dedup: sort adjacency pairs the exact and near duplicates") {
    // fixture sort order (docs with >= 3 tokens): 0 < 1 < 2 = 3 < 4 < 5 —
    // all six land within one 5-rank window of their duplicates. Verified
    // pairs: (2,3) identical -> 1.0; (4,5) share 27 of 29 3-gram shingles
    // -> 27/29 = 0.931034; every cross pair is below the 0.6 threshold
    val rows = graft.operators.Dedup.qSnmDedup.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows === Seq((2L, 3L, 1.0), (4L, 5L, 0.931034)))
  }

  test("snm candidate volume is exactly (W-1)n - W(W-1)/2 — linear by " +
      "construction") {
    val w = graft.operators.Dedup.SnmWindow
    for (dir <- Seq(fixtureDir, "/root/testdata/sf0.001")) {
      val n = Tables.documents(spark, dir)
        .filter(org.apache.spark.sql.functions.size(
          graft.functions.Text.tokens($"text")) >= 3).count()
      val cands = graft.operators.Dedup.snmCandidates(spark, dir).count()
      assert(cands === (w - 1) * n - w.toLong * (w - 1) / 2,
        s"dir=$dir n=$n")
    }
  }

  test("blocking recall: on the fixture both strategies find both pairs") {
    val rows = graft.operators.Dedup.qBlockingRecall.run(spark, fixtureDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq((2L, 2L, 2L, 0L, 0L, 2L)))
  }

  test("record linkage: planted agree/disagree pairs score and classify") {
    // A,B: same lang/source/length-bucket + jaccard 2/3 -> all four fields
    // agree -> score = sum of agreement weights -> match.
    // C,D: jaccard 1/3, different lang and source, same length bucket ->
    // only lenb agrees -> deep negative score -> non_match.
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", "s1"),
      (1L, "alpha beta gamma delta epsilon", "en", "s1"),
      (2L, "zebra zulu zoo xray", "fr", "s2"),
      (3L, "zebra zulu zoo xylophone", "de", "s3"))
    val dir = java.nio.file.Files.createTempDirectory("graft-rl").toString
    docs.map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    def qr(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val allAgree = qr(math.log(0.95 / 0.20) + math.log(0.90 / 0.10) +
      math.log(0.80 / 0.25) + math.log(0.90 / 0.02))
    val rows = Dedup.qRecordLinkage.run(spark, dir)
      .as[(Long, Long, Int, Int, Int, Int, Double, String)]
      .collect().toSeq.map(r => (r._1, r._2) -> r).toMap
    val ab = rows((0L, 1L))
    assert((ab._3, ab._4, ab._5, ab._6) === ((1, 1, 1, 1)))
    assert(ab._7 === allAgree && ab._8 === "match")
    val cd = rows((2L, 3L))
    assert((cd._3, cd._4, cd._5, cd._6) === ((0, 0, 1, 0)))
    assert(cd._8 === "non_match" && cd._7 < 0.0)
  }

  test("linkage EM: fitted parameters are probabilities and jac discriminates") {
    val rows = Dedup.qLinkageEm.run(spark, "/root/testdata/sf0.001")
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet === Set("lang", "source", "lenb", "jac"))
    rows.values.foreach { case (_, m, u, _, p) =>
      assert(m > 0 && m < 1 && u > 0 && u < 1 && p > 0 && p < 1)
    }
    // the verified-similarity field must separate the classes: EM should
    // assign it a strongly positive agreement weight
    val jac = rows("jac")
    assert(jac._2 > jac._3 && jac._4 > 1.0)
  }

  test("dedup threshold sweep: monotone, and the 0.6 row IS q_dedup_minhash") {
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.qDedupThresholdSweep.run(spark, dir)
      .as[(Double, Long, Long)].collect().toSeq
    assert(out.map(_._1) === (10 to 19).map(_ / 20.0))
    // raising the bar can only shrink the pair set and the touched docs
    assert(out.map(_._2) === out.map(_._2).sorted.reverse)
    assert(out.map(_._3) === out.map(_._3).sorted.reverse)
    // the production-threshold row counts exactly the verified pairs and
    // the docs they touch
    val prodPairs = Dedup.qDedupMinhash.run(spark, dir)
    val at06 = out.find(_._1 === 0.6).get
    assert(at06._2 === prodPairs.count())
    assert(at06._3 ===
      prodPairs.select($"ia").union(prodPairs.select($"ib"))
        .distinct().count())
  }

  test("q_minhash_tune: (4,3) row IS the production audit; table non-vacuous") {
    val dir = "/root/testdata/sf0.001"
    val tune = Dedup.qMinhashTune.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band")) -> r)
      .toMap
    assert(tune.size === 6) // every factorization of K = 12
    // the production (4 bands x 3 rows) row equals q_lsh_candidate_audit's
    // measured bucket shape and S-curve recall EXACTLY (different band-key
    // encodings, same partition -> same stats)
    val audit = Dedup.qLshCandidateAudit.run(spark, dir).collect().head
    val prod = tune((4L, 3L))
    for (f <- Seq("n_buckets", "max_bucket", "band_pairs", "n_verified"))
      assert(prod.getAs[Long](f) === audit.getAs[Long](f), f)
    assert(prod.getAs[Double]("exp_recall") === audit.getAs[Double]("exp_recall"))
    // decision-table non-vacuity on real data: fewer rows per band =>
    // coarser keys => strictly more band-join work at r = 1 than at the
    // production r = 3, and the implied threshold rises with r
    assert(tune((12L, 1L)).getAs[Long]("band_pairs")
      > prod.getAs[Long]("band_pairs"))
    val thrByR = Dedup.BandFactorizations.map { case (b, r) =>
      tune((b.toLong, r.toLong)).getAs[Double]("thr_pred") }
    assert(thrByR === thrByR.sorted) // monotone in rows_per_band
    assert(thrByR.head < thrByR.last)
    // recall falls as the implied threshold rises past the verified mass
    assert(tune((12L, 1L)).getAs[Double]("exp_recall")
      >= tune((1L, 12L)).getAs[Double]("exp_recall"))
  }

  test("q_minhash_tune: degenerate corpus (no shingles) still emits all six grid rows") {
    import spark.implicits._
    // single-word docs produce NO 2-shingles -> every banding has zero
    // buckets. The rollup's groupBy(r) emits nothing for such a banding;
    // the 1-row anchor join must keep the row (n_buckets 0, null shape),
    // matching the oracle's always-one-row global aggregates
    // (round-16 advice: the filter alone silently lost the grid rows)
    val dir = java.nio.file.Files.createTempDirectory("graft-tune0").toString
    (0 until 8).map(i => (i.toLong, s"word$i", "en", "s0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Dedup.qMinhashTune.run(spark, dir).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getAs[Long]("rows_per_band")).toSeq
      === Dedup.BandFactorizations.map(_._2.toLong).sorted)
    for (r <- rows) {
      assert(r.getAs[Long]("n_buckets") === 0L)
      assert(r.isNullAt(r.fieldIndex("max_bucket")))
      assert(r.isNullAt(r.fieldIndex("band_pairs")))
      assert(r.getAs[Long]("n_verified") === 0L)
      assert(r.isNullAt(r.fieldIndex("exp_recall")))
      assert(!r.isNullAt(r.fieldIndex("thr_pred")))
    }
  }
}
