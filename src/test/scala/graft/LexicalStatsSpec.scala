package graft

import graft.operators.LexicalStats
import org.apache.spark.sql.functions._

/** Lexical statistics: hand-computed fixture expectations for token
  * diversity and the quality-filter funnel, plus structural checks of the
  * bigram-lift ranking on the sf0.001 corpus (the fixture corpus has no
  * bigram above the support floor — itself a pinned expectation). */
class LexicalStatsSpec extends SparkSpec {
  import spark.implicits._

  test("q_token_diversity hand-computed rows") {
    val out = LexicalStats.qTokenDiversity.run(spark, fixtureDir)
      .as[(Long, Long, Long, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // doc 0 "fast fast slow": n=3 V=2, ttr=2/3, simpson=2·1/(3·2)=1/3
    assert(out(0L) === ((0L, 3L, 2L, 0.666667, Some(0.333333))))
    // doc 1 "fast the big": all distinct
    assert(out(1L) === ((1L, 3L, 3L, 1.0, Some(0.0))))
    // docs 2/3 "slow slow slow big": n=4 V=2, rep2=3·2=6 → 6/12
    assert(out(2L) === ((2L, 4L, 2L, 0.5, Some(0.5))))
    assert(out(3L) === ((3L, 4L, 2L, 0.5, Some(0.5))))
    // docs 4/5: 30 distinct tokens
    assert(out(4L) === ((4L, 30L, 30L, 1.0, Some(0.0))))
    assert(out(5L) === ((5L, 30L, 30L, 1.0, Some(0.0))))
  }

  test("token_diversity equals the declarative explode/count formulation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val declarative = docs
      .select($"doc_id", explode(graft.functions.Text.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("dn"), count(lit(1)).as("dv"),
        sum($"c" * ($"c" - 1)).as("dr"))
    val native = docs
      .select($"doc_id", call_function("token_diversity", $"text").as("td"))
      .select($"doc_id", element_at($"td", 1).as("nn"),
        element_at($"td", 2).as("nv"), element_at($"td", 3).as("nr"))
    assert(native.join(declarative, Seq("doc_id"))
      .filter($"nn" =!= $"dn" || $"nv" =!= $"dv" || $"nr" =!= $"dr")
      .count() === 0L)
  }

  test("token_diversity stays inside whole-stage codegen") {
    val plan = Tables.documents(spark, fixtureDir)
      .select(call_function("token_diversity", $"text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [token_diversity"),
      s"token_diversity fell out of codegen:\n$plan")
  }

  test("q_bigram_lift: fixture corpus has no bigram above the support floor") {
    val out = LexicalStats.qBigramLift.run(spark, fixtureDir)
    assert(out.columns.toSeq === Seq("bg", "c_xy", "c_x", "c_y", "lift"))
    assert(out.count() === 0L)
  }

  test("q_bigram_lift on sf0.001: ranked, supported, exact integer ratios") {
    val rows = LexicalStats.qBigramLift.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.length === LexicalStats.LiftTopK)
    assert(rows.forall(_._2 >= LexicalStats.LiftMinSupport))
    // ranking is (lift desc, bigram asc)
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._5 > b._5 || (a._5 == b._5 && a._1 < b._1) })
    // lift is the qrounded exact ratio of its own count columns (N = 500)
    rows.foreach { case (_, cxy, cx, cy, lift) =>
      assert(lift ===
        math.floor((cxy * 500L).toDouble / (cx * cy) * 1e6 + 0.5) / 1e6)
    }
  }

  test("q_filter_funnel hand-computed cascade") {
    // fixture n_chars: 14,12,18,18,110,109 → rule1 (100..500) keeps only
    // docs 4,5; those 30-token all-distinct docs pass every later rule
    val out = LexicalStats.qFilterFunnel.run(spark, fixtureDir)
      .as[(Int, String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      (1, "chars_range", 6L, 4L, 2L, Some(0.666667)),
      (2, "min_tokens", 2L, 0L, 2L, Some(0.0)),
      (3, "dup_tokens", 2L, 0L, 2L, Some(0.0)),
      (4, "repetitive_2gram", 2L, 0L, 2L, Some(0.0))))
  }

  test("funnel stages are a partition: n_in = n_dropped + n_out, chained") {
    val rows = LexicalStats.qFilterFunnel.run(spark, "/root/testdata/sf0.001")
      .as[(Int, String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(rows.map(_._1) === Seq(1, 2, 3, 4))
    rows.foreach { r => assert(r._3 === r._4 + r._5, r) }
    rows.sliding(2).foreach { case Seq(a, b) => assert(a._5 === b._3) }
    // every rule must have both survivors and casualties on the sf corpus
    // (threshold tuning — see NOTES.md)
    assert(rows.head._3 === 500L)
    rows.foreach { r => assert(r._4 > 0L, r) }
  }

  test("unigram surprisal: hand-computed mean -ln p on the fixture corpus") {
    // cf: fast 3, slow 7, the 1, big 3, w1..w29 2 each, w30 1, zz 1; N = 74
    val N = 74.0
    def add(tf: Long, cf: Long): BigDecimal =
      BigDecimal.valueOf(tf * math.log(N / cf))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = LexicalStats.qUnigramSurprisal.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(0L, 1L, 2L, 3L, 4L, 5L))
    // doc0 "fast fast slow"; doc1 "fast the big"; doc2/3 "slow slow slow big"
    assert(got(0) === ((0L, 3L, qr((add(2, 3) + add(1, 7)).toDouble / 3))))
    assert(got(1) === ((1L, 3L, qr((add(1, 3) + add(1, 1) + add(1, 3)).toDouble / 3))))
    assert(got(2) === ((2L, 4L, qr((add(3, 7) + add(1, 3)).toDouble / 4))))
    assert(got(2)._3 === got(3)._3) // exact duplicates score identically
    // rare-token doc (w30) scores above its twin ending in... also rare zz:
    // both docs 4/5 have 29 cf=2 tokens + one cf=1 token -> equal scores
    assert(got(4)._3 === got(5)._3)
  }

  test("q_oov_rate hand-computed per-lang coverage") {
    // cf rank (desc, term asc): slow 7; big 3, fast 3; then 17 of the 29
    // cf=2 w-terms lexicographically: w1, w10..w19, w2, w20..w24 -> the
    // 20-term vocab. OOV tokens: "the" (en), w25..w29 + w3..w9 + zz ... per
    // doc 4: w25..w30 missing? vocab w-terms = {w1, w2, w10..w24}: doc4
    // in-vocab 17 of 30; doc5 likewise (zz OOV, w30 not in doc5).
    // en: 6 tokens, 1 oov ("the"); de: 8 tokens, 0 oov; fr: 60 tokens,
    // 2*(30-17) = 26 oov -> 26/60 = 0.433333 qround'd.
    val got = LexicalStats.qOovRate.run(spark, fixtureDir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("de", 8L, 0L, 0.0),
      ("en", 6L, 1L, 0.166667),
      ("fr", 60L, 26L, 0.433333)))
  }

  /** Decimal-cast-before-sum replica: each addend rounded to 9 dp HALF_UP
    * (Spark's double→DECIMAL(38,9) cast), summed exactly, then qround'd —
    * the independent plain-Scala path for the LM-ratio queries below. */
  private def decSum(addends: Seq[Double]): Double = {
    val s = addends.map(BigDecimal.valueOf(_)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    math.floor(s * 1e6 + 0.5) / 1e6
  }

  private def fixtureTf: Seq[(Long, String, String, Map[String, Long])] =
    SparkSpec.fixtureDocs.map { case (id, text, lang, src) =>
      (id, lang, src,
        text.toLowerCase.split("\\s+").toSeq.groupBy(identity)
          .map { case (t, g) => t -> g.size.toLong })
    }

  test("q_dsir_weights: independent plain-Scala LM-ratio replica + sign structure") {
    val tf = fixtureTf
    val cfc = tf.flatMap(_._4).groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
    val cft = tf.filter(_._2 == "en").flatMap(_._4)
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
    val v = cfc.size.toLong                     // 35 terms
    val nc = cfc.values.sum                     // 74 tokens
    val nt = tf.filter(_._2 == "en").flatMap(_._4.values).sum // 6
    assert((v, nc, nt) === ((35L, 74L, 6L)))
    def lr(t: String): Double =
      math.log((cft.getOrElse(t, 0L) + 1).toDouble / (nt + v)) -
        math.log((cfc(t) + 1).toDouble / (nc + v))
    val expect = tf.map { case (id, lang, _, m) =>
      (id, lang, m.values.sum,
        decSum(m.toSeq.map { case (t, c) => c.toDouble * lr(t) }))
    }.sortBy(_._1)
    val got = LexicalStats.qDsirWeights.run(spark, fixtureDir)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got === expect)
    // structure: target-language docs score positive (they ARE the target
    // sample), the French near-dup twins score equal and negative
    assert(got(0)._4 > 0 && got(1)._4 > 0)
    assert(got(4)._4 === got(5)._4)
    assert(got(4)._4 < 0)
  }

  test("q_kl_by_source: independent replica; KL non-negative; smoothed mass sums to 1") {
    val tf = fixtureTf
    val cfs = tf.flatMap { case (_, _, src, m) => m.map { case (t, c) => (src, t, c) } }
      .groupBy(x => (x._1, x._2)).map { case ((s, t), g) => (s, t) -> g.map(_._3).sum }
    val cfc = cfs.groupBy(_._1._2).map { case (t, g) => t -> g.map(_._2).sum }
    val v = cfc.size.toLong
    val nc = cfc.values.sum
    val srcs = tf.map(_._3).distinct.sorted
    val expect = srcs.map { s =>
      val ns = cfs.collect { case ((`s`, _), c) => c }.sum
      val contribs = cfc.toSeq.map { case (t, cc) =>
        val ps = (cfs.getOrElse((s, t), 0L) + 1).toDouble / (ns + v)
        val pc = (cc + 1).toDouble / (nc + v)
        ps * (math.log(ps) - math.log(pc))
      }
      // smoothed p_source sums to exactly 1 over the shared vocabulary
      assert(math.abs(cfc.keys.toSeq.map(t =>
        (cfs.getOrElse((s, t), 0L) + 1).toDouble / (ns + v)).sum - 1.0) < 1e-12)
      (s, ns, decSum(contribs))
    }
    val got = LexicalStats.qKlBySource.run(spark, fixtureDir)
      .as[(String, Long, Double)].collect().toSeq
    assert(got === expect)
    assert(got.forall(_._3 >= 0.0)) // Gibbs' inequality
  }

  test("q_token_entropy: hand-computed nats on the fixture corpus") {
    def h(counts: Long*): Double = {
      val n = counts.sum.toDouble
      decSum(counts.map { c => -(c / n) * math.log(c / n) })
    }
    val got = LexicalStats.qTokenEntropy.run(spark, fixtureDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 3L, 2L, h(2, 1)),            // fast fast slow
      (1L, 3L, 3L, h(1, 1, 1)),         // uniform -> ln 3
      (2L, 4L, 2L, h(3, 1)),
      (3L, 4L, 2L, h(3, 1)),
      (4L, 30L, 30L, h(Seq.fill(30)(1L): _*)), // uniform -> ln 30
      (5L, 30L, 30L, h(Seq.fill(30)(1L): _*))))
    // uniform docs hit the ln(V) ceiling; skewed docs sit strictly below
    assert(math.abs(got(1)._4 - math.floor(math.log(3) * 1e6 + 0.5) / 1e6) < 1e-9)
    assert(got(0)._4 < math.log(2) + 1e-9)
  }

  test("q_vocab_coverage hand-computed fixture rows") {
    // en: fast×3 slow×1 the×1 big×1 → n=6 V=4; cum 3,4,5,6 (ties term-asc:
    //     big, slow, the) → first cum ≥ 5.4 and ≥ 5.94 is rank 4
    // de: slow×6 big×2 → n=8 V=2; cum 6,8 → rank 2 for both thresholds
    // fr: w1..w29 ×2, w30×1, zz×1 → n=60 V=31; cum(k)=2k for k ≤ 29 →
    //     v90 = ⌈54/2⌉ = 27; cum(30)=59 < 59.4 → v99 = 31
    val got = LexicalStats.qVocabCoverage.run(spark, fixtureDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("de", 8L, 2L, 2L, 2L),
      ("en", 6L, 4L, 4L, 4L),
      ("fr", 60L, 31L, 27L, 31L)))
  }

  test("q_vocab_coverage laws at sf0.001: rank ordering and bounds") {
    val rows = LexicalStats.qVocabCoverage.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, v, v90, v99) =>
      assert(1L <= v90 && v90 <= v99 && v99 <= v)
      assert(v <= n)
    }
  }

  test("q_token_fertility hand-computed per-language ratios") {
    // en: docs 0/1 — 6 tokens, 26 ASCII chars (= 26 bytes); 26/6 qrounds
    //     to 4.333333 (floor at the 6th dp), tokens/doc = 3
    // de: docs 2/3 — 8 tokens, 36 chars → 4.5, 4 tokens/doc
    // fr: docs 4/5 — 60 tokens; chars 110 + 109 = 219 → 3.65, 30/doc
    val got = LexicalStats.qTokenFertility.run(spark, fixtureDir)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got === Seq(
      ("de", 2L, 8L, 36L, 36L, 4.5, 4.5, 4.0),
      ("en", 2L, 6L, 26L, 26L, 4.333333, 4.333333, 3.0),
      ("fr", 2L, 60L, 219L, 219L, 3.65, 3.65, 30.0)))
  }

  test("q_zipf_fit equals the plain-Scala dec12 OLS model; slope < 0") {
    def dec12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def qround(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def dsum(vs: Seq[Double]): Double = vs.map(dec12).sum.toDouble
    // fixture vocabulary: slow(7) > big(3) = fast(3) > w1..w29(2) >
    // the(1) = w30(1) = zz(1) — 35 terms, ranked (cf desc, term asc)
    val cf = SparkSpec.fixtureDocs
      .flatMap(_._2.toLowerCase.split("\\s+"))
      .groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    val ranked = cf.toSeq.sortBy { case (t, c) => (-c, t) }
    val xs = ranked.zipWithIndex.map { case (_, i) => math.log((i + 1).toDouble) }
    val ys = ranked.map { case (_, c) => math.log(c.toDouble) }
    val n = ranked.size.toDouble
    val sx = dsum(xs); val sy = dsum(ys)
    val sxy = dsum(xs.zip(ys).map { case (a, b) => a * b })
    val sxx = dsum(xs.map(a => a * a))
    val expSlope = qround((n * sxy - sx * sy) / (n * sxx - sx * sx))
    val expIcept = qround((sy * sxx - sx * sxy) / (n * sxx - sx * sx))
    val got = LexicalStats.qZipfFit.run(spark, fixtureDir)
      .as[(Long, Double, Double)].head()
    assert(got === ((35L, expSlope, expIcept)))
    assert(expSlope < 0.0)
  }

  test("q_heldout_xent equals a plain-Scala replica of split + add-1 LM + ln sums") {
    // the shared hand fixture has no doc_id hashing to the val bucket
    // (md5('split:0..5') % 10 ∈ {4,9,6,7,9,5}), so build one whose ids are
    // CHOSEN to land on both sides of the split: ids 0,2,3 → train,
    // ids 14,23 → val (verified against the same salted md5 the query uses)
    val docs = Seq(
      (0L, "fast fast slow big", "en"),
      (2L, "slow big fast", "en"),
      (3L, "the big big big", "en"),
      (14L, "fast slow unknownword", "en"),  // val: 2 seen terms + 1 OOV
      (23L, "big big fast the", "en"))       // val: all seen
    val dir = java.nio.file.Files.createTempDirectory("graft-xent").toString
    docs.map { case (id, t, l) => (id, t, l, "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    // independent model: same salted-md5 split, add-1 LM, decimal-summed
    // ln addends, qround outputs
    def u32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    def qround(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def bucket(id: Long): Long = u32(s"split:$id") % 10
    assert(docs.map(d => bucket(d._1)).toSet.subsetOf(Set(4L, 6L, 7L, 8L)))
    val train = docs.filter(d => bucket(d._1) <= 7)
      .flatMap(_._2.toLowerCase.split("\\s+", -1))
    val valT = docs.filter(d => bucket(d._1) == 8)
      .flatMap(_._2.toLowerCase.split("\\s+", -1))
    assert(train.nonEmpty && valT.nonEmpty)
    val ctf = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vtf = valT.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nTrain, vocab, nVal) = (train.size.toLong, ctf.size.toLong, valT.size.toLong)
    val denom = (nTrain + vocab + 1).toDouble
    val xsum = vtf.toSeq.map { case (t, f) =>
      BigDecimal(f.toDouble * math.log(denom / (ctf.getOrElse(t, 0L) + 1).toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val nOov = vtf.collect { case (t, f) if !ctf.contains(t) => f }.sum
    assert(nOov > 0L) // the planted "unknownword" keeps the OOV path live

    val got = LexicalStats.qHeldoutXent.run(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(("en", nTrain, vocab, nVal,
      qround(nOov * 1.0 / nVal), qround(xsum / nVal))))
  }

  test("q_heldout_xent laws at sf0.001: bounds and smoothing floor") {
    val rows = LexicalStats.qHeldoutXent.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nTrain, vocab, nVal, oov, xent) =>
      assert(nTrain > 0 && vocab > 0 && nVal > 0)
      assert(oov >= 0.0 && oov <= 1.0)
      // xent is at least the best-case -ln(max p) > 0 and at most ln of the
      // smoothing denominator (the unseen-term worst case)
      assert(xent > 0.0 && xent <= math.log((nTrain + vocab + 1).toDouble))
    }
  }

  test("cooccur pmi: median-df cap keeps the rare half, pairs score ln3") {
    // fixture dfs: slow 3, big 3, fast 2, w1..w29 2, the/w30/zz 1 over
    // N=6 docs; median df = 2 -> slow and big leave. Kept doc-term sets:
    // d0{fast}, d1{fast,the}, d4{w1..w30}, d5{w1..w29,zz}. Every pair's
    // n_ab*N/(df_a*df_b) collapses to exactly 3 (e.g. w-pairs: 2*6/4),
    // so pmi = qround(ln 3) = 1.098612 for ALL 465 pairs.
    val pairs = graft.operators.LexicalStats.cooccurScored(spark, fixtureDir)
      .as[(String, String, Long, Double)].collect().toSeq
    // (fast,the) + C(29,2) w-pairs + 29 (w,w30) + 29 (w,zz) = 465
    assert(pairs.size === 465)
    assert(pairs.forall(_._4 === 1.098612))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair(("w1", "w2")) === 2L)   // co-occur in d4 AND d5
    assert(byPair(("w1", "w30")) === 1L)  // d4 only
    assert(byPair(("w1", "zz")) === 1L)   // d5 only
    assert(byPair(("fast", "the")) === 1L)
    assert(!byPair.keySet.exists(p => p._1 == "slow" || p._2 == "slow"))
    // the support floor then empties the fixture (max n_ab = 2 < 5) --
    // the verified query's nonempty path is pinned by the sf oracles
    assert(graft.operators.LexicalStats.qCooccurPmi
      .run(spark, fixtureDir).count() === 0L)
  }

  test("heaps fit: first-occurrence reduction reproduces the growth curve") {
    // doc_id deciles of 0..5 are [0.5, 1, 1.5, 2, 2.5, 3, 3.5, 4, 4.5, 5];
    // vocabulary first-occurrences: d0 brings {fast,slow}, d1 {the,big},
    // d2/d3 nothing new, d4 {w1..w30}, d5 {zz}
    val rows = graft.operators.LexicalStats.qHeapsFit.run(spark, fixtureDir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._3)) === Seq(
      (1L, 1L, 2L), (2L, 2L, 4L), (3L, 2L, 4L), (4L, 3L, 4L), (5L, 3L, 4L),
      (6L, 4L, 4L), (7L, 4L, 4L), (8L, 5L, 34L), (9L, 5L, 34L),
      (10L, 6L, 35L)))
    // one global fit rides on every row; growth is positive
    assert(rows.map(_._4).distinct.size === 1)
    assert(rows.map(_._5).distinct.size === 1)
    assert(rows.head._4 > 0.0)
  }

  test("kneser-ney: planted split reproduces the hand-computed model") {
    // ids 0,2,3 hash to train buckets, 14,23,45 to the val bucket (the
    // q_heldout_xent fixture discipline). Train bigrams: (a,b) x2, (a,c);
    // so c(a)=3, N1+(a.)=2, Pcont(b)=Pcont(c)=1/2, T=2.
    //   val "a b": p = (max(2-.75,0) + .75*2*(1/2)) / 3 = 2/3
    //   val "c c": context c unseen -> pure continuation p = 1/2 (backoff)
    //   val "b d": d never continues a train bigram -> OOV, excluded
    val docs = Seq(
      (0L, "a b"), (2L, "a b"), (3L, "a c"),
      (14L, "a b"), (23L, "c c"), (45L, "b d"))
    val dir = java.nio.file.Files.createTempDirectory("graft-kn").toString
    docs.map { case (id, t) => (id, t, "en", "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    def dec9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def qround(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val p1 = (math.max(2 - 0.75, 0.0) + 0.75 * 2 * (1.0 / 2)) / 3
    val p2 = 1.0 / 2
    val xsum = (dec9(1.0 * -math.log(p1)) + dec9(1.0 * -math.log(p2))).toDouble
    val got = LexicalStats.qKneserNey.run(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq((3L, 2L, 3L, 1L, 0.5, qround(xsum / 2))))
    assert(qround(xsum / 2) === 0.549306)
  }

  test("kn doc surprisal: per-doc scores hand-computed under the planted model") {
    // same planted split as the kneser-ney fixture — train docs 0,2,3 give
    // bc (a,b)=2, (a,c)=1; ctx a: c1=3, N1+=2; cont b=1, c=1; T=2. Every
    // doc carries exactly one bigram:
    //   "a b": p = (max(2-.75,0) + .75*2*(1/2)) / 3 = 2/3 -> -ln = 0.405465
    //   "a c": p = (max(1-.75,0) + .75*2*(1/2)) / 3 = 1/3 -> ln 3 = 1.098612
    //   "c c": context c unseen -> pure continuation p = 1/2 -> ln 2 = 0.693147
    //   "b d": d never continues a train bigram -> OOV, null score
    // train docs score IN-SAMPLE under the same model the val docs score
    // held-out under — the CCNet whole-corpus ranking semantics
    val docs = Seq(
      (0L, "a b"), (2L, "a b"), (3L, "a c"),
      (14L, "a b"), (23L, "c c"), (45L, "b d"))
    val dir = java.nio.file.Files.createTempDirectory("graft-kndoc").toString
    docs.map { case (id, t) => (id, t, "en", "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = LexicalStats.qKnDocSurprisal.run(spark, dir)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq(
      (0L, 1L, 0L, Some(0.405465)),
      (2L, 1L, 0L, Some(0.405465)),
      (3L, 1L, 0L, Some(1.098612)),
      (14L, 1L, 0L, Some(0.405465)),
      (23L, 1L, 0L, Some(0.693147)),
      (45L, 1L, 1L, None)))
  }

  test("q_hill_tail: fixture replica; k beyond the vocabulary drops") {
    // fixture cfs: slow 7; big 3, fast 3; w1..w29 2 each; the/w30/zz 1.
    // 34 distinct terms, so k=50 has no (k+1)-th order statistic.
    def d12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def alpha(cfs: Seq[Long], k: Int): Double = {
      val slncf = cfs.take(k).map(c => d12(math.log(c.toDouble))).sum.toDouble
      qr(k / (slncf - k * math.log(cfs(k).toDouble)))
    }
    val cfs = Seq(7L, 3L, 3L) ++ Seq.fill(29)(2L) ++ Seq(1L, 1L, 1L)
    val got = LexicalStats.qHillTail.run(spark, fixtureDir)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq(
      (10L, 2L, Some(alpha(cfs, 10))),
      (25L, 2L, Some(alpha(cfs, 25)))))
  }

  test("q_chao1: hand-computed spectrum on the fixture") {
    // cfs: slow 7; big/fast 3; w1..w29 2 each; the/w30/zz singletons.
    // V=35, N=74, f1=3, f2=29; chao1 = 35 + 9/58; GT = 1 - 3/74.
    val got = LexicalStats.qChao1.run(spark, fixtureDir)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(got === ((35L, 74L, 3L, 29L, 35.155172, 0.959459)))
  }

  test("q_chao1: f2 = 0 falls back to the bias-corrected form") {
    // every token distinct -> V = f1, f2 = 0: chao1 = V + f1(f1-1)/2
    val dir = java.nio.file.Files.createTempDirectory("graft-chao").toString
    Seq((0L, "a b c", "en", "s"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = LexicalStats.qChao1.run(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(got === ((3L, 3L, 3L, 0L, 6.0, 0.0)))
  }

  test("q_hill_tail at sf0.001: positive tail index; k=50 drops (31-term vocab)") {
    val got = LexicalStats.qHillTail.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.map(_._1) === Seq(10L, 25L))
    assert(got.forall(_._3.exists(_ > 0.0)))
  }

  test("q_scaling_law: the full-prefix rung IS q_heldout_xent verbatim") {
    val dir = "/root/testdata/sf0.001"
    // k = 8 trains on all eight train buckets — the same model and the
    // same val bucket as q_heldout_xent, so the rung must match bit-exact
    val rung = LexicalStats.qScalingLaw.run(spark, dir)
      .filter($"frac_eighths" === 8)
      .select($"lang", $"n_train_tokens", $"vocab", $"n_val_tokens",
        $"oov_rate", $"xent_nats")
      .collect().toSeq.map(_.toSeq)
    val held = LexicalStats.qHeldoutXent.run(spark, dir)
      .collect().toSeq.map(_.toSeq)
    assert(rung === held && held.nonEmpty)
    // ladder shape: every lang has the 4 rungs with weakly growing mass
    val ladder = LexicalStats.qScalingLaw.run(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Double,
        Option[Double], Option[Double])].collect().toSeq
    ladder.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted === Seq(1L, 2L, 4L, 8L))
      val mass = rows.sortBy(_._2).map(_._3)
      assert(mass === mass.sorted)
    }
  }

  test("q_mix_rebalance: weights close the DoReMi loop on emitted columns") {
    import spark.implicits._
    // xent/excess columns decode as Options: a val-less source (sf0.001
    // has one) carries NULL xents with a prior-only weight
    val rows = graft.operators.LexicalStats.qMixRebalance
      .run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Double)]
      .collect().toSeq
    assert(rows.nonEmpty)
    // a proper distribution over ALL sources (val-less ones included)
    assert(math.abs(rows.map(_._7).sum - 1.0) <= rows.size * 2e-6)
    assert(rows.forall(_._7 > 0))
    // excess = qround(global - self), and the weight is exactly the
    // exponentiated-excess update on the token-share prior (closed loop
    // from the emitted columns alone); a NULL-excess row is prior-only
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val nG = rows.map(_._2).sum.toDouble
    val wRaw = rows.map(r => (r._2 / nG) * math.exp(r._6.getOrElse(0.0)))
    val z = wRaw.map(BigDecimal(_).setScale(9, BigDecimal.RoundingMode.DOWN))
      .sum.toDouble
    for ((r, w) <- rows.zip(wRaw)) {
      for (e <- r._6)
        assert(e === q6(r._4.get - r._5.get), s"excess mismatch for ${r._1}")
      assert(r._6.isEmpty === (r._3 === 0L),
        s"NULL excess must coincide with an empty val split: ${r._1}")
      assert(math.abs(r._7 - q6(w / z)) <= 1e-6, s"weight loop ${r._1}")
    }
    // non-vacuity: the sources genuinely differ in excess loss
    assert(rows.flatMap(_._6).distinct.size > 1)
    assert(rows.exists(_._6.exists(_ > 0)),
      "no source underserved by the pool LM")
  }

  test("q_stopword_discovery: flat ubiquitous term passes, planted bursty term fails") {
    import spark.implicits._
    // 4 equal-mass sources x 5 docs x 100 tokens. 'the' appears once per
    // doc everywhere (perfectly flat: chi2 = 0); 'promo' appears in every
    // doc (df_rate 1) but 60x per s1 doc vs 1x elsewhere -- ubiquitous
    // yet topically bursty, the case the chi2 leg exists to reject
    val dir = java.nio.file.Files.createTempDirectory("graft-stop").toString
    val docs = for (s <- 1 to 4; d <- 0 until 5) yield {
      val id = (s - 1) * 5 + d
      val promo = if (s == 1) 60 else 1
      val fill = 100 - 1 - promo
      val text = ("the" +: Seq.fill(promo)("promo")) ++
        (1 to fill).map(i => s"f${id}x$i")
      (id.toLong, text.mkString(" "), "en", s"s$s")
    }
    docs.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.LexicalStats.qStopwordDiscovery
      .run(spark, dir)
      .select($"term", $"df_rate", $"chi2_source", $"is_flat")
      .as[(String, Double, Double, Boolean)].collect().toSeq
    val byTerm = out.map(r => r._1 -> r).toMap
    // both ubiquitous terms make the candidate list with df_rate 1
    assert(byTerm("the")._2 === 1.0 && byTerm("promo")._2 === 1.0)
    // flatness verdict: 'the' is a stopword candidate, 'promo' is not
    assert(byTerm("the")._3 === 0.0 && byTerm("the")._4)
    assert(byTerm("promo")._3 >
      graft.operators.LexicalStats.StopChi2Crit && !byTerm("promo")._4)

    // real corpus: ordering contract + candidate list is full
    val real = graft.operators.LexicalStats.qStopwordDiscovery
      .run(spark, "/root/testdata/sf0.001")
      .select($"df_rate").as[Double].collect().toSeq
    assert(real.size === graft.operators.LexicalStats.StopTopK)
    assert(real.sliding(2).forall { case Seq(a, b) => a >= b })
  }

  test("q_lm_order_sweep: unigram column IS q_heldout_xent; planted sequential corpus flips the delta") {
    import spark.implicits._
    // structural cross-check: the sweep's unigram model and formula are
    // q_heldout_xent verbatim
    val sweep = graft.operators.LexicalStats.qLmOrderSweep
      .run(spark, "/root/testdata/sf0.001")
      .select($"lang", $"xent_uni").as[(String, Double)].collect().toMap
    val held = graft.operators.LexicalStats.qHeldoutXent
      .run(spark, "/root/testdata/sf0.001")
      .select($"lang", $"xent_nats").as[(String, Double)].collect().toMap
    assert(sweep === held)

    // this synthetic corpus is near-unigram: one token of context cannot
    // help (delta <= 0 everywhere) -- the honest readout
    val deltas = graft.operators.LexicalStats.qLmOrderSweep
      .run(spark, "/root/testdata/sf0.001")
      .select($"delta_nats").as[Double].collect()
    assert(deltas.forall(_ <= 0.0))

    // planted SEQUENTIAL corpus ("a b a b ...") -- bigram context is
    // nearly deterministic, so the sweep must flip strongly positive
    val dir = java.nio.file.Files.createTempDirectory("graft-lm2").toString
    val text = Seq.fill(20)("a b").mkString(" ")
    (0 until 60).map(i => (i.toLong, text, "en", "s0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val planted = graft.operators.LexicalStats.qLmOrderSweep
      .run(spark, dir)
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(planted.size === 1 && planted.head._2 > 0,
      "val split empty on the planted ids -- repick doc ids")
    assert(planted.head._6 > 0.3,
      s"context did not help on a deterministic sequence: ${planted.head}")
  }

  // split buckets for fixture doc ids — the same u32(md5('split:'||id))%10
  // derivation the split queries use (duplicated here as the test's
  // independent arithmetic; a drift fails the bucket-membership guards)
  private lazy val splitBucket: Map[Long, Long] = {
    import spark.implicits._
    spark.range(0, 400)
      .selectExpr("id", "cast(conv(substr(md5(concat('split:', " +
        "cast(id as string))), 1, 8), 16, 10) as bigint) % 10 as b")
      .as[(Long, Long)].collect().toMap
  }
  private lazy val trainIds: Seq[Long] =
    (0L until 400L).filter(i => splitBucket(i) <= 7)
  private lazy val valIds: Seq[Long] =
    (0L until 400L).filter(i => splitBucket(i) == 8)

  test("q_lm_order_sweep: bigram-less language keeps its unigram row with NULL bigram columns") {
    import spark.implicits._
    // lang xx: every doc single-token -> its val split has tokens but NO
    // bigrams. The inner join used to drop the language entirely
    // (round-15 advice); now the unigram readout survives with NULL
    // xent_bi/delta_nats and n_val_bigrams = 0.
    assert(trainIds.size >= 6 && valIds.size >= 4, "repick fixture range")
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-solo").toString
    val docs =
      (trainIds.take(3) ++ valIds.take(2)).map(id => (id, "solo", "xx")) ++
      (trainIds.slice(3, 6) ++ valIds.slice(2, 4))
        .map(id => (id, "alpha beta gamma alpha beta", "en"))
    docs.map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.LexicalStats.qLmOrderSweep.run(spark, dir)
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().toSeq
    val xx = out.find(_._1 == "xx").getOrElse(
      fail("bigram-less language dropped from the readout"))
    assert(xx._2 > 0 && xx._3 === 0L && xx._4 > 0.0)
    assert(xx._5.isEmpty && xx._6.isEmpty && xx._7.isEmpty)
    // the normal language is untouched by the left-join restructure
    val en = out.find(_._1 == "en").get
    assert(en._3 > 0 && en._5.nonEmpty && en._6.nonEmpty)
  }

  test("q_paragraph_ppl: planted boilerplate paragraph dropped, clean paragraph kept") {
    import spark.implicits._
    val P = graft.operators.LexicalStats.ParaTokens
    // 30 background docs of one common paragraph (the LM's in-domain
    // text); doc 0 = that same clean paragraph followed by a gibberish
    // paragraph of corpus-unique tokens (maximal surprisal) — the intra-
    // document case a whole-document gate cannot fix
    val clean = (1 to P).map(i => s"w${i % 7}").mkString(" ")
    val junk = (1 to P).map(i => s"zq${i}xgl").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-para").toString
    val docs = (0L, s"$clean $junk", "en", "s0") +:
      (1 to 30).map(i => (i.toLong, clean, "en", "s0"))
    docs.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.LexicalStats.qParagraphPpl.run(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    val d0 = out.find(_._1 == 0L).get
    assert(d0._2 === 2L && d0._3 === 1L, s"doc 0 row: $d0")
    assert(d0._4 === 2L * P && d0._5 === P.toLong && d0._6 === 0.5)
    // the background docs keep their single clean paragraph whole
    assert(out.filter(_._1 > 0L).forall(r =>
      r._2 === 1L && r._3 === 1L && r._6 === 1.0))

    // real corpus: every doc present; gate non-vacuous but tercile-bounded
    val dirR = "/root/testdata/sf0.001"
    val real = graft.operators.LexicalStats.qParagraphPpl.run(spark, dirR)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(real.size.toLong === Tables.documents(spark, dirR).count())
    assert(real.forall(r => r._3 <= r._2 && r._5 <= r._4))
    assert(real.exists(_._6 < 1.0), "paragraph gate vacuous at sf0.001")
    // head+middle kept => at least ~60% of paragraphs survive corpus-wide
    val (kept, total) = (real.map(_._3).sum, real.map(_._2).sum)
    assert(kept * 10 >= total * 6, s"kept $kept of $total paragraphs")
  }

  test("q_paragraph_ppl: real newline boundaries win over fixed windows; blank lines emit nothing") {
    import spark.implicits._
    // two REAL paragraphs of 12 tokens each, separated by a BLANK line
    // (newline split → segs [clean, '', junk]); both are shorter than
    // ParaTokens, so the fixed-window fallback would have fused them
    // into ONE 24-token window — n_paras === 2 pins that the newline
    // boundary, not the window arithmetic, cut this document
    val clean = (1 to 12).map(i => s"w${i % 5}").mkString(" ")
    val junk = (1 to 12).map(i => s"zq${i}xgl").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-para-nl").toString
    val docs = (0L, s"$clean\n\n$junk", "en", "s0") +:
      (1 to 30).map(i => (i.toLong, clean, "en", "s0"))
    docs.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.LexicalStats.qParagraphPpl.run(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    val d0 = out.find(_._1 == 0L).get
    // doc 0: clean paragraph scores exactly like the 30 background docs
    // (identical text → identical LM mean), junk is corpus-unique →
    // tail tercile → dropped; the blank middle segment emits no row
    assert(d0._2 === 2L && d0._3 === 1L, s"doc 0 row: $d0")
    assert(d0._4 === 24L && d0._5 === 12L && d0._6 === 0.5)
    assert(out.filter(_._1 > 0L).forall(r =>
      r._2 === 1L && r._3 === 1L && r._6 === 1.0))
  }

  test("q_mix_rebalance: val-less source keeps a prior-only row (full mixture coverage)") {
    import spark.implicits._
    // source sv: every doc lands in a train bucket -> zero val tokens.
    // The vtf>0 filter used to drop it and renormalize the remaining
    // weights over a subset (round-15 advice); now it degrades to NULL
    // xents/excess with a prior-only weight inside the normalizer.
    val dir = java.nio.file.Files.createTempDirectory("graft-mix-novl").toString
    val docs =
      trainIds.take(4).map(id => (id, "alpha beta alpha", "sv")) ++
      (trainIds.slice(4, 8) ++ valIds.take(3))
        .map(id => (id, "alpha beta gamma delta", "sn"))
    docs.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.LexicalStats.qMixRebalance.run(spark, dir)
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Double)].collect().toSeq
    assert(out.map(_._1).sorted === Seq("sn", "sv"))
    val sv = out.find(_._1 == "sv").get
    assert(sv._2 > 0 && sv._3 === 0L)
    assert(sv._4.isEmpty && sv._5.isEmpty && sv._6.isEmpty)
    assert(sv._7 > 0.0, "val-less source got no weight")
    // still a proper distribution over ALL sources
    assert(math.abs(out.map(_._7).sum - 1.0) <= out.size * 2e-6)
    val sn = out.find(_._1 == "sn").get
    assert(sn._4.nonEmpty && sn._5.nonEmpty)
  }
}
