package graft

import graft.operators.PipelineOps

/** Training-data pipeline operators on the fixture corpus
  * (en: docs 0,1 · de: docs 2,3 · fr: docs 4,5). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample keeps exactly the docs whose hash clears the rate") {
    // hand-computed u32(md5(doc_id)) / 2^32 per doc:
    //   0→0.8117  1→0.7687  2→0.7817  3→0.9250  4→0.6582  5→0.8940
    // vs rates en 0.75, de 0.50, fr 0.25 → every fixture doc is excluded
    val out = PipelineOps.qStratifiedSample.run(spark, fixtureDir)
      .select($"doc_id").as[Long].collect().toSeq
    assert(out.isEmpty)
    // deterministic: a second run produces the identical (empty) set
    val again = PipelineOps.qStratifiedSample.run(spark, fixtureDir)
      .select($"doc_id").as[Long].collect().toSeq
    assert(again === out)
  }

  test("sequence packing: per-lang cumulative offsets into 512-token windows") {
    val rows = PipelineOps.qPackSequences.run(spark, fixtureDir)
      .select($"doc_id", $"n_tokens", $"pack_id", $"pack_offset")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows === Map(
      0L -> ((3L, 0L, 0L)),  1L -> ((3L, 0L, 3L)),   // en
      2L -> ((4L, 0L, 0L)),  3L -> ((4L, 0L, 4L)),   // de
      4L -> ((30L, 0L, 0L)), 5L -> ((30L, 0L, 30L)))) // fr
  }

  test("normalize_text lowers, strips punctuation, collapses whitespace") {
    val out = PipelineOps.qNormalizeText.run(spark, fixtureDir)
      .select($"norm_text").as[String].collect()
    assert(out.forall(t => t == t.toLowerCase))
    assert(out.forall(t => !t.contains("  ") && t.trim == t))
    assert(out.forall(_.matches("[a-z0-9 ]*")))
  }

  test("corpus prep composes dedup-keeper, quality filter, and sample") {
    val out = PipelineOps.qCorpusPrep.run(spark, fixtureDir)
      .select($"doc_id").as[Long].collect().toSeq
    // fixture: doc 3 is an exact dup of doc 2 (dropped by the keeper rule);
    // the remaining docs are all excluded by the sample thresholds
    // (u32 fractions .81/.77/.78/.66/.89 vs rates en .75/de .5/fr .25),
    // so the composition ends empty — every stage exercised, zero survivors
    assert(out.isEmpty)
    // loosening the sample away (threshold 2^32) must bring back exactly the
    // keepers that clear the quality bar — sanity-check the upstream stages
    val keepers = Tables.documents(spark, fixtureDir)
      .groupBy(org.apache.spark.sql.functions.md5($"text"))
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    assert(keepers === Set(0L, 1L, 2L, 4L, 5L))  // 3 deduped away
  }

  test("top-quality-per-lang returns at most k per stratum, rank-ordered") {
    val rows = PipelineOps.qTopQualityPerLang.run(spark, fixtureDir)
      .select($"lang", $"quality", $"rk").as[(String, Double, Long)].collect()
    val byLang = rows.groupBy(_._1)
    assert(byLang.keySet === Set("en", "de", "fr"))
    byLang.values.foreach { g =>
      assert(g.length <= PipelineOps.TopPerLang)
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3) === (1L to g.length).toSeq)
      // quality non-increasing down the ranks
      val qs = sorted.map(_._2)
      assert(qs.zip(qs.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  test("shuffle order is a deterministic permutation keyed by the seed") {
    val order1 = PipelineOps.qShuffleOrder.run(spark, fixtureDir)
      .select($"doc_id").as[Long].collect().toSeq
    val order2 = PipelineOps.qShuffleOrder.run(spark, fixtureDir)
      .select($"doc_id").as[Long].collect().toSeq
    assert(order1 === order2)
    assert(order1.sorted === Seq(0L, 1L, 2L, 3L, 4L, 5L))
    assert(order1 !== order1.sorted)  // md5 order differs from key order
  }

  test("rank windows: two-doc languages rank to {0,1} and cume {0.5,1}") {
    val rows = PipelineOps.qRankWindows.run(spark, fixtureDir)
      .select($"lang", $"pct_rank", $"cume")
      .as[(String, Double, Double)].collect().toSeq
    assert(rows.size === 6)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._2).sorted === Seq(0.0, 1.0), lang)
      assert(rs.map(_._3).sorted === Seq(0.5, 1.0), lang)
    }
  }

  test("jsonl export renders the exact compact to_json line") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest("fast fast slow".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = PipelineOps.qJsonlExport.run(spark, fixtureDir)
      .as[(Long, String)].collect().toSeq
    assert(got.size === SparkSpec.fixtureDocs.size)
    assert(got.head === ((0L,
      s"""{"doc_id":0,"lang":"en","source":"srcA","n_chars":14,"content_md5":"$h"}""")))
  }

  test("assign_ids: dense 0-based gids in doc_id order, corpus window stays partitioned") {
    val q = PipelineOps.qAssignIds.run(spark, fixtureDir)
    val got = q.as[(Long, Long)].collect().toSeq
    assert(got === SparkSpec.fixtureDocs.map(_._1).sorted.zipWithIndex
      .map { case (id, i) => (id, i.toLong) })
    // the corpus-sized row_number window must be scoped by the range
    // partition id — only the 32-row offsets histogram may run global
    val windows = q.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Window ")).toSeq
    val corpusWindow = windows.filter(_.contains("row_number()"))
    assert(corpusWindow.nonEmpty &&
      corpusWindow.forall(_.replaceAll("#\\d+[L]?", "").contains("[pid]")),
      windows.mkString("\n"))
  }

  test("q_epoch_plan equals an independent plain-Scala model of the math") {
    // replicate the whole chain — decimal(38,12) sqrt sum, qround weight,
    // allocation floor, ratio quotient, salted-md5 Bernoulli — outside Spark
    def u32(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    def qround(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val docs = SparkSpec.fixtureDocs
      .map { case (id, text, lang, _) => (id, lang, text.split("\\s+").length.toLong) }
    val nTok = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val totSqrt = nTok.values.toSeq.sorted
      .map(n => BigDecimal(math.sqrt(n.toDouble))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val r = nTok.map { case (l, n) =>
      l -> math.floor(qround(math.sqrt(n.toDouble) / totSqrt) * 1000000.0) / n }
    val expected = docs.map { case (id, lang, nt) =>
      val rr = r(lang)
      val extra = if (u32(s"epoch:$id") <
        math.floor((rr - math.floor(rr)) * 4294967296.0)) 1L else 0L
      (id, lang, nt, math.floor(rr).toLong + extra)
    }
    val got = PipelineOps.qEpochPlan.run(spark, fixtureDir)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === expected)
    // per-language Bernoulli rounding: copy counts differ by at most 1
    got.groupBy(_._2).values.foreach { rows =>
      val cs = rows.map(_._4)
      assert(cs.max - cs.min <= 1)
    }
  }

  test("pareto front equals the brute-force per-language skyline") {
    // ground truth from the shared quality surface + an O(n²) dominance scan
    val docs = graft.operators.TextAnalytics.qQualityScore.run(spark, fixtureDir)
      .select($"doc_id", $"n_tokens", $"quality")
      .as[(Long, Long, Double)].collect().toSeq
    val langOf = SparkSpec.fixtureDocs.map(d => d._1 -> d._3).toMap
    val rows = docs.map { case (id, nt, q) => (id, langOf(id), nt, q) }
    val expected = rows.filter { case (id, l, nt, q) =>
      !rows.exists { case (oid, ol, ont, oq) =>
        oid != id && ol == l && ont <= nt && oq >= q && (ont < nt || oq > q)
      }
    }.sortBy(r => (r._2, r._3, r._1))
    val got = PipelineOps.qParetoFront.run(spark, fixtureDir)
      .as[(Long, String, Long, Double)].collect().toSeq
      .map(r => (r._1, r._2, r._3, r._4))
    assert(got === expected)
    // the de twins tie on both dimensions: neither dominates, both survive
    assert(got.count(_._2 == "de") === 2)
  }

  test("length buckets: hand-computed pow-2 padding waste") {
    // fixture token counts: 3,3,4,4 -> bucket 16 (sum 14, padded 64);
    // 30,30 -> bucket 32 (sum 60, padded 64)
    val got = PipelineOps.qLengthBuckets.run(spark, fixtureDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (16L, 4L, 14L, 64L, 0.78125),
      (32L, 2L, 60L, 64L, 0.0625)))
  }

  test("q_token_budget: hand-computed Hamilton allocation on the fixture") {
    // token counts: en 3+3=6, de 4+4=8, fr 30+30=60; N=74, T=1,000,000
    //   base = T·n div N:  en 81081 (rem 6), de 108108 (rem 8), fr 810810 (rem 60)
    //   Σbase = 999,999 → leftover 1, largest remainder is fr → fr +1
    val got = PipelineOps.qTokenBudget.run(spark, fixtureDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("de", 8L, 108108L, 108108L),
      ("en", 6L, 81081L, 81081L),
      ("fr", 60L, 810810L, 810811L)))
  }

  test("q_budget_sample: maximal hash-order prefix within each language's alloc") {
    def u32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val alloc = PipelineOps.qTokenBudget.run(spark, fixtureDir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    val expected = SparkSpec.fixtureDocs
      .map { case (id, text, lang, _) =>
        (lang, id, text.toLowerCase.split("\\s+", -1).length.toLong,
          u32(s"budget:$id")) }
      .groupBy(_._1)
      .flatMap { case (lang, ds) =>
        val ordered = ds.sortBy(d => (d._4, d._2))
        val cums = ordered.scanLeft(0L)(_ + _._3).tail
        ordered.zip(cums).takeWhile(_._2 <= alloc(lang))
          .map { case (d, c) => (lang, d._2, d._3, c) }
      }.toSet
    val got = PipelineOps.qBudgetSample.run(spark, fixtureDir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // fixture allocs (en 81081, de 108108, fr 810811) exceed every
    // language's total tokens, so the sample must be the whole corpus
    assert(got.size === 6)
  }

  test("q_token_budget laws at sf0.001: sums to T, within 1 of every ideal share") {
    val rows = PipelineOps.qTokenBudget.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect().toSeq
    val n = rows.map(_._2).sum
    assert(rows.map(_._4).sum === PipelineOps.TokenBudgetT)
    rows.foreach { case (_, nt, _, alloc) =>
      val ideal = PipelineOps.TokenBudgetT.toDouble * nt / n
      assert(math.abs(alloc - ideal) < 1.0, s"alloc $alloc vs ideal $ideal")
    }
  }

  test("readability: every fixture token is one vowel group or vowel-less " +
      "-> all-monosyllable census, FORCAST floor grade 5") {
    // en: fast/the/big/slow all single vowel-group; fr: w1..w30/zz have no
    // vowels (clamped to 1 syllable); de likewise -> mono_frac 1 everywhere
    val rows = graft.operators.TextAnalytics.qReadability
      .run(spark, fixtureDir)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows === Seq(
      ("de", 2L, 8L, 1.0, 1.0, 5.0),
      ("en", 2L, 6L, 1.0, 1.0, 5.0),
      ("fr", 2L, 60L, 1.0, 1.0, 5.0)))
  }

  test("readability at sf0.001: multi-syllable vocabulary discriminates") {
    val rows = graft.operators.TextAnalytics.qReadability
      .run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, nd, nw, spw, mf, g) =>
      assert(nd > 0 && nw > 0)
      assert(spw >= 1.0)           // >= one syllable per word by clamp
      assert(mf > 0.0 && mf < 1.0) // real corpus mixes mono/poly words
      // g is rounded from the RAW quotient; mf from the same quotient —
      // compare within the 6-dp rounding slack
      assert(math.abs(g - (20.0 - 15.0 * mf)) < 2e-5)
    }
  }

  test("feature hash: pigeonhole collisions and mass accounting hold") {
    val r = operators.PipelineOps.qFeatureHash.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    val (b, vocab, used, maxK, collided, massRate) = r
    assert(b === operators.PipelineOps.HashBuckets.toLong)
    assert(used <= b && used > 0)
    // pigeonhole: with vocab > b, at least vocab - b terms MUST collide
    assert(vocab > b)
    assert(collided >= vocab - b)
    assert(maxK >= (vocab + b - 1) / b) // ceil(vocab/b) lower-bounds the max
    assert(massRate > 0.0 && massRate <= 1.0)
  }

  test("q_skipgram_pairs: pure windowing on an all-rare corpus; subsampling bites on real data") {
    import spark.implicits._
    // 1,200 DISTINCT words in one document: every f = 1/1200 < t = 0.001
    // gives p >= 1, so NOTHING is subsampled and the pair counts are pure
    // window math -- interior words sit in exactly 4 pairs (2 as center-
    // left, 2 as center-right), the first word in 2, the second in 3
    val dir = java.nio.file.Files.createTempDirectory("graft-sg").toString
    val words = (1 to 1200).map(i => f"w$i%04d")
    Seq((0L, words.mkString(" "), "en", "src",
        words.mkString(" ").length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.PipelineOps.qSkipgramPairs.run(spark, dir)
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(out.size === graft.operators.PipelineOps.SgTopK)
    // top-100 by (n_pairs desc, word): the alphabetically first interior
    // words, each with exactly 4 pairs, fully kept
    assert(out.map(_._1) === (3 to 102).map(i => f"w$i%04d"))
    assert(out.forall(r => r._2 === 1L && r._3 === 1L && r._4 === 1.0
      && r._5 === 4L))

    // real data: frequency subsampling genuinely drops occurrences
    val real = graft.operators.PipelineOps.qSkipgramPairs
      .run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    assert(real.nonEmpty)
    assert(real.exists(_._4 < 1.0), "subsampling vacuous: every word kept")
    assert(real.forall(r => r._3 <= r._2))
  }

  test("q_preference_pairs: hand-traced picks + tie-breaks; both gate values on real data") {
    import spark.implicits._
    // one stratum with a quality TIE at the top (docs 10 and 11 are
    // verbatim copies -> identical quality; chosen-tie must go to doc_id
    // 10), one singleton stratum (must produce NO pair row), and one
    // DEGENERATE stratum (docs 30/31 verbatim copies, nothing else):
    // opposed tie-breaks must emit chosen 30 != rejected 31 with margin 0
    // (never a doc paired with itself), gated out by kept=false
    val hi = "colorless green ideas sleep furiously in the long " +
      "quiet improbable afternoon " + (1 to 40).map(i => s"tok$i").mkString(" ")
    val lo = "the the the the"
    val dir = java.nio.file.Files.createTempDirectory("graft-pref").toString
    Seq(
      (10L, hi, "en", "s1"), (11L, hi, "en", "s1"), (12L, lo, "en", "s1"),
      (20L, lo, "de", "s2"),
      (30L, hi, "fr", "s3"), (31L, hi, "fr", "s3"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = PipelineOps.qPreferencePairs.run(spark, dir)
      .select($"lang", $"source", $"n_docs", $"chosen_id", $"rejected_id",
        $"kept")
      .as[(String, String, Long, Long, Long, Boolean)].collect().toSeq
    // singleton stratum (de, s2) forms no pair; the tie broke to doc 10;
    // the degenerate stratum pairs 30 vs 31, not 30 vs 30
    assert(out === Seq(("en", "s1", 3L, 10L, 12L, true),
      ("fr", "s3", 2L, 30L, 31L, false)))

    // real data: both kept values occur, singletons are excluded, and
    // every chosen strictly out-scores its rejected on kept rows
    val real = PipelineOps.qPreferencePairs.run(spark, "/root/testdata/sf0.001")
      .select($"n_docs", $"chosen_q", $"rejected_q", $"margin", $"kept")
      .as[(Long, Double, Double, Double, Boolean)].collect().toSeq
    assert(real.nonEmpty && real.forall(_._1 >= 2L))
    assert(real.exists(_._5) && real.exists(!_._5),
      "margin gate vacuous at sf0.001")
    assert(real.filter(_._5).forall(r => r._2 > r._3))
  }

  test("q_curriculum_plan: linear pacing admits 2e deciles; final epoch sees all") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = PipelineOps.qCurriculumPlan.run(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val byEpoch = rows.groupBy(_._1)
    // epoch e admits exactly buckets 1..2e (Q=10, E=5 linear schedule)
    assert(byEpoch.keySet === (1L to 5L).toSet)
    for ((e, rs) <- byEpoch)
      assert(rs.map(_._2).sorted === (1L to 2 * e),
        s"epoch $e admitted ${rs.map(_._2).sorted}")
    // the final epoch covers the whole corpus, cum_share reaching 1
    val total = Tables.documents(spark, dir).count()
    assert(byEpoch(5L).map(_._3).sum === total)
    assert(byEpoch(5L).maxBy(_._2)._5 === 1.0)
    // the curriculum genuinely GROWS: each epoch ends seeing strictly
    // more token mass than the previous
    val ends = (1L to 5L).map(e => byEpoch(e).maxBy(_._2)._5)
    assert(ends.sliding(2).forall { case Seq(a, b) => b > a })
    // shared-bucket rows are identical across the epochs that admit them
    // (the schedule only ADDS buckets, never rebuilds them)
    val byBucket = rows.groupBy(_._2)
    assert(byBucket.values.forall(rs =>
      rs.map(r => (r._3, r._4)).distinct.size === 1))
  }

  test("q_epoch_decay: repetition pricing closes on the emitted columns") {
    import spark.implicits._
    val rows = PipelineOps.qEpochDecay.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    val rs = PipelineOps.EpochRStar
    for ((lang, u, e, planned, eff, ratio) <- rows) {
      // plan consistency: planned = epochs * unique (to the round grid)
      assert(math.abs(planned - e * u) <= math.max(1.0, planned * 1e-5),
        s"$lang planned")
      if (e > 1.0) {
        // decay formula closes from the emitted columns alone
        val expected = u * (1.0 + rs * (1.0 - math.exp(-(e - 1.0) / rs)))
        assert(math.abs(eff - expected) <= math.max(0.01, expected * 1e-4),
          s"$lang effective")
        assert(eff < planned && eff > u, s"$lang bounds")
        assert(ratio < 1.0, s"$lang efficiency < 1 when repeating")
      } else assert(math.abs(ratio - 1.0) <= 2e-6)
    }
    // more repetition -> lower marginal value (efficiency anti-monotone
    // in epochs)
    val byE = rows.sortBy(_._3)
    assert(byE.map(_._6).sliding(2).forall { case Seq(a, b) => b <= a + 1e-9 })
  }
}
