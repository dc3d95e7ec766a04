package graft

import graft.operators.{Clustering, CorpusQuality}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.Random

/** Corpus-hygiene operators (repetition stats, PII redaction, contamination
  * screening) and the k-means assignment — hand-computed fixtures plus the
  * native-vs-declarative equivalence and codegen checks every other native
  * expression gets. */
class CorpusQualitySpec extends SparkSpec {
  import spark.implicits._

  test("rep_stats counters match a hand count") {
    val r = spark.sql("SELECT rep_stats('fast fast slow') AS st")
      .as[Seq[Long]].head()
    // [n_tokens, distinct, top_token, n_2grams, distinct_2grams, top_2gram]
    assert(r === Seq(3L, 2L, 2L, 2L, 2L, 1L))
    val single = spark.sql("SELECT rep_stats('solo') AS st").as[Seq[Long]].head()
    assert(single === Seq(1L, 1L, 1L, 0L, 0L, 0L))
  }

  test("q_repetition_stats hand-computed rows") {
    val out = CorpusQuality.qRepetitionStats.run(spark, fixtureDir)
      .as[(Long, Long, Long, Long, Double, Option[Double], Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap
    // doc 0 "fast fast slow": 3 tokens (2 distinct), grams {fast fast, fast slow}
    assert(out(0L) === ((0L, 3L, 2L, 2L, 0.333333, Some(0.5), Some(0.0), Some(true))))
    // doc 4 w1..w30: no repetition at all
    assert(out(4L) === ((4L, 30L, 30L, 1L, 0.0, Some(0.034483), Some(0.0), Some(false))))
  }

  test("q_gopher_rules hand-computed flags") {
    val out = CorpusQuality.qGopherRules.run(spark, fixtureDir)
      .as[(Long, Long, Double, Double, Long, Boolean, Boolean, Boolean,
        Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // doc 0 "fast fast slow": 3 words, 12 word-chars → mean 4.0; all
    // alphabetic; no symbols; zero Gopher stop words. Only the word-count
    // floor and stop-word rules reject.
    assert(out(0L) === ((0L, 3L, 4.0, 1.0, 0L,
      false, true, true, true, false, false)))
    // doc 1 "fast the big": 10 word-chars → mean 3.333333; "the" is the
    // one stop-word hit (< 2 required).
    assert(out(1L) === ((1L, 3L, 3.333333, 1.0, 1L,
      false, true, true, true, false, false)))
    // doc 4 w1..w30: 81 word-chars over 30 words → mean 2.7 BELOW the
    // 3-char floor — the word-length rule rejects too.
    assert(out(4L) === ((4L, 30L, 2.7, 1.0, 0L,
      false, false, true, true, false, false)))
  }

  test("q_ngram_novelty: fixture is all-holdout -> everything novel, hand counts") {
    // all fixture ids < HoldoutMax => train split empty, every rate 1.0.
    // hand counts — types: 35 unigrams (fast/slow/the/big + w1..w30 + zz);
    // bigrams 2+2+2+29+1=36; trigrams 1+1+2+28+1=33; 4-grams 1+27+1=29.
    // instances: 74/68/62/56.
    val got = CorpusQuality.qNgramNovelty.run(spark, fixtureDir)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 35L, 35L, 74L, 74L, 1.0, 1.0),
      (2L, 36L, 36L, 68L, 68L, 1.0, 1.0),
      (3L, 33L, 33L, 62L, 62L, 1.0, 1.0),
      (4L, 29L, 29L, 56L, 56L, 1.0, 1.0)))
  }

  test("q_ngram_novelty at sf0.001: novelty non-decreasing in n on a 31-term vocab") {
    val got = CorpusQuality.qNgramNovelty.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 4L))
    // shared unigram vocab means near-zero unigram novelty; higher orders
    // can only be as seen or less
    assert(got.head._6 <= got.last._6)
    assert(got.forall(r => r._3 <= r._2 && r._5 <= r._4))
  }

  test("PII pattern redacts emails, digit runs and entity tokens") {
    val (n, cleaned) = spark.sql(
      """SELECT cast(size(regexp_extract_all(
           'contact a.user@mail.com or 1234567 customer order',
           '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}|\\d{6,}|\\w+er\\b', 0)) as bigint),
         regexp_replace('contact a.user@mail.com or 1234567 customer order',
           '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}|\\d{6,}|\\w+er\\b', '<redacted>')""")
      .as[(Long, String)].head()
    assert(n === 4L)
    assert(cleaned === "contact <redacted> or <redacted> <redacted> <redacted>")
  }

  test("q_redact_pii leaves the er-free fixture corpus untouched") {
    val out = CorpusQuality.qRedactPii.run(spark, fixtureDir)
      .as[(Long, Long, String)].collect()
    assert(out.length === SparkSpec.fixtureDocs.size)
    assert(out.forall(_._2 === 0L))
    assert(out.map(r => r._1 -> r._3).toMap
      === SparkSpec.fixtureDocs.map(d => d._1 -> d._2).toMap)
  }

  test("q_contamination is empty when every document is in the holdout") {
    // all fixture doc_ids < HoldoutMax => no training partition
    assert(CorpusQuality.qContamination.run(spark, fixtureDir).count() === 0L)
  }

  test("dist2_f32_f64 equals the exploded decimal-sum formulation") {
    val rnd = new Random(11)
    val rows = Seq.fill(200)((Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f),
      Array.fill(64)((rnd.nextDouble() - 0.5) * 4)))
    val df = rows.toDF("a", "b").withColumn("id", monotonically_increasing_id())
    val ref = df
      .select($"id", explode(zip_with($"a", $"b",
        (x, y) => (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y))).as("p"))
      .groupBy($"id")
      .agg(sum($"p".cast(DecimalType(38, 12))).cast(DoubleType).as("declarative"))
    val native = df.select($"id",
      call_function("dist2_f32_f64", $"a", $"b").as("native"))
    assert(native.join(ref, Seq("id"))
      .filter($"native" =!= $"declarative").count() === 0)
  }

  test("q_kmeans on the fixture: identical vectors share a cell, zero distance") {
    val out = Clustering.qKmeans.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect().toSeq
    // vecs 0,1 identical -> cell 0 (tie to lower cid); 2 and 3 keep their own
    assert(out === Seq((0L, 0L, 0.0), (1L, 0L, 0.0), (2L, 2L, 0.0), (3L, 3L, 0.0)))
  }

  test("new native expressions: null semantics and codegen participation") {
    val r = spark.sql("""
      SELECT rep_stats(cast(null as string)) AS rs,
             dist2_f32_f64(cast(null as array<float>), array(1.0D)) AS d1,
             dist2_f32_f64(array(1.0f, 2.0f), array(1.0D)) AS d2,
             dist2_f32_f64(array(1.0f, 2.0f), array(0.0D, 0.0D)) AS d3""")
      .selectExpr("rs IS NULL", "d1 IS NULL", "d2 IS NULL", "d3")
      .as[(Boolean, Boolean, Boolean, Double)].head()
    assert(r === ((true, true, true, 5.0)))
    val docs = Tables.documents(spark, fixtureDir)
    val repPlan = docs.select(call_function("rep_stats", $"text"))
      .queryExecution.executedPlan.toString
    assert(repPlan.contains("*(1) Project [rep_stats"), repPlan)
    val distPlan = Tables.embeddings(spark, fixtureDir)
      .select(call_function("dist2_f32_f64", $"embedding",
        expr("cast(array(1.0D, 0D, 0D, 0D, 0D, 0D, 0D, 0D) as array<double>)")))
      .queryExecution.executedPlan.toString
    assert(distPlan.contains("*(1) Project [dist2_f32_f64"), distPlan)
  }

  test("length histogram: integer equi-width buckets partition the corpus") {
    // fixture n_chars: 14, 12, 18, 18, 110, 109 -> lo=12, hi=110, width 99
    // bucket = (n - 12) * 20 div 99: 14->0, 12->0, 18->1, 110->19, 109->19
    val r = CorpusQuality.qLengthHistogram.run(spark, fixtureDir)
      .select($"bucket", $"n_docs").as[(Long, Long)].collect().toMap
    assert(r === Map(0L -> 2L, 1L -> 2L, 19L -> 2L))
  }

  test("q_source_overlap hand-computed fixture grid") {
    // srcA = docs {0, 2}: {fast fast, fast slow, slow slow, slow big}  (4)
    // srcB = docs {1, 4}: {fast the, the big} ∪ {wi wi+1 : i=1..29}    (31)
    // srcC = docs {3, 5}: {slow slow, slow big} ∪ {wi wi+1 : i=1..28}
    //                     ∪ {w29 zz}                                   (31)
    // A∩B = ∅ (pair absent); A∩C = 2 → 2/33; B∩C = 28 → 28/34
    val got = CorpusQuality.qSourceOverlap.run(spark, fixtureDir)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("srcA", "srcC", 4L, 31L, 2L, 0.060606),
      ("srcB", "srcC", 31L, 31L, 28L, 0.823529)))
  }

  test("q_source_overlap laws at sf0.001: full grid, bounded intersections") {
    val rows = CorpusQuality.qSourceOverlap.run(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // 20 sources sharing a 31-word vocabulary: every pair overlaps
    assert(rows.size === 190)
    rows.foreach { case (a, b, nsa, nsb, i, j) =>
      assert(a < b)
      assert(i >= 1 && i <= math.min(nsa, nsb))
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("q_boilerplate_rate: zero on the boilerplate-free fixture") {
    // every (source, shingle) in the hand fixture is unique → sdf = 1
    // everywhere, below BoilerplateDf: all rates must be exactly 0
    val rows = CorpusQuality.qBoilerplateRate.run(spark, fixtureDir)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // n_sh = max(tokens − 2, 0) distinct 3-shingles per fixture doc
    assert(rows.map(r => (r._1, r._2)) ===
      Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 2L), (4L, 28L), (5L, 28L)))
    rows.foreach { case (_, _, common, rate) =>
      assert(common === 0L); assert(rate === 0.0)
    }
  }

  test("q_boilerplate_rate: planted template shingles are flagged, cross-source repeats are not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-boiler").toString
    // srcT: 3 docs sharing the template run "legal notice acme" (+ unique
    // tails); srcU: one doc containing the SAME run — cross-source, so it
    // must NOT count toward srcU's boilerplate (df within srcU is 1)
    Seq(
      (0L, "legal notice acme alpha beta", "en", "srcT"),
      (1L, "legal notice acme gamma delta", "en", "srcT"),
      (2L, "legal notice acme epsilon zeta", "en", "srcT"),
      (3L, "legal notice acme unrelated tail", "en", "srcU"))
      .map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = CorpusQuality.qBoilerplateRate.run(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // each doc has 3 distinct 3-shingles; only "legal notice acme" reaches
    // df 3 within srcT → rate 1/3 for srcT docs, 0 for the srcU doc
    assert(rows === Seq(
      (0L, 3L, 1L, 1.0 / 3),
      (1L, 3L, 1L, 1.0 / 3),
      (2L, 3L, 1L, 1.0 / 3),
      (3L, 3L, 0L, 0.0)).map { case (a, b, c, d) =>
        (a, b, c, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      })
  }

  test("memorization audit counts intra-doc repeats and distinguishes them by n_docs") {
    // one doc pastes a 5-token footer 3x; three docs share another footer
    // once each -> same occurrence count, different n_docs
    val dir = java.nio.file.Files.createTempDirectory("graft-memo").toString
    val footerA = "call now to subscribe today"
    val footerB = "all rights reserved by us"
    Seq(
      (0L, s"alpha beta $footerA gamma $footerA delta $footerA", "en", "s0"),
      (1L, s"one two $footerB three", "en", "s1"),
      (2L, s"four five $footerB six", "en", "s2"),
      (3L, s"seven eight $footerB nine", "en", "s3"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val r = graft.operators.CorpusQuality.qMemorizationNgrams
      .run(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    val byNgram = r.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byNgram(footerA) === ((3L, 1L)))   // 3 occurrences, ONE doc
    assert(byNgram(footerB) === ((3L, 3L)))   // 3 occurrences, three docs
    // nothing else in this corpus repeats >= 3 times
    assert(r.map(_._1).toSet.subsetOf(Set(footerA, footerB)))
  }

  test("q_filter_ablation: honest-protocol invariants + non-vacuity at sf0.001") {
    val rows = graft.operators.CorpusQuality.qFilterAblation
      .run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    val byV = rows.map(r => r._1 -> r).toMap
    assert(rows.map(_._1).sorted === rows.map(_._1),
      "output not variant-ordered")
    assert(byV.keySet ===
      graft.operators.CorpusQuality.AblationVariants.toSet)
    val none = byV("none")
    // the baseline is the identity gate: delta = 0 by construction
    assert(none._8 === 0.0)
    // the val split is NEVER filtered: identical across every variant
    assert(rows.map(_._5).distinct.size === 1)
    // gates only remove train docs/tokens/vocab; 'all' is the tightest
    for (r <- rows) {
      assert(r._2 <= none._2 && r._3 <= none._3 && r._4 <= none._4)
      // shrunken train vocabulary can only raise val OOV
      assert(r._6 >= none._6 - 1e-9)
    }
    assert(rows.forall(r => byV("all")._2 <= r._2))
    // non-vacuity: at least one rule really bites at sf0.001 (the
    // wordcount floor) and moves the held-out xent
    assert(rows.exists(r => r._2 < none._2))
    assert(rows.exists(r => r._8 != 0.0),
      "ablation vacuous: no filter moved the held-out xent")
  }

  test("q_canary_exposure: canaries are corpus singletons, exposure is the " +
      "rank law on a 256-candidate space") {
    val dir = "/root/testdata/sf0.001"
    val out = CorpusQuality.qCanaryExposure.run(spark, dir)
      .as[(String, Double, Long, Double)].collect().toSeq
    assert(out.nonEmpty && out.size <= CorpusQuality.CanaryCount)
    // every audited canary occurs EXACTLY once in the corpus — recount
    // independently over the raw shingle stream
    val occ = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(call_function("word_shingles_all", col("text"),
        lit(CorpusQuality.CanaryN))).as("g"))
      .groupBy(col("g")).count()
      .as[(String, Long)].collect().toMap
    for ((c, _, _, _) <- out) assert(occ(c) === 1L, s"canary '$c' not a singleton")
    for ((c, nll, rank, bits) <- out) {
      assert(c.split(" ").length === CorpusQuality.CanaryN)
      assert(nll > 0.0)
      assert(rank >= 1L && rank <= (CorpusQuality.CanaryDecoys + 1).toLong)
      // exposure = log2(256) − log2(rank), qrounded
      val want = (math.log(CorpusQuality.CanaryDecoys + 1.0) -
        math.log(rank.toDouble)) / math.log(2.0)
      assert(math.abs(bits - want) < 1e-6, s"$c: $bits vs $want")
      assert(bits >= 0.0 && bits <= 8.0 + 1e-9)
    }
    // exposure is monotone in rank across the report
    for (Seq(a, b) <- out.sortBy(_._3).sliding(2).toSeq
         if a._3 < b._3) assert(a._4 >= b._4)
  }
}
