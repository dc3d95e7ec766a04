package graft

import graft.operators.{Dedup, Profiling, TfIdf}
import org.apache.spark.sql.functions._

/** The dataset-audit batch: word_shingles_all semantics, span-level dedup
  * coverage on the hand-computable fixture, temperature mixture weights,
  * integer-moment correlation, table profiling, and the inverted index. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def qround(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("word_shingles_all keeps order and repeats; short text yields empty") {
    val rows = Seq(
      ("a b a b a", 2),   // repeats must be kept: "a b","b a","a b","b a"
      ("one two", 3),     // fewer than n tokens -> empty
      ("x y z", 3))
      .toDF("t", "n")
    val got = rows.select(call_function("word_shingles_all", $"t", lit(2)).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("a b", "b a", "a b", "b a"))
    assert(got(2) === Seq("x y", "y z"))
    val short = rows.select(call_function("word_shingles_all", $"t", lit(3)))
      .as[Seq[String]].collect()
    assert(short(1) === Seq.empty)
    val n = rows.select(call_function("word_shingles_all", lit(null).cast("string"), lit(2)))
      .collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("word_shingles_all array index is the start token offset (posexplode)") {
    val got = Seq("t0 t1 t2 t3").toDF("t")
      .select(posexplode(call_function("word_shingles_all", $"t", lit(2)))
        .as(Seq("pos", "s")))
      .as[(Int, String)].collect().toSeq
    assert(got === Seq((0, "t0 t1"), (1, "t1 t2"), (2, "t2 t3")))
  }

  test("word_shingles_all stays inside whole-stage codegen") {
    // non-foldable input (a LocalTableScan of literals would constant-fold)
    val plan = spark.range(1)
      .select(concat(lit("a b "), $"id".cast("string")).as("t"))
      .select(call_function("word_shingles_all", $"t", lit(2)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [word_shingles_all"),
      s"word_shingles_all fell out of codegen:\n$plan")
  }

  test("q_span_dedup on the fixture: only the near-dup pair shares 8-token spans") {
    // docs 0-3 have < 8 tokens (no spans); docs 4/5 share every 8-gram that
    // avoids the differing last token: starts 0..21, covering positions
    // 0..28 -> 29 of 30 tokens on each side.
    val got = Dedup.qSpanDedup.run(spark, fixtureDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 3L, 0L, 0.0), (1L, 3L, 0L, 0.0),
      (2L, 4L, 0L, 0.0), (3L, 4L, 0L, 0.0),
      (4L, 30L, 29L, qround(29.0 / 30)), (5L, 30L, 29L, qround(29.0 / 30))))
  }

  test("q_mixture_weights: sqrt-temperature weights over per-lang token counts") {
    // fixture tokens: en 3+3=6, de 4+4=8, fr 30+30=60
    val s6 = math.sqrt(6.0); val s8 = math.sqrt(8.0); val s60 = math.sqrt(60.0)
    // the engine sums the sqrt addends through DECIMAL(38,12); replicate by
    // rounding each addend to 12 dp before the (exact) sum
    def d12(x: Double): BigDecimal =
      BigDecimal.valueOf(x) // shortest-decimal repr, like Spark's Decimal cast
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val tot = (d12(s6) + d12(s8) + d12(s60)).toDouble
    val got = Profiling.qMixtureWeights.run(spark, fixtureDir)
      .as[(String, Long, Long, Double, Long)].collect().toSeq
    def exp(lang: String, nDocs: Long, toks: Long, s: Double) = {
      val w = qround(s / tot)
      (lang, nDocs, toks, w, math.floor(w * Profiling.MixtureBudget.toDouble).toLong)
    }
    assert(got === Seq(
      exp("de", 2, 8, s8), exp("en", 2, 6, s6), exp("fr", 2, 60, s60)))
  }

  test("q_temperature_mix: multi-alpha weights, plain-Scala replica") {
    // fixture tokens by source: srcA 3+4=7, srcB 3+30=33, srcC 4+30=34
    val masses = Seq(("srcA", 2L, 7L), ("srcB", 2L, 33L), ("srcC", 2L, 34L))
    def d12(x: Double): BigDecimal = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val tot1 = masses.map(_._3).sum.toDouble
    val tot50 = masses.map(m => d12(math.sqrt(m._3.toDouble))).sum.toDouble
    val tot25 = masses.map(m => d12(math.sqrt(math.sqrt(m._3.toDouble))))
      .sum.toDouble
    val got = Profiling.qTemperatureMix.run(spark, fixtureDir)
      .as[(String, Long, Long, Double, Double, Double, Double, Long, Long)]
      .collect().toSeq
    val expRows = masses.map { case (src, nd, m) =>
      val w1 = m / tot1
      val w50 = math.sqrt(m.toDouble) / tot50
      val w25 = math.sqrt(math.sqrt(m.toDouble)) / tot25
      (src, nd, m, qround(w1), qround(w50), qround(w25), qround(w25 / w1),
        math.floor(qround(w50) * Profiling.MixtureBudget.toDouble).toLong,
        math.floor(qround(w25) * Profiling.MixtureBudget.toDouble).toLong)
    }
    assert(got === expRows)
    // the flattening direction: the smallest source gains under alpha<1
    val bySrc = got.map(r => r._1 -> r).toMap
    assert(bySrc("srcA")._7 > 1.0 && bySrc("srcC")._7 < 1.0)
  }

  test("q_spearman: plain-Scala midrank replica on the fixture events") {
    // fixture: values 1..6 at hours (b*6)%24 = 0,6,12,18,0,6
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val ys = Seq(0L, 6L, 12L, 18L, 0L, 6L)
    val n = xs.size
    def rank2[T: Ordering](v: Seq[T]): Map[T, Long] = {
      val sorted = v.sorted
      v.distinct.map { x =>
        val cum = sorted.count(implicitly[Ordering[T]].lteq(_, x)).toLong
        val f = v.count(_ == x).toLong
        x -> (2 * cum - f + 1)
      }.toMap
    }
    val (rx, ry) = (rank2(xs), rank2(ys))
    val pts = xs.zip(ys).map { case (x, y) => (rx(x), ry(y)) }
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val rho0 = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n.toLong * sxx - sx * sx).toDouble) *
        math.sqrt((n.toLong * syy - sy * sy).toDouble))
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val exp = (n.toLong, qr(rho0),
      Some(qr(rho0 * math.sqrt((n - 2).toDouble / (1.0 - rho0 * rho0)))))
    val got = Profiling.qSpearman.run(spark, fixtureDir)
      .as[(Long, Double, Option[Double])].head()
    assert(got === exp)
    // ties present (two hour values repeat) — midranks exercised: a tied
    // pair's midrank is a half, so its DOUBLED rank is odd
    assert(ry(0L) % 2 === 1L)
  }

  test("q_raking: plain-Scala IPF replica; final column margins uniform") {
    // fixture cells: (click,0):2 (click,12):1 (view,6):1 (view,18):1
    // (signup,6):1; N=6, 3 types, 4 hours
    var cells = Map(
      ("click", 0L) -> (2L, 1.0), ("click", 12L) -> (1L, 1.0),
      ("view", 6L) -> (1L, 1.0), ("view", 18L) -> (1L, 1.0),
      ("signup", 6L) -> (1L, 1.0))
    def d12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def qr(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val (nn, nt, nh) = (6.0, 3.0, 4.0)
    for (_ <- 1 to Profiling.RakeIters) {
      val rm = cells.groupBy(_._1._1).map { case (t, cs) =>
        t -> cs.values.map { case (n, w) => d12(w * n) }.sum.toDouble }
      cells = cells.map { case (k, (n, w)) =>
        k -> (n, w * ((nn / nt) / rm(k._1))) }
      val cm = cells.groupBy(_._1._2).map { case (h, cs) =>
        h -> cs.values.map { case (n, w) => d12(w * n) }.sum.toDouble }
      cells = cells.map { case (k, (n, w)) =>
        k -> (n, w * ((nn / nh) / cm(k._2))) }
    }
    val expRows = cells.toSeq.map { case ((t, h), (n, w)) =>
      (t, h, n, qr(w), qr(w * n)) }.sortBy(r => (r._1, r._2))
    val got = Profiling.qRaking.run(spark, fixtureDir)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got === expRows)
    // after the final COLUMN step every hour's weighted mass is nn/nh
    val byHour = got.groupBy(_._2).view.mapValues(_.map(_._5).sum)
    assert(byHour.values.forall(m => math.abs(m - 1.5) < 1e-5))
  }

  test("q_neyman_alloc: zero-variance fixture degrades to a 0 allocation") {
    // every fixture lang holds two EQUAL-length docs → S_h = 0 for all
    // strata → the Neyman normalizer is 0 and the guarded ratio reads 0,
    // not NaN; proportional fractions are the plain 2/6 shares
    val got = Profiling.qNeymanAlloc.run(spark, fixtureDir)
      .as[(String, Long, Double, Option[Double], Double, Long, Double)]
      .collect().toSeq
    assert(got.map(_._1) === Seq("de", "en", "fr"))
    assert(got.map(_._3) === Seq(4.0, 3.0, 30.0)) // mean tokens per doc
    got.foreach { r =>
      assert(r._2 === 2L && r._4 === Some(0.0))
      assert(r._5 === 0.0 && r._6 === 0L && r._7 === 0.333333)
    }
  }

  test("q_neyman_alloc at sf0.001: plain-Scala replica of the allocation") {
    def d9(x: Double): BigDecimal =
      BigDecimal.valueOf(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    // per-doc token counts through the engine's own tokenizer (pinned
    // elsewhere); the MOMENT/ALLOCATION math is replicated independently
    val per = Tables.spread(Tables.documents(spark, "/root/testdata/sf0.001"))
      .select($"lang",
        element_at(call_function("rep_stats", $"text"), 1).as("n_toks"))
      .as[(String, Long)].collect().toSeq
    val strata = per.groupBy(_._1).toSeq.map { case (lang, rows) =>
      val n = rows.size.toLong
      val sx = rows.map(_._2).sum
      val sxx = rows.map(t => t._2 * t._2).sum
      val mean = qround(sx.toDouble / n)
      val sd = if (n > 1) Some(qround(math.sqrt(
        (n * sxx - sx * sx).toDouble / (n * (n - 1)).toDouble))) else None
      (lang, n, mean, sd)
    }.sortBy(_._1)
    val totDocs = strata.map(_._2).sum
    val totNs = strata.flatMap(s => s._4.map(sd => d9(s._2 * sd)))
      .sum.toDouble
    val expect = strata.map { case (lang, n, mean, sd) =>
      val f = sd.filter(_ => totNs > 0)
        .map(s => qround(n * s / totNs)).getOrElse(0.0)
      (lang, n, mean, sd, f,
        math.floor(f * Profiling.NeymanBudget.toDouble).toLong,
        qround(n.toDouble / totDocs))
    }
    val got = Profiling.qNeymanAlloc.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Double, Option[Double], Double, Long, Double)]
      .collect().toSeq
    assert(got === expect)
    // the allocation exhausts the budget to within per-stratum rounding
    val fracSum = got.map(_._5).sum
    assert(math.abs(fracSum - 1.0) < 1e-5 * got.size)
  }

  test("q_feature_corr: zero-variance groups are null, varying group is exact") {
    // every fixture lang has a zero-variance side (en/fr: equal token
    // counts; de: exact duplicates) -> build a corpus where one lang varies
    // on both axes. xx's chars are exactly 3·tokens − 1, so r = 1.
    val dir = java.nio.file.Files.createTempDirectory("graft-corr").toString
    val docs = Seq(
      (0L, "aa", "xx"), (1L, "aa bb", "xx"), (2L, "aa bb cc cc", "xx"),
      (3L, "dd", "yy"), (4L, "ee", "yy"))
    docs.map { case (id, t, l) => (id, t, l, "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val xx = docs.filter(_._3 == "xx")
      .map(d => (d._2.length.toLong, d._2.split("\\s+", -1).length.toLong))
    val n = xx.size.toLong
    val sx = xx.map(_._1).sum; val sy = xx.map(_._2).sum
    val sxy = xx.map(p => p._1 * p._2).sum
    val sxx = xx.map(p => p._1 * p._1).sum; val syy = xx.map(p => p._2 * p._2).sum
    val vx = (n * sxx - sx * sx).toDouble; val vy = (n * syy - sy * sy).toDouble
    val expXx = qround((n * sxy - sx * sy).toDouble / (math.sqrt(vx) * math.sqrt(vy)))
    assert(expXx === 1.0) // sanity: the constructed relation is exactly linear
    val got = Profiling.qFeatureCorr.run(spark, dir)
      .select($"lang", $"chars_tokens_r").as[(String, Option[Double])]
      .collect().toSeq
    // yy: single-char docs -> both variances 0 -> null
    assert(got === Seq(("xx", Some(expXx)), ("yy", None)))
  }

  test("q_profile_table on sf0.001: key column profiles as unique and non-null") {
    val rows = Profiling.qProfileTable.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r).toMap
    val key = rows("o_orderkey")
    val n = key.getLong(1)
    assert(n > 0 && key.getLong(2) === 0L && key.getLong(3) === n) // unique, no nulls
    assert(key.getDouble(4) === 0.0)                               // min key
    assert(rows.size === 6 && rows.values.forall(_.getLong(1) === n))
    val status = rows("o_orderstatus")
    assert(status.isNullAt(4) && !status.isNullAt(6))              // string-typed profile
  }

  test("q_inverted_index on the fixture: df rank, truncated ordered postings") {
    val got = TfIdf.qInvertedIndex.run(spark, fixtureDir)
      .as[(String, Long, String)].collect().toSeq
    // "the" is a stopword; df-3 terms first (term asc), then df-2, then df-1
    assert(got.head === ("big", 3L, "1,2,3"))
    assert(got(1) === ("slow", 3L, "0,2,3"))
    assert(got.find(_._1 == "fast").get === ("fast", 2L, "0,1"))
    assert(got.find(_._1 == "w1").get === ("w1", 2L, "4,5"))
    assert(got.find(_._1 == "zz").get === ("zz", 1L, "5"))
    assert(got.find(_._1 == "the").isEmpty)
    assert(got.size <= TfIdf.IndexTopK)
  }

  test("cms: estimate never undercounts, top term exact on the fixture") {
    // fixture term frequencies: slow 7, big 3, fast 3, the 1, w1..w29 x2,
    // w30 1, zz 1 (35 distinct > 32 buckets -> collisions are plausible,
    // soundness must hold regardless)
    val rows = graft.operators.Profiling.qCmsHeavy.run(spark, fixtureDir)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(rows.size === 20)
    assert(rows.head._1 === "slow" && rows.head._2 === 7L)
    rows.foreach { case (term, trueN, est, over, sound) =>
      assert(sound, s"CMS undercounted $term")
      assert(est >= trueN && over === est - trueN)
    }
  }

  test("gini source: fixture masses 7/33/34 hand-compute to G=0.243243") {
    // srcA 7 toks, srcB 33, srcC 34 -> iwx = 1*7+2*33+3*34 = 175, tot 74
    // G = 2*175/(3*74) - 4/3 = 0.243243; HHI = 2294/5476 = 0.418919;
    // top share = 34/74 = 0.459459
    val rows = graft.operators.Profiling.qGiniSource.run(spark, fixtureDir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows === Seq((3L, 74L, 0.243243, 0.418919, 0.459459)))
  }

  test("gini source at sf0.001: indices sit in their defined ranges") {
    val rows = graft.operators.Profiling.qGiniSource
      .run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows.size === 1)
    val (n, tot, g, hhi, top) = rows.head
    assert(n > 0 && tot > 0)
    assert(g >= 0.0 && g < 1.0)
    // HHI is bounded below by the uniform case 1/n and above by top share
    assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0)
    assert(top >= 1.0 / n - 1e-6 && top <= 1.0 && hhi <= top + 1e-6)
  }
}
