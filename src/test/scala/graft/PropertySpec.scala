package graft

import graft.functions.{Det, SentimentLexicon, Text}
import graft.streaming.Retention
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import scala.util.Random

/** Property-style tests (SURVEY.md §5.3) over seeded random inputs:
  * deterministic-aggregation order independence, tokenizer/shingle laws,
  * scorer bounds, retention invariants. One Spark job per property (inputs
  * generated as one DataFrame), seeded so failures reproduce. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private val vocab = Vector("fast", "slow", "big", "the", "a", "spark",
    "data", "zz", "w1", "w2", "merge", "join")
  private def randText(): String =
    Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("Det.dsum is order-independent (decimal accumulation)") {
    val values = Seq.fill(5000)(rnd.nextDouble() * 2e6 - 1e6)
    def total(vs: Seq[Double], parts: Int): Double =
      spark.createDataset(vs).repartition(parts).toDF("v")
        .agg(Det.dsum($"v").as("s")).as[Double].head()
    val reference = total(values, 1)
    assert(total(values, 7) === reference)
    assert(total(rnd.shuffle(values), 13) === reference)
  }

  test("Det.dsumAll equals the aggregate+crossJoin total it replaces (r17)") {
    // dsumAll is the windowed form of crossJoin(broadcast(agg(dsum)));
    // the two must agree bit-for-bit on every row, and both must return
    // ZERO rows on an empty relation (the window emits nothing; the
    // 1-row null-total aggregate crossJoins against nothing)
    val df = spark.createDataset(
        Seq.fill(200)(rnd.nextDouble() * 2e3 - 1e3)).toDF("v")
      .withColumn("id", monotonically_increasing_id())
    val viaWindow = df.withColumn("tot", Det.dsumAll($"v"))
      .select($"id", $"tot").as[(Long, Double)].collect().toMap
    val viaAgg = df.crossJoin(
        broadcast(df.agg(Det.dsum($"v").as("tot"))))
      .select($"id", $"tot").as[(Long, Double)].collect().toMap
    assert(viaWindow === viaAgg)
    val empty = df.filter($"v" > 1e9)
    assert(empty.withColumn("tot", Det.dsumAll($"v")).count() === 0L)
    assert(empty.crossJoin(
      broadcast(empty.agg(Det.dsum($"v").as("tot")))).count() === 0L)
  }

  test("shingleArray law: equals distinct sliding n-grams of the token list") {
    val texts = Seq.fill(200)(randText()).filter(_.split("\\s+").length >= 3)
    val toks = Text.tokens($"text")
    val got = texts.toDF("text")
      .select($"text", array_distinct(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws(" ", a, b))).as("sh"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (text, sh) =>
      val expected = text.toLowerCase.split("\\s+").toSeq
        .sliding(2).map(_.mkString(" ")).toSeq.distinct
      assert(sh === expected, s"for text: $text")
    }
  }

  test("native expressions match their declarative twins on random corpora") {
    // one randomized corpus through all three native/declarative pairs:
    // word_shingles (n=2,3), simhash32, minhash_bands
    val texts = Seq.fill(150)(randText()).filter(_.split("\\s+").length >= 3)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    for (n <- Seq(2, 3)) {
      val both = df.select(
        call_function("word_shingles", $"text", lit(n)).as("nat"),
        operators.Dedup.shingleArray($"text", n).as("dec"))
        .as[(Seq[String], Seq[String])].collect()
      both.foreach { case (nat, dec) => assert(nat.toSet === dec.toSet) }
    }

    val sig = df.select($"doc_id", call_function("simhash32", $"text").as("s"))
      .as[(Long, Long)].collect().toMap
    val sigDec = operators.Dedup.simhashSigDeclarative(df)
      .as[(Long, Long)].collect().toMap
    assert(sig === sigDec)

    val bands = df
      .select($"doc_id", call_function("word_shingles", $"text", lit(2)).as("sh"))
      .select($"doc_id",
        call_function("minhash_bands", $"sh", lit(12), lit(3)).as("nat"),
        array((0 until 4).map(b =>
          concat_ws("|", (0 until 3).map(r =>
            array_min(transform($"sh", s =>
              md5(concat(lit((b * 3 + r).toString), lit(":"), s))))): _*)): _*)
          .as("dec"))
      .as[(Long, Seq[String], Seq[String])].collect()
    bands.foreach { case (id, nat, dec) => assert(nat === dec, s"doc $id") }
  }

  test("lexicon scorer bounds hold for arbitrary texts") {
    val maxAbs = SentimentLexicon.entries.map(e => math.abs(e._2)).max
    val texts = Seq.fill(300)(randText())
    val scores = texts.toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
      .select($"doc_id", explode(Text.tokens($"text")).as("term"))
      .join(broadcast(SentimentLexicon.df(spark)), Seq("term"), "left")
      .groupBy($"doc_id")
      .agg((sum(coalesce($"valence", lit(0.0)).cast(DecimalType(38, 9)))
        .cast(DoubleType) / count(lit(1))).as("sentiment"))
      .as[(Long, Double)].collect()
    assert(scores.length === texts.length)
    assert(scores.forall { case (_, s) => s >= -maxAbs && s <= maxAbs })
  }

  test("retention invariants: post-total <= cap, deletions are the oldest prefix") {
    for (trial <- 1 to 25) {
      val dir = Files.createTempDirectory(s"graft-prop-ret$trial").toString
      val n = 1 + rnd.nextInt(8)
      val sizes = Seq.fill(n)(1 + rnd.nextInt(2000))
      val t0 = 1700000000000L
      sizes.zipWithIndex.foreach { case (sz, i) =>
        val f = new java.io.File(dir, f"f$i%02d.parquet")
        Files.write(f.toPath, Array.fill[Byte](sz)(1))
        f.setLastModified(t0 + i * 1000)
      }
      val cap = rnd.nextInt(4000).toLong
      val deleted = Retention.enforce(dir, cap)
      val left = Retention.dataFiles(dir)
      assert(left.map(_.getLen).sum <= cap || left.isEmpty || deleted.isEmpty)
      // deleted files form a prefix of the mtime order
      val expectPrefix = (0 until n).map(i => f"f$i%02d.parquet").take(deleted.length)
      assert(deleted === expectPrefix)
      // what remains is the newest suffix
      assert(left.map(_.getPath.getName).sorted ===
        (0 until n).map(i => f"f$i%02d.parquet").drop(deleted.length))
    }
  }

  test("rep_stats law: equals a model computed directly from the token list") {
    val texts = Seq.fill(300)(randText())
    def model(t: String): Seq[Long] = {
      val toks = t.toLowerCase.split("\\s+", -1).toSeq
      val grams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      def counts(xs: Seq[String]) = xs.groupBy(identity).view.mapValues(_.size)
      val tc = counts(toks)
      val gc = counts(grams)
      Seq(toks.size.toLong, tc.size.toLong, tc.values.max.toLong,
        grams.size.toLong, gc.size.toLong,
        if (grams.isEmpty) 0L else gc.values.max.toLong)
    }
    val got = texts.toDF("text")
      .select($"text", call_function("rep_stats", $"text").as("st"))
      .as[(String, Seq[Long])].collect()
    got.foreach { case (t, st) => assert(st === model(t), s"for '$t'") }
  }

  test("word_shingles_all laws: distinct == word_shingles; count == max(n-k+1, 0)") {
    val texts = Seq.fill(300)(randText())
    val df = texts.toDF("text").select($"text",
      call_function("word_shingles_all", $"text", lit(3)).as("all3"),
      call_function("word_shingles", $"text", lit(3)).as("dist3"),
      size(split(lower($"text"), "\\s+", -1)).as("n"))
    // law 1: positional stream, deduplicated in first-occurrence order,
    // IS the distinct-shingle set (both use the same tokenization)
    assert(df.filter(array_distinct($"all3") =!= $"dist3").count() === 0)
    // law 2: the stream has exactly max(n-k+1, 0) entries
    assert(df.filter(size($"all3") =!= greatest($"n" - 2, lit(0))).count() === 0)
  }

  test("q_table_checksum digest is row-order and partitioning independent") {
    // re-land the fixture documents shuffled across many small parts; the
    // REAL query must produce the identical digest relation
    val dir = Files.createTempDirectory("graft-checksum").toString
    Tables.documents(spark, fixtureDir)
      .orderBy(expr("md5(cast(doc_id as string))")) // scramble row order
      .repartition(5)
      .write.parquet(s"$dir/documents.parquet")
    val a = graft.operators.Profiling.qTableChecksum.run(spark, fixtureDir)
      .collect().toSeq
    val b = graft.operators.Profiling.qTableChecksum.run(spark, dir)
      .collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("winnowing laws on random texts: subset, bound, and shared-run guarantee") {
    val texts = Seq.fill(150)(randText())
    val rows = texts.toDF("text")
      .select($"text",
        call_function("winnow_hashes", $"text", lit(3), lit(4)).as("fps"),
        call_function("word_shingles_all", $"text", lit(3)).as("grams"))
      .select($"text", $"fps", transform($"grams", g => md5(g)).as("hs"))
      .as[(String, Seq[String], Seq[String])].collect()
    for ((text, fps, hs) <- rows) {
      // selected fingerprints are a subset of the gram hashes
      assert(fps.toSet.subsetOf(hs.toSet), text)
      // at most one selection per window; sorted distinct output
      val windows = if (hs.isEmpty) 0 else math.max(hs.size - 4 + 1, 1)
      assert(fps.size <= windows)
      assert(fps == fps.distinct.sorted)
      // a text with >= n+w-1 = 6 tokens always selects something
      if (hs.size >= 4) assert(fps.nonEmpty)
    }
    // the guarantee, constructed: a text and its copy wrapped in novel
    // framing share a >= 6-token run, so they must share a fingerprint
    val donors = rows.filter(_._3.size >= 6).take(5)
    val wrapped = donors.map(d => s"qq1 qq2 ${d._1} qq3 qq4").toSeq.toDF("text")
      .select(call_function("winnow_hashes", $"text", lit(3), lit(4)).as("fps"))
      .as[Seq[String]].collect()
    for ((d, w) <- donors.zip(wrapped))
      assert((d._2.toSet & w.toSet).nonEmpty, d._1)
  }

  test("CDC laws on random texts: chunk counts, boundary invariance under append") {
    def chunks(t: String, d: Int): Seq[String] =
      Seq(t).toDF("text")
        .select(call_function("cdc_chunk_hashes", $"text", lit(d)))
        .collect().head.getSeq[String](0)
    val texts = Seq.fill(60)(randText())
    val all = texts.toDF("text")
      .select($"text",
        call_function("cdc_chunk_hashes", $"text", lit(4)).as("c4"),
        call_function("cdc_chunk_hashes", $"text", lit(1)).as("c1"))
      .as[(String, Seq[String], Seq[String])].collect()
    for ((t, c4, c1) <- all) {
      val n = t.toLowerCase.split("\\s+", -1).length
      // divisor 1: every token a boundary → exactly one chunk per token
      assert(c1.size == n, t)
      // chunk count bounded by token count, and never zero
      assert(c4.nonEmpty && c4.size <= n)
    }
    // append invariance: adding a suffix never changes the chunks BEFORE
    // the original text's last interior boundary (the CDC re-alignment
    // property, here exercised from the left side)
    for (t <- texts.take(10)) {
      val base = chunks(t, 4)
      val extended = chunks(t + " extra trailing tokens here", 4)
      // all but the final (possibly merged) chunk of the base survive
      assert(base.dropRight(1).zip(extended).forall { case (a, b) => a == b },
        s"prefix chunks changed for: $t")
    }
  }

  test("CUSUM prefix identity equals the direct reset recursion on random series") {
    // S_t = P_t - min(0, min_{j<=t} P_j) is the window form q_cusum_drift
    // executes; the direct recursion S_t = max(0, S_{t-1} + d_t) is the
    // textbook definition (and StreamCusum's state form). They must agree
    // on any series, including long negative runs and sign flips.
    for (_ <- 1 to 20) {
      val ds = Seq.fill(300)(rnd.nextDouble() * 4 - 2)
      val direct = ds.scanLeft(0.0)((s, d) => math.max(0.0, s + d)).tail
      val prefix = ds.scanLeft(0.0)(_ + _).tail
      val mins = prefix.scanLeft(0.0)(math.min).tail
      val viaIdentity = prefix.zip(mins).map { case (p, m) => p - math.min(m, 0.0) }
      direct.zip(viaIdentity).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"identity diverged: $a vs $b") }
    }
  }

  test("HLL union partition-invariance: exact in coupon mode, sketch-error-bounded in the promotion band") {
    // the property StreamSketch's equality rests on — with its TRUE
    // contract (probed empirically this round): below the coupon->dense
    // promotion (~512 coupons at lgK=12) every partitioning of the same
    // rows unions to the IDENTICAL estimate (coupon lists are exact);
    // inside the promotion band (~700 distinct) the single-pass sketch
    // and the union can promote at different points and disagree by a
    // few units — both still within the sketch's own 3*rsd error of the
    // exact count, which is the bound the production audit
    // (q_hll_sketch_merge's approx_ok) actually enforces.
    def est(distinct: Int, groups: Int): Double = {
      val df = (0 until 3000).map(i => (i % groups, (i % distinct).toLong))
        .toDF("g", "user_id")
      df.groupBy($"g").agg(hll_sketch_agg($"user_id").as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
        .as[Double].head()
    }
    for (g <- Seq(7, 64)) // coupon regime: bit-exact under any grouping
      assert(est(300, g) === est(300, 1))
    for (n <- Seq(700, 1000, 3000); g <- Seq(7, 64)) { // promotion band +
      val (s, u) = (est(n, 1), est(n, g))              // dense regime
      assert(math.abs(u - s) <= 3 * 0.0262 * n,
        s"n=$n g=$g single=$s union=$u")
      assert(math.abs(u - n) <= 3 * 0.0262 * n)
    }
  }

  test("containment dominates Jaccard; subsets have containment 1") {
    // random set pairs through the q_containment_dedup formulas
    for (_ <- 1 to 50) {
      val a = Seq.fill(5 + rnd.nextInt(30))(rnd.nextInt(60)).toSet
      val b = Seq.fill(5 + rnd.nextInt(30))(rnd.nextInt(60)).toSet
      val inter = (a & b).size.toDouble
      if (inter > 0) {
        val c = inter / math.min(a.size, b.size)
        val j = inter / (a.size + b.size - inter)
        assert(c >= j - 1e-12)
      }
      val sub = a.take(1 + rnd.nextInt(a.size)) // subset of a
      val cSub = (sub & a).size.toDouble / math.min(sub.size, a.size)
      assert(cSub === 1.0)
    }
  }

  test("histogram quantile error bound holds on random data (q_hist_quantiles law)") {
    val bins = operators.Governance.HistBins
    for (_ <- 1 to 10) {
      val xs = Seq.fill(500)(rnd.nextDouble() * 100 - 50).sorted
      val (lo, hi) = (xs.head, xs.last)
      val width = (hi - lo) / bins
      for (p <- operators.Governance.Quantiles) {
        val trn = math.ceil(p * xs.size).toInt
        val exact = xs(trn - 1)
        val bin = math.min(bins - 1L,
          math.floor((exact - lo) / width).toLong)
        // cumulative count of the exact value's bin reaches its rank, so
        // the lookup picks a bin at or below it; the right edge of the
        // exact value's bin bounds the error by one width
        val approx = lo + (bin + 1) * width
        assert(approx >= exact - 1e-9 && approx - exact <= width + 1e-9)
      }
    }
  }
}
