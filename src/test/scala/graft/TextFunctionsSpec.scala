package graft

import graft.functions.{SentimentLexicon, Text}
import org.apache.spark.sql.functions._

/** Unit tests for the text primitives (SURVEY.md §5.2): tokenizer edge
  * cases, stopword removal duplicate preservation, regex reference counts,
  * lexicon scorer bounds. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("text").select(Text.tokens($"text").as("t"))
      .as[Seq[String]].head()

  test("tokens: lowercase + whitespace split, runs collapse") {
    assert(tok("Fast SLOW big") === Seq("fast", "slow", "big"))
    assert(tok("a\t b\n\nc") === Seq("a", "b", "c"))
  }

  test("tokens: repeated whitespace pins the documented MLlib deviation") {
    // MLlib Tokenizer splits on single \s and yields ["a", "", "b"] here;
    // Text.tokens splits on \s+ (deliberate deviation, see Text.scala doc)
    // so consecutive whitespace never produces an empty token.
    assert(tok("a  b") === Seq("a", "b"))
  }

  test("tokens: leading whitespace yields a leading empty token (Java split semantics)") {
    assert(tok("  x y") === Seq("", "x", "y"))
  }

  test("tokens: unicode text survives lowercasing") {
    assert(tok("Héllo WÖRLD") === Seq("héllo", "wörld"))
  }

  test("withoutStopwords preserves duplicates and order (array_except would not)") {
    val r = Seq("fast the fast a the slow").toDF("text")
      .select(Text.withoutStopwords(Text.tokens($"text")).as("t"))
      .as[Seq[String]].head()
    assert(r === Seq("fast", "fast", "slow"))
  }

  test("refCount counts all matches of each reference pattern") {
    val df = Seq("spark stream sort batch big merger").toDF("text")
    val r = df.select(
      Text.refCount($"text", Text.userRefPattern).as("u"),
      Text.refCount($"text", Text.subRefPattern).as("s"),
      Text.refCount($"text", Text.urlRefPattern).as("l"))
      .as[(Int, Int, Int)].head()
    // \bs\w+ : spark stream sort; \bb\w+ : batch big; \w+er\b : merger
    assert(r === ((3, 2, 1)))
  }

  test("lexicon integrity: unique terms, disjoint from core/boosters/negators, exact eighths") {
    val lex = SentimentLexicon.all
    assert(lex.map(_._1).distinct.size === lex.size, "duplicate lexicon terms")
    val core = SentimentLexicon.entries.map(_._1).toSet
    val ext = SentimentLexicon.extended.map(_._1).toSet
    assert(core.intersect(ext).isEmpty, "extended must not shadow core")
    val modifiers = functions.Vader.boosters.keySet ++ functions.Vader.negators
    assert(lex.map(_._1).toSet.intersect(modifiers).isEmpty,
      "booster/negator words are modifiers, never scored lexicon terms")
    // exact binary fractions (multiples of 1/8) keep Scala Double rendering
    // and DuckDB literal parsing hash-identical in the generated oracle
    assert(lex.forall { case (_, v) => (v * 8) == math.rint(v * 8) })
    assert(lex.forall { case (_, v) => math.abs(v) <= 0.75 })
  }

  test("lexicon scorer: score bounded by max |valence|, empty/unknown => 0") {
    val maxAbs = SentimentLexicon.all.map(e => math.abs(e._2)).max
    assert(maxAbs <= 1.0)
    val docs = operators.TextAnalytics.qSentimentDocs.run(spark, fixtureDir)
      .as[(Long, Long, Double)].collect()
    assert(docs.forall { case (_, _, s) => s >= -maxAbs && s <= maxAbs })
    // doc 0 "fast fast slow": (0.75 + 0.75 - 0.75) / 3
    assert(docs.find(_._1 == 0L).get._3 === 0.25)
    // doc 4 is all unknown terms => 0.0
    assert(docs.find(_._1 == 4L).get._3 === 0.0)
  }

  test("bpe pretokens: letter/digit boundaries split inside fixture tokens") {
    val r = operators.TextAnalytics.qBpeTokens.run(spark, fixtureDir)
      .select($"doc_id", $"n_bpe_tokens", $"n_ws_tokens", $"fertility")
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    // "fast fast slow": pure letter runs -> 3 pretokens, 3 ws tokens
    assert(r(0L) === ((0L, 3L, 3L, 1.0)))
    // doc 4: 30 tokens "w<i>" each split into letter+digit runs -> 60
    assert(r(4L) === ((4L, 60L, 30L, 2.0)))
    // doc 5: 29 "w<i>" pairs + literal "zz" -> 59; 59/30 rounded at 6dp
    assert(r(5L) === ((5L, 59L, 30L, 1.966667)))
  }

  test("bpe merge pairs: corpus-weighted adjacent-pair counts, hand-computed") {
    // word freqs: fast=3, slow=7, the=1, big=3, w1..w29=2 each, w30=1, zz=1.
    // pair "w1" = w1(2) + w10..w19(2 each) = 22; "w2" = w2(2) + w20..w29 = 22;
    // slow's sl/lo/ow = 7; fast's fa/as/st = 3; big's bi/ig = 3; th/he = 1;
    // "w3" = w3(2) + w30(1) = 3. Top-20 tie-break is (n_occ desc, pair asc),
    // so the trailing freq-2 digit pairs admit "10".."18" and cut "19".
    val got = operators.TextAnalytics.qBpeMergePairs.run(spark, fixtureDir)
      .as[(String, Long)].collect().toSeq
    val expected = Seq(
      "w1" -> 22L, "w2" -> 22L,
      "lo" -> 7L, "ow" -> 7L, "sl" -> 7L,
      "as" -> 3L, "bi" -> 3L, "fa" -> 3L, "ig" -> 3L, "st" -> 3L, "w3" -> 3L) ++
      (10 to 18).map(d => d.toString -> 2L)
    assert(got === expected)
  }

  test("bpe train: the Sennrich worked example reproduces its merge table") {
    // the canonical BPE corpus (Sennrich et al. 2016 §3.2): low×5,
    // lower×2, newest×6, widest×3. Hand-derived 8-round merge table with
    // the pinned (count desc, left asc, right asc) tie-break:
    //   1 (e,s,9)   es from newest 6 + widest 3
    //   2 (es,t,9)  the new symbol immediately re-merges with t
    //   3 (l,o,7)   lo vs ow tie at 7 -> left asc picks l
    //   4 (lo,w,7)
    //   5 (e,w,6)   ew/ne/w-est tie at 6 -> "e" < "n" < "w"
    //   6 (ew,est,6)  "ew" < "n"
    //   7 (n,ewest,6)
    //   8 (d,est,3) d-est/id/wi tie at 3 -> "d" < "i" < "w"
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    words.zipWithIndex.map { case (w, i) =>
      (i.toLong, w, "en", "srcX", w.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = operators.TextAnalytics.qBpeTrain.run(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L),
      (3L, "l", "o", 7L), (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L), (6L, "ew", "est", 6L),
      (7L, "n", "ewest", 6L), (8L, "d", "est", 3L)))
  }

  test("bpe train: double-pass rewrite merges shared-boundary runs greedily") {
    // "ababab" spelled a b a b a b with merge (a,b): greedy left-to-right
    // must yield ab ab ab — the single-pass replace misses every second
    // occurrence (shared boundary space), the documented second pass
    // catches them; and "aaa" with (a,a) must yield aa a, never a aa
    val words = Seq.fill(9)("ababab") ++ Seq.fill(2)("aaa")
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe2").toString
    words.zipWithIndex.map { case (w, i) =>
      (i.toLong, w, "en", "srcX", w.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = operators.TextAnalytics.qBpeTrain.run(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    // round 1: pairs ab×3·9=27, ba×2·9=18, aa×2·2=4 -> (a,b,27)
    // round 2: vocab ab ab ab ×9, aaa -> a a a ×2 (untouched):
    //   pairs (ab,ab)×2·9=18, (a,a)×2·2=4 -> (ab,ab,18)
    // round 3: abab ab ×9 (greedy LTR pairing!), a a a:
    //   pairs (abab,ab)=9, (a,a)=4 -> (abab,ab,9)
    // round 4: ababab×9 exhausted; aaa: (a,a,4)
    // round 5: aa a ×2 (greedy, never a aa): (aa,a,2)
    // round 6: both words are single symbols -> no pairs, trainer stops
    assert(got === Seq(
      (1L, "a", "b", 27L), (2L, "ab", "ab", 18L),
      (3L, "abab", "ab", 9L), (4L, "a", "a", 4L),
      (5L, "aa", "a", 2L)))
  }

  test("bpe vocab sweep: tier economics hand-traced; tier 0 is the char census") {
    // 40 docs of "abcd abcd abcd": merge 1 = (a,b), 2 = (ab,c),
    // 3 = (abc,d); the trainer stops at 3 (single-symbol words), so
    // tiers 4 and 8 coincide with the full table — the sweep reads:
    //   k=0: 4 syms/word; k=2: "abc d" = 2; k=4,8: "abcd" = 1
    val dir = java.nio.file.Files.createTempDirectory("graft-bpesw").toString
    val text = "abcd abcd abcd"
    (0 until 40)
      .map(i => (i.toLong, text, "en", "s0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = operators.TextAnalytics.qBpeVocabSweep.run(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])]
      .collect().toSeq
    val w = 120L // words
    assert(got.map(r => (r._1, r._4, r._5)) === Seq(
      (0L, 4 * w, 4.0), (2L, 2 * w, 2.0), (4L, w, 1.0), (8L, w, 1.0)))
    assert(got.forall(r => r._2 === w && r._3 === 4 * w))
    // marginal column: NULL at the baseline, then (480-240)/2, (240-120)/2, 0/4
    assert(got.map(_._7) ===
      Seq(None, Some(120.0), Some(60.0), Some(0.0)))

    // real corpus: monotone non-increasing token counts; tier 0 IS the
    // character census; fertility never increases with more merges
    val real = operators.TextAnalytics.qBpeVocabSweep
      .run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])]
      .collect().toSeq
    assert(real.map(_._1) ===
      operators.TextAnalytics.BpeSweepTiers.map(_.toLong))
    assert(real.head._4 === real.head._3)
    assert(real.map(_._4).sliding(2).forall { case Seq(a, b) => b <= a })
    assert(real.map(_._5).sliding(2).forall { case Seq(a, b) => b <= a })
    assert(real.last._4 < real.head._4, "merges bought nothing at sf0.001")
  }

  test("bpe memo: rewriting the corpus at the SAME path retrains (no stale table)") {
    // the round-16 advice's footgun: the memo was keyed by (session, dir),
    // so overwriting a fixed path (ScaleRehearsal's /tmp rehearsal dirs)
    // silently served the previous corpus's merge table. The key now
    // carries a content fingerprint (file count, bytes, max mtime) — the
    // second training below MUST see the new corpus.
    val dir = java.nio.file.Files.createTempDirectory("graft-bpememo").toString
    def write(words: Seq[String]): Unit = {
      val fs = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/documents.parquet"), true)
      words.zipWithIndex.map { case (w, i) =>
        (i.toLong, w, "en", "srcX", w.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
    }
    write(Seq.fill(5)("low") ++ Seq.fill(2)("lower"))
    val first = operators.TextAnalytics.qBpeTrain.run(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(first.head === ((1L, "l", "o", 7L)))
    // same path, different corpus — and re-ask twice: the retrained
    // table must ALSO be memoized (second read hits the new entry)
    write(Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    val second = operators.TextAnalytics.qBpeTrain.run(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(second.head === ((1L, "e", "s", 9L)), "stale merge table served")
    assert(second !== first)
    val third = operators.TextAnalytics.qBpeTrain.run(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(third === second)
  }

  test("lang confusion: diagonal mass equals q_lang_id accuracy") {
    val conf = Queries.byName("q_lang_confusion")
      .run(spark, "/root/testdata/sf0.001")
      .select($"n_actual", $"tp").as[(Long, Long)].collect()
    val preds = Queries.byName("q_lang_id").run(spark, "/root/testdata/sf0.001")
      .select($"correct").as[Boolean].collect()
    assert(conf.map(_._1).sum === preds.length.toLong)
    assert(conf.map(_._2).sum === preds.count(identity).toLong)
  }
}
