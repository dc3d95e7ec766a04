package graft

import graft.functions.F
import org.apache.spark.sql.functions._

/** The user-facing Column-function facade: every wrapper resolves against
  * the registered native expression and returns the same values the SQL
  * names do. */
class FSpec extends SparkSpec {
  import spark.implicits._

  test("every F wrapper matches its registered SQL twin") {
    val df = Seq(("fast fast slow", Array(1f, 2f), Array(0.5, 0.5), 3L, 5L))
      .toDF("t", "v", "c", "x", "y")
    val viaF = df.select(
      F.sentimentScore($"t"), F.vaderScore($"t"), F.simhash32($"t"), F.ahash16($"t"),
      F.wordShingles($"t", 2), F.minhashBands(F.wordShingles($"t", 2), 12, 3),
      F.dotF32($"v", $"v"), F.dotF32Fast($"v", $"v"),
      F.dist2F32F64($"v", $"c"), F.dist2F32F64Fast($"v", $"c"),
      F.lshBucket($"v"), F.repStats($"t"), F.meanCodepoint($"t"),
      F.wordShinglesAll($"t", 2), F.wordChunks($"t", 2),
      F.zorder2($"x", $"y"), F.q8Stats($"v"),
      F.tokens($"t"), F.withoutStopwords(F.tokens($"t"))).collect()(0)
    val viaSql = df.selectExpr(
      "sentiment_score(t)", "vader_score(t)", "simhash32(t)", "ahash16(t)",
      "word_shingles(t, 2)", "minhash_bands(word_shingles(t, 2), 12, 3)",
      "dot_f32(v, v)", "dot_f32_fast(v, v)",
      "dist2_f32_f64(v, c)", "dist2_f32_f64_fast(v, c)",
      "lsh_bucket(v, 8)", "rep_stats(t)", "mean_codepoint(t)",
      "word_shingles_all(t, 2)", "word_chunks(t, 2)",
      "zorder2(x, y)", "q8_stats(v)",
      "split(lower(t), '\\\\s+')", "filter(split(lower(t), '\\\\s+'), x -> true)")
      .collect()(0)
    for (i <- 0 until 17)
      assert(viaF.get(i) === viaSql.get(i), s"wrapper $i diverges")
    // the positional span stream keeps the in-document repeat
    assert(viaF.getSeq[String](13) === Seq("fast fast", "fast slow"))
    // tokens + stopword removal behave (no stopwords in the fixture text)
    assert(viaF.getSeq[String](17) === Seq("fast", "fast", "slow"))
    assert(viaF.getSeq[String](18) === Seq("fast", "fast", "slow"))
  }
}
