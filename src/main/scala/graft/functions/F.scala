package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The library's user-facing Column-function surface — typed Scala wrappers
  * over every native expression `GraftExtensions` registers, in the style of
  * `org.apache.spark.sql.functions`. A library user composes these into
  * their own DataFrames without knowing the registered SQL names:
  *
  * {{{
  *   import graft.functions.F._
  *   docs.select($"id", sentimentScore($"body"), simhash32($"body"))
  * }}}
  *
  * Requires the session to be built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object F {

  /** Lexicon-average sentiment in [-1, 1] (native codegen; see
    * [[SentimentScore]]). */
  def sentimentScore(text: Column): Column =
    call_function("sentiment_score", text)

  /** VADER-faithful compound score (negation/boosters/caps/punctuation,
    * s/√(s²+15), 4 dp; see [[Vader]]). */
  def vaderScore(text: Column): Column =
    call_function("vader_score", text)

  /** 32-bit tf-weighted SimHash signature, one map-side pass per row. */
  def simhash32(text: Column): Column =
    call_function("simhash32", text)

  /** 16-bit average perceptual hash of a payload's code-point stream —
    * map-side media near-dup signature (see [[ArrayOps.ahash16]]). */
  def ahash16(text: Column): Column =
    call_function("ahash16", text)

  /** Upper-triangle outer-product stream (i, j, p) of a float vector —
    * the map-side Gram/covariance feed (see [[ArrayOps.upperProducts]]). */
  def upperProducts(vec: Column): Column =
    call_function("upper_products", vec)

  /** Distinct lowercase word n-gram shingles of a text. */
  def wordShingles(text: Column, n: Int): Column =
    call_function("word_shingles", text, lit(n))

  /** Every sliding word n-gram in position order, repeats kept — the
    * positional span stream for exact-substring dedup (array index = start
    * token offset). */
  def wordShinglesAll(text: Column, n: Int): Column =
    call_function("word_shingles_all", text, lit(n))

  /** Non-overlapping in-order n-token chunks of a text (context chunking;
    * includes the trailing partial chunk so reassembly is lossless). */
  def wordChunks(text: Column, n: Int): Column =
    call_function("word_chunks", text, lit(n))

  /** MinHash LSH band keys: k hashes in one pass, banded every `bandRows`. */
  def minhashBands(shingles: Column, k: Int, bandRows: Int): Column =
    call_function("minhash_bands", shingles, lit(k), lit(bandRows))

  /** Morton/Z-order interleave of two bigint dimensions (low 21 bits each)
    * — the sort key for multi-dimensional data layout. */
  def zorder2(x: Column, y: Column): Column =
    call_function("zorder2", x, y)

  /** Symmetric-int8 quantization round-trip stats of an array&lt;float&gt;:
    * struct(max_abs, errs). */
  def q8Stats(vec: Column): Column =
    call_function("q8_stats", vec)

  /** Exact-decimal dot product of two array&lt;float&gt; columns
    * (order-independent — safe for oracle-grade comparisons). */
  def dotF32(a: Column, b: Column): Column =
    call_function("dot_f32", a, b)

  /** Plain-double dot product — the fast prefilter twin of [[dotF32]]. */
  def dotF32Fast(a: Column, b: Column): Column =
    call_function("dot_f32_fast", a, b)

  /** Exact-decimal squared L2 distance from an array&lt;float&gt; vector to
    * an array&lt;double&gt; centroid. */
  def dist2F32F64(v: Column, centroid: Column): Column =
    call_function("dist2_f32_f64", v, centroid)

  /** Plain-double squared L2 distance — the fast ranking/prefilter twin of
    * [[dist2F32F64]]. */
  def dist2F32F64Fast(v: Column, centroid: Column): Column =
    call_function("dist2_f32_f64_fast", v, centroid)

  /** Sign-LSH bucket id of an embedding under `nPlanes` deterministic
    * hyperplanes. */
  def lshBucket(embedding: Column, nPlanes: Int = 8): Column =
    call_function("lsh_bucket", embedding, lit(nPlanes))

  /** One-pass repetition counters: [n_tokens, distinct_tokens,
    * top_token_count, n_2grams, distinct_2grams, top_2gram_count]. */
  def repStats(text: Column): Column =
    call_function("rep_stats", text)

  /** Mean Unicode code point, 6 dp (the media "brightness" semantic). */
  def meanCodepoint(text: Column): Column =
    call_function("mean_codepoint", text)

  /** MLlib-Tokenizer-equivalent tokens (lowercase whitespace split). */
  def tokens(text: Column): Column = Text.tokens(text)

  /** Drop MLlib's 181 default English stopwords, preserving duplicates and
    * order. */
  def withoutStopwords(toks: Column): Column = Text.withoutStopwords(toks)
}
