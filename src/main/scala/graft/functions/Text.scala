package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the cleaning / sentiment / TF-IDF / dedup
  * operators.
  *
  * Tokenization follows MLlib `Tokenizer` (lowercase + whitespace split —
  * reference reddit_consumer.py:183-184) with ONE deliberate deviation:
  * the split pattern is `\s+` (runs of whitespace = one delimiter, never
  * an empty token) where MLlib splits on single `\s` and so emits empty
  * tokens between consecutive whitespace ("a  b" → ["a", "", "b"] in
  * MLlib; ["a", "b"] here). The empty tokens are an MLlib wart — they
  * survive StopWordsRemover ("" is not a stopword) and pollute TF and
  * token counts — so this library pins the cleaner semantics, identical
  * on single-spaced text, and TextFunctionsSpec fixes the "a  b" case.
  * The DuckDB oracle twin is
  * `string_split_regex(lower(text), '[[:space:]]+')` — POSIX `[[:space:]]`
  * is exactly Java's `\s` (both include vertical tab, unlike RE2's `\s`),
  * so Spark and oracle tokenize identically on ANY corpus, not just the
  * driver's lowercase single-spaced one.
  */
object Text {

  /** Whitespace-run tokens (MLlib Tokenizer minus its empty-token wart —
    * see the object doc above for the pinned deviation). */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** MLlib `StopWordsRemover`'s default English stopword list (181 words),
    * loaded from the exact resource MLlib ships — the list the reference
    * applies (reddit_consumer.py:186-187, StopWordsRemover with defaults).
    * Static, so it inlines into the DuckDB oracle via [[stopwordsSqlList]]
    * (apostrophe-bearing entries like "isn't" are SQL-escaped). */
  val stopwords: Seq[String] =
    org.apache.spark.ml.feature.StopWordsRemover.loadDefaultStopWords("english").toSeq

  def stopwordsSqlList: String =
    stopwords.map(w => "'" + w.replace("'", "''") + "'").mkString("(", ", ", ")")

  /** Remove stopwords with a higher-order function (no shuffle; preserves
    * duplicates and order, matching MLlib StopWordsRemover — `array_except`
    * would dedup and silently break term frequencies). */
  def withoutStopwords(toks: Column): Column =
    filter(toks, t => !t.isin(stopwords: _*))

  /** Reference-style regex reference extraction (reddit_consumer.py:400-407):
    * counts of pattern matches per document. Patterns generalized onto the
    * driver vocabulary (`/u/..`, `/r/..`, URLs do not occur in the synthetic
    * corpus). Java and RE2 agree on these constructs. */
  val userRefPattern = "\\bs\\w+" // scan slow small sort spark stream ...
  val subRefPattern  = "\\bb\\w+" // batch big
  val urlRefPattern  = "\\w+er\\b" // customer filter order ...

  def refCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))
}
