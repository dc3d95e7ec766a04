package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embedded sentiment lexicon + relational scorer.
  *
  * The reference scores posts with the VADER compound score through a Python
  * UDF (reference reddit_consumer.py:87-99). NLTK's lexicon is not available
  * offline, so the engine's *defined* semantic is a lexicon join: tokenize,
  * join tokens against a (term, valence) table, score = sum(valence)/n_tokens
  * — a pure relational formulation that is exactly reproducible in the DuckDB
  * oracle (the VALUES clause below is generated from the same Seq, so Spark
  * and oracle can never drift). No explicit clamp is applied or needed: with
  * per-term |valence| ≤ 0.75 the per-token mean is bounded by [-0.75, 0.75]
  * by construction. The VADER-faithful tier (graft.functions.Vader) is the
  * one that clamps, per the published algorithm.
  *
  * Valences are tuned to the driver testdata's 31-word vocabulary so scores
  * are non-trivial; unknown terms contribute 0 like VADER's neutral words.
  */
object SentimentLexicon {

  /** (term, valence) — valence in [-1, 1], exactly representable decimals. */
  val entries: Seq[(String, Double)] = Seq(
    "fast"   ->  0.75,
    "slow"   -> -0.75,
    "big"    ->  0.25,
    "small"  -> -0.25,
    "spark"  ->  0.5,
    "value"  ->  0.5,
    "merge"  ->  0.25,
    "join"   ->  0.25,
    "dup"    -> -0.5,
    "scan"   -> -0.25,
    "sort"   -> -0.125,
    "stream" ->  0.375,
    "data"   ->  0.25,
    "hash"   ->  0.125,
    "key"    ->  0.125,
    "group"  ->  0.125,
    "filter" -> -0.125,
    "batch"  ->  0.125,
    "window" ->  0.125,
    "query"  ->  0.25
  )

  /** Lexicon as a DataFrame (term string, valence double). Tiny (20 rows) —
    * any join against it broadcasts. */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("term", "valence")
  }

  /** The same lexicon as a DuckDB/ANSI VALUES relation named `lex(term,
    * valence)`; interpolate into oracle SQL with `FROM $valuesSql`. */
  def valuesSql: String =
    entries
      .map { case (t, v) => s"('$t', $v)" }
      .mkString("(VALUES ", ", ", ") AS lex(term, valence)")
}
