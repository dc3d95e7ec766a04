package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.{Det, SentimentLexicon, Text}
import graft.functions.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's per-batch text pipeline (SURVEY.md §2.2, §2.8, §2.10),
  * generalized onto the `documents` table, plus the training-data-pipeline
  * text analysis operators (quality scoring, token counting, language id,
  * fingerprinting).
  *
  * Reference semantics reproduced:
  *  - P1 JSON parse + flatten (reddit_consumer.py:296-299) — including
  *    PERMISSIVE null-on-malformed behavior;
  *  - P2 cleaning filter (reddit_consumer.py:300-305) incl. keepalive drop;
  *  - P3 derived columns (created_utc cast, text_length, sentiment);
  *  - F5/F6 regex reference extraction + counts (reddit_consumer.py:400-407);
  *  - A3/A5/A6 per-group stats and totals (reddit_consumer.py:375-384,
  *    410-420);
  *  - U1 sentiment scorer as a relational lexicon join (see
  *    SentimentLexicon).
  */
object TextAnalytics {

  /** The wire-format schema of the reference producer
    * (reddit_producer.py:79-86). */
  val postSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("subreddit", StringType),
    StructField("id", StringType),
    StructField("text", StringType),
    StructField("created_utc", DoubleType),
    StructField("author", StringType)))

  /** Manufacture the reference's newline-JSON wire format from `documents`
    * (FIXTURES.md §3 mapping), plus a keepalive and a malformed line to
    * exercise PERMISSIVE parsing. */
  def jsonLines(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(to_json(struct(
        lit("submission").as("type"),
        $"lang".as("subreddit"),
        $"doc_id".cast(StringType).as("id"),
        $"text",
        (lit(1.7e9) + $"doc_id" * lit(1.5)).as("created_utc"),
        $"source".as("author"))).as("value"))
      .unionByName(Seq(
        """{"type": "keepalive", "timestamp": 1700000001.23}""",
        """this is not valid json {{{""",
        """{"type": "submission", "subreddit": "x", "id": "short", "text": "tiny", "created_utc": 1.0, "author": "a"}"""
      ).toDF("value"))
  }

  /** P1+P2: parse the wire JSON and apply the cleaning filter — the ONE
    * definition shared by the batch query (q_parse_clean) and the streaming
    * pipeline (MicroBatchPipeline.parseBatch), so the cleaning rule can
    * never desynchronize between the oracle-checked batch path and the
    * per-batch streaming path (reference reddit_consumer.py:296-308). */
  def parseClean(lines: DataFrame): DataFrame = {
    import lines.sparkSession.implicits._
    lines
      .select(from_json($"value", postSchema).as("data"))
      .select($"data.*")
      .filter($"text".isNotNull && $"text" =!= "" &&
        length($"text") > 10 && $"type" =!= "keepalive")
  }

  /** P1+P2+P3: parse the wire format, apply the cleaning filter, derive
    * columns. Keepalives/malformed/short rows must all be dropped. */
  val qParseClean = GraftQuery(
    "q_parse_clean",
    (spark, dir) => {
      import spark.implicits._
      parseClean(jsonLines(spark, dir))
        .select(
          $"id".cast(LongType).as("doc_id"),
          $"subreddit",
          $"author",
          length($"text").cast(LongType).as("text_length"),
          unix_micros($"created_utc".cast(TimestampType)).as("created_us"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, lang AS subreddit, source AS author,
        length(text)::BIGINT AS text_length,
        CAST((1700000000 + doc_id * 1.5) * 1000000 AS BIGINT) AS created_us
      FROM documents
      WHERE text IS NOT NULL AND text <> '' AND length(text) > 10
      ORDER BY doc_id""")
  )

  /** A3 exact variant: per-group stats with exact distinct count. */
  val qSubredditStats = GraftQuery(
    "q_subreddit_stats",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("post_count"),
          countDistinct($"source").as("unique_sources"),
          davg($"n_chars").as("avg_chars"))
        .orderBy($"post_count".desc, $"lang")
    },
    Some(s"""
      SELECT lang, count(*) AS post_count,
        count(DISTINCT source) AS unique_sources,
        ${Oracle.davg("n_chars")} AS avg_chars
      FROM documents
      GROUP BY lang
      ORDER BY post_count DESC, lang""")
  )

  /** A4: approx_count_distinct (HLL++) with a tolerance audit — the sketch
    * estimate itself is engine-specific (hash-seeded), so instead of emitting
    * it raw (rows-only check) the query computes BOTH the sketch and the exact
    * distinct in one aggregate and emits the exact value plus a pass flag
    * `approx_ok = |hll − exact| ≤ 3·rsd·exact` (rsd = 0.05, the Spark
    * default). The DuckDB oracle reproduces the exact columns and asserts the
    * flag is 1 — so a drifting sketch now FAILS the hash compare instead of
    * being skipped. The raw sketch-only aggregation (the 100 TB scale path:
    * map-side-mergeable, no exact-distinct shuffle) is one
    * `approx_count_distinct` select away; this query is its calibration
    * audit, same pattern as q_minhash_estimate / q_ivf_recall_audit. */
  val qSubredditStatsApprox = GraftQuery(
    "q_subreddit_stats_approx",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("post_count"),
          countDistinct($"source").as("unique_sources"),
          approx_count_distinct($"source").as("hll"),
          davg($"n_chars").as("avg_chars"))
        .select($"lang", $"post_count", $"unique_sources", $"avg_chars",
          // tolerance floored at 1: for groups with ≤ 6 distinct sources
          // 3·rsd·exact < 1, and a single-unit HLL deviation (possible on
          // unlucky register collisions) would fail a bound that cannot
          // even express it — the audit stays meaningful, never brittle
          when(abs($"hll" - $"unique_sources").cast(DoubleType)
            <= greatest(lit(1.0),
              lit(3.0 * 0.05) * $"unique_sources".cast(DoubleType)), 1L)
            .otherwise(0L).as("approx_ok"))
        .orderBy($"post_count".desc, $"lang")
    },
    Some(s"""
      SELECT lang, count(*) AS post_count,
        count(DISTINCT source) AS unique_sources,
        ${Oracle.davg("n_chars")} AS avg_chars,
        1::BIGINT AS approx_ok
      FROM documents
      GROUP BY lang
      ORDER BY post_count DESC, lang""")
  )

  /** F5/F6 per doc: regex reference counts (patterns generalized onto the
    * driver vocabulary; /u/ /r/ URLs do not occur in the synthetic corpus). */
  val qRefsByDoc = GraftQuery(
    "q_refs_by_doc",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select(
          $"doc_id",
          Text.refCount($"text", Text.userRefPattern).cast(LongType).as("user_refs"),
          Text.refCount($"text", Text.subRefPattern).cast(LongType).as("sub_refs"),
          Text.refCount($"text", Text.urlRefPattern).cast(LongType).as("url_refs"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
        len(regexp_extract_all(text, '\bs\w+'))::BIGINT AS user_refs,
        len(regexp_extract_all(text, '\bb\w+'))::BIGINT AS sub_refs,
        len(regexp_extract_all(text, '\w+er\b'))::BIGINT AS url_refs
      FROM documents
      ORDER BY doc_id""")
  )

  /** A5: per-group reference totals over the per-doc counts. */
  val qRefsTotals = GraftQuery(
    "q_refs_totals",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select(
          $"lang",
          Text.refCount($"text", Text.userRefPattern).cast(LongType).as("u"),
          Text.refCount($"text", Text.subRefPattern).cast(LongType).as("s"),
          Text.refCount($"text", Text.urlRefPattern).cast(LongType).as("l"))
        .groupBy($"lang")
        .agg(sum($"u").as("total_user_refs"), sum($"s").as("total_sub_refs"),
          sum($"l").as("total_url_refs"))
        .orderBy($"lang")
    },
    Some("""
      SELECT lang,
        sum(len(regexp_extract_all(text, '\bs\w+')))::BIGINT AS total_user_refs,
        sum(len(regexp_extract_all(text, '\bb\w+')))::BIGINT AS total_sub_refs,
        sum(len(regexp_extract_all(text, '\w+er\b')))::BIGINT AS total_url_refs
      FROM documents
      GROUP BY lang
      ORDER BY lang""")
  )

  /** A6: two-level re-aggregation to a single global row. */
  val qRefsGlobal = GraftQuery(
    "q_refs_global",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select(
          Text.refCount($"text", Text.userRefPattern).cast(LongType).as("u"),
          Text.refCount($"text", Text.subRefPattern).cast(LongType).as("s"),
          Text.refCount($"text", Text.urlRefPattern).cast(LongType).as("l"))
        .agg(sum($"u").as("total_user_refs"), sum($"s").as("total_sub_refs"),
          sum($"l").as("total_url_refs"))
    },
    Some("""
      SELECT
        sum(len(regexp_extract_all(text, '\bs\w+')))::BIGINT AS total_user_refs,
        sum(len(regexp_extract_all(text, '\bb\w+')))::BIGINT AS total_sub_refs,
        sum(len(regexp_extract_all(text, '\w+er\b')))::BIGINT AS total_url_refs
      FROM documents""")
  )

  /** Per-doc token rows joined to the embedded lexicon (broadcast). */
  private def docSentiment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", explode(Text.tokens($"text")).as("term"))
      .join(broadcast(SentimentLexicon.df(spark)), Seq("term"), "left")
      .groupBy($"doc_id", $"lang")
      .agg(
        count(lit(1)).as("n_tokens"),
        Det.qround(sum(coalesce($"valence", lit(0.0)).cast(DecimalType(38, Det.Scale)))
          .cast(DoubleType) / count(lit(1))).as("sentiment"))
  }

  private val docSentimentSql = s"""
    SELECT t.doc_id, count(*) AS n_tokens,
      floor((sum(CAST(coalesce(lex.valence, 0.0) AS DECIMAL(38,9)))::DOUBLE)
            / count(*) * 1000000.0 + 0.5) / 1000000.0 AS sentiment
    FROM (SELECT doc_id, lang, unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
          FROM documents) t
    LEFT JOIN ${SentimentLexicon.valuesSql} ON t.term = lex.term
    GROUP BY t.doc_id"""

  /** U1 tier (a): relational lexicon sentiment per document. */
  val qSentimentDocs = GraftQuery(
    "q_sentiment_docs",
    (spark, dir) => {
      import spark.implicits._
      docSentiment(spark, dir)
        .select($"doc_id", $"n_tokens", $"sentiment")
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, n_tokens, sentiment FROM ($docSentimentSql)
      ORDER BY doc_id""")
  )

  /** Reference's per-batch avg-sentiment metric (reddit_consumer.py:356),
    * grouped by lang instead of one global batch row. Per-doc sentiment is
    * already rounded to 6dp => exactly decimal-representable => the re-agg
    * stays order-independent. */
  val qAvgSentimentByLang = GraftQuery(
    "q_avg_sentiment_by_lang",
    (spark, dir) => {
      import spark.implicits._
      docSentiment(spark, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), davg($"sentiment").as("average_sentiment"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH ds AS (
        SELECT t.doc_id, any_value(t.lang) AS lang,
          floor((sum(CAST(coalesce(lex.valence, 0.0) AS DECIMAL(38,9)))::DOUBLE)
                / count(*) * 1000000.0 + 0.5) / 1000000.0 AS sentiment
        FROM (SELECT doc_id, lang, unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
              FROM documents) t
        LEFT JOIN ${SentimentLexicon.valuesSql} ON t.term = lex.term
        GROUP BY t.doc_id)
      SELECT lang, count(*) AS n_docs,
        ${Oracle.davg("sentiment")} AS average_sentiment
      FROM ds GROUP BY lang ORDER BY lang""")
  )

  /** U1 through the native codegen expression (graft.functions.SentimentScore,
    * installed by GraftExtensions): same defined semantics as the relational
    * scorer, zero join — the per-row fast path a 100 TB scoring pass wants. */
  val qSentimentExpr = GraftQuery(
    "q_sentiment_expr",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id", expr("sentiment_score(text)").as("sentiment"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT t.doc_id,
        floor((sum(CAST(coalesce(lex.valence, 0.0) AS DECIMAL(38,9)))::DOUBLE)
              / count(*) * 1000000.0 + 0.5) / 1000000.0 AS sentiment
      FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
            FROM documents) t
      LEFT JOIN ${SentimentLexicon.valuesSql} ON t.term = lex.term
      GROUP BY t.doc_id
      ORDER BY t.doc_id""")
  )

  /** U1 tier (b): the VADER-faithful compound score (graft.functions.Vader —
    * negation window, boosters, caps/punctuation emphasis, s/√(s²+15)
    * normalization per the published algorithm, over the embedded lexicon).
    * The compound itself is per-row double arithmetic the SQL oracle cannot
    * reproduce, so the verified output is the bounded contract instead: one
    * row per document (coverage — same row set as q_sentiment_docs) with
    * `vader_in_range = (compound IS NOT NULL AND −1 ≤ compound ≤ 1)`, which
    * the normalization s/√(s²+15) guarantees. A NaN/null/out-of-range score
    * now FAILS the hash compare instead of being skipped; the exact compound
    * values are pinned by VaderSpec's hand-computed fixtures. */
  val qSentimentVader = GraftQuery(
    "q_sentiment_vader",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id", expr("vader_score(text)").as("c"))
        .select($"doc_id",
          when($"c".isNotNull && $"c" >= -1.0 && $"c" <= 1.0, 1L)
            .otherwise(0L).as("vader_in_range"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, 1::BIGINT AS vader_in_range
      FROM documents
      ORDER BY doc_id""")
  )

  /** Token counting: whitespace tokens, regex word tokens, distinct tokens. */
  val qTokenStats = GraftQuery(
    "q_token_stats",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select(
          $"doc_id",
          size(Text.tokens($"text")).cast(LongType).as("n_tokens"),
          size(regexp_extract_all($"text", lit("[a-z0-9]+"), lit(0)))
            .cast(LongType).as("n_word_tokens"),
          size(array_distinct(Text.tokens($"text"))).cast(LongType).as("n_distinct"),
          size(Text.withoutStopwords(array_distinct(Text.tokens($"text"))))
            .cast(LongType).as("n_content"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id,
        len(string_split_regex(lower(text), '[[:space:]]+'))::BIGINT AS n_tokens,
        len(regexp_extract_all(text, '[a-z0-9]+'))::BIGINT AS n_word_tokens,
        len(list_distinct(string_split_regex(lower(text), '[[:space:]]+')))::BIGINT AS n_distinct,
        len(list_filter(list_distinct(string_split_regex(lower(text), '[[:space:]]+')),
            w -> w NOT IN ${Text.stopwordsSqlList}))::BIGINT AS n_content
      FROM documents
      ORDER BY doc_id""")
  )

  /** GPT-2-style byte-pair pretokenizer regex, lookahead-free so it means
    * the same thing under Java regex (Spark) and RE2 (DuckDB): contraction
    * suffixes, optional-space letter runs, optional-space digit runs,
    * optional-space punctuation runs, residual whitespace runs. Both
    * engines use leftmost-first alternation, so the token boundaries
    * agree. (The original GPT-2 pattern's `\s+(?!\S)` needs negative
    * lookahead, which RE2 rejects — the residual `\s+` branch differs
    * from it only in how interior whitespace RUNS are grouped, which
    * shifts no letter/digit/punct boundary.) */
  private val BpePretokenRegex =
    """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

  /** Token counting the way an LLM data pipeline bills it: BPE-pretokenizer
    * segments (the unit BPE merges operate on) next to whitespace tokens,
    * with per-doc fertility (pretokens per whitespace token). Map-only —
    * one regex pass per row inside whole-stage codegen; the corpus total is
    * `sum(n_bpe_tokens)` downstream. */
  val qBpeTokens = GraftQuery(
    "q_bpe_tokens",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select(
          $"doc_id",
          size(regexp_extract_all($"text", lit(BpePretokenRegex), lit(0)))
            .cast(LongType).as("n_bpe_tokens"),
          size(Text.tokens($"text")).cast(LongType).as("n_ws_tokens"))
        .withColumn("fertility",
          Det.qround($"n_bpe_tokens" / $"n_ws_tokens"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id,
          len(regexp_extract_all(text,
            '${BpePretokenRegex.replace("'", "''")}'))::BIGINT AS n_bpe_tokens,
          len(string_split_regex(lower(text), '[[:space:]]+'))::BIGINT
            AS n_ws_tokens
        FROM documents)
      SELECT doc_id, n_bpe_tokens, n_ws_tokens,
        ${graft.Oracle.qround("n_bpe_tokens * 1.0 / n_ws_tokens")} AS fertility
      FROM t
      ORDER BY doc_id""")
  )

  /** The quality score of a `text` column, rounded to 6 dp — shared by
    * q_quality_score and the composite corpus-prep pipeline. */
  private[graft] def qualityCol: org.apache.spark.sql.Column = {
    val toks = Text.tokens(col("text"))
    val nTok = size(toks).cast(DoubleType)
    val nStop = size(filter(toks, t => t.isin(Text.stopwords: _*))).cast(DoubleType)
    val avgLen = (length(col("text")) - size(toks) + lit(1)).cast(DoubleType) / size(toks)
    Det.qround(
      lit(0.3) * log(lit(1.0) + nTok) +
      lit(0.5) * (lit(1.0) - nStop / nTok) +
      lit(0.2) * least(avgLen / lit(10.0), lit(1.0)))
  }

  /** The same score as DuckDB SQL over a relation exposing `text`. */
  private[graft] def qualitySqlExpr: String = s"""
    floor((0.3 * ln(1.0 + len(string_split_regex(lower(text), '[[:space:]]+')))
      + 0.5 * (1.0 - len(list_filter(string_split_regex(lower(text), '[[:space:]]+'),
          w -> w IN ${Text.stopwordsSqlList}))::DOUBLE / len(string_split_regex(lower(text), '[[:space:]]+')))
      + 0.2 * least(((length(text) - len(string_split_regex(lower(text), '[[:space:]]+')) + 1)::DOUBLE
          / len(string_split_regex(lower(text), '[[:space:]]+'))) / 10.0, 1.0)) * 1000000.0 + 0.5) / 1000000.0"""

  /** Quality scoring for a training-data pipeline: stopword ratio, mean token
    * length, log-length prior — a deterministic combination of the standard
    * heuristics (cf. Gopher/C4 quality rules). */
  val qQualityScore = GraftQuery(
    "q_quality_score",
    (spark, dir) => {
      import spark.implicits._
      val toks = Text.tokens($"text")
      val nTok = size(toks).cast(DoubleType)
      val nStop = size(filter(toks, t => t.isin(Text.stopwords: _*))).cast(DoubleType)
      val avgLen = (length($"text") - size(toks) + lit(1)).cast(DoubleType) / size(toks)
      Tables.documents(spark, dir)
        .select(
          $"doc_id",
          size(toks).cast(LongType).as("n_tokens"),
          Det.qround(nStop / nTok).as("stopword_ratio"),
          Det.qround(avgLen).as("avg_token_len"),
          // the ONE quality definition (shared with q_corpus_prep and
          // q_top_quality_per_lang) — an inlined copy here could silently
          // drift from the others on a weight change
          qualityCol.as("quality"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH q AS (
        SELECT doc_id,
          len(string_split_regex(lower(text), '[[:space:]]+'))::BIGINT AS n_tokens,
          len(list_filter(string_split_regex(lower(text), '[[:space:]]+'),
              w -> w IN ${Text.stopwordsSqlList}))::DOUBLE AS n_stop,
          (length(text) - len(string_split_regex(lower(text), '[[:space:]]+')) + 1)::DOUBLE
            / len(string_split_regex(lower(text), '[[:space:]]+')) AS avg_len
        FROM documents)
      SELECT doc_id, n_tokens,
        floor(n_stop / n_tokens * 1000000.0 + 0.5) / 1000000.0 AS stopword_ratio,
        floor(avg_len * 1000000.0 + 0.5) / 1000000.0 AS avg_token_len,
        floor((0.3 * ln(1.0 + n_tokens) + 0.5 * (1.0 - n_stop / n_tokens)
              + 0.2 * least(avg_len / 10.0, 1.0)) * 1000000.0 + 0.5) / 1000000.0 AS quality
      FROM q
      ORDER BY doc_id""")
  )

  /** Language identification by n-gram profile (Cavnar-Trenkle shape, word
    * unigrams as the n-grams): per language, the top-5 most frequent terms
    * form its profile; a document is classified to the language whose profile
    * overlaps its token set most (ties: lang asc).
    *
    * Fit/transform shape: the profile table is the MODEL — a bounded
    * artifact (langs × 5 terms) produced by one small aggregation — and
    * classification is a map-only pass: each document intersects its
    * distinct-token array with every broadcast profile row in-place
    * (`array_intersect`, codegen), so no corpus-proportional shuffle of
    * (doc, term) rows ever happens. The only per-doc shuffle left is the
    * 1-row-per-doc `min_by` pick (partial-aggregated before the exchange —
    * all of a doc's language rows sit in the same partition). The previous
    * explode→join→groupBy→window formulation shuffled every matched token
    * occurrence — at 100 TB that shuffle IS the job; this one never
    * materializes it. */
  /** Per-document language predictions — shared by [[qLangId]] (which IS
    * this relation ordered) and [[qLangConfusion]] (which aggregates it
    * into the classifier-eval readout). */
  private[graft] def langPredictions(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      val docs = Tables.spread(Tables.documents(spark, dir))
      val profiles = docs
        .select($"lang".as("plang"), explode(Text.tokens($"text")).as("term"))
        .groupBy($"plang", $"term").agg(count(lit(1)).as("freq"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"plang").orderBy($"freq".desc, $"term")))
        .filter($"rk" <= 5)
        .groupBy($"plang").agg(collect_set($"term").as("pterms"))
      docs
        .select($"doc_id", $"lang", array_distinct(Text.tokens($"text")).as("dterms"))
        .crossJoin(broadcast(profiles))
        .select($"doc_id", $"lang", $"plang",
          size(array_intersect($"dterms", $"pterms")).as("overlap"))
        .filter($"overlap" >= 1)  // join parity: no row for zero overlap
        .groupBy($"doc_id", $"lang")
        .agg(min_by($"plang", struct((-$"overlap").as("no"), $"plang".as("p")))
          .as("pred_lang"))
        .select($"doc_id", $"pred_lang", $"lang".as("actual_lang"),
          ($"pred_lang" === $"lang").as("correct"))
  }

  val qLangId = GraftQuery(
    "q_lang_id",
    (spark, dir) => langPredictions(spark, dir).orderBy(col("doc_id")),
    Some(s"""
      WITH $langPredCtes
      SELECT doc_id, pred_lang, actual_lang, correct
      FROM preds
      ORDER BY doc_id""")
  )

  /** Cohen's κ over the language-ID predictions — chance-corrected
    * agreement (Cohen 1960), the companion number to [[qLangConfusion]]'s
    * per-class F1: raw accuracy flatters a classifier on skewed label
    * distributions (predicting the majority class scores high agreement
    * by luck); κ subtracts the agreement the margins alone would produce.
    * The same statistic measures inter-annotator agreement when the two
    * columns are two labelers — the label-quality audit a supervised
    * corpus runs before training on the labels.
    *
    * Exactness: everything is INTEGER until the final divisions —
    * κ = (n·po_num − pe_num) / (n² − pe_num) with po_num = Σ diagonal
    * and pe_num = Σ_class row_margin·col_margin, so po, pe and κ are
    * each one [[graft.functions.Det.qround]]ed quotient of exact longs;
    * the margins-degenerate case (pe = 1) reports null.
    *
    * Scale shape: the corpus collapses once to the ≤|langs|² confusion
    * cells (inside [[langPredictions]]); margins, the margin product and
    * the readout are all cell-table-sized. */
  val qCohensKappa = GraftQuery(
    "q_cohens_kappa",
    (spark, dir) => {
      import spark.implicits._
      val cells = langPredictions(spark, dir)
        .groupBy($"actual_lang", $"pred_lang").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = cells.agg(coalesce(sum($"c"), lit(0L)).as("n"),
        coalesce(sum(when($"actual_lang" === $"pred_lang", $"c")
          .otherwise(0L)), lit(0L)).as("po_num"))
      val r = cells.groupBy($"actual_lang".as("l")).agg(sum($"c").as("ra"))
      val cc = cells.groupBy($"pred_lang".as("l")).agg(sum($"c").as("ca"))
      val pe = r.join(cc, Seq("l"))
        .agg(coalesce(sum($"ra" * $"ca"), lit(0L)).as("pe_num"))
      m.crossJoin(broadcast(pe))
        .select($"n".as("n_docs"),
          when($"n" > 0, Det.qround($"po_num" / $"n")).as("po"),
          when($"n" > 0, Det.qround($"pe_num" / ($"n" * $"n"))).as("pe"),
          when($"n" * $"n" =!= $"pe_num", Det.qround(
            ($"n" * $"po_num" - $"pe_num") / ($"n" * $"n" - $"pe_num")))
            .as("kappa"))
        .orderBy($"n_docs")
    },
    Some(s"""
      WITH $langPredCtes,
      cells AS (
        SELECT actual_lang AS a, pred_lang AS p, count(*)::BIGINT AS c
        FROM preds GROUP BY 1, 2),
      m AS (
        SELECT coalesce(sum(c), 0)::BIGINT AS n,
          coalesce(sum(CASE WHEN a = p THEN c ELSE 0 END), 0)::BIGINT
            AS po_num
        FROM cells),
      r AS (SELECT a AS l, sum(c)::BIGINT AS ra FROM cells GROUP BY 1),
      cc AS (SELECT p AS l, sum(c)::BIGINT AS ca FROM cells GROUP BY 1),
      pe AS (
        SELECT coalesce(sum(ra * ca), 0)::BIGINT AS pe_num
        FROM r JOIN cc USING (l))
      SELECT n AS n_docs,
        CASE WHEN n > 0 THEN ${Oracle.qround("po_num / n")} END AS po,
        CASE WHEN n > 0 THEN ${Oracle.qround("pe_num / (n * n)")} END AS pe,
        CASE WHEN n * n <> pe_num THEN
          ${Oracle.qround("(n * po_num - pe_num) / (n * n - pe_num)")}
        END AS kappa
      FROM m CROSS JOIN pe
      ORDER BY n_docs""")
  )

  /** Oracle CTE block exposing `preds(doc_id, pred_lang, actual_lang,
    * correct)` — shared by [[qLangId]] and [[qLangConfusion]]. */
  private[graft] def langPredCtes: String = """toks AS (
        SELECT doc_id, lang, unnest(list_distinct(string_split_regex(lower(text), '[[:space:]]+'))) AS term
        FROM documents),
      profiles AS (
        SELECT plang, term FROM (
          SELECT lang AS plang, term, count(*) AS freq,
            row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, term) AS rk
          FROM (SELECT lang, unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term FROM documents)
          GROUP BY lang, term)
        WHERE rk <= 5),
      overlap AS (
        SELECT t.doc_id, t.lang, p.plang, count(*) AS overlap
        FROM toks t JOIN profiles p ON t.term = p.term
        GROUP BY t.doc_id, t.lang, p.plang),
      preds AS (
        SELECT doc_id, plang AS pred_lang, lang AS actual_lang,
          (plang = lang) AS correct
        FROM (SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY overlap DESC, plang) AS rn
              FROM overlap)
        WHERE rn = 1)"""

  /** Document fingerprinting: full-text digest + min-shingle digest (the
    * rolling-hash fingerprint family, realized with md5 so Spark and the
    * oracle agree byte-for-byte). */
  val qFingerprint = GraftQuery(
    "q_fingerprint",
    (spark, dir) => {
      import spark.implicits._
      val toks = Text.tokens($"text")
      // spread: the per-token md5 transform is CodegenFallback (interpreted),
      // so its cost must not pin to a single-split scan — same rule as the
      // Dedup/Similarity sketch projections
      Tables.spread(Tables.documents(spark, dir))
        .select(
          $"doc_id",
          md5($"text").as("fp_full"),
          array_min(transform(toks, t => md5(t))).as("fp_min_token"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, md5(text) AS fp_full,
        list_min(list_transform(string_split_regex(lower(text), '[[:space:]]+'), t -> md5(t))) AS fp_min_token
      FROM documents
      ORDER BY doc_id""")
  )

  /** Heavy hitters — the two-pass sketch-then-verify pattern for "top terms
    * without a full-vocabulary shuffle": pass 1 runs Spark's `approx_top_k`
    * (DataSketches frequent-items) as a grouping-less aggregate, whose
    * exchange carries ONE sketch per partition instead of one row per
    * distinct term; pass 2 recounts ONLY the candidate terms (broadcast
    * semi join, so the aggregate's exchange carries ≤ map-side-combined
    * candidate rows) and takes the exact top 20.
    *
    * Oracle contract, stated precisely: maxItemsTracked is pinned at
    * 100,000, and a frequent-items sketch is EXACT while the number of
    * distinct tracked items stays under its capacity — so on any corpus
    * with ≤100k distinct terms the candidates are the true top-100, the
    * recount is exact, and the hash-compare against the plain exact top-20
    * oracle is sound (driver corpora: tens of distinct terms). Beyond
    * capacity the sketch only guarantees no item with frequency ≥ n/cap is
    * missed; near-uniform tails could then rotate ranks near the cut, and
    * this query would have to move to the rows-only tier like the other
    * approximate twins. The 5× candidate superset (100 for a top-20) is
    * margin for exactly that regime, not a proof. */
  val qHeavyHitters = GraftQuery(
    "q_heavy_hitters",
    (spark, dir) => {
      import spark.implicits._
      def toks = Tables.spread(Tables.documents(spark, dir))
        .select(explode(Text.tokens($"text")).as("term"))
      val cand = toks.agg(expr("approx_top_k(term, 100, 100000)").as("sk"))
        .select(explode($"sk").as("c"))
        .select($"c.item".as("term"))
      toks.join(broadcast(cand), Seq("term"), "left_semi")
        .groupBy($"term").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"term")
        .limit(20)
    },
    Some("""
      SELECT term, count(*) AS n
      FROM (SELECT unnest(string_split_regex(lower(text), '[[:space:]]+'))
              AS term FROM documents)
      GROUP BY term
      ORDER BY n DESC, term
      LIMIT 20""")
  )

  /** BPE tokenizer training, first merge step (Sennrich et al. 2016): the
    * corpus-weighted frequency of every adjacent character pair, ranked —
    * the top pair is the first merge a BPE trainer would perform, and the
    * ranking is the merge-candidate table each subsequent iteration
    * re-derives. Counted the way real BPE trainers do: build the WORD
    * FREQUENCY table first (one corpus pass, partial+final on the token),
    * then enumerate each distinct word's adjacent pairs once and weight by
    * the word's corpus frequency — pair occurrences within a word count
    * with multiplicity ("aaa" contributes "aa" twice).
    *
    * Scale shape: the only corpus-proportional work is the token-frequency
    * aggregate; pair enumeration runs over the VOCABULARY (distinct words ×
    * avg word length), the pair aggregate is pair-domain-sized, and the
    * ranked output is a TakeOrderedAndProject top-20. This is why BPE
    * training is feasible on 100 TB corpora at all — iterations touch the
    * word-frequency table, never the raw text again. */
  val qBpeMergePairs = GraftQuery(
    "q_bpe_merge_pairs",
    (spark, dir) => {
      import spark.implicits._
      val words = Tables.spread(Tables.documents(spark, dir))
        .select(explode(Text.tokens($"text")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("freq"))
        .filter(length($"word") >= 2)
      words
        .select($"word", $"freq",
          explode(sequence(lit(1), length($"word") - 1)).as("i"))
        .select($"word".substr($"i", lit(2)).as("pair"), $"freq")
        .groupBy($"pair").agg(sum($"freq").as("n_occ"))
        .orderBy($"n_occ".desc, $"pair")
        .limit(20)
    },
    Some("""
      WITH words AS (
        SELECT word, count(*) AS freq
        FROM (SELECT unnest(string_split_regex(lower(text), '[[:space:]]+'))
                AS word FROM documents)
        GROUP BY word),
      pos AS (
        SELECT word, freq, unnest(range(1, length(word))) AS i
        FROM words WHERE length(word) >= 2)
      SELECT substring(word, i, 2) AS pair, sum(freq)::BIGINT AS n_occ
      FROM pos
      GROUP BY 1
      ORDER BY n_occ DESC, pair
      LIMIT 20""")
  )

  /** Merge rounds for [[qBpeTrain]]. */
  val BpeMerges = 8

  /** Full BPE tokenizer TRAINING (Sennrich et al. 2016) — [[qBpeMergePairs]]
    * computes the first merge candidate table; this runs the actual
    * iterative trainer for [[BpeMerges]] rounds and emits the MERGE TABLE
    * (rank, left symbol, right symbol, weighted pair count) — the artifact
    * a tokenizer ships. Variant pinned exactly: words are whitespace
    * tokens spelled as space-separated character symbols (no end-of-word
    * marker), pair counts are corpus-frequency-weighted with in-word
    * multiplicity, the merge pick is (count desc, left asc, right asc),
    * and a merge rewrites all non-overlapping occurrences left-to-right
    * (realized as a double-pass delimited `replace` — one pass misses
    * every second occurrence of a shared-boundary run like `a b a b`,
    * two passes provably catch all: after pass one no two unmerged
    * occurrences remain adjacent).
    *
    * Scale shape: the ONLY corpus-priced work is the word-frequency
    * aggregate; every round thereafter runs on the VOCABULARY relation
    * (symbolized word, freq) — pair enumeration is vocab × avg word
    * length, the pick is a TakeOrdered(1), and the rewrite is a map pass
    * over the vocab. The 1-row pick is collected and re-enters as a
    * literal (the q_kcenter_select shape: the K merge rows are the one
    * thing held driver-side), and the superseded vocab state unpersists
    * two rounds back — this is why BPE training is feasible at 100 TB:
    * iterations never touch the raw text again. */
  /** Corpus word frequencies (word, freq) — the ONE corpus-priced
    * relation of BPE training, and the ADDITIVE integer relation
    * [[graft.streaming.StreamBpe]] maintains as a per-batch delta log. */
  private[graft] def bpeWordFreqs(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(explode(Text.tokens($"text")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
  }

  /** The trainer over the corpus at `dir` — returns the learned merge
    * table (rank, left, right, weighted count). Shared by [[qBpeTrain]]
    * (which IS the table) and [[qBpeEncode]] (which applies it). All
    * per-round state is released before returning; the K merge rows are
    * the only thing held driver-side (the q_kcenter_select license). */
  private[graft] def bpeLearn(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Long, String, String, Long)] =
    bpeMemo.getOrElseUpdate((dir, bpeCorpusFingerprint(spark, dir)), {
      if (bpeMemo.size >= BpeMemoCap) bpeMemo.clear()
      bpeLearnFrom(bpeWordFreqs(Tables.spread(Tables.documents(spark, dir))))
    })

  /** Cheap content fingerprint of the corpus behind a data dir — ONE
    * recursive FS listing of `documents.parquet`: (file count, total
    * bytes, max mtime). Keys [[bpeMemo]] (round-16 advice): rewriting the
    * corpus at the SAME path (ScaleRehearsal overwrites fixed /tmp
    * rehearsal dirs) changes the fingerprint, so the memo misses instead
    * of serving a stale merge table. */
  private def bpeCorpusFingerprint(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0L, 0L, 0L)
    val it = fs.listFiles(p, true)
    var n = 0L; var bytes = 0L; var mtime = 0L
    while (it.hasNext) {
      val st = it.next()
      n += 1; bytes += st.getLen
      mtime = math.max(mtime, st.getModificationTime)
    }
    (n, bytes, mtime)
  }

  /** Merge-table memo so q_bpe_train / q_bpe_encode / q_bpe_vocab_sweep
    * share ONE trainer run per corpus: in a full bench run the
    * [[BpeMerges]] vocabulary-relation training rounds are paid once, not
    * three times (the clsMemo precedent, verdict r13 item 5). Keyed by
    * (dir, content fingerprint) — NOT by SparkSession (the round-16
    * advice: session keys retained sessions for the JVM lifetime, and a
    * same-path rewrite served a stale table; the value is pure
    * corpus-derived data, so sharing across sessions is sound and
    * staleness is the fingerprint's job). Size-capped: at
    * [[BpeMemoCap]] distinct corpora the map clears (entries are K merge
    * rows each — model-sized — but unbounded key churn, e.g. a rehearsal
    * loop rebuilding tmp dirs, must not grow driver state forever). The
    * memo never holds a DataFrame, so each query's own corpus
    * encode/scan passes stay honest. The streaming reader (StreamBpe →
    * [[bpeLearnFrom]]) is NOT memoized: its folded log grows between
    * readouts. */
  private val BpeMemoCap = 64
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[(String, (Long, Long, Long)),
      Seq[(Long, String, String, Long)]]

  /** The trainer loop over an explicit (word, freq) relation — shared by
    * the batch queries and the streaming maintainer's reader, so a
    * stream-maintained frequency table learns the identical merge
    * table. */
  private[graft] def bpeLearnFrom(wordFreqs: org.apache.spark.sql.DataFrame)
      : Seq[(Long, String, String, Long)] = {
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    var vocab = wordFreqs
      .select(array_join(split($"word", ""), " ").as("ws"), $"freq")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var prev: Option[org.apache.spark.sql.DataFrame] = None
    val merges =
      scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var done = false
    for (r <- 1 to BpeMerges if !done) {
      val syms = vocab.select(split($"ws", " ").as("s"), $"freq")
        .filter(size($"s") >= 2)
      val top = syms
        .select($"s", $"freq",
          explode(sequence(lit(1), size($"s") - 1)).as("i"))
        .select(element_at($"s", $"i").as("a"),
          element_at($"s", $"i" + 1).as("b"), $"freq")
        .groupBy($"a", $"b").agg(sum($"freq").as("n"))
        .orderBy($"n".desc, $"a", $"b").limit(1)
        .as[(String, String, Long)].collect().headOption
      top match {
        case None => done = true
        case Some((a, b, n)) =>
          merges += ((r.toLong, a, b, n))
          val pat = lit(s" $a $b ")
          val rep = lit(s" $a$b ")
          prev.foreach(_.unpersist())
          prev = Some(vocab)
          vocab = vocab.select(
            trim(org.apache.spark.sql.functions.replace(
              org.apache.spark.sql.functions.replace(
                concat(lit(" "), $"ws", lit(" ")), pat, rep),
              pat, rep)).as("ws"), $"freq")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    }
    prev.foreach(_.unpersist())
    vocab.unpersist()
    merges.toSeq
  }

  /** Shared oracle CTE chain for the three BPE queries: v0 (the
    * char-spelled vocabulary), then per round r the pair counts `p$r`,
    * the picked merge `t$r`, and the rewritten vocabulary `v$r`.
    *
    * `t$r` is ALWAYS exactly one row: when `p$r` is empty (the trainer
    * exhausted — every word fully merged before [[BpeMerges]] rounds),
    * the pick degrades to a chr(10) SENTINEL identity merge — a newline
    * can never appear in a symbol (words are split on `[[:space:]]+`),
    * so the ` \\n \\n ` pattern never matches and the round's rewrite,
    * and every downstream encode CROSS JOIN, become no-ops instead of
    * collapsing the whole relation to zero rows (the round-16 advice's
    * latent divergence: an early-stopping corpus emptied the oracle
    * while the Spark side, which mirrors [[bpeLearnFrom]]'s early stop,
    * returned every row). q_bpe_train filters sentinels out via
    * `n IS NOT NULL`, matching the Spark merge list's length. */
  private def bpeRoundsCtes: String = (1 to BpeMerges).map { r =>
    val prev = s"v${r - 1}"
    s"""
      p$r AS (
        SELECT s[i] AS a, s[i + 1] AS b, sum(freq)::BIGINT AS n
        FROM (
          SELECT s, freq, unnest(range(1, len(s))) AS i
          FROM (SELECT string_split(ws, ' ') AS s, freq FROM $prev)
          WHERE len(s) >= 2)
        GROUP BY 1, 2),
      t$r AS (
        SELECT coalesce(p.a, chr(10)) AS a, coalesce(p.b, chr(10)) AS b,
          p.n AS n
        FROM (SELECT 1 AS one) o
        LEFT JOIN (SELECT a, b, n FROM p$r ORDER BY n DESC, a, b LIMIT 1) p
          ON true),
      v$r AS (
        SELECT trim(replace(replace(' ' || ws || ' ',
            ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
            ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ')) AS ws, freq
        FROM $prev CROSS JOIN t$r)"""
  }.mkString(",")

  val qBpeTrain = GraftQuery(
    "q_bpe_train",
    (spark, dir) => {
      import spark.implicits._
      bpeLearn(spark, dir)
        .toDF("merge_rank", "left_sym", "right_sym", "n_occ")
        .orderBy($"merge_rank")
    },
    Some {
      val rows = (1 to BpeMerges).map { r =>
        s"SELECT $r::BIGINT AS merge_rank, a AS left_sym, b AS right_sym, n AS n_occ FROM t$r WHERE n IS NOT NULL"
      }.mkString("\n      UNION ALL ")
      s"""
      WITH v0 AS (
        SELECT array_to_string(string_split(word, ''), ' ') AS ws,
          count(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split_regex(lower(text), '[[:space:]]+'))
                AS word FROM documents)
        GROUP BY 1),$bpeRoundsCtes
      SELECT * FROM (
      $rows)
      ORDER BY merge_rank"""
    }
  )

  /** BPE ENCODING with the learned merge table — the apply side of
    * [[qBpeTrain]], closing the tokenizer loop (train the merges, then
    * measure what they buy on the corpus): every document's words are
    * spelled as character symbols and the [[BpeMerges]] merges rewrite
    * them IN RANK ORDER (the BPE inference rule), yielding per-language
    * token-economy readouts — words, character count, post-merge BPE
    * symbol count, symbols-per-word fertility, and the compression ratio
    * vs raw characters. The multilingual-tokenizer fairness metric at
    * the point where it is actually decided: a language whose fertility
    * stays high after training is under-served by the learned merges.
    *
    * Scale shape: the trainer touches only the vocabulary (see
    * [[bpeLearn]]); encoding is ONE corpus map pass — the K rank-ordered
    * rewrites nest as K literal double-`replace` pairs inside a single
    * projection (whole-stage codegen fuses them; nothing materializes
    * between merges), then one (doc → lang) two-level aggregate. The
    * oracle applies the SAME rank-ordered chain from its unrolled t1..tK
    * CTEs. */
  val qBpeEncode = GraftQuery(
    "q_bpe_encode",
    (spark, dir) => {
      import spark.implicits._
      val merges = bpeLearn(spark, dir)
      val ws0 = concat(lit(" "), array_join(split($"word", ""), " "), lit(" "))
      val encoded = merges.foldLeft(ws0) { case (c, (_, a, b, _)) =>
        val pat = lit(s" $a $b ")
        val rep = lit(s" $a$b ")
        org.apache.spark.sql.functions.replace(
          org.apache.spark.sql.functions.replace(c, pat, rep), pat, rep)
      }
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", $"lang", explode(Text.tokens($"text")).as("word"))
        .select($"doc_id", $"lang", length($"word").as("n_chars"),
          size(split(trim(encoded), " ")).as("n_syms"))
        .groupBy($"doc_id", $"lang")
        .agg(count(lit(1)).as("words"), sum($"n_chars").as("chars"),
          sum($"n_syms").as("syms"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"words").as("n_words"),
          sum($"chars").as("n_chars"), sum($"syms").as("n_bpe_tokens"))
        .select($"lang", $"n_docs", $"n_words", $"n_chars", $"n_bpe_tokens",
          Det.qround($"n_bpe_tokens" / $"n_words").as("fertility"),
          Det.qround($"n_bpe_tokens" / $"n_chars").as("tokens_per_char"))
        .orderBy($"lang")
    },
    Some {
      val enc = (1 to BpeMerges).foldLeft("' ' || ws0 || ' '") { (c, r) =>
        s"""replace(replace($c,
            ' ' || t$r.a || ' ' || t$r.b || ' ', ' ' || t$r.a || t$r.b || ' '),
            ' ' || t$r.a || ' ' || t$r.b || ' ', ' ' || t$r.a || t$r.b || ' ')"""
      }
      val tJoins = (1 to BpeMerges).map(r => s"CROSS JOIN t$r").mkString(" ")
      s"""
      WITH v0 AS (
        SELECT array_to_string(string_split(word, ''), ' ') AS ws,
          count(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split_regex(lower(text), '[[:space:]]+'))
                AS word FROM documents)
        GROUP BY 1),$bpeRoundsCtes,
      toks AS (
        SELECT doc_id, lang,
          unnest(string_split_regex(lower(text), '[[:space:]]+')) AS word
        FROM documents),
      enc AS (
        SELECT doc_id, lang, length(word) AS n_chars,
          len(string_split(trim($enc), ' ')) AS n_syms
        FROM (SELECT doc_id, lang, word,
                array_to_string(string_split(word, ''), ' ') AS ws0
              FROM toks) $tJoins),
      per_doc AS (
        SELECT doc_id, lang, count(*) AS words, sum(n_chars) AS chars,
          sum(n_syms) AS syms
        FROM enc GROUP BY 1, 2)
      SELECT lang, count(*)::BIGINT AS n_docs, sum(words)::BIGINT AS n_words,
        sum(chars)::BIGINT AS n_chars, sum(syms)::BIGINT AS n_bpe_tokens,
        ${Oracle.qround("sum(syms) / sum(words)")} AS fertility,
        ${Oracle.qround("sum(syms) / sum(chars)")} AS tokens_per_char
      FROM per_doc GROUP BY lang
      ORDER BY lang"""
    }
  )

  /** Per-language readability profile — FORCAST grade level (Caylor et
    * al. 1973) plus its syllable-census components. FORCAST is chosen
    * DELIBERATELY over Flesch/Flesch–Kincaid: it is the one classic
    * readability formula with no sentence-length leg (built for
    * non-narrative text — forms, listings), and this corpus has no
    * sentence punctuation at all, so a Flesch here would just be a
    * constant minus 1.015·(words per doc) — a dead input leg dressed as
    * a measurement (the q_kaplan_meier vacuity lesson). Syllables use
    * the standard vowel-group heuristic (runs of [aeiouy], minimum 1 per
    * word); grade = 20 − N/10 with N = monosyllables per 150 words,
    * algebraically 20 − 15·mono_frac.
    *
    * Exactness: the censuses are pure integer counts (regex vowel-group
    * extraction is byte-identical in both engines — the F5 precedent);
    * the ratios are single [[Det.qround]]ed quotients of exact integers.
    * Scale shape: explode → per-doc partial aggregate → per-lang
    * re-aggregate (the A6 two-level shape); everything after the first
    * aggregate is |docs|-sized, then |langs|-sized. */
  val qReadability = GraftQuery(
    "q_readability",
    (spark, dir) => {
      import spark.implicits._
      val perDoc = Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", $"lang", explode(Text.tokens($"text")).as("term"))
        .select($"doc_id", $"lang",
          greatest(size(regexp_extract_all($"term", lit("[aeiouy]+"), lit(0))),
            lit(1)).as("syl"))
        .groupBy($"doc_id", $"lang")
        .agg(count(lit(1)).as("words"), sum($"syl").as("syls"),
          sum(when($"syl" === 1, 1L).otherwise(0L)).as("monos"))
      perDoc.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"words").as("n_words"),
          sum($"syls").as("n_syls"), sum($"monos").as("n_monos"))
        .select($"lang", $"n_docs", $"n_words",
          Det.qround($"n_syls" / $"n_words").as("syl_per_word"),
          Det.qround($"n_monos" / $"n_words").as("mono_frac"),
          Det.qround(lit(20.0) - lit(15.0) * ($"n_monos" / $"n_words"))
            .as("forcast_grade"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, lang,
          unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
        FROM documents),
      syl AS (
        SELECT doc_id, lang,
          greatest(len(regexp_extract_all(term, '[aeiouy]+')), 1) AS syl
        FROM toks),
      per_doc AS (
        SELECT doc_id, lang, count(*) AS words, sum(syl) AS syls,
          sum(CASE WHEN syl = 1 THEN 1 ELSE 0 END) AS monos
        FROM syl GROUP BY 1, 2)
      SELECT lang, count(*)::BIGINT AS n_docs,
        sum(words)::BIGINT AS n_words,
        ${Oracle.qround("sum(syls) / sum(words)")} AS syl_per_word,
        ${Oracle.qround("sum(monos) / sum(words)")} AS mono_frac,
        ${Oracle.qround("20e0 - 15e0 * (sum(monos) / sum(words))")}
          AS forcast_grade
      FROM per_doc GROUP BY lang
      ORDER BY lang""")
  )

  /** Merge-count tiers swept by [[qBpeVocabSweep]]: 0 = the character
    * baseline, [[BpeMerges]] = the full trained table. Tiers are
    * PREFIXES of the one merge list — BPE merge ranks nest (encoding
    * with k merges is the intermediate state of encoding with K), so the
    * sweep never retrains and never re-encodes from scratch. */
  val BpeSweepTiers: Seq[Int] = Seq(0, 2, 4, BpeMerges)

  /** Tokenizer vocab-size sweep — the "how many merges are worth it"
    * decision table (the tokenizer sibling of q_minhash_tune /
    * q_ivf_tune / q_lm_order_sweep): for each merge-count tier, the
    * corpus token economy under the FIRST k learned merges — total BPE
    * tokens, fertility (tokens/word), chars/token, and the marginal
    * tokens saved per additional merge since the previous tier (the
    * diminishing-returns curve a tokenizer-size decision reads; when it
    * flattens, extra vocabulary no longer buys sequence length).
    *
    * Exactness: the trainer and the rank-ordered double-replace rewrite
    * are [[qBpeTrain]]/[[qBpeEncode]] verbatim; tier snapshots are
    * intermediate states of the SAME rewrite chain; counts are
    * integers; ratios are qround'd quotients; the marginal column is a
    * qround'd quotient of lagged integers over the |tiers|-row stack.
    *
    * Scale shape: training touches only the vocabulary ([[bpeLearn]]);
    * the sweep is ONE corpus map pass in which the K nested replace
    * pairs are evaluated once and each tier contributes a snapshot
    * COLUMN (codegen subexpression reuse — tiers multiply columns,
    * never corpus passes), folded by one global aggregate; the stack,
    * lag window, and readout run on |tiers| rows. */
  val qBpeVocabSweep = GraftQuery(
    "q_bpe_vocab_sweep",
    (spark, dir) => {
      import spark.implicits._
      val merges = bpeLearn(spark, dir)
      val ws0 = concat(lit(" "), array_join(split($"word", ""), " "),
        lit(" "))
      // running rewrite chain with a snapshot column at each tier
      // boundary (tier k's chain extends tier k-1's — the prefix
      // property)
      val tierCols: Seq[(Int, org.apache.spark.sql.Column)] = {
        var c = ws0
        var applied = 0
        BpeSweepTiers.map { k =>
          merges.slice(applied, k).foreach { case (_, a, b, _) =>
            val pat = lit(s" $a $b ")
            val rep = lit(s" $a$b ")
            c = org.apache.spark.sql.functions.replace(
              org.apache.spark.sql.functions.replace(c, pat, rep),
              pat, rep)
          }
          applied = math.max(applied, k)
          k -> size(split(trim(c), " "))
        }
      }
      val ts = BpeSweepTiers
      val agg = Tables.spread(Tables.documents(spark, dir))
        .select(explode(Text.tokens($"text")).as("word"))
        .select(length($"word").as("n_chars") +:
          tierCols.filter(_._1 != ts.head)
            .map { case (k, c) => c.as(s"syms_$k") }: _*)
        .agg(count(lit(1)).as("n_words"), sum($"n_chars").as("nc") +:
          ts.tail.map(k => sum(col(s"syms_$k")).as(s"t_$k")): _*)
        // tier 0 IS the character census (each word spells as its
        // chars), so its sum is read off n_chars rather than a
        // redundant split column
        .withColumn(s"t_${ts.head}", col("nc"))
      val byTier = org.apache.spark.sql.expressions.Window
        .orderBy($"n_merges")
      agg.selectExpr("n_words", "nc as n_chars",
        s"stack(${ts.size}, ${ts.map(k => s"CAST($k AS BIGINT), t_$k")
          .mkString(", ")}) as (n_merges, n_bpe_tokens)")
        .withColumn("pt", lag($"n_bpe_tokens", 1).over(byTier))
        .withColumn("pm", lag($"n_merges", 1).over(byTier))
        .select($"n_merges", $"n_words", $"n_chars", $"n_bpe_tokens",
          Det.qround($"n_bpe_tokens".cast(DoubleType) / $"n_words")
            .as("fertility"),
          Det.qround($"n_chars".cast(DoubleType) / $"n_bpe_tokens")
            .as("chars_per_token"),
          when($"pt".isNotNull, Det.qround(
            ($"pt" - $"n_bpe_tokens").cast(DoubleType)
              / ($"n_merges" - $"pm"))).as("tokens_saved_per_merge"))
        .orderBy($"n_merges")
    },
    Some {
      def encSql(k: Int): String =
        (1 to k).foldLeft("' ' || ws0 || ' '") { (c, r) =>
          s"""replace(replace($c,
            ' ' || t$r.a || ' ' || t$r.b || ' ', ' ' || t$r.a || t$r.b || ' '),
            ' ' || t$r.a || ' ' || t$r.b || ' ', ' ' || t$r.a || t$r.b || ' ')"""
        }
      val ts = BpeSweepTiers
      val tJoins = (1 to BpeMerges).map(r => s"CROSS JOIN t$r").mkString(" ")
      val tierSyms = ts.tail.map(k =>
        s"len(string_split(trim(${encSql(k)}), ' ')) AS syms_$k")
        .mkString(",\n          ")
      val stackRows = ts.map { k =>
        val tk = if (k == ts.head) "n_chars" else s"t_$k"
        s"SELECT $k::BIGINT AS n_merges, n_words, n_chars, $tk AS n_bpe_tokens FROM tot"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH v0 AS (
        SELECT array_to_string(string_split(word, ''), ' ') AS ws,
          count(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split_regex(lower(text), '[[:space:]]+'))
                AS word FROM documents)
        GROUP BY 1),$bpeRoundsCtes,
      words AS (
        SELECT unnest(string_split_regex(lower(text), '[[:space:]]+'))
          AS word
        FROM documents),
      enc AS (
        SELECT length(word) AS n_chars,
          $tierSyms
        FROM (SELECT word,
                array_to_string(string_split(word, ''), ' ') AS ws0
              FROM words) $tJoins),
      tot AS (
        SELECT count(*)::BIGINT AS n_words, sum(n_chars)::BIGINT AS n_chars,
          ${ts.tail.map(k => s"sum(syms_$k)::BIGINT AS t_$k")
            .mkString(", ")}
        FROM enc),
      st AS (
        $stackRows)
      SELECT n_merges, n_words, n_chars, n_bpe_tokens,
        ${Oracle.qround("n_bpe_tokens::DOUBLE / n_words")} AS fertility,
        ${Oracle.qround("n_chars::DOUBLE / n_bpe_tokens")} AS chars_per_token,
        CASE WHEN lag(n_bpe_tokens) OVER (ORDER BY n_merges) IS NOT NULL
          THEN ${Oracle.qround(
            "(lag(n_bpe_tokens) OVER (ORDER BY n_merges) - n_bpe_tokens)" +
              "::DOUBLE / (n_merges - lag(n_merges) OVER (ORDER BY n_merges))")}
        END AS tokens_saved_per_merge
      FROM st
      ORDER BY n_merges"""
    }
  )

  val all: Seq[GraftQuery] = Seq(
    qParseClean, qSubredditStats, qSubredditStatsApprox, qRefsByDoc,
    qRefsTotals, qRefsGlobal, qSentimentDocs, qAvgSentimentByLang,
    qSentimentExpr, qSentimentVader, qTokenStats, qBpeTokens, qQualityScore,
    qLangId, qFingerprint, qHeavyHitters, qBpeMergePairs, qBpeTrain,
    qBpeEncode, qBpeVocabSweep, qReadability, qLangConfusion, qCohensKappa)

  /** Language-ID classifier evaluation — confusion counts and per-class
    * precision/recall/F1 plus macro-F1 over [[langPredictions]] (the
    * same per-doc relation q_lang_id emits): the eval readout that turns
    * "the classifier runs" into "the classifier is this good, per class".
    * The corpus collapses once to the ≤|langs|² confusion cells
    * (persisted — actual margins, predicted margins and the diagonal all
    * read it); every metric below is |langs|-sized. P/R divide integers
    * and are 6-dp-prerounded before F1 (fixed trees both engines);
    * macro-F1 sums decimal-cast F1 addends over the ≤|langs|-row window
    * (the q_anova_f cross-group discipline). */
  lazy val qLangConfusion = GraftQuery(
    "q_lang_confusion",
    (spark, dir) => {
      import spark.implicits._
      val cells = langPredictions(spark, dir)
        .groupBy($"actual_lang", $"pred_lang").agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = cells.groupBy($"actual_lang".as("lang"))
        .agg(sum($"n").as("n_actual"))
      val pr = cells.groupBy($"pred_lang".as("lang"))
        .agg(sum($"n").as("n_pred"))
      val tp = cells.filter($"actual_lang" === $"pred_lang")
        .select($"actual_lang".as("lang"), $"n".as("tp"))
      val allW = org.apache.spark.sql.expressions.Window
        .rowsBetween(Long.MinValue, Long.MaxValue)
      a.join(pr, Seq("lang"), "full_outer")
        .join(tp, Seq("lang"), "left_outer")
        .select($"lang", coalesce($"n_actual", lit(0L)).as("n_actual"),
          coalesce($"n_pred", lit(0L)).as("n_pred"),
          coalesce($"tp", lit(0L)).as("tp"))
        // Det.qround (Column form, double literals) — an inline
        // `floor(...)/1000000.0` in expr() text would parse the literal
        // as DECIMAL and silently run the whole F1 tree in decimal
        // arithmetic (found by the sf0.001 sweep: a half-way F1 diverged)
        .withColumn("precision", when($"n_pred" > 0,
          Det.qround($"tp".cast(DoubleType) / $"n_pred")).otherwise(0.0))
        .withColumn("recall", when($"n_actual" > 0,
          Det.qround($"tp".cast(DoubleType) / $"n_actual")).otherwise(0.0))
        .withColumn("f1", when($"precision" + $"recall" > 0,
          Det.qround(lit(2.0) * $"precision" * $"recall" /
            ($"precision" + $"recall"))).otherwise(0.0))
        .withColumn("macro_f1", Det.qround(
          sum(expr("CAST(f1 AS DECIMAL(38,9))")).over(allW)
            .cast(DoubleType) / count(lit(1)).over(allW)))
        .orderBy($"lang")
    },
    Some(s"""
      WITH $langPredCtes,
      cells AS (
        SELECT actual_lang, pred_lang, count(*)::BIGINT AS n
        FROM preds GROUP BY 1, 2),
      a AS (SELECT actual_lang AS lang, sum(n)::BIGINT AS n_actual
            FROM cells GROUP BY 1),
      p AS (SELECT pred_lang AS lang, sum(n)::BIGINT AS n_pred
            FROM cells GROUP BY 1),
      t AS (SELECT actual_lang AS lang, n AS tp FROM cells
            WHERE actual_lang = pred_lang),
      j AS (
        SELECT lang, coalesce(n_actual, 0)::BIGINT AS n_actual,
          coalesce(n_pred, 0)::BIGINT AS n_pred,
          coalesce(tp, 0)::BIGINT AS tp
        FROM a FULL OUTER JOIN p USING (lang) LEFT JOIN t USING (lang)),
      f AS (
        SELECT *,
          CASE WHEN n_pred > 0 THEN
            floor(CAST(tp AS DOUBLE) / n_pred * 1000000.0 + 0.5) / 1000000.0
            ELSE 0.0 END AS precision,
          CASE WHEN n_actual > 0 THEN
            floor(CAST(tp AS DOUBLE) / n_actual * 1000000.0 + 0.5) / 1000000.0
            ELSE 0.0 END AS recall
        FROM j),
      g AS (
        SELECT *,
          CASE WHEN precision + recall > 0 THEN
            floor(2.0 * precision * recall / (precision + recall)
              * 1000000.0 + 0.5) / 1000000.0 ELSE 0.0 END AS f1
        FROM f)
      SELECT lang, n_actual, n_pred, tp, precision, recall, f1,
        ${graft.Oracle.qround(
          "(sum(CAST(f1 AS DECIMAL(38,9))) OVER ())::DOUBLE / " +
            "count(*) OVER ()")} AS macro_f1
      FROM g ORDER BY lang""")
  )
}
