package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.{Det, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational TF-IDF (SURVEY.md §2.9) — the reference's
  * Tokenizer→StopWordsRemover→CountVectorizer→IDF→explode→join→agg→top-k
  * chain (reddit_consumer.py:175-247) collapsed into one DataFrame DAG:
  * two shuffles (tf, df) and one broadcast join, no MLlib fit/transform, no
  * vector serialization round-trip.
  *
  * Semantics pinned:
  *  - vocabulary = top `vocabSize` terms by CORPUS term frequency (sum of
  *    per-doc tf), matching MLlib CountVectorizer's selection rank
  *    (reddit_consumer.py:198-202); ties broken (cf desc, term asc) —
  *    documented deviation from CountVectorizer's arbitrary tie order only;
  *  - idf(t) = ln((m + 1) / (df(t) + 1)), MLlib's formula with minDocFreq=0;
  *  - tfidf = tf * idf per (doc, term).
  *
  * Scale: df/vocab is a tiny aggregate (≤ vocabSize rows) broadcast back to
  * the tf rows — the fact-side data shuffles once, on (doc_id, term).
  */
object TfIdf {
  val VocabSize = 10000
  val TopK = 10

  /** (doc_id, term, tf, idf, tfidf) for every in-vocabulary term. */
  def scores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val toks = docs.select($"doc_id",
      explode(Text.withoutStopwords(Text.tokens($"text"))).as("term"))
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
    val vocab = dfreq
      .orderBy($"cf".desc, $"term").limit(VocabSize)
      .select($"term", $"df")
    val m = docs.agg(count(lit(1)).as("m"))
    val idf = vocab.crossJoin(broadcast(m))
      .withColumn("idf", log(($"m" + lit(1.0)) / ($"df" + lit(1.0))))
      .select($"term", $"df", $"idf")
    tf.join(broadcast(idf), Seq("term"))
      .select($"doc_id", $"term", $"tf", $"df",
        Det.qround($"tf" * $"idf").as("tfidf"))
  }

  private val scoresSql = s"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[[:space:]]+'),
        w -> w NOT IN ${Text.stopwordsSqlList})) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY term
              ORDER BY cf DESC, term LIMIT $VocabSize),
    idf AS (SELECT term, df,
              ln(((SELECT count(*) FROM documents) + 1.0) / (df + 1.0)) AS idf
            FROM dfreq)
    SELECT tf.doc_id, tf.term, tf.tf, idf.df,
      ${graft.Oracle.qround("tf.tf * idf.idf")} AS tfidf
    FROM tf JOIN idf ON tf.term = idf.term"""

  /** Full per-(doc, term) score relation. */
  val qTfIdfScores = GraftQuery(
    "q_tfidf_scores",
    (spark, dir) => {
      import spark.implicits._
      scores(spark, dir).orderBy($"doc_id", $"term")
    },
    Some(s"SELECT * FROM ($scoresSql) ORDER BY doc_id, term")
  )

  /** Reference's top-10-keywords output (reddit_consumer.py:234-243):
    * avg tfidf per term, deterministic tiebreak, true top-k plan. */
  val qTopKeywords = GraftQuery(
    "q_top_keywords",
    (spark, dir) => {
      import spark.implicits._
      scores(spark, dir)
        .groupBy($"term")
        .agg(
          Det.qround(sum($"tfidf".cast(DecimalType(38, Det.Scale)))
            .cast(DoubleType)).as("total_score"),
          count(lit(1)).as("n_docs"),
          Det.qround(sum($"tfidf".cast(DecimalType(38, Det.Scale))).cast(DoubleType)
            / count(lit(1))).as("avg_score"))
        .orderBy($"avg_score".desc, $"term")
        .limit(TopK)
    },
    Some(s"""
      SELECT term,
        ${graft.Oracle.qround("sum(CAST(tfidf AS DECIMAL(38,9)))::DOUBLE")}
          AS total_score,
        count(*) AS n_docs,
        ${graft.Oracle.qround("sum(CAST(tfidf AS DECIMAL(38,9)))::DOUBLE / count(*)")}
          AS avg_score
      FROM ($scoresSql)
      GROUP BY term
      ORDER BY avg_score DESC, term
      LIMIT $TopK""")
  )

  /** Posting-list truncation and index size for [[qInvertedIndex]]. */
  val PostingsK = 8
  val IndexTopK = 50

  /** Inverted-index build — the search-index materialization step of a
    * retrieval/RAG pipeline: term → document frequency + the first
    * [[PostingsK]] postings (doc_ids ascending, comma-joined), for the
    * [[IndexTopK]] highest-df terms. Truncated postings keep the output
    * bounded BY CONSTRUCTION (the full index is corpus-sized, which a
    * verified surface can't dump).
    *
    * Scale shape: one exchange on `term` serves both the df count and the
    * per-term top-[[PostingsK]] — Spark plans the `row_number ≤ K` filter
    * as WindowGroupLimit (partial per-partition top-K BEFORE the exchange),
    * so only K rows per (partition, term) cross the shuffle, then
    * TakeOrderedAndProject caps the final listing. */
  val qInvertedIndex = GraftQuery(
    "q_inverted_index",
    (spark, dir) => {
      import spark.implicits._
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"term")
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id",
          explode(array_distinct(Text.withoutStopwords(Text.tokens($"text"))))
            .as("term"))
        .withColumn("df", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(w.orderBy($"doc_id")))
        .filter($"rn" <= PostingsK)
        .groupBy($"term")
        .agg(max($"df").as("df"),
          expr("listagg(CAST(doc_id AS STRING), ',') WITHIN GROUP (ORDER BY doc_id)")
            .as("postings"))
        .orderBy($"df".desc, $"term")
        .limit(IndexTopK)
    },
    Some(s"""
      WITH toks AS (
        SELECT DISTINCT doc_id, term FROM (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(text), '[[:space:]]+'),
            w -> w NOT IN ${Text.stopwordsSqlList})) AS term
          FROM documents)),
      per AS (
        SELECT term, doc_id,
          count(*) OVER (PARTITION BY term) AS df,
          row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        FROM toks)
      SELECT term, max(df)::BIGINT AS df,
        string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
      FROM per WHERE rn <= $PostingsK
      GROUP BY term
      ORDER BY df DESC, term
      LIMIT $IndexTopK""")
  )

  val all: Seq[GraftQuery] = Seq(qTfIdfScores, qTopKeywords, qInvertedIndex)
}
