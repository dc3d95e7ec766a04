package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.{Det, Text}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lexical-statistics operators for a training-data pipeline, over
  * `documents`:
  *
  *  - per-document vocabulary diversity (type-token ratio + Simpson's
  *    repeat-probability index) — exact rationals of term counts, the
  *    log-free cousins of token entropy — plus token entropy itself
  *    ([[qTokenEntropy]]): `sum(−p·ln p)` IS cross-engine exact once each
  *    addend is one ln-of-a-double-quotient (bit-identical, the
  *    q_unigram_surprisal precedent) and the sum goes through the decimal
  *    cast;
  *  - corpus-level bigram association (lift = P(xy)/(P(x)P(y)) over document
  *    sets) — the collocation signal behind phrase mining / tokenizer vocab
  *    induction, again kept as an exact integer ratio;
  *  - a C4/Gopher-style quality-filter FUNNEL: the cascade accounting
  *    (evaluated → dropped → surviving per rule, in order) every corpus
  *    curation run reports, computed in ONE pass over the corpus.
  *
  * Physical design: diversity is a two-level aggregate — the (doc, term)
  * exchange partial-aggregates map-side, the per-doc rollup is 1 row per
  * (doc, term) group; lift joins the bigram counts against the BROADCAST
  * unigram vocabulary (vocabulary-sized, not corpus-sized) and takes top-k
  * via TakeOrderedAndProject; the funnel is a map-side projection of four
  * integer predicates (native `rep_stats`, no tokenization shuffle) feeding
  * a single global aggregate — at 100 TB one row per partition crosses the
  * exchange.
  */
object LexicalStats {

  val qTokenDiversity = GraftQuery(
    "q_token_diversity",
    (spark, dir) => {
      import spark.implicits._
      // native one-pass counters (token_diversity) — the declarative twin
      // (explode → count per (doc, term) → sum(c·(c−1))) shuffles one row
      // per (doc, term); this is a map-only projection plus the output sort
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", call_function("token_diversity", $"text").as("td"))
        .select($"doc_id",
          element_at($"td", 1).as("n_tokens"),
          element_at($"td", 2).as("n_types"),
          element_at($"td", 3).as("rep2"))
        .select($"doc_id", $"n_tokens", $"n_types",
          Det.qround($"n_types".cast(DoubleType) / $"n_tokens").as("ttr"),
          when($"n_tokens" > 1, Det.qround($"rep2".cast(DoubleType) /
            ($"n_tokens" * ($"n_tokens" - 1)))).as("simpson"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
        FROM documents),
      tc AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY doc_id, term)
      SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
        ${Oracle.qround("count(*)::DOUBLE / sum(c)")} AS ttr,
        CASE WHEN sum(c) > 1 THEN
          ${Oracle.qround("sum(c * (c - 1))::DOUBLE / (sum(c) * (sum(c) - 1))")}
        END AS simpson
      FROM tc GROUP BY doc_id
      ORDER BY doc_id""")
  )

  /** Minimum document frequency for a bigram to be scored — the standard
    * support floor that keeps one-off co-occurrences out of the ranking. */
  val LiftMinSupport = 5L
  val LiftTopK = 20

  /** Document-set semantics (a bigram/term counts once per document — the
    * same set semantics as the shingle-based dedup family), so every count
    * is a document frequency and lift is the exact integer ratio
    * `df(xy)·N / (df(x)·df(y))`, divided once in IEEE doubles identically
    * in both engines. */
  val qBigramLift = GraftQuery(
    "q_bigram_lift",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.spread(Tables.documents(spark, dir))
      val bi = docs
        .select(explode(call_function("word_shingles", $"text", lit(2))).as("bg"))
        .groupBy($"bg").agg(count(lit(1)).as("c_xy"))
        .filter($"c_xy" >= LiftMinSupport)
      val un = docs
        .select($"doc_id", explode(array_distinct(Text.tokens($"text"))).as("t"))
        .groupBy($"t").agg(count(lit(1)).as("c_t"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      bi.withColumn("x", element_at(split($"bg", " "), 1))
        .withColumn("y", element_at(split($"bg", " "), 2))
        .join(broadcast(un.select($"t".as("x"), $"c_t".as("c_x"))), Seq("x"))
        .join(broadcast(un.select($"t".as("y"), $"c_t".as("c_y"))), Seq("y"))
        .crossJoin(broadcast(nDocs))
        .select($"bg", $"c_xy", $"c_x", $"c_y",
          Det.qround(($"c_xy" * $"n_docs").cast(DoubleType) / ($"c_x" * $"c_y"))
            .as("lift"))
        .orderBy($"lift".desc, $"bg")
        .limit(LiftTopK)
    },
    Some(s"""
      WITH sh AS (${Dedup.shinglesSql(2)}),
      bi AS (
        SELECT shingle AS bg, count(*) AS c_xy FROM sh GROUP BY shingle
        HAVING count(*) >= $LiftMinSupport),
      toks AS (
        SELECT doc_id, unnest(list_distinct(
          string_split_regex(lower(text), '[[:space:]]+'))) AS t
        FROM documents),
      un AS (SELECT t, count(*) AS c_t FROM toks GROUP BY t),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT bg, c_xy::BIGINT AS c_xy, ux.c_t::BIGINT AS c_x,
        uy.c_t::BIGINT AS c_y,
        ${Oracle.qround("(c_xy * n_docs)::DOUBLE / (ux.c_t * uy.c_t)")} AS lift
      FROM bi
      JOIN un ux ON ux.t = string_split(bg, ' ')[1]
      JOIN un uy ON uy.t = string_split(bg, ' ')[2]
      CROSS JOIN n
      ORDER BY lift DESC, bg
      LIMIT $LiftTopK""")
  )

  /** Funnel rule bounds (tuned to the driver corpus so every rule has both
    * survivors and casualties; see NOTES.md). The fraction rules are stated
    * as INTEGER cross-multiplications — `5·distinct ≥ 2·tokens` instead of
    * `1 − distinct/tokens ≤ 0.6` — so the cascade is exact in both engines
    * with no float comparison anywhere. */
  val MinChars = 100L
  val MaxChars = 500L
  val MinTokens = 25L

  val qFilterFunnel = GraftQuery(
    "q_filter_funnel",
    (spark, dir) => {
      import spark.implicits._
      val st = call_function("rep_stats", $"text")
      val flags = Tables.spread(Tables.documents(spark, dir))
        .select($"n_chars", st.as("st"))
        .select(
          ($"n_chars" >= MinChars && $"n_chars" <= MaxChars).as("p1"),
          (element_at($"st", 1) >= MinTokens).as("p2"),
          // dup_token_frac <= 0.6  <=>  5*distinct >= 2*tokens
          (element_at($"st", 2) * 5 >= element_at($"st", 1) * 2).as("p3"),
          // top_2gram_frac < 0.08  <=>  25*top2 < 2*n2
          (element_at($"st", 4) > 0 &&
            element_at($"st", 6) * 25 < element_at($"st", 4) * 2).as("p4"))
      val agg = flags.agg(
        count(lit(1)).as("n0"),
        sum(when(!$"p1", 1L).otherwise(0L)).as("d1"),
        sum(when($"p1", 1L).otherwise(0L)).as("s1"),
        sum(when($"p1" && !$"p2", 1L).otherwise(0L)).as("d2"),
        sum(when($"p1" && $"p2", 1L).otherwise(0L)).as("s2"),
        sum(when($"p1" && $"p2" && !$"p3", 1L).otherwise(0L)).as("d3"),
        sum(when($"p1" && $"p2" && $"p3", 1L).otherwise(0L)).as("s3"),
        sum(when($"p1" && $"p2" && $"p3" && !$"p4", 1L).otherwise(0L)).as("d4"),
        sum(when($"p1" && $"p2" && $"p3" && $"p4", 1L).otherwise(0L)).as("s4"))
      agg
        .select(explode(array(
          struct(lit(1).as("stage"), lit("chars_range").as("rule"),
            $"n0".as("n_in"), $"d1".as("n_dropped"), $"s1".as("n_out")),
          struct(lit(2).as("stage"), lit("min_tokens").as("rule"),
            $"s1".as("n_in"), $"d2".as("n_dropped"), $"s2".as("n_out")),
          struct(lit(3).as("stage"), lit("dup_tokens").as("rule"),
            $"s2".as("n_in"), $"d3".as("n_dropped"), $"s3".as("n_out")),
          struct(lit(4).as("stage"), lit("repetitive_2gram").as("rule"),
            $"s3".as("n_in"), $"d4".as("n_dropped"), $"s4".as("n_out"))))
          .as("r"))
        .select($"r.stage", $"r.rule", $"r.n_in", $"r.n_dropped", $"r.n_out",
          when($"r.n_in" > 0,
            Det.qround($"r.n_dropped".cast(DoubleType) / $"r.n_in"))
            .as("drop_frac"))
        .orderBy($"stage")
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, n_chars,
          string_split_regex(lower(text), '[[:space:]]+') AS ws
        FROM documents),
      tc AS (
        SELECT doc_id, term, count(*) AS c
        FROM (SELECT doc_id, unnest(ws) AS term FROM toks)
        GROUP BY doc_id, term),
      ts AS (
        SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct
        FROM tc GROUP BY doc_id),
      gc AS (
        SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id,
                unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS g
              FROM toks)
        GROUP BY doc_id, g),
      gs AS (SELECT doc_id, sum(c) AS n2, max(c) AS top2 FROM gc GROUP BY doc_id),
      flags AS (
        SELECT
          d.n_chars >= $MinChars AND d.n_chars <= $MaxChars AS p1,
          t.n_tokens >= $MinTokens AS p2,
          t.n_distinct * 5 >= t.n_tokens * 2 AS p3,
          g.n2 > 0 AND g.top2 * 25 < g.n2 * 2 AS p4
        FROM documents d
        JOIN ts t USING (doc_id)
        JOIN gs g USING (doc_id)),
      agg AS (
        SELECT count(*) AS n0,
          sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS d1,
          sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS s1,
          sum(CASE WHEN p1 AND NOT p2 THEN 1 ELSE 0 END) AS d2,
          sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS s2,
          sum(CASE WHEN p1 AND p2 AND NOT p3 THEN 1 ELSE 0 END) AS d3,
          sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS s3,
          sum(CASE WHEN p1 AND p2 AND p3 AND NOT p4 THEN 1 ELSE 0 END) AS d4,
          sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS s4
        FROM flags),
      rows_ AS (
        SELECT 1 AS stage, 'chars_range' AS rule,
          n0 AS n_in, d1 AS n_dropped, s1 AS n_out FROM agg
        UNION ALL SELECT 2, 'min_tokens', s1, d2, s2 FROM agg
        UNION ALL SELECT 3, 'dup_tokens', s2, d3, s3 FROM agg
        UNION ALL SELECT 4, 'repetitive_2gram', s3, d4, s4 FROM agg)
      SELECT stage, rule, n_in::BIGINT AS n_in, n_dropped::BIGINT AS n_dropped,
        n_out::BIGINT AS n_out,
        CASE WHEN n_in > 0 THEN
          ${Oracle.qround("n_dropped::DOUBLE / n_in")}
        END AS drop_frac
      FROM rows_
      ORDER BY stage""")
  )

  /** Unigram language-model surprisal — the perplexity-proxy quality score
    * every corpus-filtering recipe ranks documents with (CCNet's "LM
    * perplexity bucket" collapsed to its order-0 core): fit the unigram LM
    * on the corpus itself (p(t) = cf(t)/N), then score each document by its
    * mean token surprisal `−ln p(t)` = `ln(N/cf(t))`. High = rare-token
    * text (specialist or garbage), low = boilerplate.
    *
    * Exactness: `ln` over the same double quotient is bit-identical across
    * engines (established by the TF-IDF idf term since round 1); the
    * per-document mean goes through the standard decimal-cast-before-sum
    * path so token order can't perturb the sum.
    *
    * Scale shape: the LM is the vocabulary relation (term, cf) — tiny next
    * to the corpus — broadcast onto the (doc, term) tf relation; the corpus
    * shuffles once, on (doc_id, term), then once more on doc_id for the
    * per-doc rollup (both partial+final). */
  /** The per-document mean-surprisal relation (doc_id, n_tokens,
    * mean_surprisal) — shared by [[qUnigramSurprisal]] (which IS this
    * relation ordered) and PipelineOps.qCurriculumPlan (which uses it as
    * the difficulty score). */
  private[graft] def docSurprisal(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      // tf (shuffled, corpus-priced) feeds both the LM build and the probe
      // join — persist so the (doc, term) exchange runs once
      val tf = Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", explode(Text.tokens($"text")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tf.join(broadcast(surprisalLm(tf)), Seq("term"))
        .groupBy($"doc_id")
        .agg(sum($"tf").as("n_tokens"),
          Det.qround(
            sum(($"tf".cast(DoubleType) * $"s").cast(DecimalType(38, Det.Scale)))
              .cast(DoubleType) / sum($"tf")).as("mean_surprisal"))
  }

  /** The corpus unigram surprisal LM (term, s = ln(tot/cf)) re-aggregated
    * from any (…, term, tf) relation — the ONE scoring model shared by
    * [[docSurprisal]] (document granularity) and [[qParagraphPpl]]
    * (paragraph granularity); the cf re-aggregate is invariant to extra
    * grouping keys in the input, so both build the identical model. */
  private[graft] def surprisalLm(tf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = tf.sparkSession
    import spark.implicits._
    val cf = tf.groupBy($"term").agg(sum($"tf").as("cf"))
    val tot = cf.agg(sum($"cf").as("tot"))
    cf.crossJoin(broadcast(tot))
      .select($"term",
        log($"tot".cast(DoubleType) / $"cf".cast(DoubleType)).as("s"))
  }

  /** The shared surprisal prelude as DuckDB CTEs ending in a `docsurp`
    * relation — the oracle twin of [[docSurprisal]]. */
  private[graft] val DocSurprisalSql: String = s"""
      toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
      tot AS (SELECT sum(cf) AS tot FROM cf),
      lm AS (SELECT term, ln(tot::DOUBLE / cf::DOUBLE) AS s FROM cf CROSS JOIN tot),
      docsurp AS (
        SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
          ${Oracle.qround(
            "sum(CAST(tf::DOUBLE * s AS DECIMAL(38,9)))::DOUBLE / sum(tf)")}
            AS mean_surprisal
        FROM tf JOIN lm USING (term)
        GROUP BY doc_id)"""

  val qUnigramSurprisal = GraftQuery(
    "q_unigram_surprisal",
    (spark, dir) => {
      import spark.implicits._
      docSurprisal(spark, dir).orderBy($"doc_id")
    },
    Some(s"""
      WITH ${DocSurprisalSql}
      SELECT doc_id, n_tokens, mean_surprisal
      FROM docsurp
      ORDER BY doc_id""")
  )

  /** Vocabulary size for [[qOovRate]] — deliberately smaller than the
    * corpus vocabulary so the out-of-vocabulary tail is non-empty at every
    * SF; a production run sets this to the tokenizer's vocab size. */
  val OovVocabN = 20

  /** Out-of-vocabulary rate per language — the tokenizer/vocab coverage
    * audit a training pipeline runs before committing a vocabulary: fix
    * the vocab as the top-[[OovVocabN]] corpus terms by token frequency
    * (ties to the lexicographically lower term, the CountVectorizer
    * discipline), then measure what fraction of each language's token
    * stream falls outside it. A language whose oov_rate spikes is
    * under-served by the vocabulary (the multilingual-tokenizer fairness
    * metric).
    *
    * Scale shape: the vocab is a tiny top-N aggregate
    * (TakeOrderedAndProject) broadcast back onto the token stream as a
    * LEFT join membership probe — the corpus-sized side never shuffles on
    * term; the final per-lang rollup is one partial+final aggregate.
    * Token stream computed twice (vocab pass + coverage pass) — the usual
    * recompute-a-cheap-projection-over-caching-a-corpus-sized-relation
    * trade. */
  val qOovRate = GraftQuery(
    "q_oov_rate",
    (spark, dir) => {
      import spark.implicits._
      def toks = Tables.spread(Tables.documents(spark, dir))
        .select($"lang", explode(Text.tokens($"text")).as("term"))
      val vocab = toks.groupBy($"term").agg(count(lit(1)).as("cf"))
        .orderBy($"cf".desc, $"term").limit(OovVocabN)
        .select($"term", lit(1).as("iv"))
      toks.join(broadcast(vocab), Seq("term"), "left")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when($"iv".isNull, 1L).otherwise(0L)).as("n_oov"))
        .select($"lang", $"n_tokens", $"n_oov",
          Det.qround($"n_oov" / $"n_tokens").as("oov_rate"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH toks AS (
        SELECT lang, unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
        FROM documents),
      vocab AS (
        SELECT term FROM (
          SELECT term, count(*) AS cf FROM toks GROUP BY term
          ORDER BY cf DESC, term LIMIT $OovVocabN)),
      probe AS (
        SELECT t.lang, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
        FROM toks t LEFT JOIN vocab v ON t.term = v.term)
      SELECT lang, count(*) AS n_tokens, sum(oov)::BIGINT AS n_oov,
        ${Oracle.qround("sum(oov)::DOUBLE / count(*)")} AS oov_rate
      FROM probe GROUP BY lang
      ORDER BY lang""")
  )

  /** Target stratum for [[qDsirWeights]] — a production run points this at
    * a high-quality seed corpus; here the largest language stratum. */
  val DsirTargetLang = "en"

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling", arXiv:2302.03169): score every
    * document by the log-likelihood ratio of a TARGET unigram LM (fit on the
    * [[DsirTargetLang]] stratum — the stand-in for a curated seed corpus)
    * against the CORPUS unigram LM, `Σ_t tf(t)·(ln p_target(t) − ln
    * p_corpus(t))`. Documents with positive weight look more like the
    * target than the mixture — the resampling then keeps them with
    * probability ∝ exp(weight). Both LMs are add-one smoothed over the
    * SHARED corpus vocabulary, so the ratio is finite for every token and
    * both distributions sum to exactly 1.
    *
    * Exactness: each smoothed probability is one double quotient of exact
    * integers, `ln` over the same double is bit-identical across engines
    * (the q_unigram_surprisal precedent), the per-term difference and the
    * tf scaling are single IEEE ops, and the per-document rollup is the
    * decimal-cast-before-sum path — token order can't perturb it.
    *
    * Scale shape: both LMs live in ONE vocabulary-sized relation (term,
    * ln-ratio) — built by a corpus tf pass that shuffles once on (doc,
    * term) and once on term, then BROADCAST onto the tf relation; the
    * per-doc rollup is one partial+final aggregate. The corpus never
    * shuffles on anything wider than (doc, term). */
  val qDsirWeights = GraftQuery(
    "q_dsir_weights",
    (spark, dir) => {
      import spark.implicits._
      // tf is a SHUFFLED corpus-priced aggregate consumed four times (probe
      // join, both LM counts, the scalar totals) — persist it so the (doc,
      // term) exchange runs once, not per consumer (the q_contamination
      // discipline; Verify/Bench clearCache() between queries)
      val tf = Tables.eager(Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", $"lang", explode(Text.tokens($"text")).as("term"))
        .groupBy($"doc_id", $"lang", $"term").agg(count(lit(1)).as("tf")))
      // ONE vocabulary aggregate for BOTH LMs: the former separate cfc/cft
      // relations were each consumed twice (the scalar totals AND the lm
      // projection), and unpersisted they executed twice apiece — four
      // term-keyed exchanges over the tf cache plus a join. A conditional
      // sum folds the target stratum into the same pass (a term with no
      // target rows gets cft = 0, exactly what the old left join's
      // coalesce(cft, 0) produced), and the totals read the eager cache.
      val cf = Tables.eager(tf.groupBy($"term").agg(
        sum($"tf").as("cfc"),
        sum(when($"lang" === DsirTargetLang, $"tf").otherwise(0L)).as("cft")))
      val scal = cf.agg(count(lit(1)).as("v"), sum($"cfc").as("nc"),
        sum($"cft").as("nt"))
      val lm = cf
        .crossJoin(broadcast(scal))
        .select($"term",
          (log(($"cft" + lit(1L)).cast(DoubleType) /
               ($"nt" + $"v").cast(DoubleType)) -
           log(($"cfc" + lit(1L)).cast(DoubleType) /
               ($"nc" + $"v").cast(DoubleType))).as("lr"))
      tf.join(broadcast(lm), Seq("term"))
        .groupBy($"doc_id", $"lang")
        .agg(sum($"tf").as("n_tokens"),
          Det.qround(
            sum(($"tf".cast(DoubleType) * $"lr").cast(DecimalType(38, Det.Scale)))
              .cast(DoubleType)).as("dsir_weight"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH tf AS (
        SELECT doc_id, lang, term, count(*) AS tf
        FROM (SELECT doc_id, lang,
                unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
              FROM documents)
        GROUP BY doc_id, lang, term),
      cfc AS (SELECT term, sum(tf) AS cfc FROM tf GROUP BY term),
      cft AS (SELECT term, sum(tf) AS cft FROM tf
              WHERE lang = '$DsirTargetLang' GROUP BY term),
      scal AS (SELECT (SELECT count(*) FROM cfc) AS v,
                      (SELECT sum(cfc) FROM cfc) AS nc,
                      (SELECT sum(cft) FROM cft) AS nt),
      lm AS (
        SELECT term,
          ln((coalesce(cft, 0) + 1)::DOUBLE / (nt + v)::DOUBLE)
            - ln((cfc + 1)::DOUBLE / (nc + v)::DOUBLE) AS lr
        FROM cfc LEFT JOIN cft USING (term) CROSS JOIN scal)
      SELECT doc_id, lang, sum(tf)::BIGINT AS n_tokens,
        ${Oracle.qround("sum(CAST(tf::DOUBLE * lr AS DECIMAL(38,9)))::DOUBLE")}
          AS dsir_weight
      FROM tf JOIN lm USING (term)
      GROUP BY doc_id, lang
      ORDER BY doc_id""")
  )

  /** Per-source KL divergence from the corpus unigram distribution —
    * the domain-drift audit behind mixture rebalancing: for each source,
    * `KL(p_source ‖ p_corpus) = Σ_{t∈V} p_s(t)·(ln p_s(t) − ln p_c(t))`,
    * both distributions add-one smoothed over the shared corpus vocabulary
    * (so each sums to exactly 1 and the divergence is finite and ≥ 0). A
    * source whose KL spikes is lexically off-mixture — the signal that its
    * [[qMixtureWeights]]-style sampling weight needs review, or that a
    * scrape changed under you.
    *
    * Exactness: the same one-quotient-per-probability + bit-identical-`ln`
    * discipline as [[qDsirWeights]]; the per-source sum over vocabulary
    * terms goes through the decimal cast, so term order can't perturb it.
    *
    * Scale shape: after the corpus-priced tf pass (one (source, term)
    * exchange, partial-aggregated map-side), EVERYTHING is model-scale —
    * the (source × vocabulary) grid is |sources|·|V| rows built from a
    * broadcast vocabulary, never corpus-sized; one final one-row-per-source
    * aggregate. */
  val qKlBySource = GraftQuery(
    "q_kl_by_source",
    (spark, dir) => {
      import spark.implicits._
      // cfs is the one corpus-priced aggregate (three consumers: corpus
      // counts, per-source totals, the grid's left join) — persist so the
      // (source, term) exchange runs once
      val cfs = Tables.spread(Tables.documents(spark, dir))
        .select($"source", explode(Text.tokens($"text")).as("term"))
        .groupBy($"source", $"term").agg(count(lit(1)).as("cfs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cfc = cfs.groupBy($"term").agg(sum($"cfs").as("cfc"))
      val scal = cfc.agg(count(lit(1)).as("v"), sum($"cfc").as("nc"))
      val srcTotals = cfs.groupBy($"source").agg(sum($"cfs").as("ns"))
      val grid = srcTotals
        .crossJoin(broadcast(cfc))
        .join(broadcast(cfs), Seq("source", "term"), "left")
        .crossJoin(broadcast(scal))
      val ps = (coalesce($"cfs", lit(0L)) + lit(1L)).cast(DoubleType) /
        ($"ns" + $"v").cast(DoubleType)
      val pc = ($"cfc" + lit(1L)).cast(DoubleType) /
        ($"nc" + $"v").cast(DoubleType)
      grid
        .select($"source", $"ns", (ps * (log(ps) - log(pc))).as("contrib"))
        .groupBy($"source", $"ns")
        .agg(Det.qround(
          sum($"contrib".cast(DecimalType(38, Det.Scale))).cast(DoubleType))
          .as("kl_div"))
        .select($"source", $"ns".as("n_tokens"), $"kl_div")
        .orderBy($"source")
    },
    Some(s"""
      WITH cfs AS (
        SELECT source, term, count(*) AS cfs
        FROM (SELECT source,
                unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
              FROM documents)
        GROUP BY source, term),
      cfc AS (SELECT term, sum(cfs) AS cfc FROM cfs GROUP BY term),
      scal AS (SELECT (SELECT count(*) FROM cfc) AS v,
                      (SELECT sum(cfc) FROM cfc) AS nc),
      srct AS (SELECT source, sum(cfs) AS ns FROM cfs GROUP BY source),
      grid AS (
        SELECT s.source, s.ns, c.term, c.cfc, f.cfs
        FROM srct s CROSS JOIN cfc c
        LEFT JOIN cfs f ON f.source = s.source AND f.term = c.term),
      contrib AS (
        SELECT source, ns,
          ((coalesce(cfs, 0) + 1)::DOUBLE / (ns + v)::DOUBLE)
            * (ln((coalesce(cfs, 0) + 1)::DOUBLE / (ns + v)::DOUBLE)
               - ln((cfc + 1)::DOUBLE / (nc + v)::DOUBLE)) AS contrib
        FROM grid CROSS JOIN scal)
      SELECT source, ns::BIGINT AS n_tokens,
        ${Oracle.qround("sum(CAST(contrib AS DECIMAL(38,9)))::DOUBLE")}
          AS kl_div
      FROM contrib
      GROUP BY source, ns
      ORDER BY source""")
  )

  /** Shannon token entropy per document (nats) — the information-density
    * filter signal between the exact-rational diversity pair and the full
    * LM scores: `H = Σ_t −p(t)·ln p(t)` over the document's own term
    * distribution. Near-zero = one token repeated (boilerplate/spam);
    * near `ln(n_distinct)` = uniform usage. Complements [[qTokenDiversity]]
    * (which is blind to HOW unevenly the repeated mass is spread).
    *
    * Exactness: each p is one double quotient of exact counts, `ln` over
    * the same double is bit-identical across engines, `−p · ln p` is two
    * IEEE ops in a pinned order, and the per-doc sum is decimal-cast —
    * term order can't perturb it.
    *
    * Scale shape: one (doc, term) exchange for tf, then ONE doc-keyed
    * exchange feeding both the window total and the final rollup (the
    * aggregate reuses the window's partitioning — no further shuffle). */
  val qTokenEntropy = GraftQuery(
    "q_token_entropy",
    (spark, dir) => {
      import spark.implicits._
      val tf = Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", explode(Text.tokens($"text")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val withN = tf.withColumn("n",
        sum($"tf").over(Window.partitionBy($"doc_id")))
      val p = $"tf".cast(DoubleType) / $"n".cast(DoubleType)
      withN
        .select($"doc_id", $"n", (-p * log(p)).as("contrib"))
        .groupBy($"doc_id")
        .agg(max($"n").as("n_tokens"), count(lit(1)).as("n_distinct"),
          Det.qround(sum($"contrib".cast(DecimalType(38, Det.Scale)))
            .cast(DoubleType)).as("entropy"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
              FROM documents)
        GROUP BY doc_id, term),
      tn AS (SELECT doc_id, tf, sum(tf) OVER (PARTITION BY doc_id) AS n
             FROM tf),
      c AS (SELECT doc_id, n,
              -(tf::DOUBLE / n::DOUBLE) * ln(tf::DOUBLE / n::DOUBLE) AS contrib
            FROM tn)
      SELECT doc_id, max(n)::BIGINT AS n_tokens, count(*) AS n_distinct,
        ${Oracle.qround("sum(CAST(contrib AS DECIMAL(38,9)))::DOUBLE")}
          AS entropy
      FROM c GROUP BY doc_id
      ORDER BY doc_id""")
  )

  /** Vocabulary coverage curve per language — the tokenizer-sizing query:
    * how many vocabulary entries (ranked by corpus frequency, ties by term)
    * does it take to cover 90% / 99% of a language's token mass? A language
    * whose `v99` is a large multiple of its `v90` has a long lexical tail —
    * the signal that a shared multilingual vocabulary will fragment it into
    * subword pieces (the [[qOovRate]] fairness metric's design-time
    * counterpart: OOV rate audits a CHOSEN vocab, this query tells you what
    * vocab size to choose).
    *
    * Exactness: ranks and cumulative masses are exact integers; the
    * coverage threshold test is integer cross-multiplication
    * (`cum·100 ≥ tot·90` — no double division anywhere), so the minimal
    * ranks are definitionally identical across engines. (Long overflow
    * would need a single-language token mass ≥ 9.2e16 ≈ 2e4× a 100 TB
    * corpus.)
    *
    * Scale shape: one (lang, term) tf exchange (partial-aggregated
    * map-side), then EVERYTHING runs on the vocabulary-sized relation —
    * one lang-keyed exchange feeding both Windows (ordered cumulative sum
    * + unordered total share the partitioning; Catalyst plans them without
    * a second shuffle) and the final one-row-per-language rollup. The
    * corpus never shuffles on anything wider than (lang, term). */
  val qVocabCoverage = GraftQuery(
    "q_vocab_coverage",
    (spark, dir) => {
      import spark.implicits._
      val tf = Tables.spread(Tables.documents(spark, dir))
        .select($"lang", explode(Text.tokens($"text")).as("term"))
        .groupBy($"lang", $"term").agg(count(lit(1)).as("cf"))
      val byFreq = Window.partitionBy($"lang").orderBy($"cf".desc, $"term")
      val whole = Window.partitionBy($"lang")
      tf
        .withColumn("rnk", row_number().over(byFreq))
        .withColumn("cum", sum($"cf").over(byFreq
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum($"cf").over(whole))
        .groupBy($"lang")
        .agg(max($"tot").as("n_tokens"), count(lit(1)).as("vocab_size"),
          min(when($"cum" * 100L >= $"tot" * 90L, $"rnk"))
            .cast(LongType).as("v90"),
          min(when($"cum" * 100L >= $"tot" * 99L, $"rnk"))
            .cast(LongType).as("v99"))
        .orderBy($"lang")
    },
    Some("""
      WITH tf AS (
        SELECT lang, term, count(*) AS cf
        FROM (SELECT lang,
                unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
              FROM documents)
        GROUP BY lang, term),
      ranked AS (
        SELECT lang, cf,
          row_number() OVER w AS rnk,
          sum(cf) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS cum,
          sum(cf) OVER (PARTITION BY lang) AS tot
        FROM tf
        WINDOW w AS (PARTITION BY lang ORDER BY cf DESC, term))
      SELECT lang, max(tot)::BIGINT AS n_tokens, count(*) AS vocab_size,
        min(CASE WHEN cum * 100 >= tot * 90 THEN rnk END) AS v90,
        min(CASE WHEN cum * 100 >= tot * 99 THEN rnk END) AS v99
      FROM ranked
      GROUP BY lang
      ORDER BY lang""")
  )

  /** Tokenizer fertility audit per language — the bytes/chars-per-token
    * ratios a multilingual pipeline tracks to see which languages the
    * whitespace tokenizer serves cheaply and which it fragments (for a
    * subword tokenizer the same query, pointed at its token counts, is the
    * standard "fertility" fairness metric: a language paying 2× the
    * bytes-per-token budget gets half the effective context window).
    *
    * Exactness: all five aggregates are integer sums (token counts,
    * UTF-8 octet lengths, code-point lengths); the three ratios are single
    * qround'd double quotients of exact integers.
    *
    * Scale shape: map-only projection (size/length/encode are codegen'd,
    * no explode — the token ARRAY is never materialized into rows), one
    * partial+final aggregate on the ≤|langs| key. At 100 TB one row per
    * (partition, lang) crosses the exchange. */
  val qTokenFertility = GraftQuery(
    "q_token_fertility",
    (spark, dir) => {
      import spark.implicits._
      Tables.spread(Tables.documents(spark, dir))
        .select($"lang",
          size(Text.tokens($"text")).cast(LongType).as("nt"),
          length($"text").cast(LongType).as("nc"),
          length(encode($"text", "UTF-8")).cast(LongType).as("nb"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"nt").as("n_tokens"),
          sum($"nc").as("n_chars"), sum($"nb").as("n_bytes"))
        .select($"lang", $"n_docs", $"n_tokens", $"n_chars", $"n_bytes",
          Det.qround($"n_bytes".cast(DoubleType) / $"n_tokens")
            .as("bytes_per_token"),
          Det.qround($"n_chars".cast(DoubleType) / $"n_tokens")
            .as("chars_per_token"),
          Det.qround($"n_tokens".cast(DoubleType) / $"n_docs")
            .as("tokens_per_doc"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH d AS (
        SELECT lang,
          len(string_split_regex(lower(text), '[[:space:]]+'))::BIGINT AS nt,
          length(text)::BIGINT AS nc,
          octet_length(encode(text))::BIGINT AS nb
        FROM documents),
      a AS (
        SELECT lang, count(*) AS n_docs, sum(nt)::BIGINT AS n_tokens,
          sum(nc)::BIGINT AS n_chars, sum(nb)::BIGINT AS n_bytes
        FROM d GROUP BY lang)
      SELECT lang, n_docs, n_tokens, n_chars, n_bytes,
        ${Oracle.qround("n_bytes::DOUBLE / n_tokens")} AS bytes_per_token,
        ${Oracle.qround("n_chars::DOUBLE / n_tokens")} AS chars_per_token,
        ${Oracle.qround("n_tokens::DOUBLE / n_docs")} AS tokens_per_doc
      FROM a
      ORDER BY lang""")
  )

  /** Zipf's-law fit over the corpus token-frequency spectrum — the OLS
    * slope/intercept of ln(cf) on ln(rank), the one-number corpus-health
    * summary (natural text sits near slope −1; machine-generated or
    * boilerplate-heavy corpora flatten, dedup failures steepen the head).
    * The diagnostic a curation run plots after every major filter stage.
    *
    * Exactness: rank is an exact integer (freq desc, term asc — the
    * CountVectorizer tie-break); each ln is one libm call on a bit-identical
    * input (the q_unigram_surprisal precedent); the regression moments
    * Σx, Σy, Σxy, Σx² go through the scale-12 decimal cast
    * (order-independent), and the closed-form slope/intercept is a pinned
    * sequence of IEEE double ops, qround'd.
    *
    * Scale shape: one corpus-pass (term) aggregate (partial+final), then
    * EVERYTHING runs on the vocabulary-sized relation: the global
    * frequency rank is a single-partition sort of the vocabulary — bounded
    * by distinct terms, not corpus size, the same discipline as the TF-IDF
    * vocab rank — and the moments collapse in one partial+final aggregate
    * to a single row. */
  /** The corpus-wide (term, cf) token-frequency collapse shared by the
    * frequency-spectrum family ([[qZipfFit]], [[qHillTail]], [[qChao1]])
    * and graft.streaming.StreamVocab's maintained fold: full tokens (no
    * stopword removal), one partial+final aggregate. ADDITIVE over
    * document slices (plain integer counts), which is what lets a
    * streaming maintainer keep it current per micro-batch and fold at
    * read time. */
  private[graft] def cfOf(docsIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docsIn
      .select(explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cf"))

  /** The Zipf log-log OLS readout from a (term, cf) relation — shared by
    * [[qZipfFit]] and the streaming maintainer's fold. */
  private[graft] def zipfFromCf(cfIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = cfIn.sparkSession
    import spark.implicits._
    cfIn
      .withColumn("rnk",
        row_number().over(Window.orderBy($"cf".desc, $"term")))
      .select(log($"rnk".cast(DoubleType)).as("x"),
        log($"cf".cast(DoubleType)).as("y"))
      .agg(
        count(lit(1)).as("n_terms"),
        sum($"x".cast(DecimalType(38, 12))).cast(DoubleType).as("sx"),
        sum($"y".cast(DecimalType(38, 12))).cast(DoubleType).as("sy"),
        sum(($"x" * $"y").cast(DecimalType(38, 12)))
          .cast(DoubleType).as("sxy"),
        sum(($"x" * $"x").cast(DecimalType(38, 12)))
          .cast(DoubleType).as("sxx"))
      .select($"n_terms",
        Det.qround(($"n_terms" * $"sxy" - $"sx" * $"sy") /
          ($"n_terms" * $"sxx" - $"sx" * $"sx")).as("slope"),
        Det.qround(($"sy" * $"sxx" - $"sx" * $"sxy") /
          ($"n_terms" * $"sxx" - $"sx" * $"sx")).as("intercept"))
  }

  val qZipfFit = GraftQuery(
    "q_zipf_fit",
    (spark, dir) =>
      zipfFromCf(cfOf(Tables.spread(Tables.documents(spark, dir)))),
    Some(s"""
      WITH cf AS (
        SELECT term, count(*) AS cf
        FROM (SELECT unnest(string_split_regex(lower(text), '[[:space:]]+'))
                AS term FROM documents)
        GROUP BY term),
      ranked AS (
        SELECT cf, row_number() OVER (ORDER BY cf DESC, term) AS rnk
        FROM cf),
      xy AS (
        SELECT ln(rnk::DOUBLE) AS x, ln(cf::DOUBLE) AS y FROM ranked),
      m AS (
        SELECT count(*) AS n_terms,
          sum(CAST(x AS DECIMAL(38,12)))::DOUBLE AS sx,
          sum(CAST(y AS DECIMAL(38,12)))::DOUBLE AS sy,
          sum(CAST(x * y AS DECIMAL(38,12)))::DOUBLE AS sxy,
          sum(CAST(x * x AS DECIMAL(38,12)))::DOUBLE AS sxx
        FROM xy)
      SELECT n_terms,
        ${Oracle.qround(
          "(n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)")} AS slope,
        ${Oracle.qround(
          "(sy * sxx - sx * sxy) / (n_terms * sxx - sx * sx)")} AS intercept
      FROM m""")
  )

  /** Held-out cross-entropy per language: the validation split scored under
    * a Laplace-smoothed (add-1) unigram LM fit on the TRAIN split — the
    * generalization-gap twin of [[qUnigramSurprisal]] (which scores the
    * corpus under itself and so can only under-estimate entropy). The split
    * is q_train_split's salted-md5 assignment VERBATIM (buckets ≤ 7 train,
    * = 8 val), so this query and the materialized split can never disagree.
    * Per language: p(w) = (ctf(w)+1) / (N_train + V + 1), unseen terms get
    * ctf = 0 under the same formula; xent_nats = Σ_val tf·ln(1/p) / N_val,
    * and oov_rate = the val-token mass unseen in train — rising xent with
    * rising oov says the split's vocabulary drifted, rising xent with flat
    * oov says the token DISTRIBUTION drifted (the practical drift-triage
    * split).
    *
    * Exactness: each addend is one ln of a double quotient of exact
    * integers (the q_unigram_surprisal precedent — bit-identical across
    * engines), summed through the scale-9 decimal cast; the rest is exact
    * integer arithmetic and qround.
    *
    * Scale shape: ONE (lang, term) exchange computes train and val counts
    * together (partial+final); the per-lang LM normalizers are a tiny
    * aggregate broadcast back onto the vocabulary relation; the final
    * rollup is one lang-keyed aggregate. The corpus never shuffles twice. */
  /** The (lang, term) split-count collapse shared by [[qHeldoutXent]],
    * [[qScalingLaw]] and graft.streaming.StreamXent's maintained fold:
    * token-instance counts per prefix ladder rung (ctf1 = bucket 0 only,
    * ctf2 ≤ 1, ctf4 ≤ 3, ctf8 = the full train split) plus the val count.
    * ADDITIVE over document slices (plain integer counters keyed by the
    * per-doc salted split), which is what lets a streaming maintainer
    * keep it current per micro-batch and fold at read time. */
  private[graft] def xentTf(docsIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docsIn.sparkSession
    import spark.implicits._
    docsIn
      .withColumn("bucket",
        expr(PipelineOps.u32Expr("concat('split:', cast(doc_id as string))") + " % 10"))
      .filter($"bucket" <= 8)
      .select($"lang", $"bucket", explode(Text.tokens($"text")).as("term"))
      .groupBy($"lang", $"term")
      .agg(count(when($"bucket" <= 0, 1)).as("ctf1"),
        count(when($"bucket" <= 1, 1)).as("ctf2"),
        count(when($"bucket" <= 3, 1)).as("ctf4"),
        count(when($"bucket" <= 7, 1)).as("ctf8"),
        count(when($"bucket" === 8, 1)).as("vtf"))
  }

  /** The held-out readout from the shared tf relation (ctf8 = the full
    * train split) — shared by [[qHeldoutXent]] and the streaming
    * maintainer's fold, so the two surfaces can never drift. */
  private[graft] def heldoutReport(tfIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = tfIn.sparkSession
    import spark.implicits._
    val tf = tfIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val st = tf.groupBy($"lang")
      .agg(sum($"ctf8").as("n_train"),
        count(when($"ctf8" > 0, 1)).as("vocab"),
        sum($"vtf").as("n_val"))
    tf.filter($"vtf" > 0)
      .join(broadcast(st), Seq("lang"))
      .groupBy($"lang", $"n_train", $"vocab", $"n_val")
      .agg(
        coalesce(sum(when($"ctf8" === 0, $"vtf")), lit(0L)).as("n_oov"),
        sum(($"vtf".cast(DoubleType) *
          log(($"n_train" + $"vocab" + 1).cast(DoubleType) /
            ($"ctf8" + 1).cast(DoubleType)))
          .cast(DecimalType(38, Det.Scale))).cast(DoubleType).as("xsum"))
      .select($"lang", $"n_train".as("n_train_tokens"), $"vocab",
        $"n_val".as("n_val_tokens"),
        Det.qround($"n_oov" * lit(1.0) / $"n_val").as("oov_rate"),
        Det.qround($"xsum" / $"n_val").as("xent_nats"))
      .orderBy($"lang")
  }

  val qHeldoutXent = GraftQuery(
    "q_heldout_xent",
    (spark, dir) =>
      heldoutReport(xentTf(Tables.spread(Tables.documents(spark, dir)))),
    Some(s"""
      WITH split AS (
        SELECT lang, text,
          ${PipelineOps.u32Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10 AS bucket
        FROM documents),
      toks AS (
        SELECT lang, bucket,
          unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
        FROM split WHERE bucket <= 8),
      tf AS (
        SELECT lang, term,
          count(*) FILTER (WHERE bucket <= 7) AS ctf,
          count(*) FILTER (WHERE bucket = 8) AS vtf
        FROM toks GROUP BY lang, term),
      st AS (
        SELECT lang, sum(ctf) AS n_train,
          count(*) FILTER (WHERE ctf > 0) AS vocab,
          sum(vtf) AS n_val
        FROM tf GROUP BY lang)
      SELECT lang, n_train::BIGINT AS n_train_tokens, vocab::BIGINT AS vocab,
        n_val::BIGINT AS n_val_tokens,
        ${Oracle.qround(
          "coalesce(sum(vtf) FILTER (WHERE ctf = 0), 0) * 1.0 / n_val")} AS oov_rate,
        ${Oracle.qround(
          "sum(CAST(vtf::DOUBLE * ln((n_train + vocab + 1)::DOUBLE / (ctf + 1)::DOUBLE)" +
            " AS DECIMAL(38,9)))::DOUBLE / n_val")} AS xent_nats
      FROM tf JOIN st USING (lang)
      WHERE vtf > 0
      GROUP BY lang, n_train, vocab, n_val
      ORDER BY lang""")
  )

  /** Minimum co-occurrence support for [[qCooccurPmi]] — PMI's known
    * rare-pair instability (Church & Hanks 1990) is screened by support,
    * the standard practice. */
  val MinPairN = 5

  /** Document-level co-occurrence PMI — word-association mining: for term
    * pairs sharing documents, pmi = ln(P(a,b) / (P(a)·P(b))) over the
    * DOC-MEMBERSHIP distribution. The complementary statistic to
    * [[qBigramLift]]: lift scores ADJACENT token bigrams (phrase
    * detection); PMI here scores bag-of-document association at any
    * distance (topic affinity, embedding-eval word pairs).
    *
    * Scale shape: the corpus collapses to the DISTINCT (doc, term)
    * relation once; the pair stream is a doc_id self-equi-join of that
    * relation AFTER a frequency cap: terms in the UPPER HALF of the
    * document-frequency distribution leave (df > median df — the
    * deterministic cousin of Mikolov-style frequent-word subsampling).
    * The cap is distribution-adaptive on purpose: an absolute "df ≤ N/2"
    * rule is degenerate on corpora where nearly every term is ubiquitous
    * (the driver corpus: 30 of 31 terms sit in ~77% of docs), while the
    * median rule always retains the less-frequent half of the
    * vocabulary. Ubiquitous terms dominate pair volume quadratically and
    * carry no association signal — exactly the ones pruned. Per-doc pair
    * fanout is bounded by the capped per-doc vocabulary, never all-pairs
    * across docs; the df relation is vocabulary-sized (aggregate +
    * broadcast, the median via exact percentile over it — Spark
    * `percentile` ≡ DuckDB `quantile_cont` bit-identical, the
    * q_winsorized_stats precedent). */
  /** The scored pair relation BEFORE the support floor — shared by
    * [[qCooccurPmi]] and the fixture spec (which hand-checks the PMI
    * arithmetic on pairs the support rule would hide). */
  /** The df-capped within-doc pair stream BEFORE aggregation (one row per
    * (doc, term<term) pair over the kept half of the vocabulary —
    * Σ_docs C(k_kept,2) rows, linear in corpus size since pairs never
    * cross documents): the candidate volume of the PMI miner. Shared by
    * [[cooccurScored]] and the scale rehearsal so the measured relation
    * IS the executed one. */
  /** The df-capped (doc, term, df) membership relation entering the pair
    * join — the PMI miner's "postings". */
  private[graft] def cooccurKept(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val docs = Tables.spread(Tables.documents(spark, dir))
    val dt = docs
      .select($"doc_id", explode(Text.tokens($"text")).as("term"))
      .distinct()
    val dfr = dt.groupBy($"term").agg(count(lit(1)).as("df"))
    val med = dfr.agg(expr("percentile(df, 0.5)").as("med"))
    // eager: BOTH sides of the PMI pair self-join consume this membership
    // relation; lazily each side re-ran the distinct + df + median chain
    Tables.eager(dt.join(
      broadcast(dfr.crossJoin(broadcast(med)).filter($"df" <= $"med")),
      Seq("term")))
  }

  private[graft] def cooccurPairRows(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val kept = cooccurKept(spark, dir)
    kept.as("a")
      .join(kept.as("b"),
        $"a.doc_id" === $"b.doc_id" && $"a.term" < $"b.term")
  }

  private[graft] def cooccurScored(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val nd = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    cooccurPairRows(spark, dir)
      .groupBy($"a.term".as("term_a"), $"b.term".as("term_b"))
      .agg(max($"a.df").as("df_a"), max($"b.df").as("df_b"),
        count(lit(1)).as("n_ab"))
      .crossJoin(broadcast(nd))
      .select($"term_a", $"term_b", $"n_ab",
        Det.qround(log(($"n_ab" * $"n_docs").cast(DoubleType) /
          ($"df_a" * $"df_b"))).as("pmi"))
  }

  val qCooccurPmi = GraftQuery(
    "q_cooccur_pmi",
    (spark, dir) => {
      import spark.implicits._
      cooccurScored(spark, dir)
        .filter($"n_ab" >= MinPairN)
        .orderBy($"pmi".desc, $"term_a", $"term_b")
        .limit(20)
    },
    Some(s"""
      WITH dt AS (
        SELECT DISTINCT doc_id, term FROM (
          SELECT doc_id,
            unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
          FROM documents)),
      nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
      dfr AS (SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1),
      med AS (SELECT quantile_cont(df, 0.5e0) AS med FROM dfr),
      kept AS (
        SELECT dt.doc_id, dt.term, dfr.df
        FROM dt JOIN dfr USING (term) CROSS JOIN med
        WHERE df <= med),
      pairs AS (
        SELECT a.term AS term_a, b.term AS term_b,
          max(a.df) AS df_a, max(b.df) AS df_b, count(*) AS n_ab
        FROM kept a JOIN kept b
          ON a.doc_id = b.doc_id AND a.term < b.term
        GROUP BY 1, 2
        HAVING count(*) >= $MinPairN)
      SELECT term_a, term_b, n_ab,
        ${Oracle.qround("ln((n_ab * n_docs)::DOUBLE / (df_a * df_b))")} AS pmi
      FROM pairs CROSS JOIN nd
      ORDER BY pmi DESC, term_a, term_b
      LIMIT 20""")
  )

  /** Number of corpus-prefix checkpoints for the Heaps-law fit. */
  val HeapsCheckpoints = 10

  /** Heaps/Herdan vocabulary-growth law fit — the companion of
    * [[qZipfFit]] (Zipf: frequency vs rank; Heaps: vocabulary vs corpus
    * size, V = k·Nᵝ) and the 100 TB planning tool it implies: fit β on
    * today's corpus, extrapolate tokenizer/embedding-table vocabulary at
    * 10× data before paying for the scan.
    *
    * The naive build (distinct-count per corpus prefix) re-scans the
    * corpus once per checkpoint; the relational trick is FIRST-OCCURRENCE
    * REDUCTION: V(prefix ≤ c) = |{terms: min doc_id ≤ c}|, so ONE
    * (term → min doc_id) aggregate answers every checkpoint, and the
    * checkpoint grid is a conditional count over the vocabulary-sized
    * firsts relation. Checkpoints are exact doc_id deciles (Spark
    * `percentile` ≡ DuckDB `quantile_cont`, bit-identical); the OLS fit
    * of ln V on ln N runs over ≤10 points through the q_zipf_fit decimal
    * moment machinery. Output: the growth curve (decile, n_docs, vocab)
    * with the fitted (beta, ln_k) alongside. */
  val qHeapsFit = GraftQuery(
    "q_heaps_fit",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val pcts = (1 to HeapsCheckpoints)
        .map(i => (i / 10.0).toString + "D").mkString(", ")
      val cps = docs.agg(expr(s"percentile(doc_id, array($pcts))").as("cps"))
        .select(posexplode($"cps").as(Seq("i", "cp")))
        .select(($"i" + 1).cast(LongType).as("decile"), $"cp")
      val firsts = Tables.spread(docs)
        .select($"doc_id", explode(Text.tokens($"text")).as("term"))
        .groupBy($"term").agg(min($"doc_id").as("first_doc"))
      val nd = docs.select($"doc_id").crossJoin(broadcast(cps))
        .groupBy($"decile", $"cp")
        .agg(count(when($"doc_id" <= $"cp", 1)).as("n_docs"))
      val vb = firsts.crossJoin(broadcast(cps))
        .groupBy($"decile")
        .agg(count(when($"first_doc" <= $"cp", 1)).as("vocab"))
      val pts = nd.join(vb, Seq("decile"))
      val fit = pts.filter($"n_docs" > 0 && $"vocab" > 0)
        .select(log($"n_docs".cast(DoubleType)).as("x"),
          log($"vocab".cast(DoubleType)).as("y"))
        .agg(
          count(lit(1)).as("np"),
          sum($"x".cast(DecimalType(38, 12))).cast(DoubleType).as("sx"),
          sum($"y".cast(DecimalType(38, 12))).cast(DoubleType).as("sy"),
          sum(($"x" * $"y").cast(DecimalType(38, 12)))
            .cast(DoubleType).as("sxy"),
          sum(($"x" * $"x").cast(DecimalType(38, 12)))
            .cast(DoubleType).as("sxx"))
        .select(
          Det.qround(($"np" * $"sxy" - $"sx" * $"sy") /
            ($"np" * $"sxx" - $"sx" * $"sx")).as("beta"),
          Det.qround(($"sy" * $"sxx" - $"sx" * $"sxy") /
            ($"np" * $"sxx" - $"sx" * $"sx")).as("ln_k"))
      pts.crossJoin(broadcast(fit))
        .select($"decile", $"n_docs", $"vocab", $"beta", $"ln_k")
        .orderBy($"decile")
    },
    Some(s"""
      WITH cps AS (
        SELECT unnest(range(1, ${HeapsCheckpoints + 1})) AS decile,
          unnest(q) AS cp
        FROM (SELECT quantile_cont(doc_id,
          [${(1 to HeapsCheckpoints).map(i => s"${i / 10.0}e0").mkString(", ")}])
          AS q FROM documents)),
      firsts AS (
        SELECT term, min(doc_id) AS first_doc FROM (
          SELECT doc_id,
            unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
          FROM documents)
        GROUP BY term),
      nd AS (
        SELECT decile, cp,
          count(CASE WHEN doc_id <= cp THEN 1 END) AS n_docs
        FROM documents CROSS JOIN cps GROUP BY 1, 2),
      vb AS (
        SELECT decile, count(CASE WHEN first_doc <= cp THEN 1 END) AS vocab
        FROM firsts CROSS JOIN cps GROUP BY 1),
      pts AS (
        SELECT nd.decile, nd.n_docs, vb.vocab
        FROM nd JOIN vb USING (decile)),
      xy AS (
        SELECT ln(n_docs::DOUBLE) AS x, ln(vocab::DOUBLE) AS y
        FROM pts WHERE n_docs > 0 AND vocab > 0),
      m AS (
        SELECT count(*) AS np,
          sum(CAST(x AS DECIMAL(38,12)))::DOUBLE AS sx,
          sum(CAST(y AS DECIMAL(38,12)))::DOUBLE AS sy,
          sum(CAST(x * y AS DECIMAL(38,12)))::DOUBLE AS sxy,
          sum(CAST(x * x AS DECIMAL(38,12)))::DOUBLE AS sxx
        FROM xy),
      fit AS (
        SELECT
          ${Oracle.qround("(np * sxy - sx * sy) / (np * sxx - sx * sx)")}
            AS beta,
          ${Oracle.qround("(sy * sxx - sx * sxy) / (np * sxx - sx * sx)")}
            AS ln_k
        FROM m)
      SELECT decile, n_docs, vocab, beta, ln_k
      FROM pts CROSS JOIN fit
      ORDER BY decile""")
  )

  /** Interpolated Kneser–Ney bigram LM (Kneser & Ney 1995; Chen & Goodman
    * 1999 — THE pre-neural n-gram smoothing, and still the standard
    * data-quality LM a corpus pipeline fits for filtering/perplexity
    * triage) evaluated as held-out cross-entropy — the bigram upgrade of
    * [[qHeldoutXent]]'s add-one unigram. Same salted-md5 split (buckets
    * ≤ 7 train, = 8 val). For a val bigram (w1, w2):
    *
    *   p = (max(c(w1,w2) − D, 0) + D·N1+(w1·)·Pcont(w2)) / c(w1)  if c(w1) > 0
    *   p = Pcont(w2) = N1+(·w2) / N1+(··)                          otherwise
    *
    * with D = 0.75 (a DYADIC discount — exactly representable, so the
    * formula tree stays bit-identical cross-engine). Val bigrams whose w2
    * never ends a train bigram (Pcont = 0) are reported as n_oov and
    * excluded from scoring — the model assigns them no mass, exactly like
    * the unigram query's OOV accounting; backoff_rate reports how much
    * val mass was scored purely through the continuation term (c = 0).
    *
    * Exactness: all five model relations are integer counts off ONE
    * (w1, w2) exchange; p is a fixed double tree over exact integers +
    * the dyadic D; each addend vb·(−ln p) goes through the scale-9
    * decimal cast ([[qHeldoutXent]] precedent).
    *
    * Scale shape: the corpus collapses once to the bigram-type relation
    * (persisted — context totals, continuation counts, type total, and
    * the scored val side all read it); everything downstream is
    * vocabulary/bigram-type-scale, never corpus-scale. */
  val qKneserNey = GraftQuery(
    "q_kneser_ney",
    (spark, dir) => {
      import spark.implicits._
      val bucketed = Tables.spread(Tables.documents(spark, dir))
        .withColumn("bucket",
          expr(PipelineOps.u32Expr("concat('split:', cast(doc_id as string))") + " % 10"))
        .filter($"bucket" <= 8)
      val bc = bucketed
        .select($"bucket",
          explode(call_function("word_shingles_all", $"text", lit(2))).as("bg"))
        .select($"bucket",
          element_at(split($"bg", " "), 1).as("w1"),
          element_at(split($"bg", " "), 2).as("w2"))
        .groupBy($"w1", $"w2")
        .agg(count(when($"bucket" <= 7, 1)).as("cb"),
          count(when($"bucket" === 8, 1)).as("vb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ctx = bc.groupBy($"w1")
        .agg(sum($"cb").as("c1"), count(when($"cb" > 0, 1)).as("n1p"))
      val cont = bc.groupBy($"w2")
        .agg(count(when($"cb" > 0, 1)).as("r1p"))
      val tot = bc.agg(count(when($"cb" > 0, 1)).as("tt"),
        coalesce(sum($"cb"), lit(0L)).as("ntb"))
      bc.filter($"vb" > 0)
        .join(ctx, Seq("w1"))
        .join(cont, Seq("w2"))
        .crossJoin(broadcast(tot))
        .withColumn("p", expr(
          """CASE WHEN r1p = 0 THEN CAST(NULL AS DOUBLE)
               WHEN c1 > 0 THEN
                 (greatest(cb - 0.75, 0.0)
                   + 0.75 * n1p * (CAST(r1p AS DOUBLE) / tt)) / c1
               ELSE CAST(r1p AS DOUBLE) / tt END"""))
        .agg(max($"ntb").as("n_train_bigrams"),
          max($"tt").as("n_bigram_types"),
          sum($"vb").as("n_val_bigrams"),
          coalesce(sum(when($"r1p" === 0, $"vb")), lit(0L)).as("n_oov"),
          coalesce(sum(when($"r1p" > 0 && $"cb" === 0, $"vb")), lit(0L))
            .as("nbk"),
          sum(when($"r1p" > 0, $"vb")).as("nsc"),
          sum(when($"r1p" > 0,
            expr("CAST(CAST(vb AS DOUBLE) * (0 - ln(p)) AS DECIMAL(38,9))")))
            .cast(DoubleType).as("xsum"))
        .select($"n_train_bigrams", $"n_bigram_types", $"n_val_bigrams",
          $"n_oov",
          Det.qround(expr("CAST(nbk AS DOUBLE) / nsc")).as("backoff_rate"),
          Det.qround(expr("xsum / nsc")).as("xent_nats"))
        .orderBy($"n_bigram_types")
    },
    Some(s"""
      WITH split AS (
        SELECT text,
          ${PipelineOps.u32Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10 AS bucket
        FROM documents),
      bgs AS (
        SELECT bucket, string_split(bg, ' ')[1] AS w1,
          string_split(bg, ' ')[2] AS w2
        FROM (
          SELECT bucket,
            unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS bg
          FROM (
            SELECT bucket,
              string_split_regex(lower(text), '[[:space:]]+') AS ws
            FROM split WHERE bucket <= 8))),
      bc AS (
        SELECT w1, w2,
          count(*) FILTER (WHERE bucket <= 7) AS cb,
          count(*) FILTER (WHERE bucket = 8) AS vb
        FROM bgs GROUP BY 1, 2),
      ctx AS (SELECT w1, sum(cb)::BIGINT AS c1,
                count(*) FILTER (WHERE cb > 0) AS n1p
              FROM bc GROUP BY 1),
      cont AS (SELECT w2, count(*) FILTER (WHERE cb > 0) AS r1p
               FROM bc GROUP BY 1),
      tot AS (SELECT count(*) FILTER (WHERE cb > 0)::BIGINT AS tt,
                coalesce(sum(cb), 0)::BIGINT AS ntb
              FROM bc),
      sc AS (
        SELECT bc.cb, bc.vb, ctx.c1, ctx.n1p, cont.r1p, tot.tt, tot.ntb,
          CASE WHEN cont.r1p = 0 THEN NULL
            WHEN ctx.c1 > 0 THEN
              (greatest(cb - 0.75, 0.0)
                + 0.75 * n1p * (CAST(r1p AS DOUBLE) / tt)) / c1
            ELSE CAST(r1p AS DOUBLE) / tt END AS p
        FROM bc JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot
        WHERE vb > 0),
      g AS (
        SELECT max(ntb)::BIGINT AS n_train_bigrams,
          max(tt)::BIGINT AS n_bigram_types,
          sum(vb)::BIGINT AS n_val_bigrams,
          coalesce(sum(vb) FILTER (WHERE r1p = 0), 0)::BIGINT AS n_oov,
          coalesce(sum(vb) FILTER (WHERE r1p > 0 AND cb = 0), 0)::BIGINT AS nbk,
          (sum(vb) FILTER (WHERE r1p > 0))::BIGINT AS nsc,
          (sum(CAST(CAST(vb AS DOUBLE) * (0 - ln(p)) AS DECIMAL(38,9)))
            FILTER (WHERE r1p > 0))::DOUBLE AS xsum
        FROM sc)
      SELECT n_train_bigrams, n_bigram_types, n_val_bigrams, n_oov,
        ${Oracle.qround("CAST(nbk AS DOUBLE) / nsc")} AS backoff_rate,
        ${Oracle.qround("xsum / nsc")} AS xent_nats
      FROM g ORDER BY n_bigram_types""")
  )

  /** Per-document Kneser–Ney surprisal — the CCNet-style LM quality
    * signal at the DOCUMENT level (Wenzek et al. 2020 rank documents by
    * LM perplexity and keep/weight by bucket): score every document's
    * bigrams under the SAME interpolated-KN bigram model [[qKneserNey]]
    * fits on the train split (salted-md5 buckets ≤ 7), and roll up to a
    * per-doc mean bigram surprisal. Low = the model finds the text
    * predictable (boilerplate-ish); high = rare constructions
    * (specialist text or garbage) — the ranking a curation pipeline
    * thresholds or stratifies on. Val-split docs get genuinely held-out
    * scores; train-split docs are scored in-sample, exactly like CCNet
    * scoring the very corpus its LM came from.
    *
    * Model identity: the five model relations (bigram counts, context
    * totals, continuation counts, type total) are built from train
    * bigrams only — numerically IDENTICAL to [[qKneserNey]]'s (its bc
    * relation carries val-only rows with cb = 0, which contribute
    * nothing to any model statistic). Bigrams whose w2 never ends a
    * train bigram (Pcont = 0) are the per-doc n_oov, excluded from the
    * mean — the corpus-level query's OOV accounting, per document.
    *
    * Exactness: p is the same fixed double tree over exact integers and
    * the dyadic D = 0.75; each addend n·(−ln p) goes through the
    * scale-9 decimal cast so within-doc order cannot perturb the sum;
    * docs with no scorable bigram report NULL (guarded division).
    *
    * Scale shape: ONE (doc, w1, w2) exchange feeds both the model build
    * and the scoring probe (persisted); model relations are
    * bigram-type/vocabulary-scale — they broadcast when they fit and
    * AQE shuffle-joins on (w1, w2)/(w1)/(w2) otherwise; the per-doc
    * rollup is one partial+final aggregate on doc_id. Nothing after the
    * first exchange is corpus-token-scale. */
  /** Per-(doc, bucket, bigram) counts — the shared collapse the KN
    * document scorer and its streaming maintainer
    * ([[graft.streaming.StreamKn]]) both start from: one row per distinct
    * (doc, w1, w2) with its in-doc multiplicity and the salted-md5 split
    * bucket riding along. */
  private[graft] def knDocBigrams(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("bucket",
        expr(PipelineOps.u32Expr("concat('split:', cast(doc_id as string))") + " % 10"))
      .select($"doc_id", $"bucket",
        explode(call_function("word_shingles_all", $"text", lit(2))).as("bg"))
      .select($"doc_id", $"bucket",
        element_at(split($"bg", " "), 1).as("w1"),
        element_at(split($"bg", " "), 2).as("w2"))
      .groupBy($"doc_id", $"bucket", $"w1", $"w2")
      .agg(count(lit(1)).as("n"))
  }

  /** Train-split bigram counts (w1, w2, cb) from a [[knDocBigrams]]
    * relation — ADDITIVE integer counters, which is what lets
    * [[graft.streaming.StreamKn]] maintain the model as a per-batch delta
    * log whose fold equals this batch build exactly. */
  private[graft] def knTrainCounts(db: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import db.sparkSession.implicits._
    db.filter($"bucket" <= 7)
      .groupBy($"w1", $"w2").agg(sum($"n").as("cb"))
  }

  /** Score a [[knDocBigrams]] relation against a (w1, w2, cb) model —
    * the full interpolated-KN per-doc readout shared by
    * [[qKnDocSurprisal]] and the streaming maintainer's reader, so the
    * two surfaces can never drift. The caller persists `bc` (consumed by
    * the probe join and the three derived model relations). */
  private[graft] def knScoreDocs(db: org.apache.spark.sql.DataFrame,
      bc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import db.sparkSession.implicits._
    val ctx = bc.groupBy($"w1")
      .agg(sum($"cb").as("c1"), count(lit(1)).as("n1p"))
    val cont = bc.groupBy($"w2").agg(count(lit(1)).as("r1p"))
    val tot = bc.agg(count(lit(1)).as("tt"))
    db.join(bc, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select($"doc_id", $"n",
        coalesce($"cb", lit(0L)).as("cb"),
        coalesce($"c1", lit(0L)).as("c1"),
        coalesce($"n1p", lit(0L)).as("n1p"),
        coalesce($"r1p", lit(0L)).as("r1p"), $"tt")
      .withColumn("p", expr(
        """CASE WHEN r1p = 0 THEN CAST(NULL AS DOUBLE)
             WHEN c1 > 0 THEN
               (greatest(cb - 0.75, 0.0)
                 + 0.75 * n1p * (CAST(r1p AS DOUBLE) / tt)) / c1
             ELSE CAST(r1p AS DOUBLE) / tt END"""))
      .groupBy($"doc_id")
      .agg(sum($"n").as("n_bigrams"),
        coalesce(sum(when($"r1p" === 0, $"n")), lit(0L)).as("n_oov"),
        coalesce(sum(when($"r1p" > 0, $"n")), lit(0L)).as("nsc"),
        sum(when($"r1p" > 0,
          expr("CAST(CAST(n AS DOUBLE) * (0 - ln(p)) AS DECIMAL(38,9))")))
          .cast(DoubleType).as("xsum"))
      .select($"doc_id", $"n_bigrams", $"n_oov",
        when($"nsc" > 0, Det.qround($"xsum" / $"nsc"))
          .as("surprisal_nats"))
      .orderBy($"doc_id")
  }

  val qKnDocSurprisal = GraftQuery(
    "q_kn_doc_surprisal",
    (spark, dir) => {
      // per-(doc, bigram) counts — persisted: the model build and the
      // scoring probe both read it
      val db = knDocBigrams(Tables.spread(Tables.documents(spark, dir)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // train-split model — numerically identical to qKneserNey's
      val bc = knTrainCounts(db)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      knScoreDocs(db, bc)
    },
    Some(s"""
      WITH split AS (
        SELECT doc_id, text,
          ${PipelineOps.u32Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10 AS bucket
        FROM documents),
      bgs AS (
        SELECT doc_id, bucket, string_split(bg, ' ')[1] AS w1,
          string_split(bg, ' ')[2] AS w2
        FROM (
          SELECT doc_id, bucket,
            unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS bg
          FROM (
            SELECT doc_id, bucket,
              string_split_regex(lower(text), '[[:space:]]+') AS ws
            FROM split))),
      db AS (
        SELECT doc_id, bucket, w1, w2, count(*)::BIGINT AS n
        FROM bgs GROUP BY 1, 2, 3, 4),
      bc AS (
        SELECT w1, w2, sum(n)::BIGINT AS cb
        FROM db WHERE bucket <= 7 GROUP BY 1, 2),
      ctx AS (SELECT w1, sum(cb)::BIGINT AS c1, count(*)::BIGINT AS n1p
              FROM bc GROUP BY 1),
      cont AS (SELECT w2, count(*)::BIGINT AS r1p FROM bc GROUP BY 1),
      tot AS (SELECT count(*)::BIGINT AS tt FROM bc),
      sc AS (
        SELECT db.doc_id, db.n,
          coalesce(bc.cb, 0) AS cb, coalesce(ctx.c1, 0) AS c1,
          coalesce(ctx.n1p, 0) AS n1p, coalesce(cont.r1p, 0) AS r1p, tot.tt,
          CASE WHEN coalesce(cont.r1p, 0) = 0 THEN NULL
            WHEN coalesce(ctx.c1, 0) > 0 THEN
              (greatest(coalesce(bc.cb, 0) - 0.75, 0.0)
                + 0.75 * ctx.n1p * (CAST(cont.r1p AS DOUBLE) / tot.tt))
                / ctx.c1
            ELSE CAST(cont.r1p AS DOUBLE) / tot.tt END AS p
        FROM db LEFT JOIN bc USING (w1, w2) LEFT JOIN ctx USING (w1)
          LEFT JOIN cont USING (w2) CROSS JOIN tot),
      g AS (
        SELECT doc_id, sum(n)::BIGINT AS n_bigrams,
          coalesce(sum(n) FILTER (WHERE r1p = 0), 0)::BIGINT AS n_oov,
          coalesce(sum(n) FILTER (WHERE r1p > 0), 0)::BIGINT AS nsc,
          (sum(CAST(CAST(n AS DOUBLE) * (0 - ln(p)) AS DECIMAL(38,9)))
            FILTER (WHERE r1p > 0))::DOUBLE AS xsum
        FROM sc GROUP BY doc_id)
      SELECT doc_id, n_bigrams, n_oov,
        CASE WHEN nsc > 0 THEN ${Oracle.qround("xsum / nsc")}
        END AS surprisal_nats
      FROM g ORDER BY doc_id""")
  )

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3: rank
    * documents by LM perplexity, cut the distribution into head / middle
    * / tail thirds, and treat the bucket as the quality stratum a
    * curation recipe keeps, downsamples, or drops): the per-doc KN
    * surprisal scores ([[qKnDocSurprisal]]'s exact relation) are cut at
    * the exact 1/3 and 2/3 quantiles, and each bucket reports its
    * document count, bigram token mass, and mean surprisal — the
    * stratification table a mixing recipe reads. Docs whose every bigram
    * is OOV under the train-split model land in a fourth `oov` bucket
    * (no score to rank on — the bucket a real pipeline routes to
    * language-ID re-check).
    *
    * Exactness: bucket thresholds are EXACT ORDER STATISTICS — the
    * smallest score whose cumulative count reaches ⌈n/3⌉ resp. ⌈2n/3⌉,
    * computed in integer arithmetic over the 6-dp score VALUE DOMAIN.
    * Interpolated quantiles are deliberately avoided here: at a tied
    * boundary Spark's `a + g·(b−a)` and DuckDB's `(1−g)·a + g·b`
    * disagree in the last ulp even when a = b (measured at sf0.1:
    * 3.4060440000000001 vs …39999999996), silently flipping boundary
    * docs across engines. Data-valued thresholds compare exactly;
    * reported thresholds and means go through
    * [[graft.functions.Det.qround]]; the mean sums already-rounded
    * per-doc scores through the decimal cast (order-free).
    *
    * Scale shape: everything after the [[knScoreDocs]] pass collapses to
    * the bounded 6-dp score value domain (the q_mwu_test discipline) —
    * the cumulative window runs on that domain, never the docs; the two
    * thresholds return as a broadcast 1-row relation and the rollup is
    * one 4-row aggregate. */
  val qCcnetBuckets = GraftQuery(
    "q_ccnet_buckets",
    (spark, dir) => {
      import spark.implicits._
      val db = knDocBigrams(Tables.spread(Tables.documents(spark, dir)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bc = knTrainCounts(db)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // scored docs feed the threshold aggregate AND the bucket rollup
      val scored = knScoreDocs(db, bc)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vd = scored.filter($"surprisal_nats".isNotNull)
        .groupBy($"surprisal_nats".as("v")).agg(count(lit(1)).as("f"))
      val cumW = org.apache.spark.sql.expressions.Window.orderBy($"v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val thr = vd
        .select($"v", sum($"f").over(cumW).as("cf"))
        .crossJoin(broadcast(vd.agg(coalesce(sum($"f"), lit(0L)).as("nn"))))
        .agg(min(when($"cf" * 3 >= $"nn", $"v")).as("q33"),
          min(when($"cf" * 3 >= $"nn" * 2, $"v")).as("q66"))
      scored.crossJoin(broadcast(thr))
        .select($"n_bigrams", $"surprisal_nats", $"q33", $"q66",
          when($"surprisal_nats".isNull, "oov")
            .when($"surprisal_nats" <= $"q33", "head")
            .when($"surprisal_nats" <= $"q66", "middle")
            .otherwise("tail").as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_bigrams").as("n_bigrams"),
          Det.qround(
            sum($"surprisal_nats".cast(DecimalType(38, Det.Scale)))
              .cast(DoubleType) / count($"surprisal_nats"))
            .as("mean_surprisal"),
          Det.qround(max($"q33")).as("q33"),
          Det.qround(max($"q66")).as("q66"))
        .orderBy($"bucket")
    },
    Some(s"""
      WITH split AS (
        SELECT doc_id, text,
          ${PipelineOps.u32Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10 AS bucket
        FROM documents),
      bgs AS (
        SELECT doc_id, bucket, string_split(bg, ' ')[1] AS w1,
          string_split(bg, ' ')[2] AS w2
        FROM (
          SELECT doc_id, bucket,
            unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS bg
          FROM (
            SELECT doc_id, bucket,
              string_split_regex(lower(text), '[[:space:]]+') AS ws
            FROM split))),
      db AS (
        SELECT doc_id, bucket, w1, w2, count(*)::BIGINT AS n
        FROM bgs GROUP BY 1, 2, 3, 4),
      bcm AS (
        SELECT w1, w2, sum(n)::BIGINT AS cb
        FROM db WHERE bucket <= 7 GROUP BY 1, 2),
      ctx AS (SELECT w1, sum(cb)::BIGINT AS c1, count(*)::BIGINT AS n1p
              FROM bcm GROUP BY 1),
      cont AS (SELECT w2, count(*)::BIGINT AS r1p FROM bcm GROUP BY 1),
      tot AS (SELECT count(*)::BIGINT AS tt FROM bcm),
      sc AS (
        SELECT db.doc_id, db.n, coalesce(cont.r1p, 0) AS r1p,
          CASE WHEN coalesce(cont.r1p, 0) = 0 THEN NULL
            WHEN coalesce(ctx.c1, 0) > 0 THEN
              (greatest(coalesce(bcm.cb, 0) - 0.75, 0.0)
                + 0.75 * ctx.n1p * (CAST(cont.r1p AS DOUBLE) / tot.tt))
                / ctx.c1
            ELSE CAST(cont.r1p AS DOUBLE) / tot.tt END AS p
        FROM db LEFT JOIN bcm USING (w1, w2) LEFT JOIN ctx USING (w1)
          LEFT JOIN cont USING (w2) CROSS JOIN tot),
      g AS (
        SELECT doc_id, sum(n)::BIGINT AS n_bigrams,
          coalesce(sum(n) FILTER (WHERE r1p > 0), 0)::BIGINT AS nsc,
          (sum(CAST(CAST(n AS DOUBLE) * (0 - ln(p)) AS DECIMAL(38,9)))
            FILTER (WHERE r1p > 0))::DOUBLE AS xsum
        FROM sc GROUP BY doc_id),
      scored AS (
        SELECT doc_id, n_bigrams,
          CASE WHEN nsc > 0 THEN ${Oracle.qround("xsum / nsc")}
          END AS s
        FROM g),
      vd AS (
        SELECT s AS v, count(*)::BIGINT AS f
        FROM scored WHERE s IS NOT NULL GROUP BY 1),
      cum AS (
        SELECT v, (sum(f) OVER (ORDER BY v ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cf
        FROM vd),
      nn AS (SELECT coalesce(sum(f), 0)::BIGINT AS nn FROM vd),
      thr AS (
        SELECT min(CASE WHEN cf * 3 >= nn THEN v END) AS q33,
          min(CASE WHEN cf * 3 >= nn * 2 THEN v END) AS q66
        FROM cum CROSS JOIN nn)
      SELECT
        CASE WHEN s IS NULL THEN 'oov'
          WHEN s <= q33 THEN 'head'
          WHEN s <= q66 THEN 'middle'
          ELSE 'tail' END AS bucket,
        count(*)::BIGINT AS n_docs,
        sum(n_bigrams)::BIGINT AS n_bigrams,
        ${Oracle.qround(
          "sum(CAST(s AS DECIMAL(38,9)))::DOUBLE / count(s)")}
          AS mean_surprisal,
        ${Oracle.qround("max(q33)")} AS q33,
        ${Oracle.qround("max(q66)")} AS q66
      FROM scored CROSS JOIN thr
      GROUP BY 1 ORDER BY 1""")
  )

  /** Hill-plot evaluation points for [[qHillTail]]. */
  val HillKs: Seq[Int] = Seq(10, 25, 50)

  /** Hill tail-index estimator over the token frequency distribution
    * (Hill 1975) — the direct order-statistics estimate of the power-law
    * exponent that [[qZipfFit]] gets by log-log regression: for the k
    * largest frequencies X₍₁₎ ≥ … ≥ X₍ₖ₊₁₎,
    * α̂_k = k / Σ_{i≤k} (ln X₍ᵢ₎ − ln X₍ₖ₊₁₎). Emitted at the three
    * [[HillKs]] depths side by side — the "Hill plot" readout whose
    * stability across k tells a corpus owner whether the head really is
    * power-law (stable α̂) or just heavy (drifting α̂); read together with
    * q_zipf_fit's slope it is the standard two-estimator cross-check.
    *
    * Scale shape: ONE (term → cf) aggregate, then a TakeOrdered of the
    * max(k)+1 = ${51} head rows — the Hill statistic only ever touches a
    * BOUNDED prefix of the frequency ranking, so there is no corpus-wide
    * window here at all (cheaper than the Zipf regression, which scans
    * the whole vocabulary). ln addends ride DECIMAL(38,12) (the q_zipf_fit
    * discipline); a k with fewer than k+1 distinct terms produces no row
    * (inner join), and an all-tied head (denominator 0) degrades to a
    * null α̂ rather than an error. */
  /** The Hill-plot readout from a (term, cf) relation — shared by
    * [[qHillTail]] and the streaming maintainer's fold. */
  private[graft] def hillFromCf(cfIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = cfIn.sparkSession
    import spark.implicits._
    val maxK = HillKs.max
    val top = cfIn.orderBy($"cf".desc, $"term").limit(maxK + 1)
      .withColumn("rnk",
        row_number().over(Window.orderBy($"cf".desc, $"term")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ks = HillKs.map(_.toLong).toDF("k")
    val thr = top.join(broadcast(ks), $"rnk" === $"k" + 1)
      .select($"k", $"cf".as("xk1"),
        log($"cf".cast(DoubleType)).as("lnxk"))
    val sums = top.join(broadcast(ks), $"rnk" <= $"k")
      .groupBy($"k")
      .agg(sum(log($"cf".cast(DoubleType)).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("slncf"))
    thr.join(sums, Seq("k"))
      .select($"k", $"xk1",
        when($"slncf" - $"k" * $"lnxk" > 0,
          Det.qround($"k" / ($"slncf" - $"k" * $"lnxk")))
          .as("alpha_hill"))
      .orderBy($"k")
  }

  val qHillTail = GraftQuery(
    "q_hill_tail",
    (spark, dir) =>
      hillFromCf(cfOf(Tables.spread(Tables.documents(spark, dir)))),
    Some(s"""
      WITH cf AS (
        SELECT term, count(*) AS cf
        FROM (SELECT unnest(string_split_regex(lower(text), '[[:space:]]+'))
                AS term FROM documents)
        GROUP BY term),
      top AS (
        SELECT cf, row_number() OVER (ORDER BY cf DESC, term) AS rnk
        FROM cf ORDER BY cf DESC, term LIMIT ${HillKs.max + 1}),
      ks AS (SELECT unnest([${HillKs.mkString(", ")}])::BIGINT AS k),
      thr AS (
        SELECT k, cf AS xk1, ln(cf::DOUBLE) AS lnxk
        FROM top JOIN ks ON rnk = k + 1),
      s AS (
        SELECT k,
          sum(CAST(ln(cf::DOUBLE) AS DECIMAL(38,12)))::DOUBLE AS slncf
        FROM top JOIN ks ON rnk <= k GROUP BY k)
      SELECT k, xk1,
        CASE WHEN slncf - k * lnxk > 0
          THEN ${Oracle.qround("k / (slncf - k * lnxk)")} END AS alpha_hill
      FROM thr JOIN s USING (k)
      ORDER BY k""")
  )

  /** Chao1 species-richness estimate of the vocabulary (Chao 1984) plus
    * the Good–Turing unseen-mass estimate — the "how much vocabulary have
    * we NOT crawled yet" readout a corpus-coverage plan reads beside
    * [[qHeapsFit]]'s growth curve: from the frequency-of-frequencies
    * spectrum alone, Chao1 = V + f₁²/(2f₂) lower-bounds the true
    * vocabulary size (bias-corrected form f₁(f₁−1)/(2(f₂+1)) when f₂ = 0),
    * and the Good–Turing coverage estimate Ĉ = 1 − f₁/N gives the
    * probability mass of unseen types. Also emits the head of the
    * spectrum itself (f₁, f₂) — the sufficient statistics.
    *
    * Exactness: V, N, f₁, f₂ are exact integers from a two-level
    * aggregate (term counts → frequency-of-frequency counts); the two
    * estimates are one IEEE division each, [[Det.qround]]ed. Scale shape:
    * the first aggregate is the same (term → cf) collapse the Zipf/Hill
    * family makes; the spectrum is a ≤|distinct cf|-row re-aggregate
    * (q_refs_global two-level discipline). */
  /** The Chao1/Good–Turing readout from a (term, cf) relation — shared by
    * [[qChao1]] and the streaming maintainer's fold. */
  private[graft] def chao1FromCf(cfIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = cfIn.sparkSession
    import spark.implicits._
    cfIn.agg(
        count(lit(1)).as("v_obs"),
        sum($"cf").as("n_tokens"),
        sum(when($"cf" === 1, 1L).otherwise(0L)).as("f1"),
        sum(when($"cf" === 2, 1L).otherwise(0L)).as("f2"))
      .select($"v_obs", $"n_tokens", $"f1", $"f2",
        Det.qround($"v_obs" +
          when($"f2" > 0,
            $"f1".cast(DoubleType) * $"f1" / (lit(2.0) * $"f2"))
          .otherwise(
            $"f1".cast(DoubleType) * ($"f1" - 1) / lit(2.0)))
          .as("chao1"),
        Det.qround(lit(1.0) -
          $"f1".cast(DoubleType) / $"n_tokens").as("gt_coverage"))
  }

  val qChao1 = GraftQuery(
    "q_chao1",
    (spark, dir) =>
      chao1FromCf(cfOf(Tables.spread(Tables.documents(spark, dir)))),
    Some(s"""
      WITH cf AS (
        SELECT term, count(*) AS cf
        FROM (SELECT unnest(string_split_regex(lower(text), '[[:space:]]+'))
                AS term FROM documents)
        GROUP BY term),
      s AS (
        SELECT count(*)::BIGINT AS v_obs, sum(cf)::BIGINT AS n_tokens,
          sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
          sum(CASE WHEN cf = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
        FROM cf)
      SELECT v_obs, n_tokens, f1, f2,
        ${Oracle.qround(
          """v_obs + CASE WHEN f2 > 0
               THEN f1::DOUBLE * f1 / (2.0 * f2)
               ELSE f1::DOUBLE * (f1 - 1) / 2.0 END""")} AS chao1,
        ${Oracle.qround("1.0 - f1::DOUBLE / n_tokens")} AS gt_coverage
      FROM s
      ORDER BY v_obs""")
  )

  /** Data-scaling ladder — the "does more data still help" curation-ROI
    * diagnostic (the empirical-scaling-law shape of Kaplan et al. 2020 /
    * Hoffmann et al. 2022, instrumented on the unigram LM this engine can
    * fit exactly): held-out cross-entropy under [[qHeldoutXent]]'s add-1
    * unigram model trained on NESTED PREFIXES of the train split — 1, 2,
    * 4, all 8 of the salted-md5 train buckets, every rung evaluated on
    * the SAME val bucket (8), so the k = 8 rung IS q_heldout_xent's
    * readout verbatim (LexicalStatsSpec pins the bit-equality). Per lang,
    * the rungs feed a log-log OLS fit (the q_zipf_fit machinery):
    * slope = d ln(xent)/d ln(D) — the local power-law exponent a curation
    * team reads as "one more doubling of this source buys slope·ln2 nats"
    * — and the fitted line extrapolates to `xent_at_10x`, the predicted
    * loss at 10× the current train mass. Rising oov with falling xent
    * along the ladder shows WHERE the gain comes from (vocabulary
    * coverage vs distribution sharpening).
    *
    * Exactness: every count is integer from ONE (lang, term) exchange
    * (the four prefix counts + val count are conditional aggregates of
    * the same pass); xent addends are single-ln doubles decimal-summed
    * (q_heldout_xent precedent); the 4-point OLS runs on ln of the
    * already-qrounded xent values through scale-12 decimal sums
    * (q_zipf_fit precedent); a degenerate ladder (all mass in one
    * bucket ⇒ zero x-variance) yields NULL slope/extrapolation, not NaN.
    *
    * Scale shape: ONE corpus exchange to (lang, term) counts; the ×4
    * prefix fan-out happens on the VOCABULARY-sized relation; everything
    * after is ≤|langs|×4 rows. The corpus never shuffles twice. */
  /** The full ladder + fit readout from the shared tf relation — shared
    * by [[qScalingLaw]] and the streaming maintainer's fold. */
  private[graft] def scalingReport(tfIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = tfIn.sparkSession
    import spark.implicits._
    {
      val tf = tfIn
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pre = tf.selectExpr("lang", "term", "vtf",
        "stack(4, 1L, ctf1, 2L, ctf2, 4L, ctf4, 8L, ctf8) as (k, ctf)")
      val st = pre.groupBy($"lang", $"k")
        .agg(sum($"ctf").as("n_train"),
          count(when($"ctf" > 0, 1)).as("vocab"),
          sum($"vtf").as("n_val"))
      val xe = pre.filter($"vtf" > 0)
        .join(broadcast(st), Seq("lang", "k"))
        .groupBy($"lang", $"k", $"n_train", $"vocab", $"n_val")
        .agg(coalesce(sum(when($"ctf" === 0, $"vtf")), lit(0L)).as("n_oov"),
          sum(($"vtf".cast(DoubleType) *
            log(($"n_train" + $"vocab" + 1).cast(DoubleType) /
              ($"ctf" + 1).cast(DoubleType)))
            .cast(DecimalType(38, Det.Scale))).cast(DoubleType).as("xsum"))
        .filter($"n_train" > 0 && $"n_val" > 0)
        .select($"lang", $"k", $"n_train", $"vocab", $"n_val",
          Det.qround($"n_oov" * lit(1.0) / $"n_val").as("oov_rate"),
          Det.qround($"xsum" / $"n_val").as("xent_nats"))
      val fit = xe.filter($"xent_nats" > 0)
        .select($"lang", log($"n_train".cast(DoubleType)).as("x"),
          log($"xent_nats").as("y"), $"n_train")
        .groupBy($"lang")
        .agg(count(lit(1)).as("np"),
          sum($"x".cast(DecimalType(38, 12))).cast(DoubleType).as("sx"),
          sum($"y".cast(DecimalType(38, 12))).cast(DoubleType).as("sy"),
          sum(($"x" * $"y").cast(DecimalType(38, 12)))
            .cast(DoubleType).as("sxy"),
          sum(($"x" * $"x").cast(DecimalType(38, 12)))
            .cast(DoubleType).as("sxx"),
          max($"n_train").as("n_max"))
        .withColumn("den", expr("np * sxx - sx * sx"))
        .select($"lang",
          when($"den" =!= 0.0,
            Det.qround(expr("(np * sxy - sx * sy) / den"))).as("slope"),
          when($"den" =!= 0.0,
            Det.qround(expr("(sy * sxx - sx * sxy) / den"))).as("icept"),
          $"n_max")
      xe.join(broadcast(fit), Seq("lang"))
        .select($"lang", $"k".as("frac_eighths"),
          $"n_train".as("n_train_tokens"), $"vocab",
          $"n_val".as("n_val_tokens"), $"oov_rate", $"xent_nats", $"slope",
          when($"slope".isNotNull, Det.qround(
            exp($"icept" + $"slope" * log(lit(10.0) * $"n_max"))))
            .as("xent_at_10x"))
        .orderBy($"lang", $"frac_eighths")
    }
  }

  val qScalingLaw = GraftQuery(
    "q_scaling_law",
    (spark, dir) =>
      scalingReport(xentTf(Tables.spread(Tables.documents(spark, dir)))),
    Some(s"""
      WITH split AS (
        SELECT lang, text,
          ${PipelineOps.u32Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10
            AS bucket
        FROM documents),
      toks AS (
        SELECT lang, bucket,
          unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
        FROM split WHERE bucket <= 8),
      tf AS (
        SELECT lang, term,
          count(*) FILTER (WHERE bucket <= 0) AS ctf1,
          count(*) FILTER (WHERE bucket <= 1) AS ctf2,
          count(*) FILTER (WHERE bucket <= 3) AS ctf4,
          count(*) FILTER (WHERE bucket <= 7) AS ctf8,
          count(*) FILTER (WHERE bucket = 8) AS vtf
        FROM toks GROUP BY lang, term),
      pre AS (
        SELECT lang, term, vtf, kk.k,
          CASE kk.k WHEN 1 THEN ctf1 WHEN 2 THEN ctf2 WHEN 4 THEN ctf4
            ELSE ctf8 END AS ctf
        FROM tf CROSS JOIN (SELECT unnest([1, 2, 4, 8])::BIGINT AS k) kk),
      st AS (
        SELECT lang, k, sum(ctf)::BIGINT AS n_train,
          (count(*) FILTER (WHERE ctf > 0))::BIGINT AS vocab,
          sum(vtf)::BIGINT AS n_val
        FROM pre GROUP BY lang, k),
      xe AS (
        SELECT p.lang, p.k, n_train, vocab, n_val,
          ${Oracle.qround(
            "coalesce(sum(vtf) FILTER (WHERE ctf = 0), 0) * 1.0 / n_val")}
            AS oov_rate,
          ${Oracle.qround(
            "sum(CAST(vtf::DOUBLE * ln((n_train + vocab + 1)::DOUBLE /" +
              " (ctf + 1)::DOUBLE) AS DECIMAL(38,9)))::DOUBLE / n_val")}
            AS xent_nats
        FROM pre p JOIN st USING (lang, k)
        WHERE p.vtf > 0
        GROUP BY p.lang, p.k, n_train, vocab, n_val
        HAVING n_train > 0 AND n_val > 0),
      fitin AS (
        SELECT lang, ln(n_train::DOUBLE) AS x, ln(xent_nats) AS y, n_train
        FROM xe WHERE xent_nats > 0),
      fit0 AS (
        SELECT lang, count(*)::BIGINT AS np,
          sum(CAST(x AS DECIMAL(38,12)))::DOUBLE AS sx,
          sum(CAST(y AS DECIMAL(38,12)))::DOUBLE AS sy,
          sum(CAST(x * y AS DECIMAL(38,12)))::DOUBLE AS sxy,
          sum(CAST(x * x AS DECIMAL(38,12)))::DOUBLE AS sxx,
          max(n_train)::BIGINT AS n_max
        FROM fitin GROUP BY lang),
      fit AS (
        SELECT lang, np * sxx - sx * sx AS den,
          CASE WHEN np * sxx - sx * sx <> 0.0 THEN
            ${Oracle.qround("(np * sxy - sx * sy) / (np * sxx - sx * sx)")}
          END AS slope,
          CASE WHEN np * sxx - sx * sx <> 0.0 THEN
            ${Oracle.qround("(sy * sxx - sx * sxy) / (np * sxx - sx * sx)")}
          END AS icept,
          n_max
        FROM fit0)
      SELECT xe.lang, k AS frac_eighths, n_train AS n_train_tokens, vocab,
        n_val AS n_val_tokens, oov_rate, xent_nats, slope,
        CASE WHEN slope IS NOT NULL THEN
          ${Oracle.qround("exp(icept + slope * ln(10.0 * n_max))")}
        END AS xent_at_10x
      FROM xe JOIN fit USING (lang)
      ORDER BY lang, frac_eighths""")
  )

  /** Mixture rebalancing from per-source excess loss — the DoReMi shape
    * (Xie et al. 2023) instrumented on the unigram LM this engine fits
    * exactly: per source, score the source's OWN untouched val split
    * (q_train_split's buckets: ≤ 7 train, = 8 val) under TWO add-1
    * unigram LMs — the GLOBAL train LM (the proxy trained on the current
    * uniform-ish mixture) and the source's SELF LM (the per-domain
    * reference) — and read excess = xent_global − xent_self: how much the
    * shared model underserves this source. Weights follow DoReMi's
    * exponentiated-excess update on the token-share prior:
    * w_s ∝ (N_s / N_g) · exp(excess_s), normalized — the "which sources
    * deserve more epochs" number a data-mixing run feeds back into
    * q_epoch_plan / q_temperature_mix. A NEGATIVE excess is honest too
    * (tiny sources whose self-LM generalizes worse than the pool). A
    * source with NO val-split tokens keeps its row — NULL xents/excess,
    * prior-only weight — so the table always covers the full mixture
    * (round-15 advice: the vtf>0 filter used to silently drop it and
    * renormalize over a subset).
    *
    * Exactness: all counts are integers off ONE (source, term) exchange;
    * each xent addend is one ln of a double quotient of exact integers
    * (the q_heldout_xent precedent), decimal-summed; excess is a
    * difference of qround'd doubles; exp runs on the qround'd excess
    * (identical input both engines); the weight normalizer is a
    * decimal-cast sum of the raw weights.
    *
    * Scale shape: one corpus token pass into the (source, term)
    * exchange; the global ctf is a term-level re-aggregate of that
    * vocabulary-sized relation joined back on term (vocab × vocab keyed
    * join); normalizers are ≤|sources|-row and 1-row aggregates
    * broadcast back; the readout is |sources| rows. The corpus never
    * shuffles twice. */
  /** The (source, term, ctf, vtf) split-count collapse — ADDITIVE over
    * document slices (split buckets are per-doc constants), shared by
    * [[qMixRebalance]] and graft.streaming.StreamMix's maintained fold. */
  private[graft] def mixSt(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("bucket", expr(PipelineOps.u32Expr(
        "concat('split:', cast(doc_id as string))") + " % 10"))
      .filter($"bucket" <= 8)
      .select($"source", $"bucket",
        explode(Text.tokens($"text")).as("term"))
      .groupBy($"source", $"term")
      .agg(count(when($"bucket" <= 7, 1)).as("ctf"),
        count(when($"bucket" === 8, 1)).as("vtf"))
  }

  /** The |sources|-row rebalance table from a (source, term, ctf, vtf)
    * relation — shared by [[qMixRebalance]] and the streaming
    * maintainer's fold. */
  private[graft] def mixReport(stIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = stIn.sparkSession
    import spark.implicits._
    // eager (was lazy persist): tg, ns and the scored join materialize as
    // concurrent subqueries, each re-running the (source, term) corpus
    // aggregate behind a lazily-persisted st; tg and ns are themselves
    // each consumed twice (totals + join), so they cache too
    val st = Tables.eager(stIn)
    locally {
      val tg = Tables.eager(st.groupBy($"term").agg(sum($"ctf").as("ctf_g")))
      val ng = tg.agg(sum($"ctf_g").as("n_g"),
        count(when($"ctf_g" > 0, 1)).as("v_g"))
      val ns = Tables.eager(st.groupBy($"source")
        .agg(sum($"ctf").as("n_s"), count(when($"ctf" > 0, 1)).as("v_s"),
          sum($"vtf").as("n_val")))
      val scored = st.filter($"vtf" > 0)
        .join(tg, "term").join(ns, "source").crossJoin(broadcast(ng))
        .groupBy($"source")
        .agg(
          sum(expr("CAST(vtf * ln(CAST(n_g + v_g + 1 AS DOUBLE) / " +
            "(ctf_g + 1)) AS DECIMAL(38,9))")).as("sg"),
          sum(expr("CAST(vtf * ln(CAST(n_s + v_s + 1 AS DOUBLE) / " +
            "(ctf + 1)) AS DECIMAL(38,9))")).as("ss"))
      // source list derives from ns (ALL sources), the xent legs join
      // LEFT: a source with zero val-split tokens must not vanish from
      // the mixture table (its weight renormalizing the rest over a
      // subset — round-15 advice). It degrades to NULL xents/excess and
      // a prior-only weight (exp(0) = 1), keeping the DoReMi table a
      // full-coverage distribution.
      val ex = ns.join(scored, Seq("source"), "left")
        .crossJoin(broadcast(ng.select($"n_g")))
        .select($"source", $"n_s", $"n_val",
          Det.qround($"sg".cast(DoubleType) / $"n_val").as("xent_global"),
          Det.qround($"ss".cast(DoubleType) / $"n_val").as("xent_self"),
          ($"n_s".cast(DoubleType) / $"n_g").as("prior"))
        .withColumn("excess",
          Det.qround($"xent_global" - $"xent_self"))
        .withColumn("w_raw", $"prior" * exp(coalesce($"excess", lit(0.0))))
      // normalizer as an unpartitioned window over the |sources|-row
      // relation (bounded) — same exact decimal sum as the former
      // agg+broadcast crossJoin, one barrier fewer (and ex is no longer
      // consumed twice)
      val allW = org.apache.spark.sql.expressions.Window.partitionBy()
        .rowsBetween(Long.MinValue, Long.MaxValue)
      ex.withColumn("z", sum($"w_raw".cast(DecimalType(38, Det.Scale)))
          .over(allW).cast(DoubleType))
        .select($"source", $"n_s".as("n_train_tokens"),
          $"n_val".as("n_val_tokens"), $"xent_global", $"xent_self",
          $"excess", Det.qround($"w_raw" / $"z").as("weight"))
        .orderBy($"source")
    }
  }

  val qMixRebalance = GraftQuery(
    "q_mix_rebalance",
    (spark, dir) =>
      mixReport(mixSt(Tables.spread(Tables.documents(spark, dir)))),
    Some(s"""
      WITH split AS (
        SELECT source, text,
          ${PipelineOps.u32Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10
            AS bucket
        FROM documents),
      st AS (
        SELECT source, term,
          count(*) FILTER (WHERE bucket <= 7) AS ctf,
          count(*) FILTER (WHERE bucket = 8) AS vtf
        FROM (SELECT source, bucket,
                unnest(string_split_regex(lower(text), '[[:space:]]+'))
                  AS term
              FROM split WHERE bucket <= 8)
        GROUP BY source, term),
      tg AS (SELECT term, sum(ctf) AS ctf_g FROM st GROUP BY term),
      ng AS (SELECT sum(ctf_g) AS n_g,
               count(*) FILTER (WHERE ctf_g > 0) AS v_g FROM tg),
      ns AS (
        SELECT source, sum(ctf) AS n_s,
          count(*) FILTER (WHERE ctf > 0) AS v_s, sum(vtf) AS n_val
        FROM st GROUP BY source),
      scored AS (
        SELECT source,
          sum(CAST(vtf * ln(CAST(n_g + v_g + 1 AS DOUBLE) / (ctf_g + 1))
            AS DECIMAL(38,9))) AS sg,
          sum(CAST(vtf * ln(CAST(n_s + v_s + 1 AS DOUBLE) / (ctf + 1))
            AS DECIMAL(38,9))) AS ss
        FROM st JOIN tg USING (term) JOIN ns USING (source) CROSS JOIN ng
        WHERE vtf > 0
        GROUP BY source),
      ex AS (
        SELECT source, n_s, n_val,
          ${Oracle.qround("sg::DOUBLE / n_val")} AS xent_global,
          ${Oracle.qround("ss::DOUBLE / n_val")} AS xent_self,
          (n_s::DOUBLE / n_g) AS prior
        FROM ns LEFT JOIN scored USING (source) CROSS JOIN ng),
      ex2 AS (
        SELECT source, n_s, n_val, xent_global, xent_self,
          ${Oracle.qround("xent_global - xent_self")} AS excess,
          prior * exp(coalesce(
            ${Oracle.qround("xent_global - xent_self")}, 0.0)) AS w_raw
        FROM ex),
      z AS (
        SELECT sum(CAST(w_raw AS DECIMAL(38,9)))::DOUBLE AS z FROM ex2)
      SELECT source, n_s::BIGINT AS n_train_tokens,
        n_val::BIGINT AS n_val_tokens, xent_global, xent_self, excess,
        ${Oracle.qround("w_raw / z")} AS weight
      FROM ex2 CROSS JOIN z
      ORDER BY source""")
  )

  /** Candidate-list size / χ²₀.₉₅ threshold for [[qStopwordDiscovery]]
    * (the critical value is for |sources|−1 = 19 degrees of freedom on
    * the driver corpus — a production run recomputes it for its source
    * count; it is a LITERAL so both engines compare identically). */
  val StopTopK = 20
  val StopChi2Crit: Double = 30.14

  /** Corpus-driven stopword discovery — the first preprocessing step in
    * a NEW language/domain where no curated list exists: a stopword
    * candidate is (a) ubiquitous (document-frequency rate near 1) and
    * (b) topically FLAT — its counts across sources match each source's
    * token mass (low χ²). Content words are ubiquitous-but-bursty (high
    * χ² — concentrated where their topic lives); function words are
    * ubiquitous-and-flat. Top [[StopTopK]] by df-rate with the per-term
    * source-χ² and the `is_flat` verdict at [[StopChi2Crit]] — the
    * complement of q_top_keywords (TF-IDF finds the DISTINCTIVE terms;
    * this finds the ones to remove before TF-IDF).
    *
    * Exactness: df/cf/source counts are exact integers off two
    * aggregates; expected counts e_s = cf·N_s/N and the χ² addends are
    * IEEE ops on identical doubles, decimal-summed, qround'd; the flat
    * verdict compares the qround'd χ² to a literal.
    *
    * Scale shape: one (source, term) exchange for the observed counts
    * (partial-aggregated) and one DISTINCT (doc, term) exchange for df —
    * both corpus passes end in vocabulary-sized relations; the χ² sum
    * runs per term over its ≤|sources| rows (vocab-scale); top-K is a
    * TakeOrderedAndProject. */
  val qStopwordDiscovery = GraftQuery(
    "q_stopword_discovery",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.spread(Tables.documents(spark, dir))
      val toks = Tables.eager(docs.select($"doc_id", $"source",
          explode(Text.tokens($"text")).as("term")))
      // count off the bare scan, not through spread()'s repartition
      val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
      // eager: the (source, term) counts feed the per-source masses AND the
      // χ² join — unpersisted, the corpus exchange ran once per consumer
      val ost = Tables.eager(toks.groupBy($"source", $"term")
        .agg(count(lit(1)).as("o")))
      val ns = ost.groupBy($"source").agg(sum($"o").as("n_s"))
      val tot = ns.agg(sum($"n_s").as("nn"))
      val chi = ost.join(ns, "source").crossJoin(broadcast(tot))
        .select($"term", $"o", $"n_s", $"nn")
        // per-source χ² addend against the token-mass expectation; a
        // source with NO occurrences of the term still contributes e_s
        // (handled in closed form below: Σ_s∉obs e_s = cf − Σ_s∈obs e_s)
        .withColumn("e", $"n_s".cast(DoubleType) *
          sum($"o").over(org.apache.spark.sql.expressions.Window
            .partitionBy($"term")).cast(DoubleType) / $"nn".cast(DoubleType))
        .groupBy($"term")
        .agg(sum($"o").as("cf"),
          sum(expr("CAST((o - e) * (o - e) / e AS DECIMAL(38,9))"))
            .as("x_obs"),
          sum(expr("CAST(e AS DECIMAL(38,9))")).as("e_obs"))
      val df = toks.select($"doc_id", $"term").distinct()
        .groupBy($"term").agg(count(lit(1)).as("df"))
      chi.join(df, "term").crossJoin(broadcast(nDocs))
        .crossJoin(broadcast(tot))
        .select($"term", $"df",
          Det.qround($"df".cast(DoubleType) / $"n_docs").as("df_rate"),
          $"cf",
          Det.qround($"cf".cast(DoubleType) / $"nn").as("cf_rate"),
          // unobserved (source, term) cells contribute (0−e)²/e = e;
          // their total is cf − Σ_observed e (exact in the decimal lane)
          Det.qround($"x_obs".cast(DoubleType) +
            ($"cf".cast(DoubleType) - $"e_obs".cast(DoubleType)))
            .as("chi2_source"))
        .withColumn("is_flat", $"chi2_source" < StopChi2Crit)
        .orderBy($"df_rate".desc, $"term")
        .limit(StopTopK)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, source,
          unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
        FROM documents),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      ost AS (
        SELECT source, term, count(*) AS o FROM toks GROUP BY source, term),
      ns AS (SELECT source, sum(o) AS n_s FROM ost GROUP BY source),
      tot AS (SELECT sum(n_s) AS nn FROM ns),
      cfr AS (SELECT term, sum(o) AS cf FROM ost GROUP BY term),
      chi AS (
        SELECT term,
          sum(CAST((o - e) * (o - e) / e AS DECIMAL(38,9))) AS x_obs,
          sum(CAST(e AS DECIMAL(38,9))) AS e_obs
        FROM (SELECT term, o,
                n_s::DOUBLE * cf::DOUBLE / nn::DOUBLE AS e
              FROM ost JOIN ns USING (source) JOIN cfr USING (term)
                CROSS JOIN tot)
        GROUP BY term),
      dfr AS (
        SELECT term, count(*) AS df
        FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term)
      SELECT term, df::BIGINT AS df,
        ${Oracle.qround("df::DOUBLE / n_docs")} AS df_rate,
        cf::BIGINT AS cf,
        ${Oracle.qround("cf::DOUBLE / nn")} AS cf_rate,
        ${Oracle.qround("x_obs::DOUBLE + (cf::DOUBLE - e_obs::DOUBLE)")}
          AS chi2_source,
        (${Oracle.qround("x_obs::DOUBLE + (cf::DOUBLE - e_obs::DOUBLE)")}
          < $StopChi2Crit) AS is_flat
      FROM chi JOIN cfr USING (term) JOIN dfr USING (term)
      CROSS JOIN nd CROSS JOIN tot
      ORDER BY df_rate DESC, term
      LIMIT $StopTopK""")
  )

  /** LM order sweep — "does context buy perplexity on this corpus": per
    * language, the SAME untouched val split (q_train_split's buckets:
    * ≤ 7 train, = 8 val) scored under the train-split add-1 unigram LM
    * (q_heldout_xent's model and formula VERBATIM — LexicalStatsSpec
    * pins the xent_uni column bit-equal to q_heldout_xent) and under a
    * train-split add-1 BIGRAM LM (p(w₂|w₁) = (c(w₁w₂)+1)/(c₁(w₁)+V+1),
    * the same V), both in nats per prediction. `delta_nats` = uni − bi
    * is the value of one token of context; read with
    * `unseen_bigram_rate` (val bigram mass never seen in train) it
    * answers whether a higher-order model is worth its state at this
    * corpus size — the n-gram cousin of q_scaling_law's
    * more-data question. A language whose val split contains NO bigrams
    * (every val doc single-token) keeps its unigram row with NULL bigram
    * columns and n_val_bigrams = 0 — the readout never silently loses a
    * language (round-15 advice).
    *
    * Exactness: all counts are integers (bigrams via the native
    * `word_shingles_all` n=2 pass, the q_ngram_novelty machinery); each
    * addend is one ln of a double quotient of exact integers,
    * decimal-summed; delta is a difference of qround'd doubles.
    *
    * Scale shape: one token pass to (lang, term) counts and one shingle
    * pass to (lang, bigram) counts (both partial-aggregated); context
    * counts are a re-aggregate of the bigram relation (vocab-scale);
    * per-lang normalizers broadcast back; readout is |langs| rows.
    * Bigram state is vocab²-BOUNDED, never corpus-bounded (the
    * q_kneser_ney precedent). */
  val qLmOrderSweep = GraftQuery(
    "q_lm_order_sweep",
    (spark, dir) => {
      import spark.implicits._
      val base = Tables.spread(Tables.documents(spark, dir))
        .withColumn("bucket", expr(PipelineOps.u32Expr(
          "concat('split:', cast(doc_id as string))") + " % 10"))
        .filter($"bucket" <= 8)
      // unigram side: q_heldout_xent's exact relation
      val uni = base
        .select($"lang", $"bucket", explode(Text.tokens($"text")).as("term"))
        .groupBy($"lang", $"term")
        .agg(count(when($"bucket" <= 7, 1)).as("ctf"),
          count(when($"bucket" === 8, 1)).as("vtf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val un = uni.groupBy($"lang")
        .agg(sum($"ctf").as("n_train"),
          count(when($"ctf" > 0, 1)).as("vocab"), sum($"vtf").as("n_val"))
      val uScore = uni.filter($"vtf" > 0).join(un, "lang")
        .groupBy($"lang")
        .agg(sum(expr("CAST(vtf * ln(CAST(n_train + vocab + 1 AS DOUBLE)" +
          " / (ctf + 1)) AS DECIMAL(38,9))")).as("su"),
          sum(when($"ctf" === 0, $"vtf").otherwise(0L)).as("oov_u"))
      // bigram side: within-doc adjacent pairs
      val bi = base
        .select($"lang", $"bucket",
          explode(call_function("word_shingles_all", $"text", lit(2)))
            .as("g"))
        .groupBy($"lang", $"g")
        .agg(count(when($"bucket" <= 7, 1)).as("cb"),
          count(when($"bucket" === 8, 1)).as("vb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ctx = bi.groupBy($"lang",
          substring_index($"g", " ", 1).as("w1"))
        .agg(sum($"cb").as("c1"))
      val bn = bi.groupBy($"lang").agg(sum($"vb").as("nb_val"))
      val bScore = bi.filter($"vb" > 0)
        .withColumn("w1", substring_index($"g", " ", 1))
        .join(ctx, Seq("lang", "w1"), "left")
        .join(un.select($"lang", $"vocab"), "lang")
        .groupBy($"lang")
        .agg(sum(expr("CAST(vb * ln(CAST(coalesce(c1, 0) + vocab + 1 " +
          "AS DOUBLE) / (cb + 1)) AS DECIMAL(38,9))")).as("sb"),
          sum(when($"cb" === 0, $"vb").otherwise(0L)).as("unseen_b"))
      // bScore joins LEFT: a language whose val split contains no bigrams
      // (every val doc single-token) must keep its unigram readout row —
      // an inner join silently dropped the language entirely (round-15
      // advice). The bigram columns degrade to NULL behind the nb_val > 0
      // guard (which also keeps 0/0 out of the plan).
      uScore.join(un, "lang")
        .join(bn, Seq("lang"), "left")
        .join(bScore, Seq("lang"), "left")
        .select($"lang", $"n_val".as("n_val_tokens"),
          coalesce($"nb_val", lit(0L)).as("n_val_bigrams"),
          Det.qround($"su".cast(DoubleType) / $"n_val").as("xent_uni"),
          when($"nb_val" > 0,
            Det.qround($"sb".cast(DoubleType) / $"nb_val")).as("xent_bi"),
          when($"nb_val" > 0,
            Det.qround($"su".cast(DoubleType) / $"n_val" -
              $"sb".cast(DoubleType) / $"nb_val")).as("delta_nats"),
          when($"nb_val" > 0,
            Det.qround($"unseen_b".cast(DoubleType) / $"nb_val"))
            .as("unseen_bigram_rate"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH split AS (
        SELECT lang, text,
          ${PipelineOps.u32Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10
            AS bucket
        FROM documents),
      w AS (
        SELECT lang, bucket,
          string_split_regex(lower(text), '[[:space:]]+') AS ws
        FROM split WHERE bucket <= 8),
      uni AS (
        SELECT lang, term,
          count(*) FILTER (WHERE bucket <= 7) AS ctf,
          count(*) FILTER (WHERE bucket = 8) AS vtf
        FROM (SELECT lang, bucket, unnest(ws) AS term FROM w)
        GROUP BY lang, term),
      un AS (
        SELECT lang, sum(ctf) AS n_train,
          count(*) FILTER (WHERE ctf > 0) AS vocab, sum(vtf) AS n_val
        FROM uni GROUP BY lang),
      us AS (
        SELECT lang,
          sum(CAST(vtf * ln(CAST(n_train + vocab + 1 AS DOUBLE)
            / (ctf + 1)) AS DECIMAL(38,9))) AS su,
          sum(CASE WHEN ctf = 0 THEN vtf ELSE 0 END) AS oov_u
        FROM uni JOIN un USING (lang) WHERE vtf > 0 GROUP BY lang),
      bi AS (
        SELECT lang, g,
          count(*) FILTER (WHERE bucket <= 7) AS cb,
          count(*) FILTER (WHERE bucket = 8) AS vb
        FROM (SELECT lang, bucket,
                unnest([ws[i] || ' ' || ws[i+1]
                  for i in range(1, len(ws))]) AS g
              FROM w)
        GROUP BY lang, g),
      ctx AS (
        SELECT lang, split_part(g, ' ', 1) AS w1, sum(cb) AS c1
        FROM bi GROUP BY lang, split_part(g, ' ', 1)),
      bn AS (SELECT lang, sum(vb) AS nb_val FROM bi GROUP BY lang),
      bs AS (
        SELECT lang,
          sum(CAST(vb * ln(CAST(coalesce(c1, 0) + vocab + 1 AS DOUBLE)
            / (cb + 1)) AS DECIMAL(38,9))) AS sb,
          sum(CASE WHEN cb = 0 THEN vb ELSE 0 END) AS unseen_b
        FROM (SELECT b.*, split_part(b.g, ' ', 1) AS w1 FROM bi b
              WHERE vb > 0)
        LEFT JOIN ctx USING (lang, w1)
        JOIN (SELECT lang, vocab FROM un) uv USING (lang)
        GROUP BY lang)
      SELECT lang, n_val::BIGINT AS n_val_tokens,
        coalesce(nb_val, 0)::BIGINT AS n_val_bigrams,
        ${Oracle.qround("su::DOUBLE / n_val")} AS xent_uni,
        CASE WHEN nb_val > 0 THEN
          ${Oracle.qround("sb::DOUBLE / nb_val")} END AS xent_bi,
        CASE WHEN nb_val > 0 THEN
          ${Oracle.qround("su::DOUBLE / n_val - sb::DOUBLE / nb_val")}
        END AS delta_nats,
        CASE WHEN nb_val > 0 THEN
          ${Oracle.qround("unseen_b::DOUBLE / nb_val")}
        END AS unseen_bigram_rate
      FROM us JOIN un USING (lang)
      LEFT JOIN bn USING (lang)
      LEFT JOIN bs USING (lang)
      ORDER BY lang""")
  )

  /** Fixed-window width (tokens) for [[qParagraphPpl]]'s UNSTRUCTURED
    * fallback: documents carrying real newlines split on them (the CCNet
    * convention — each line is a paragraph); documents without any
    * newline have no structural breaks to honor and fall back to fixed
    * [[ParaTokens]]-token windows. */
  val ParaTokens = 20

  /** Paragraph-level perplexity filtering — the CCNet shape (Wenzek et
    * al. 2020) INSIDE documents, the intra-document complement of
    * q_filter_ablation's whole-document gates: a mostly-good document
    * often carries boilerplate/gibberish spans that a doc-level gate
    * cannot remove without throwing away the good text. Each document is
    * cut into paragraphs — on its REAL newline boundaries when it has
    * any (CCNet splits on '\n'; empty lines yield empty paragraphs that
    * simply emit no rows), else fixed [[ParaTokens]]-token windows (the
    * unstructured-text fallback) — and every paragraph is scored
    * under the SAME corpus unigram LM as q_unigram_surprisal
    * ([[surprisalLm]] — one model, two granularities), and the corpus-
    * wide surprisal terciles (the q_ccnet_buckets head/middle/tail
    * split) gate each paragraph: head+middle kept, tail (gibberish-like)
    * dropped. Readout per document: paragraph/token counts before and
    * after, the kept fraction, and the cut — the cleaned-token budget a
    * curation run reads next to its document-level funnel.
    *
    * Exactness: per-paragraph mean surprisal is the docSurprisal formula
    * verbatim (decimal-summed, qround'd); terciles are min-over-the-
    * bounded-6-dp-value-domain picks (the q_ccnet_buckets discipline —
    * no engine percentile); gates compare identical rounded doubles;
    * counts are integers; kept_frac is one qround'd integer quotient.
    *
    * Scale shape: ONE generator pass into the (doc, para, term)
    * exchange (the newline split and tokenizer are CHAINED generators in
    * the same map stage — paragraph ids are per-row arithmetic on the
    * segment index / token position, no extra shuffle); the LM is the
    * vocab-scale re-aggregate broadcast back;
    * the tercile window runs on the BOUNDED rounded-score value domain,
    * never the paragraphs; the readout is one (doc) re-group of the
    * paragraph relation. The corpus shuffles once. */
  val qParagraphPpl = GraftQuery(
    "q_paragraph_ppl",
    (spark, dir) => {
      import spark.implicits._
      val ptf = Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", $"text".contains("\n").as("has_nl"),
          posexplode(split($"text", "\n")).as(Seq("seg", "seg_text")))
        .select($"doc_id", $"has_nl", $"seg",
          posexplode(Text.tokens($"seg_text")).as(Seq("pos", "term")))
        // the tokenizer's Java-split semantics emit an empty token on a
        // leading-whitespace segment; it is not a word — drop it AFTER
        // position assignment (both engines index unfiltered positions)
        .filter($"term" =!= "")
        .select($"doc_id",
          when($"has_nl", $"seg".cast(LongType))
            .otherwise(expr(s"pos div $ParaTokens")).as("para"),
          $"term")
        .groupBy($"doc_id", $"para", $"term").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val paras = ptf.join(broadcast(surprisalLm(ptf)), Seq("term"))
        .groupBy($"doc_id", $"para")
        .agg(sum($"tf").as("n_tokens"),
          Det.qround(
            sum(($"tf".cast(DoubleType) * $"s")
              .cast(DecimalType(38, Det.Scale)))
              .cast(DoubleType) / sum($"tf")).as("ms"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // corpus terciles over the bounded rounded-score value domain
      val vd = paras.groupBy($"ms".as("v")).agg(count(lit(1)).as("f"))
      val cumW = org.apache.spark.sql.expressions.Window.orderBy($"v")
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val thr = vd
        .select($"v", sum($"f").over(cumW).as("cf"))
        .crossJoin(broadcast(vd.agg(coalesce(sum($"f"), lit(0L)).as("nn"))))
        .agg(min(when($"cf" * 3 >= $"nn" * 2, $"v")).as("q66"))
      paras.crossJoin(broadcast(thr))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_paras"),
          sum(when($"ms" <= $"q66", 1L).otherwise(0L)).as("kept_paras"),
          sum($"n_tokens").as("n_tokens"),
          sum(when($"ms" <= $"q66", $"n_tokens").otherwise(0L))
            .as("kept_tokens"),
          max($"q66").as("surp_cut"))
        .select($"doc_id", $"n_paras", $"kept_paras", $"n_tokens",
          $"kept_tokens",
          Det.qround($"kept_tokens".cast(DoubleType) / $"n_tokens")
            .as("kept_frac"),
          $"surp_cut")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH segs AS (
        SELECT doc_id, contains(text, chr(10)) AS has_nl,
          unnest(range(len(sg))) AS seg, unnest(sg) AS seg_text
        FROM (SELECT doc_id, text, string_split(text, chr(10)) AS sg
              FROM documents)),
      ptoks AS (
        SELECT doc_id,
          CASE WHEN has_nl THEN seg
               ELSE tpos // $ParaTokens END AS para,
          term
        FROM (
          SELECT doc_id, has_nl, seg,
            unnest(range(len(ws))) AS tpos, unnest(ws) AS term
          FROM (SELECT doc_id, has_nl, seg,
                  string_split_regex(lower(seg_text), '[[:space:]]+') AS ws
                FROM segs))
        WHERE term <> ''),
      ptf AS (
        SELECT doc_id, para, term, count(*) AS tf
        FROM ptoks GROUP BY doc_id, para, term),
      cf AS (SELECT term, sum(tf) AS cf FROM ptf GROUP BY term),
      tot AS (SELECT sum(cf) AS tot FROM cf),
      lm AS (SELECT term, ln(tot::DOUBLE / cf::DOUBLE) AS s
             FROM cf CROSS JOIN tot),
      paras AS (
        SELECT doc_id, para, sum(tf)::BIGINT AS n_tokens,
          ${Oracle.qround(
            "sum(CAST(tf::DOUBLE * s AS DECIMAL(38,9)))::DOUBLE / sum(tf)")}
            AS ms
        FROM ptf JOIN lm USING (term)
        GROUP BY doc_id, para),
      vd AS (SELECT ms AS v, count(*) AS f FROM paras GROUP BY ms),
      cum AS (
        SELECT v, sum(f) OVER (ORDER BY v) AS cf2,
          (SELECT sum(f) FROM vd) AS nn
        FROM vd),
      thr AS (
        SELECT min(CASE WHEN cf2 * 3 >= nn * 2 THEN v END) AS q66 FROM cum)
      SELECT doc_id, count(*)::BIGINT AS n_paras,
        sum(CASE WHEN ms <= q66 THEN 1 ELSE 0 END)::BIGINT AS kept_paras,
        sum(n_tokens)::BIGINT AS n_tokens,
        sum(CASE WHEN ms <= q66 THEN n_tokens ELSE 0 END)::BIGINT
          AS kept_tokens,
        ${Oracle.qround(
          "sum(CASE WHEN ms <= q66 THEN n_tokens ELSE 0 END)::DOUBLE" +
            " / sum(n_tokens)")} AS kept_frac,
        max(q66) AS surp_cut
      FROM paras CROSS JOIN thr
      GROUP BY doc_id
      ORDER BY doc_id""")
  )

  val all: Seq[GraftQuery] =
    Seq(qTokenDiversity, qBigramLift, qFilterFunnel, qUnigramSurprisal,
      qOovRate, qDsirWeights, qKlBySource, qTokenEntropy, qVocabCoverage,
      qTokenFertility, qZipfFit, qHeldoutXent, qCooccurPmi, qHeapsFit,
      qKneserNey, qKnDocSurprisal, qCcnetBuckets, qHillTail, qChao1,
      qScalingLaw, qMixRebalance, qStopwordDiscovery, qLmOrderSweep,
      qParagraphPpl)
}
