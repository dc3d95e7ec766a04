package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset-audit operators a large-scale curation pipeline runs before and
  * after every transform:
  *
  *  - table PROFILING (the ANALYZE/data-quality surface): one pass over the
  *    fact table emitting per-column row/null/NDV counts and min/max — the
  *    stats block every catalog (and every CBO) keeps per table;
  *  - data-MIXTURE weights: temperature sampling over the per-language token
  *    counts (w ∝ tok^α with α = 1/2 — the multilingual rebalancing rule
  *    from the mBERT/XLM-R lineage), plus the token budget each stratum
  *    receives. `sqrt` is IEEE-754 correctly-rounded in both engines, so
  *    the weights are oracle-exact with no rational-arithmetic contortions;
  *  - feature CORRELATION: Pearson r between document length in chars and
  *    in tokens, per language, from exact integer raw moments — the
  *    redundancy check run before adding a feature to a quality classifier.
  *
  * Physical design: the profile is ONE aggregate over the scan — Catalyst
  * plans the 6 `count(DISTINCT col)`s as a ×7 `Expand` feeding a single
  * partial+final aggregate, the classic exact-NDV shape (the approx path at
  * 100 TB swaps `approx_count_distinct` and drops the Expand — same query
  * skeleton, see q_subreddit_stats_approx); mixture and correlation are
  * two-level aggregates whose second level is language-sized (single-digit
  * rows), with the language totals broadcast back across the tiny final
  * join. Nothing corpus-sized crosses more than one exchange.
  */
object Profiling {

  val qProfileTable = GraftQuery(
    "q_profile_table",
    (spark, dir) => {
      import spark.implicits._
      val o = Tables.spread(Tables.orders(spark, dir))
      def nNull(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
      val agg = o.agg(
        count(lit(1)).as("n"),
        nNull("o_orderkey").as("nn_key"), countDistinct($"o_orderkey").as("nd_key"),
        min($"o_orderkey").cast(DoubleType).as("min_key"),
        max($"o_orderkey").cast(DoubleType).as("max_key"),
        nNull("o_custkey").as("nn_cust"), countDistinct($"o_custkey").as("nd_cust"),
        min($"o_custkey").cast(DoubleType).as("min_cust"),
        max($"o_custkey").cast(DoubleType).as("max_cust"),
        nNull("o_totalprice").as("nn_price"), countDistinct($"o_totalprice").as("nd_price"),
        min($"o_totalprice").as("min_price"), max($"o_totalprice").as("max_price"),
        nNull("o_orderdate").as("nn_date"), countDistinct($"o_orderdate").as("nd_date"),
        // o_orderdate arrives TIMESTAMP_NTZ; the session is pinned UTC, so
        // the TIMESTAMP cast is instant-preserving and unix_millis applies
        unix_millis(min($"o_orderdate").cast(TimestampType)).cast(DoubleType)
          .as("min_date"),
        unix_millis(max($"o_orderdate").cast(TimestampType)).cast(DoubleType)
          .as("max_date"),
        nNull("o_orderstatus").as("nn_stat"), countDistinct($"o_orderstatus").as("nd_stat"),
        min($"o_orderstatus").as("min_stat"), max($"o_orderstatus").as("max_stat"),
        nNull("o_orderpriority").as("nn_prio"), countDistinct($"o_orderpriority").as("nd_prio"),
        min($"o_orderpriority").as("min_prio"), max($"o_orderpriority").as("max_prio"))
      val nullD = lit(null).cast(DoubleType)
      val nullS = lit(null).cast(StringType)
      agg
        .select(explode(array(
          struct(lit("o_orderkey").as("col_name"), $"n".as("n_rows"),
            $"nn_key".as("n_null"), $"nd_key".as("n_distinct"),
            $"min_key".as("min_num"), $"max_key".as("max_num"),
            nullS.as("min_str"), nullS.as("max_str")),
          struct(lit("o_custkey").as("col_name"), $"n".as("n_rows"),
            $"nn_cust".as("n_null"), $"nd_cust".as("n_distinct"),
            $"min_cust".as("min_num"), $"max_cust".as("max_num"),
            nullS.as("min_str"), nullS.as("max_str")),
          struct(lit("o_totalprice").as("col_name"), $"n".as("n_rows"),
            $"nn_price".as("n_null"), $"nd_price".as("n_distinct"),
            $"min_price".as("min_num"), $"max_price".as("max_num"),
            nullS.as("min_str"), nullS.as("max_str")),
          struct(lit("o_orderdate").as("col_name"), $"n".as("n_rows"),
            $"nn_date".as("n_null"), $"nd_date".as("n_distinct"),
            $"min_date".as("min_num"), $"max_date".as("max_num"),
            nullS.as("min_str"), nullS.as("max_str")),
          struct(lit("o_orderstatus").as("col_name"), $"n".as("n_rows"),
            $"nn_stat".as("n_null"), $"nd_stat".as("n_distinct"),
            nullD.as("min_num"), nullD.as("max_num"),
            $"min_stat".as("min_str"), $"max_stat".as("max_str")),
          struct(lit("o_orderpriority").as("col_name"), $"n".as("n_rows"),
            $"nn_prio".as("n_null"), $"nd_prio".as("n_distinct"),
            nullD.as("min_num"), nullD.as("max_num"),
            $"min_prio".as("min_str"), $"max_prio".as("max_str"))))
          .as("r"))
        .select($"r.col_name", $"r.n_rows", $"r.n_null", $"r.n_distinct",
          $"r.min_num", $"r.max_num", $"r.min_str", $"r.max_str")
        .orderBy($"col_name")
    },
    Some("""
      SELECT 'o_orderkey' AS col_name, count(*)::BIGINT AS n_rows,
        (count(*) - count(o_orderkey))::BIGINT AS n_null,
        count(DISTINCT o_orderkey)::BIGINT AS n_distinct,
        min(o_orderkey)::DOUBLE AS min_num, max(o_orderkey)::DOUBLE AS max_num,
        NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str FROM orders
      UNION ALL
      SELECT 'o_custkey', count(*)::BIGINT, (count(*) - count(o_custkey))::BIGINT,
        count(DISTINCT o_custkey)::BIGINT,
        min(o_custkey)::DOUBLE, max(o_custkey)::DOUBLE,
        NULL::VARCHAR, NULL::VARCHAR FROM orders
      UNION ALL
      SELECT 'o_totalprice', count(*)::BIGINT, (count(*) - count(o_totalprice))::BIGINT,
        count(DISTINCT o_totalprice)::BIGINT,
        min(o_totalprice), max(o_totalprice),
        NULL::VARCHAR, NULL::VARCHAR FROM orders
      UNION ALL
      SELECT 'o_orderdate', count(*)::BIGINT, (count(*) - count(o_orderdate))::BIGINT,
        count(DISTINCT o_orderdate)::BIGINT,
        epoch_ms(min(o_orderdate))::DOUBLE, epoch_ms(max(o_orderdate))::DOUBLE,
        NULL::VARCHAR, NULL::VARCHAR FROM orders
      UNION ALL
      SELECT 'o_orderstatus', count(*)::BIGINT, (count(*) - count(o_orderstatus))::BIGINT,
        count(DISTINCT o_orderstatus)::BIGINT,
        NULL::DOUBLE, NULL::DOUBLE,
        min(o_orderstatus), max(o_orderstatus) FROM orders
      UNION ALL
      SELECT 'o_orderpriority', count(*)::BIGINT, (count(*) - count(o_orderpriority))::BIGINT,
        count(DISTINCT o_orderpriority)::BIGINT,
        NULL::DOUBLE, NULL::DOUBLE,
        min(o_orderpriority), max(o_orderpriority) FROM orders
      ORDER BY col_name""")
  )

  /** Temperature exponent α = 1/2 and the per-epoch token budget the weights
    * are applied to. α is a library parameter; 1/2 keeps `sqrt` (the one
    * power both engines compute correctly-rounded) on the verified surface —
    * `pow(x, 0.3)` would be libm-dependent and belongs on the rows-only
    * path with the other approximate twins. */
  val MixtureBudget = 1000000L

  val qMixtureWeights = GraftQuery(
    "q_mixture_weights",
    (spark, dir) => {
      import spark.implicits._
      val per = Tables.spread(Tables.documents(spark, dir))
        .select($"lang", element_at(call_function("rep_stats", $"text"), 1).as("n_toks"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
      // Σ√tok through exact decimal addends: language count is tiny but the
      // discipline is the same as every other float aggregate on the
      // verified surface (order-independent, bit-identical in DuckDB).
      val tot = per.agg(
        sum(sqrt($"n_tokens".cast(DoubleType)).cast(DecimalType(38, 12)))
          .cast(DoubleType).as("tot_sqrt"))
      val weight = Det.qround(sqrt($"n_tokens".cast(DoubleType)) / $"tot_sqrt")
      per.crossJoin(broadcast(tot))
        .select($"lang", $"n_docs", $"n_tokens",
          weight.as("weight"),
          floor(weight * lit(MixtureBudget.toDouble)).cast(LongType)
            .as("sample_tokens"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH toks AS (
        SELECT lang, len(string_split_regex(lower(text), '[[:space:]]+')) AS n_toks
        FROM documents),
      per AS (
        SELECT lang, count(*)::BIGINT AS n_docs, sum(n_toks)::BIGINT AS n_tokens
        FROM toks GROUP BY lang),
      tot AS (
        SELECT sum(CAST(sqrt(n_tokens::DOUBLE) AS DECIMAL(38,12)))::DOUBLE AS tot_sqrt
        FROM per)
      SELECT lang, n_docs, n_tokens,
        ${Oracle.qround("sqrt(n_tokens::DOUBLE) / tot_sqrt")} AS weight,
        floor((${Oracle.qround("sqrt(n_tokens::DOUBLE) / tot_sqrt")}) * ${MixtureBudget}e0)::BIGINT
          AS sample_tokens
      FROM per CROSS JOIN tot
      ORDER BY lang""")
  )

  val qFeatureCorr = GraftQuery(
    "q_feature_corr",
    (spark, dir) => {
      import spark.implicits._
      val per = Tables.spread(Tables.documents(spark, dir))
        .select($"lang", $"n_chars",
          element_at(call_function("rep_stats", $"text"), 1).as("n_toks"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"),
          sum($"n_chars").as("sx"), sum($"n_toks").as("sy"),
          sum($"n_chars" * $"n_toks").as("sxy"),
          sum($"n_chars" * $"n_chars").as("sxx"),
          sum($"n_toks" * $"n_toks").as("syy"))
      // n·Σxy − Σx·Σy etc. stay in exact BIGINT (≈10^12 at sf0.1, well
      // under 2^53 even at 100×) and convert to double once — both engines
      // see the identical integer, so r is bit-identical without decimals.
      val num = ($"n" * $"sxy" - $"sx" * $"sy").cast(DoubleType)
      val vx = ($"n" * $"sxx" - $"sx" * $"sx").cast(DoubleType)
      val vy = ($"n" * $"syy" - $"sy" * $"sy").cast(DoubleType)
      per.select($"lang", $"n",
        when(vx > 0 && vy > 0, Det.qround(num / (sqrt(vx) * sqrt(vy))))
          .as("chars_tokens_r"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH per AS (
        SELECT lang, count(*)::BIGINT AS n,
          sum(n_chars)::BIGINT AS sx,
          sum(len(string_split_regex(lower(text), '[[:space:]]+')))::BIGINT AS sy,
          sum(n_chars * len(string_split_regex(lower(text), '[[:space:]]+')))::BIGINT AS sxy,
          sum(n_chars * n_chars)::BIGINT AS sxx,
          sum(len(string_split_regex(lower(text), '[[:space:]]+')) *
              len(string_split_regex(lower(text), '[[:space:]]+')))::BIGINT AS syy
        FROM documents GROUP BY lang)
      SELECT lang, n,
        CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
          ${Oracle.qround(
            "(n * sxy - sx * sy)::DOUBLE / " +
            "(sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE))")}
        END AS chars_tokens_r
      FROM per
      ORDER BY lang""")
  )

  /** Order-independent table checksum — the anti-entropy digest a migration
    * (exactly like this repo's own oracle gate) or replica-repair pass
    * compares across systems: per partition (language), the XOR of a
    * 60-bit md5-derived row hash over a canonical field serialization,
    * plus the row count. XOR is commutative/associative and never
    * overflows, so the digest is partitioning- and order-independent by
    * construction — no decimal machinery needed.
    *
    * Canonical serialization: each field is md5-hashed individually (NULL →
    * 32 zeros — an arbitrary sentinel that no real md5 digest of a non-NULL
    * value here collides with in practice) and the FIXED-WIDTH digests
    * are concatenated — no delimiter, so a field containing the delimiter
    * can't shift the framing, and no `concat_ws` NULL-skip divergence from
    * the oracle's NULL-propagating `||` (a dropped field would silently
    * alias two different rows).
    *
    * Scale shape: map-side row hash (md5 is the engine-portable hash of
    * the whole verified surface), partial+final `bit_xor`/`count` — one
    * language-keyed exchange carrying one row per (partition, language). */
  val qTableChecksum = GraftQuery(
    "q_table_checksum",
    (spark, dir) => {
      import spark.implicits._
      def fh(e: String) = s"coalesce(md5(cast($e as string)), repeat('0', 32))"
      Tables.spread(Tables.documents(spark, dir))
        .select($"lang", expr(
          s"""cast(conv(substr(md5(concat(
             ${fh("doc_id")}, ${fh("lang")}, ${fh("source")},
             ${fh("n_chars")}, ${fh("text")})), 1, 15), 16, 10) as bigint)""")
          .as("h"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))
        .orderBy($"lang")
    },
    Some {
      def fh(e: String) = s"coalesce(md5(CAST($e AS VARCHAR)), repeat('0', 32))"
      s"""
      SELECT lang, count(*)::BIGINT AS n_rows,
        bit_xor(CAST(('0x' || substr(md5(
          ${fh("doc_id")} || ${fh("lang")} || ${fh("source")} ||
          ${fh("n_chars")} || ${fh("text")}), 1, 15)) AS BIGINT))::BIGINT
          AS checksum
      FROM documents GROUP BY lang ORDER BY lang"""
    }
  )

  /** Count-Min sketch depth (hash rows) and width (buckets per row). The
    * width is deliberately ≈ the driver vocabulary (31 distinct tokens) so
    * collisions — and therefore nonzero `overcount` rows — actually occur
    * and the soundness audit is exercised, not vacuous. */
  val CmsD = 3
  val CmsW = 32

  /** Count-Min sketch frequency estimation (Cormode & Muthukrishnan 2005)
    * with its one-sided-error audit — the third mergeable sketch of the
    * suite beside HLL (distinct counts, q_hll_sketch_merge) and the
    * mergeable histogram (quantiles, q_hist_quantiles): CMS answers point
    * frequency queries from O(d·w) counters however large the stream.
    *
    * Build: each token occurrence increments one bucket per hash row
    * (bucket = u32(md5(row:term)) mod w — the portable md5 derivation
    * every sampling op shares, so the oracle replays the exact hashes);
    * estimate(term) = min over rows of its bucket counts. The audit pins
    * CMS's DETERMINISTIC guarantee — `sound` (est ≥ true count) must hold
    * for every term regardless of hash luck; `overcount` exposes the
    * collision error the (ε, δ) analysis bounds probabilistically.
    *
    * Scale shape: the sketch is a partial+final aggregate collapsing to
    * ≤ d·w rows per partition before the exchange — the partial-combine IS
    * the sketch-merge, which is why the same relation maintains
    * incrementally per micro-batch at ingest. The estimate side joins the
    * vocabulary against the BROADCAST d·w-cell sketch; the exact recount
    * (feasible on the bounded driver vocabulary) exists only to score the
    * audit. */
  /** The CMS bucket derivation — shared text so build and probe can never
    * disagree (and the streaming maintainer hashes identically). */
  private def cmsBucket: String =
    s"${PipelineOps.u32Expr("concat(cast(r as string), ':', term)")} % $CmsW"

  /** The corpus token stream the CMS counts (the q_heavy_hitters stream). */
  private[graft] def cmsTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir))
      .select(explode(graft.functions.Text.tokens($"text")).as("term"))
  }

  /** Build the d×w sketch cells (r, bucket, c) from any (term) relation —
    * ADDITIVE: cells over disjoint row slices sum to the cells over the
    * union, which is both why the partial aggregate IS the merge and why
    * graft.streaming.StreamCms can maintain this exact relation per
    * micro-batch. */
  private[graft] def cmsCells(terms: DataFrame): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    terms
      .withColumn("r", explode(expr(s"sequence(0, ${CmsD - 1})")))
      .withColumn("bucket", expr(cmsBucket))
      .groupBy($"r", $"bucket").agg(count(lit(1)).as("c"))
  }

  /** Probe a cell relation with a (term, true_n) vocabulary: est = min
    * over rows, plus the one-sided-error audit columns. */
  private[graft] def cmsEstimates(cells: DataFrame, truth: DataFrame)
      : DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    truth
      .withColumn("r", explode(expr(s"sequence(0, ${CmsD - 1})")))
      .withColumn("bucket", expr(cmsBucket))
      .join(broadcast(cells), Seq("r", "bucket"))
      .groupBy($"term", $"true_n")
      .agg(min($"c").as("cms_est"))
      .select($"term", $"true_n", $"cms_est",
        ($"cms_est" - $"true_n").as("overcount"),
        ($"cms_est" >= $"true_n").as("sound"))
  }

  val qCmsHeavy = GraftQuery(
    "q_cms_heavy",
    (spark, dir) => {
      import spark.implicits._
      def toks = cmsTokens(spark, dir)
      val truth = toks.groupBy($"term").agg(count(lit(1)).as("true_n"))
      cmsEstimates(cmsCells(toks), truth)
        .orderBy($"true_n".desc, $"term")
        .limit(20)
    },
    Some(s"""
      WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), '[[:space:]]+'))
          AS term FROM documents),
      rows_ AS (SELECT unnest(range($CmsD)) AS r),
      cells AS (
        SELECT r, ${PipelineOps.u32Sql("r::VARCHAR || ':' || term")} % $CmsW
            AS bucket, count(*) AS c
        FROM toks CROSS JOIN rows_
        GROUP BY 1, 2),
      truth AS (
        SELECT term, count(*) AS true_n FROM toks GROUP BY 1),
      est AS (
        SELECT t.term, t.true_n, min(c.c)::BIGINT AS cms_est
        FROM (SELECT term, true_n, r FROM truth CROSS JOIN rows_) t
        JOIN cells c ON c.r = t.r
          AND c.bucket = ${PipelineOps.u32Sql("t.r::VARCHAR || ':' || t.term")} % $CmsW
        GROUP BY 1, 2)
      SELECT term, true_n, cms_est, cms_est - true_n AS overcount,
        cms_est >= true_n AS sound
      FROM est
      ORDER BY true_n DESC, term
      LIMIT 20""")
  )

  /** Source-concentration audit — the three standard concentration
    * indices of the per-source token mass (Gini, Herfindahl–Hirschman,
    * top-source share), one row. [[qMixtureWeights]] PRESCRIBES a
    * mixture; this MEASURES how concentrated the raw corpus actually is —
    * the number a data-governance review reads before deciding whether
    * reweighting is needed at all (a Gini near 0 = balanced sources;
    * near 1 = one crawl dominates the corpus).
    *
    * Exactness: token masses are exact integers; the rank-weighted Gini
    * numerator Σ i·x_(i) rides DECIMAL(38,0) (the q_ks_test wrap-guard),
    * so G = 2·Σi·x/(n·Σx) − (n+1)/n is one IEEE tree over exact
    * integers; HHI addends (share²) are 6-dp-prerounded then
    * decimal-summed (the q_anova_f discipline). Scale shape: ONE corpus
    * pass to the |sources|-row mass relation; the rank window and both
    * reductions run above that bounded aggregate (the q_psi_drift
    * discipline). */
  val qGiniSource = GraftQuery(
    "q_gini_source",
    (spark, dir) => {
      import spark.implicits._
      val dec0 = DecimalType(38, 0)
      val per = Tables.spread(Tables.documents(spark, dir))
        .select($"source",
          element_at(call_function("rep_stats", $"text"), 1).as("n_toks"))
        .groupBy($"source").agg(sum($"n_toks").as("x"))
      val W = org.apache.spark.sql.expressions.Window
      val ranked = per.withColumn("i",
        row_number().over(W.orderBy($"x".asc, $"source")))
      ranked.agg(count(lit(1)).as("n"), sum($"x").as("tot"),
          sum($"i".cast(dec0) * $"x").as("iwx"),
          max($"x").as("xmax"),
          Det.dsum(Det.qround($"x".cast(DoubleType) * $"x".cast(DoubleType))).as("sumsq"))
        .filter($"n" > 0 && $"tot" > 0)
        .select($"n", $"tot".as("total_tokens"),
          Det.qround(
            lit(2.0) * $"iwx".cast(DoubleType) /
              ($"n".cast(DoubleType) * $"tot".cast(DoubleType)) -
              ($"n" + lit(1.0)) / $"n").as("gini"),
          Det.qround($"sumsq" /
            ($"tot".cast(DoubleType) * $"tot".cast(DoubleType))).as("hhi"),
          Det.qround($"xmax" / $"tot").as("top_share"))
        .orderBy($"n")
    },
    Some(s"""
      WITH per AS (
        SELECT source,
          sum(len(string_split_regex(lower(text), '[[:space:]]+')))::BIGINT
            AS x
        FROM documents GROUP BY source),
      ranked AS (
        SELECT x, row_number() OVER (ORDER BY x ASC, source) AS i FROM per),
      agg AS (
        SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS tot,
          sum(i::DECIMAL(38,0) * x) AS iwx,
          max(x) AS xmax,
          ${Oracle.dsum(Oracle.qround("x::DOUBLE * x::DOUBLE"))} AS sumsq
        FROM ranked)
      SELECT n, tot AS total_tokens,
        ${Oracle.qround(
          "2e0 * iwx::DOUBLE / (n::DOUBLE * tot::DOUBLE) - (n + 1e0) / n")}
          AS gini,
        ${Oracle.qround("sumsq / (tot::DOUBLE * tot::DOUBLE)")} AS hhi,
        ${Oracle.qround("xmax / tot")} AS top_share
      FROM agg WHERE n > 0 AND tot > 0
      ORDER BY n""")
  )

  /** Document budget allocated by [[qNeymanAlloc]]. */
  val NeymanBudget = 10000L

  /** Neyman (variance-optimal) stratified-sampling allocation over the
    * language strata — the survey-sampling classic (Neyman 1934) that
    * [[qMixtureWeights]]' temperature rule does NOT capture: temperature
    * reweights by stratum MASS alone, Neyman allocates the budget
    * n_h = n·N_h·S_h / Σ N_k·S_k so strata whose per-document token
    * counts VARY more receive proportionally more of the sample (the
    * estimator-variance-minimizing split for a stratified mean). The
    * proportional fraction N_h/N is emitted beside it — the gap between
    * the two columns is exactly the variance signal.
    *
    * Exactness: per-stratum token sums and squared sums are exact BIGINTs
    * (the q_feature_corr integer-moment argument: ≈1e10 at sf0.1, far
    * under 2⁵³ at 100×); the variance numerator n·sxx − sx² stays integer
    * and converts to double once; S_h = √· is correctly-rounded in both
    * engines; the Σ N_h·S_h normalizer rides the decimal-addend path.
    * Scale shape: ONE corpus pass collapses documents to the |langs|-row
    * moment relation; the normalizer is a 1-row broadcast back. */
  val qNeymanAlloc = GraftQuery(
    "q_neyman_alloc",
    (spark, dir) => {
      import spark.implicits._
      val per = Tables.spread(Tables.documents(spark, dir))
        .select($"lang",
          element_at(call_function("rep_stats", $"text"), 1).as("n_toks"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_toks").as("sx"),
          sum($"n_toks" * $"n_toks").as("sxx"))
      val stats = per.select($"lang", $"n_docs",
        Det.qround($"sx".cast(DoubleType) / $"n_docs").as("mean_toks"),
        when($"n_docs" > 1, Det.qround(sqrt(
          ($"n_docs" * $"sxx" - $"sx" * $"sx").cast(DoubleType) /
            ($"n_docs" * ($"n_docs" - 1)).cast(DoubleType))))
          .as("sd_toks"))
      val tot = stats.agg(
        sum($"n_docs").as("tot_docs"),
        sum(($"n_docs" * $"sd_toks").cast(DecimalType(38, 9)))
          .cast(DoubleType).as("tot_ns"))
      // an all-zero-variance corpus (every stratum constant) has no Neyman
      // signal, and a single-doc stratum has no variance estimate: both
      // degrade to an explicit 0 allocation rather than a NaN/null hazard
      val nw = when(coalesce($"tot_ns", lit(0.0)) > 0 &&
          $"sd_toks".isNotNull,
        Det.qround($"n_docs" * $"sd_toks" / $"tot_ns")).otherwise(lit(0.0))
      stats.crossJoin(broadcast(tot))
        .select($"lang", $"n_docs", $"mean_toks", $"sd_toks",
          nw.as("neyman_frac"),
          floor(nw * lit(NeymanBudget.toDouble)).cast(LongType)
            .as("neyman_docs"),
          Det.qround($"n_docs".cast(DoubleType) / $"tot_docs")
            .as("prop_frac"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH toks AS (
        SELECT lang,
          len(string_split_regex(lower(text), '[[:space:]]+')) AS n_toks
        FROM documents),
      per AS (
        SELECT lang, count(*)::BIGINT AS n_docs,
          sum(n_toks)::BIGINT AS sx,
          sum(n_toks * n_toks)::BIGINT AS sxx
        FROM toks GROUP BY lang),
      stats AS (
        SELECT lang, n_docs,
          ${Oracle.qround("sx::DOUBLE / n_docs")} AS mean_toks,
          CASE WHEN n_docs > 1 THEN
            ${Oracle.qround("""sqrt((n_docs * sxx - sx * sx)::DOUBLE /
              (n_docs * (n_docs - 1))::DOUBLE)""")}
          END AS sd_toks
        FROM per),
      tot AS (
        SELECT sum(n_docs)::BIGINT AS tot_docs,
          sum(CAST(n_docs * sd_toks AS DECIMAL(38,9)))::DOUBLE AS tot_ns
        FROM stats)
      SELECT lang, n_docs, mean_toks, sd_toks,
        CASE WHEN coalesce(tot_ns, 0e0) > 0 AND sd_toks IS NOT NULL THEN
          ${Oracle.qround("n_docs * sd_toks / tot_ns")}
        ELSE 0e0 END AS neyman_frac,
        floor((CASE WHEN coalesce(tot_ns, 0e0) > 0 AND sd_toks IS NOT NULL
            THEN ${Oracle.qround("n_docs * sd_toks / tot_ns")}
          ELSE 0e0 END) * ${NeymanBudget}e0)::BIGINT AS neyman_docs,
        ${Oracle.qround("n_docs::DOUBLE / tot_docs")} AS prop_frac
      FROM stats CROSS JOIN tot
      ORDER BY lang""")
  )

  /** Temperature-scaled domain sampling weights (the multilingual/domain
    * upsampling classic: mBERT's exponential smoothing, XLM/mT5's
    * temperature mixing — w_α ∝ mass^α renormalized, α < 1 flattening the
    * head and upweighting the tail). [[qMixtureWeights]] prescribes the
    * single α=0.5 mixture over lang; THIS query is the readout a pipeline
    * owner reads to PICK the temperature: per source, the weight at
    * α ∈ {1, 0.5, 0.25} side by side, the tail upsampling factor
    * w_.25/w_1, and the per-α sampled-token allocation under the shared
    * [[MixtureBudget]].
    *
    * Determinism: α=0.5 and α=0.25 are one and two IEEE `sqrt`s —
    * CORRECTLY-ROUNDED ops in both engines (unlike libm `pow`, which this
    * query deliberately avoids), so every weight is bit-identical
    * cross-engine before the 6-dp round; addends ride DECIMAL(38,12) (the
    * qMixtureWeights discipline). Scale shape: ONE corpus pass to the
    * |sources|-row mass relation; everything downstream is arithmetic on
    * that bounded aggregate with a 1-row broadcast of the three
    * normalizers. */
  val qTemperatureMix = GraftQuery(
    "q_temperature_mix",
    (spark, dir) => {
      import spark.implicits._
      val per = Tables.spread(Tables.documents(spark, dir))
        .select($"source",
          element_at(call_function("rep_stats", $"text"), 1).as("n_toks"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
      val m = $"n_tokens".cast(DoubleType)
      val tot = per.agg(
        sum($"n_tokens").as("tot1"),
        sum(sqrt(m).cast(DecimalType(38, 12))).cast(DoubleType).as("tot50"),
        sum(sqrt(sqrt(m)).cast(DecimalType(38, 12))).cast(DoubleType)
          .as("tot25"))
      val w1 = m / $"tot1".cast(DoubleType)
      val w50 = sqrt(m) / $"tot50"
      val w25 = sqrt(sqrt(m)) / $"tot25"
      per.crossJoin(broadcast(tot))
        .select($"source", $"n_docs", $"n_tokens",
          Det.qround(w1).as("w_a100"),
          Det.qround(w50).as("w_a50"),
          Det.qround(w25).as("w_a25"),
          Det.qround(w25 / w1).as("upsample_a25"),
          floor(Det.qround(w50) * lit(MixtureBudget.toDouble))
            .cast(LongType).as("tokens_a50"),
          floor(Det.qround(w25) * lit(MixtureBudget.toDouble))
            .cast(LongType).as("tokens_a25"))
        .orderBy($"source")
    },
    Some(s"""
      WITH toks AS (
        SELECT source,
          len(string_split_regex(lower(text), '[[:space:]]+')) AS n_toks
        FROM documents),
      per AS (
        SELECT source, count(*)::BIGINT AS n_docs,
          sum(n_toks)::BIGINT AS n_tokens
        FROM toks GROUP BY source),
      tot AS (
        SELECT sum(n_tokens)::BIGINT AS tot1,
          sum(CAST(sqrt(n_tokens::DOUBLE) AS DECIMAL(38,12)))::DOUBLE AS tot50,
          sum(CAST(sqrt(sqrt(n_tokens::DOUBLE)) AS DECIMAL(38,12)))::DOUBLE
            AS tot25
        FROM per)
      SELECT source, n_docs, n_tokens,
        ${Oracle.qround("n_tokens::DOUBLE / tot1::DOUBLE")} AS w_a100,
        ${Oracle.qround("sqrt(n_tokens::DOUBLE) / tot50")} AS w_a50,
        ${Oracle.qround("sqrt(sqrt(n_tokens::DOUBLE)) / tot25")} AS w_a25,
        ${Oracle.qround(
          "(sqrt(sqrt(n_tokens::DOUBLE)) / tot25) / (n_tokens::DOUBLE / tot1::DOUBLE)")}
          AS upsample_a25,
        floor((${Oracle.qround("sqrt(n_tokens::DOUBLE) / tot50")})
          * ${MixtureBudget}e0)::BIGINT AS tokens_a50,
        floor((${Oracle.qround("sqrt(sqrt(n_tokens::DOUBLE)) / tot25")})
          * ${MixtureBudget}e0)::BIGINT AS tokens_a25
      FROM per CROSS JOIN tot
      ORDER BY source""")
  )

  /** Exact Spearman rank correlation between event `value` and
    * hour-of-day — the monotone-association companion to
    * [[qFeatureCorr]]'s Pearson (robust to the metric's scale and to any
    * monotone transform; the correlation a profiling pass trusts on
    * heavy-tailed metrics). Ties take the standard MIDRANK treatment,
    * computed EXACTLY: on the bounded (value × hour) contingency grid,
    * the doubled midrank 2r(v) = 2·cum(v) − f(v) + 1 is an integer from
    * the marginal cumulative counts (the q_ks_test integer-lane lesson
    * applied to ranks — no float prefix sums), Pearson over doubled ranks
    * equals Pearson over ranks (affine invariance), and every moment sum
    * rides DECIMAL(38,0) (documented headroom: n·Σw·R² ≈ 4·10³⁶ < 10³⁸
    * at 10⁹ rows). The only IEEE ops are the final quotient and sqrt.
    *
    * Honest null: value is independent of hour-of-day by construction, so
    * ρ ≈ 0 — the machinery (midranks, tie handling, t transform) is what
    * is verified. Scale shape: ONE corpus aggregate to the grid; marginal
    * windows and the reduction run above the bounded domain. */
  val qSpearman = GraftQuery(
    "q_spearman",
    (spark, dir) => {
      import spark.implicits._
      val dec = DecimalType(38, 0)
      // eager, not lazy persist: fx and fy materialize as concurrent
      // broadcast subqueries, so a lazily-persisted grid raced and rebuilt
      // its corpus aggregate per consumer (see Tables.eager); spread()
      // parallelizes the partial aggregate off the driver's single-split
      // file (no-op on a real multi-split table)
      val grid = Tables.eager(Tables.spread(Tables.events(spark, dir))
        .select($"value",
          expr("pmod(ts_us, 86400000000) div 3600000000").as("hour"))
        .groupBy($"value", $"hour").agg(count(lit(1)).as("w")))
      val W = org.apache.spark.sql.expressions.Window
      val fx = grid.groupBy($"value").agg(sum($"w").as("f"))
        .withColumn("cum", sum($"f").over(W.orderBy($"value")
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .select($"value", (lit(2) * $"cum" - $"f" + 1).as("rx2"))
      val fy = grid.groupBy($"hour").agg(sum($"w").as("f"))
        .withColumn("cum", sum($"f").over(W.orderBy($"hour")
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .select($"hour", (lit(2) * $"cum" - $"f" + 1).as("ry2"))
      val s = grid
        .join(broadcast(fx), Seq("value"))
        .join(broadcast(fy), Seq("hour"))
        .agg(sum($"w").as("n"),
          sum($"w".cast(dec) * $"rx2").as("sx"),
          sum($"w".cast(dec) * $"ry2").as("sy"),
          sum($"w".cast(dec) * $"rx2" * $"ry2").as("sxy"),
          sum($"w".cast(dec) * $"rx2" * $"rx2").as("sxx"),
          sum($"w".cast(dec) * $"ry2" * $"ry2").as("syy"))
        .filter($"n" > 2)
      s.select($"n",
          (($"n" * $"sxy" - $"sx" * $"sy").cast(DoubleType) /
            (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast(DoubleType)) *
              sqrt(($"n" * $"syy" - $"sy" * $"sy").cast(DoubleType))))
            .as("rho0"))
        .select($"n", Det.qround($"rho0").as("rho"),
          when(abs($"rho0") < 1, Det.qround(
            $"rho0" * sqrt(($"n" - 2).cast(DoubleType) /
              (lit(1.0) - $"rho0" * $"rho0")))).as("t_stat"))
    },
    Some(s"""
      WITH grid AS (
        SELECT value, epoch_us(ts) % 86400000000 // 3600000000 AS hour,
          count(*)::BIGINT AS w
        FROM events GROUP BY 1, 2),
      fx AS (
        SELECT value,
          2 * (sum(f) OVER (ORDER BY value
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
            - f + 1 AS rx2
        FROM (SELECT value, sum(w)::BIGINT AS f FROM grid GROUP BY value)),
      fy AS (
        SELECT hour,
          2 * (sum(f) OVER (ORDER BY hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
            - f + 1 AS ry2
        FROM (SELECT hour, sum(w)::BIGINT AS f FROM grid GROUP BY hour)),
      s AS (
        SELECT sum(w)::BIGINT AS n,
          sum(w::DECIMAL(38,0) * rx2) AS sx,
          sum(w::DECIMAL(38,0) * ry2) AS sy,
          sum(w::DECIMAL(38,0) * rx2 * ry2) AS sxy,
          sum(w::DECIMAL(38,0) * rx2 * rx2) AS sxx,
          sum(w::DECIMAL(38,0) * ry2 * ry2) AS syy
        FROM grid JOIN fx USING (value) JOIN fy USING (hour)),
      r AS (
        SELECT n,
          (n * sxy - sx * sy)::DOUBLE /
            (sqrt((n * sxx - sx * sx)::DOUBLE) *
             sqrt((n * syy - sy * sy)::DOUBLE)) AS rho0
        FROM s WHERE n > 2)
      SELECT n, ${Oracle.qround("rho0")} AS rho,
        CASE WHEN abs(rho0) < 1 THEN
          ${Oracle.qround(
            "rho0 * sqrt((n - 2)::DOUBLE / (1.0 - rho0 * rho0))")} END
          AS t_stat
      FROM r
      ORDER BY n""")
  )

  /** Full row+column IPF rounds for [[qRaking]]. */
  val RakeIters = 3

  /** Raking / iterative proportional fitting (Deming & Stephan 1940) of
    * the (event_type × hour-of-day) contingency grid to UNIFORM target
    * margins — the survey-statistics reweighting every dataset-balancing
    * pipeline reimplements ("weight the corpus so each type and each
    * hour contributes equally"): w⁰ = 1, then alternately scale each row
    * to its target row mass and each column to its target column mass,
    * [[RakeIters]] full rounds. Emits per-cell weight and the weighted
    * mass; after the final COLUMN step the column margins match exactly
    * and the row margins are within the usual one-step IPF residual —
    * the convergence readout a reviewer checks.
    *
    * Determinism: the weight is a short chain of IEEE divisions/products
    * of exact integer masses and margin sums — identical trees in both
    * engines (margin sums stay in integer·double products over the
    * bounded grid, no reduction-order hazard: each margin is a ≤24-term
    * decimal-prerounded sum). Scale shape: ONE corpus aggregate to the
    * ≤|types|·24 grid; the IPF rounds are joins over that bounded
    * relation (the q_bh_fdr discipline). */
  val qRaking = GraftQuery(
    "q_raking",
    (spark, dir) => {
      import spark.implicits._
      val W = org.apache.spark.sql.expressions.Window
      def d12sumOver(c: org.apache.spark.sql.Column,
          part: org.apache.spark.sql.Column) =
        sum(c.cast(DecimalType(38, 12))).over(W.partitionBy(part))
          .cast(DoubleType)
      // eager (was lazy): the totals broadcast and the weight chain race
      // the cache build; spread() parallelizes the partial aggregate off
      // the single-split events file
      val grid = Tables.eager(Tables.spread(Tables.events(spark, dir))
        .select($"event_type",
          expr("pmod(ts_us, 86400000000) div 3600000000").as("hour"))
        .groupBy($"event_type", $"hour").agg(count(lit(1)).as("n")))
      val tot = grid.agg(sum($"n").as("nn"),
        countDistinct($"event_type").as("nt"),
        countDistinct($"hour").as("nh"))
      var w = grid.crossJoin(broadcast(tot))
        .select($"event_type", $"hour", $"n", $"nn", $"nt", $"nh",
          lit(1.0).as("w"))
      // each IPF margin is a PARTITIONED WINDOW over the bounded grid —
      // the same per-key exact decimal sum as the former groupBy +
      // broadcast join back, but inside one plan: six aggregate jobs,
      // six broadcast materializations and the per-round persists
      // collapse into one stage chain of alternating-key exchanges
      for (_ <- 1 to RakeIters) {
        w = w
          .withColumn("rmass", d12sumOver($"w" * $"n", $"event_type"))
          .select($"event_type", $"hour", $"n", $"nn", $"nt", $"nh",
            ($"w" * (($"nn" / $"nt") / $"rmass")).as("w"))
        w = w
          .withColumn("cmass", d12sumOver($"w" * $"n", $"hour"))
          .select($"event_type", $"hour", $"n", $"nn", $"nt", $"nh",
            ($"w" * (($"nn" / $"nh") / $"cmass")).as("w"))
      }
      w.select($"event_type", $"hour", $"n",
          Det.qround($"w").as("weight"),
          Det.qround($"w" * $"n").as("w_mass"))
        .orderBy($"event_type", $"hour")
    },
    Some {
      def round(i: Int): String = {
        val prev = if (i == 1) "w0" else s"w${i - 1}c"
        s"""
      r${i}m AS (
        SELECT event_type AS rt,
          sum(CAST(w * n AS DECIMAL(38,12)))::DOUBLE AS rmass
        FROM $prev GROUP BY event_type),
      w${i}r AS (
        SELECT p.event_type, p.hour, p.n, p.nn, p.nt, p.nh,
          p.w * ((p.nn / p.nt) / m.rmass) AS w
        FROM $prev p JOIN r${i}m m ON p.event_type = m.rt),
      c${i}m AS (
        SELECT hour AS ch,
          sum(CAST(w * n AS DECIMAL(38,12)))::DOUBLE AS cmass
        FROM w${i}r GROUP BY hour),
      w${i}c AS (
        SELECT p.event_type, p.hour, p.n, p.nn, p.nt, p.nh,
          p.w * ((p.nn / p.nh) / m.cmass) AS w
        FROM w${i}r p JOIN c${i}m m ON p.hour = m.ch)"""
      }
      s"""
      WITH grid AS (
        SELECT event_type, epoch_us(ts) % 86400000000 // 3600000000 AS hour,
          count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2),
      tot AS (
        SELECT sum(n)::BIGINT AS nn,
          count(DISTINCT event_type)::BIGINT AS nt,
          count(DISTINCT hour)::BIGINT AS nh
        FROM grid),
      w0 AS (
        SELECT event_type, hour, n, nn::DOUBLE AS nn, nt::DOUBLE AS nt,
          nh::DOUBLE AS nh, 1e0 AS w
        FROM grid CROSS JOIN tot),
      ${(1 to RakeIters).map(round).mkString(",")}
      SELECT event_type, hour, n,
        ${Oracle.qround("w")} AS weight,
        ${Oracle.qround("w * n")} AS w_mass
      FROM w${RakeIters}c
      ORDER BY event_type, hour"""
    }
  )

  val all: Seq[GraftQuery] =
    Seq(qProfileTable, qMixtureWeights, qNeymanAlloc, qFeatureCorr,
      qTableChecksum, qCmsHeavy, qGiniSource, qTemperatureMix, qSpearman,
      qRaking)
}
