package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.{Det, Text}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for a training-data pipeline, over `documents`:
  *
  *  - exact dedup (hash group-by on the full text);
  *  - MinHash + LSH banding near-dup (shingle → minhash signature → banded
  *    bucket join → exact Jaccard verify) — the scalable path: candidate
  *    generation never compares all pairs, only docs sharing an LSH bucket;
  *  - SimHash (tf-weighted bitwise signature, banded hamming join);
  *  - n-gram Jaccard (exact, candidates pruned by the shared-shingle join);
  *  - connected-component cluster assignment over the verified pairs;
  *  - incremental cross-run screening (new batch vs the corpus index);
  *  - character-level edit-distance audit of the LSH candidates;
  *  - span-level (exact-substring) coverage via the positional
  *    `word_shingles_all` stream — see [[qSpanDedup]].
  *
  * All hashing is md5-based: Spark's `md5` and DuckDB's `md5` agree
  * byte-for-byte, which makes every one of these sketches oracle-checkable —
  * no engine-private hash (xxhash/murmur) appears in the verified surface.
  *
  * Physical design (the 100 TB shape): signatures are computed in a SINGLE
  * per-row projection through the native codegen expressions
  * (`word_shingles`, `minhash_bands`, `simhash32` — functions/ArrayOps) —
  * no per-hash-index crossJoin, no per-(doc, hash) shuffle, no multi-level
  * aggregation, no CodegenFallback lambda in any hot path. The only
  * shuffles left are (a) the banded candidate join on (band, key) — rows ∝
  * docs × bands, and (b) the final verify join, which only ever sees
  * LSH-candidate pairs (O(n) with bounded bucket sizes), never O(n²).
  * Jaccard verification uses `array_intersect` on the per-doc shingle sets
  * carried alongside the candidates; cluster assignment turns the verified
  * pairs into per-doc keeper labels via bounded min-label propagation.
  *
  * The driver corpus plants 25 near-duplicate pairs (documents containing
  * the marker token "dup"); 2-shingle Jaccard ≥ 0.6 isolates exactly those.
  */
object Dedup {

  val MinHashK = 12        // signature length
  val BandRows = 3         // rows per LSH band => 4 bands; P(band)=s³ keeps
                           // the ≥0.9-jaccard planted pairs (miss < 0.4% per
                           // pair) while cutting false candidates ~20× on a
                           // high-baseline-similarity corpus
  val JaccardThreshold = 0.6
  // Length-filter bound as an exact rational. The verified filter keeps
  // pairs with qROUNDED jaccard ≥ 0.6, which admits raw J as low as
  // 0.5999995 — so the candidate filter must use a slightly WIDER bound
  // than 3/5 or it could prune a pair the rounded filter keeps (visible
  // only on multi-million-shingle documents). 599999/1000000 leaves
  // another 5e-7 of headroom for IEEE noise in J·1e6 and still prunes
  // essentially everything 3/5 would.
  val LengthFilterNum = 599999L
  val LengthFilterDen = 1000000L

  /** Exact duplicate groups: one keeper per distinct text. */
  val qDedupExact = GraftQuery(
    "q_dedup_exact",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .groupBy(md5($"text").as("fp"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select($"keep_id", $"n_copies", $"fp")
        .orderBy($"keep_id")
    },
    Some("""
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS fp
      FROM documents
      GROUP BY md5(text)
      ORDER BY keep_id""")
  )

  /** Distinct word n-gram shingles of a text column, as an array — computed
    * per row, no explode. Declarative (CodegenFallback) formulation, kept as
    * the unit-tested semantic twin of the native `word_shingles` expression
    * actually used by the queries (DedupSpec asserts set equality). */
  private[graft] def shingleArray(text: Column, n: Int): Column = {
    val toks = Text.tokens(text)
    // slice lengths clamped at 0: a doc with fewer than n-1 tokens would
    // otherwise hand slice() a negative length, which THROWS at runtime
    // (the native wordShingles returns [] for the same input)
    def len(minus: Int) = greatest(size(toks) - minus, lit(0))
    val sh =
      if (n == 2)
        zip_with(slice(toks, lit(1), len(1)), slice(toks, lit(2), len(1)),
          (a, b) => concat_ws(" ", a, b))
      else
        zip_with(
          zip_with(slice(toks, lit(1), len(2)), slice(toks, lit(2), len(2)),
            (a, b) => concat_ws(" ", a, b)),
          slice(toks, lit(3), len(2)),
          (ab, c) => concat_ws(" ", ab, c))
    array_distinct(sh)
  }

  /** (doc_id, sh: array&lt;string&gt;) distinct-shingle sets, via the native
    * codegen `word_shingles` expression (ArrayOps.wordShingles — the
    * declarative [[shingleArray]] twin is CodegenFallback).
    *
    * The scan is repartitioned before the shingle/hash projections so the
    * downstream per-row md5 work is spread across all cores. On a real
    * multi-split table the scan provides this parallelism for free; the
    * driver's single small parquet file would otherwise pin the whole
    * projection to one thread. */
  private[graft] def docShingles(spark: SparkSession, dir: String, n: Int): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id", call_function("word_shingles", $"text", lit(n)).as("sh"))
  }

  /** DuckDB twin of [[docShingles]] exploded (list comprehension over split
    * tokens) — the oracle works on shingle ROWS; same sets, same results. */
  private[operators] def shinglesSql(n: Int): String =
    if (n == 2)
      """SELECT doc_id, unnest(list_distinct(
           [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])) AS shingle
         FROM (SELECT doc_id, string_split_regex(lower(text), '[[:space:]]+') AS ws FROM documents)"""
    else
      """SELECT doc_id, unnest(list_distinct(
           [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)])) AS shingle
         FROM (SELECT doc_id, string_split_regex(lower(text), '[[:space:]]+') AS ws FROM documents)"""

  /** Exact Jaccard of every candidate pair against the true shingle sets
    * (UNfiltered — the relation [[qDedupThresholdSweep]] sweeps): join
    * the (small) pair list back to the per-doc arrays and intersect per
    * row. */
  private def scoredJaccard(cand: DataFrame, docsSh: DataFrame): DataFrame = {
    import cand.sparkSession.implicits._
    cand
      .join(docsSh.select($"doc_id".as("ia"), $"sh".as("sha")), Seq("ia"))
      .join(docsSh.select($"doc_id".as("ib"), $"sh".as("shb")), Seq("ib"))
      .select($"ia", $"ib",
        size(array_intersect($"sha", $"shb")).as("inter"),
        size($"sha").as("na"), size($"shb").as("nb"))
      .select($"ia", $"ib",
        graft.functions.Det.qround($"inter" / ($"na" + $"nb" - $"inter")).as("jaccard"))
  }

  /** Exact-Jaccard verification of candidate pairs at the production
    * threshold. */
  private def verifyJaccard(cand: DataFrame, docsSh: DataFrame): DataFrame = {
    import cand.sparkSession.implicits._
    scoredJaccard(cand, docsSh)
      .filter($"jaccard" >= JaccardThreshold)
      .orderBy($"ia", $"ib")
  }

  /** MinHash + LSH banding + exact Jaccard verification: verified near-dup
    * pairs (ia &lt; ib, jaccard ≥ threshold), shared by q_dedup_minhash and
    * the cluster-assignment operator.
    *
    * Signature h_i(doc) = min over shingles of md5(i || ':' || shingle),
    * all K values computed in one codegen'd projection (minhash_bands — no
    * crossJoin with a hash-index table, no shuffle); band key = concat of
    * BandRows signature values; candidate pairs = docs sharing any band key.
    */
  /** LSH candidate pairs (ia &lt; ib) from MinHash banding over a per-doc
    * shingle relation — band keys from the native minhash_bands expression:
    * all K md5 mins in one codegen'd pass per row (the declarative
    * transform/array_min twin is CodegenFallback: interpreted lambdas +
    * boxed allocations, ~100x slower; semantics identical — see
    * ArrayOps.minhashBands). Shared by the Jaccard-verified near-dup
    * queries and the edit-distance audit. */
  /** Banded posting rows (doc_id, band, key) — the LSH candidate-GENERATION
    * volume (rows entering the band join): grows linearly with the corpus,
    * which is what makes banding the scale path (ScaleLawSpec pins the
    * exponent on a salted replica blow-up; Prof -scale measures it). */
  private[graft] def minhashPostings(docsSh: DataFrame): DataFrame = {
    import docsSh.sparkSession.implicits._
    docsSh.select($"doc_id", posexplode(
      call_function("minhash_bands", $"sh", lit(MinHashK), lit(BandRows)))
      .as(Seq("band", "key")))
  }

  private[graft] def minhashCandidates(docsSh: DataFrame): DataFrame = {
    import docsSh.sparkSession.implicits._
    val banded = minhashPostings(docsSh)
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"))
      .distinct()
  }

  private[graft] def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    // eager for the same reason as in q_ngram_jaccard: banding + the two
    // verify joins would otherwise re-run the shingle projection (lazily
    // persisted they still race — see Tables.eager)
    minhashPairsOf(Tables.eager(docShingles(spark, dir, 2)))

  /** [[minhashPairs]] over an explicit shingle relation (pass it
    * eager-persisted) — lets [[qMinhashEstimate]] feed ONE shingle pass to
    * the pair pipeline AND its signature projection. */
  private[graft] def minhashPairsOf(docsSh: DataFrame): DataFrame =
    verifyJaccard(minhashCandidates(docsSh), docsSh)

  /** The LSH candidate relation (`cand(ia, ib)`) as oracle CTEs — the SQL
    * twin of [[minhashCandidates]], shared by the pair/cluster oracles and
    * the edit-distance audit. */
  private[operators] def minhashCandCtes: String = s"""
      sh AS (${shinglesSql(2)}),
      hashed AS (
        SELECT doc_id, h, min(md5(h || ':' || shingle)) AS mh
        FROM sh CROSS JOIN (SELECT unnest(range($MinHashK)) AS h)
        GROUP BY doc_id, h),
      bands AS (
        SELECT doc_id, h // $BandRows AS band,
          string_agg(mh, '|' ORDER BY h) AS key
        FROM hashed GROUP BY doc_id, h // $BandRows),
      cand AS (
        SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)"""

  /** UNTHRESHOLDED candidate-pair Jaccards as oracle SQL — the SQL twin
    * of [[scoredJaccard]] over the LSH candidates, swept by
    * q_dedup_threshold_sweep's oracle. */
  private def minhashScoredSql: String = s"""
      WITH $minhashCandCtes,
      sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
      inter AS (
        SELECT ia, ib, count(*) AS inter
        FROM cand
        JOIN sh sa ON ia = sa.doc_id
        JOIN sh sb ON ib = sb.doc_id AND sa.shingle = sb.shingle
        GROUP BY ia, ib)
      SELECT ia, ib,
        ${graft.Oracle.qround("inter * 1.0 / (na.ns + nb.ns - inter)")} AS jaccard
      FROM inter
      JOIN sizes na ON ia = na.doc_id
      JOIN sizes nb ON ib = nb.doc_id"""

  /** The minhash pair relation as oracle SQL (shared with q_dedup_clusters):
    * the scored relation filtered at the production threshold. */
  private def minhashPairsSql: String = s"""
      SELECT * FROM ($minhashScoredSql)
      WHERE jaccard >= $JaccardThreshold"""

  val qDedupMinhash = GraftQuery(
    "q_dedup_minhash",
    (spark, dir) => minhashPairs(spark, dir),
    Some(s"SELECT * FROM ($minhashPairsSql) ORDER BY ia, ib")
  )

  /** LSH parameter audit — the dedup-QA query MinHashK/BandRows get retuned
    * from (the NOTES "dedup constants" procedure, as a query instead of
    * folklore): bucket shape and candidate volume straight off the banded
    * relation (`band_pairs` = Σ C(bucket,2) is the work the band join
    * performs BEFORE pair dedup — the number a runaway banding blows up
    * first), exact-verify precision over the generated candidates, and the
    * S-curve EXPECTED recall: for a pair with verified jaccard j, the
    * banding catches it with p = 1 − (1 − j^r)^b, so avg(p) over the
    * verified pairs estimates recall against the truth WITHOUT an all-pairs
    * ground-truth join (which no 100 TB corpus can afford; the estimate is
    * conditioned on the pairs LSH found — at scale you'd union a second,
    * more permissive banding to debias, same query shape). Power terms are
    * explicit left-associated products, IEEE-identical in both engines, so
    * the whole audit is oracle-checkable.
    */
  val qLshCandidateAudit = GraftQuery(
    "q_lsh_candidate_audit",
    (spark, dir) => {
      import spark.implicits._
      val docsSh = docShingles(spark, dir, 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val banded = docsSh.select($"doc_id", posexplode(
          call_function("minhash_bands", $"sh", lit(MinHashK), lit(BandRows)))
          .as(Seq("band", "key")))
      val bstats = banded.groupBy($"band", $"key").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_buckets"), max($"sz").as("max_bucket"),
          sum(expr("(sz * (sz - 1)) div 2")).as("band_pairs"))
      val cand = minhashCandidates(docsSh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cstats = cand.agg(count(lit(1)).as("n_cand"))
      // power chains derived from the banding constants (left-assoc products,
      // mirrored verbatim in the oracle) so a retune can't desync the S-curve
      val jPowR = Seq.fill(BandRows)($"j": Column).reduce(_ * _)
      val mPowB = Seq.fill(MinHashK / BandRows)($"m": Column).reduce(_ * _)
      val vstats = verifyJaccard(cand, docsSh)
        .select($"jaccard".as("j"))
        .select((lit(1.0) - jPowR).as("m"))
        .select((lit(1.0) - mPowB).as("p"))
        .agg(count(lit(1)).as("n_verified"),
          graft.functions.Det.davg($"p").as("exp_recall"))
      bstats.crossJoin(broadcast(cstats)).crossJoin(broadcast(vstats))
        .select($"n_buckets", $"max_bucket", $"band_pairs", $"n_cand",
          $"n_verified",
          // n_cand = 0 on an empty/dup-free corpus: precision is undefined
          // there and ANSI division THROWS — null instead (both engines;
          // found by the EmptyTablesSpec zero-row sweep)
          when($"n_cand" > 0,
            graft.functions.Det.qround($"n_verified" / $"n_cand"))
            .as("precision"),
          $"exp_recall")
    },
    Some(s"""
      WITH $minhashCandCtes,
      buckets AS (SELECT band, key, count(*) AS sz FROM bands GROUP BY band, key),
      bstats AS (SELECT count(*) AS n_buckets, max(sz) AS max_bucket,
        sum((sz * (sz - 1)) // 2)::BIGINT AS band_pairs FROM buckets),
      cstats AS (SELECT count(*) AS n_cand FROM cand),
      sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
      inter AS (
        SELECT ia, ib, count(*) AS inter FROM cand
        JOIN sh sa ON ia = sa.doc_id
        JOIN sh sb ON ib = sb.doc_id AND sa.shingle = sb.shingle
        GROUP BY ia, ib),
      verified AS (
        SELECT ${graft.Oracle.qround("inter * 1.0 / (na.ns + nb.ns - inter)")} AS j
        FROM inter
        JOIN sizes na ON ia = na.doc_id
        JOIN sizes nb ON ib = nb.doc_id
        WHERE ${graft.Oracle.qround("inter * 1.0 / (na.ns + nb.ns - inter)")}
            >= $JaccardThreshold),
      probs AS (
        SELECT 1.0 - ${Seq.fill(MinHashK / BandRows)("m").mkString("*")} AS p
        FROM (SELECT 1.0 - ${Seq.fill(BandRows)("j").mkString("*")} AS m
              FROM verified)),
      vstats AS (SELECT count(*) AS n_verified,
        ${graft.Oracle.davg("p")} AS exp_recall FROM probs)
      SELECT n_buckets, max_bucket, band_pairs, n_cand, n_verified,
        CASE WHEN n_cand > 0
          THEN ${graft.Oracle.qround("n_verified * 1.0 / n_cand")} END AS precision,
        exp_recall
      FROM bstats, cstats, vstats""")
  )

  /** Every (bands, rowsPerBand) factorization of [[MinHashK]] = 12, the
    * grid [[qMinhashTune]] walks — ordered by rows per band, bracketing
    * the production (4 bands × 3 rows) on both sides. */
  private[graft] val BandFactorizations: Seq[(Int, Int)] =
    Seq((12, 1), (6, 2), (4, 3), (3, 4), (2, 6), (1, 12))

  /** Banding auto-tuner (round-15 verdict item #7) — the "should we
    * re-band" decision table q_lsh_candidate_audit's folklore procedure
    * reads from: for EACH (b, r) factorization of the existing K = 12
    * signature, one row with
    *
    *  - `thr_pred` = (1/b)^(1/r), the S-curve P(candidate | j) =
    *    1 − (1 − j^r)^b inflection estimate — the Jaccard level this
    *    banding is implicitly tuned for (spelled exp(ln(1/b)/r) in both
    *    engines, the q_logistic_irls exp/ln-parity precedent);
    *  - the MEASURED bucket shape under that banding (n_buckets,
    *    max_bucket, and band_pairs = Σ C(bucket, 2) — the candidate
    *    volume the band join would generate BEFORE pair dedup, the
    *    number a bad banding blows up first);
    *  - `exp_recall` = avg over the production-verified pairs of the
    *    S-curve catch probability under (b, r) — measured recall against
    *    the same conditioned truth set the audit uses (at (4, 3) this IS
    *    the audit's exp_recall; the spec pins the row).
    *
    * Reading the table: rows_per_band below 3 explode band_pairs (r = 1
    * buckets key on a single minimum), rows above 3 trade candidate
    * volume for recall lost at the production threshold — (4, 3) is the
    * knee, which is WHY it is the production setting.
    *
    * Scale shape: the K raw minima are computed ONCE per doc (the same
    * native one-pass expression as banding, bandRows = 1); ONE map-side
    * projection then emits the (rows_per_band, band, slot-ordered key)
    * rows of ALL six factorizations at once — Σ 12/r = 28 rows per doc,
    * each banding's keys assembled from the same 12 array slots — so
    * the whole grid costs ONE groupBy(r, band, key) exchange plus a
    * 6-row banding rollup, never six re-groups of the minima relation
    * (round-15 verdict item #4: same aggregates, a third of the
    * exchanges); the recall leg is ONE 13-column aggregate over the
    * verified pairs (grid → aggregate COLUMNS, the
    * q_filter_threshold_sweep pattern).
    * Exactness: bucket counts are integers; the power chains are
    * explicit left-associated products mirrored verbatim in the oracle;
    * averages are decimal [[Det.davg]] folds. */
  val qMinhashTune = GraftQuery(
    "q_minhash_tune",
    (spark, dir) => {
      import spark.implicits._
      val docsSh = docShingles(spark, dir, 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the K raw minima, one native pass (the q_minhash_estimate
      // shape); a doc with no shingles signs NULL and is absent from
      // every banding (the posexplode-of-empty behavior of the six-
      // re-group shape this replaces). For banding r, band i's key is
      // minima[i·r .. i·r+r−1] joined in slot order — identical to the
      // oracle's string_agg(mh, '|' ORDER BY h) within h div r — built
      // here as one codegen'd array-of-structs explode, no interpreted
      // HOF and no per-banding exchange.
      val banded = docsSh
        .select(call_function("minhash_bands", $"sh", lit(MinHashK),
          lit(1)).as("mhs"))
        .filter($"mhs".isNotNull)
        .select(explode(array(
          (for ((b, r) <- BandFactorizations; band <- 0 until b) yield
            struct(lit(r).as("r"), lit(band).as("band"),
              // md5 fingerprint of the slot-ordered key: bucket SIZES are
              // invariant under an injective key mapping (the exact-dedup
              // fingerprint argument; 128-bit collisions ~1e-24), and the
              // fixed 32-char key keeps the one big exchange and its hash
              // table ~2.5x smaller than raw r-minima concatenations
              // (the r=12 key alone is 400 bytes)
              md5(concat_ws("|", (0 until r).map(s =>
                $"mhs".getItem(band * r + s)): _*)).as("key"))): _*))
          .as("x"))
        .select($"x.r".as("r"), $"x.band".as("band"), $"x.key".as("key"))
      // ONE (r, band, key) exchange for all six bandings, then the
      // 6-row banding-keyed rollup (persisted: six final-projection legs
      // read it)
      val stats = banded
        .groupBy($"r", $"band", $"key").agg(count(lit(1)).as("sz"))
        .groupBy($"r")
        .agg(count(lit(1)).as("n_buckets"), max($"sz").as("max_bucket"),
          sum(expr("(sz * (sz - 1)) div 2")).as("band_pairs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // ONE aggregate over the verified pairs: count + per-(b,r) S-curve
      // expected recall as columns
      val verified = verifyJaccard(minhashCandidates(docsSh), docsSh)
        .select($"jaccard".as("j"))
      val erCols = BandFactorizations.zipWithIndex.map { case ((b, r), i) =>
        val jPowR = Seq.fill(r)($"j": Column).reduce(_ * _)
        val m = lit(1.0) - jPowR
        val mPowB = Seq.fill(b)(m).reduce(_ * _)
        Det.davg(lit(1.0) - mPowB).as(s"er$i")
      }
      // persisted (1 row): each grid leg prunes this to its own er$i
      // column, so the six broadcast subtrees canonicalize DIFFERENTLY
      // and exchange reuse never fires — without the barrier the whole
      // candidate+verify pipeline executes six times (measured at the
      // 10x rehearsal: 25-28 s vs ~8 s with the barrier; invisible at 1x
      // where the verify leg is cheap)
      val vAgg = verified.agg(count(lit(1)).as("n_verified"), erCols: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      BandFactorizations.zipWithIndex.map { case ((b, r), i) =>
        // LEFT-join a 1-row anchor so a zero-bucket banding (degenerate
        // corpus: no doc yields shingles) still emits its grid row —
        // the oracle's per-banding GLOBAL aggregate always produces one
        // row (count 0, null shape), and the filter alone would lose it
        // (round-16 advice)
        spark.range(1)
          .join(stats.filter($"r" === r), lit(true), "left")
          .crossJoin(broadcast(vAgg))
          .select(lit(b.toLong).as("bands"),
            lit(r.toLong).as("rows_per_band"),
            Det.qround(exp(log(lit(1.0) / lit(b.toDouble))
              / lit(r.toDouble))).as("thr_pred"),
            coalesce($"n_buckets", lit(0L)).as("n_buckets"),
            $"max_bucket", $"band_pairs",
            $"n_verified", col(s"er$i").as("exp_recall"))
      }.reduce(_.unionByName(_)).orderBy($"rows_per_band")
    },
    Some {
      val perR = BandFactorizations.map { case (b, r) => s"""
      bands_$r AS (
        SELECT doc_id, h // $r AS band,
          string_agg(mh, '|' ORDER BY h) AS key
        FROM hashed GROUP BY doc_id, h // $r),
      buckets_$r AS (
        SELECT band, key, count(*) AS sz FROM bands_$r GROUP BY band, key),
      stats_$r AS (
        SELECT count(*) AS n_buckets, max(sz) AS max_bucket,
          sum((sz * (sz - 1)) // 2)::BIGINT AS band_pairs
        FROM buckets_$r),
      er_$r AS (
        SELECT ${Oracle.davg("p")} AS er FROM (
          SELECT 1.0 - ${Seq.fill(b)("m").mkString("*")} AS p FROM (
            SELECT 1.0 - ${Seq.fill(r)("j").mkString("*")} AS m
            FROM verified)))""" }.mkString(",")
      val selects = BandFactorizations.map { case (b, r) => s"""
      SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
        ${Oracle.qround(s"exp(ln(1.0e0 / ${b.toDouble}e0) / ${r.toDouble}e0)")}
          AS thr_pred,
        s.n_buckets, s.max_bucket, s.band_pairs, vs.n_verified,
        e.er AS exp_recall
      FROM stats_$r s, vstats vs, er_$r e""" }.mkString(" UNION ALL ")
      s"""
      WITH $minhashCandCtes,
      sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
      inter AS (
        SELECT ia, ib, count(*) AS inter FROM cand
        JOIN sh sa ON ia = sa.doc_id
        JOIN sh sb ON ib = sb.doc_id AND sa.shingle = sb.shingle
        GROUP BY ia, ib),
      verified AS (
        SELECT ${Oracle.qround("inter * 1.0 / (na.ns + nb.ns - inter)")} AS j
        FROM inter
        JOIN sizes na ON ia = na.doc_id
        JOIN sizes nb ON ib = nb.doc_id
        WHERE ${Oracle.qround("inter * 1.0 / (na.ns + nb.ns - inter)")}
            >= $JaccardThreshold),
      vstats AS (SELECT count(*) AS n_verified FROM verified),
      $perR
      SELECT * FROM ($selects) ORDER BY rows_per_band"""
    }
  )

  /** The Jaccard grid [[qDedupThresholdSweep]] walks — brackets the
    * production [[JaccardThreshold]] (0.6) on both sides. Literal
    * doubles, identical in both engines. */
  private[graft] val DedupThresholds: Seq[Double] = (10 to 19).map(_ / 20.0)

  /** Dedup-aggressiveness sweep — the q_filter_threshold_sweep question
    * asked of the near-dup pipeline: for each Jaccard threshold on the
    * grid, how many verified candidate pairs survive and how many
    * distinct documents they touch. A curation team reads this before
    * moving [[JaccardThreshold]]: the pair count says how much MORE
    * merging a lower bar buys, the touched-doc count bounds the removal
    * set. Scoped to the LSH CANDIDATE set (banding is tuned for the
    * production threshold), so sub-0.6 rows read as within-candidate
    * retention — the same audit framing as q_lsh_candidate_audit, whose
    * recall S-curve says how complete the candidate set is at each j.
    *
    * Scale shape: the exact-Jaccard scoring runs ONCE over the
    * bucket-scoped candidate pairs (never all-pairs); the sweep is a
    * |grid|-way conditional pass over that audit-sized relation, and the
    * touched-doc distinct runs on (thr, doc) pairs bounded by
    * 2·|grid|·|candidates|. Exactness: counts are integers; jaccard is
    * already qrounded; grid comparisons use identical literal doubles. */
  val qDedupThresholdSweep = GraftQuery(
    "q_dedup_threshold_sweep",
    (spark, dir) => {
      import spark.implicits._
      val docsSh = docShingles(spark, dir, 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val scored = scoredJaccard(minhashCandidates(docsSh), docsSh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val g = DedupThresholds.toDF("thr")
      val byThr = scored.crossJoin(broadcast(g)).filter($"jaccard" >= $"thr")
      val pairsPerT = byThr.groupBy($"thr").agg(count(lit(1)).as("n_pairs"))
      val docsPerT = byThr
        .select($"thr", explode(array($"ia", $"ib")).as("d")).distinct()
        .groupBy($"thr").agg(count(lit(1)).as("n_docs_touched"))
      g.join(pairsPerT, Seq("thr"), "left")
        .join(docsPerT, Seq("thr"), "left")
        .select($"thr", coalesce($"n_pairs", lit(0L)).as("n_pairs"),
          coalesce($"n_docs_touched", lit(0L)).as("n_docs_touched"))
        .orderBy($"thr")
    },
    Some {
      val grid = DedupThresholds.mkString(", ")
      s"""
      WITH pall AS ($minhashScoredSql),
      g AS (SELECT CAST(unnest([$grid]) AS DOUBLE) AS thr),
      pt AS (
        SELECT thr, count(*)::BIGINT AS n_pairs
        FROM pall CROSS JOIN g WHERE jaccard >= thr GROUP BY 1),
      dt AS (
        SELECT thr, count(DISTINCT d)::BIGINT AS n_docs_touched
        FROM (SELECT thr, unnest([ia, ib]) AS d
              FROM pall CROSS JOIN g WHERE jaccard >= thr)
        GROUP BY 1)
      SELECT g.thr, coalesce(pt.n_pairs, 0)::BIGINT AS n_pairs,
        coalesce(dt.n_docs_touched, 0)::BIGINT AS n_docs_touched
      FROM g LEFT JOIN pt USING (thr) LEFT JOIN dt USING (thr)
      ORDER BY g.thr"""
    }
  )

  /** Maximum label-propagation rounds for q_dedup_clusters — a guard far
    * above any real near-dup component diameter. */
  val MaxCcIterations = 20

  /** Dedup cluster assignment: connected components over the verified
    * MinHash near-dup pairs, every document labeled with its cluster's
    * minimum doc_id (the canonical keeper; singletons keep themselves).
    * This is the step that turns a PAIR list into an actionable keep/drop
    * decision — grouping "A~B, B~C" into one cluster {A,B,C} → keeper A.
    *
    * Shape: iterative min-label propagation — per round one join of the
    * edge list against current labels + one min-aggregate, converging in
    * ≤ component-diameter rounds (each round is a bounded shuffle on the
    * edge key; no driver-side data beyond the convergence counter). The
    * iteration runs over the EDGE-ENDPOINT SUBGRAPH only — the set of
    * documents that have at least one verified near-dup, a vanishing
    * fraction of any real corpus — and the final labels are joined back to
    * the full document table exactly once (documents outside the subgraph
    * are their own cluster). At 100 TB this is the difference between
    * per-round shuffles ∝ |near-dup pairs| and per-round shuffles ∝ |corpus|.
    * MaxCcIterations bounds pathology; the oracle computes the same fixpoint
    * with a recursive CTE.
    */
  /** (doc_id, cluster) for EVERY document — the connected-component labels
    * over the verified MinHash pairs, singletons labeling themselves.
    * Shared by [[qDedupClusters]] (which just orders it) and
    * [[qDedupKeepBest]] (which picks a quality-ranked keeper per label). */
  private[graft] def clusterAssignment(
      spark: SparkSession, dir: String): DataFrame = {
      import spark.implicits._
      val pairs = minhashPairs(spark, dir).select($"ia", $"ib")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = pairs.union(pairs.select($"ib", $"ia")).toDF("src", "dst")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // init = identity WITH the first propagation round folded in
      // (label₀ = min over self + direct neighbors): diameter-1 components —
      // the overwhelming near-dup case — converge before the loop even runs,
      // so the loop body executes exactly once (the confirming round)
      var cached = edges.groupBy($"src")
        .agg(least($"src", min($"dst")).as("label"))
        .select($"src".as("id"), $"label")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var labels = cached
      var changed = 1L
      var it = 0
      while (changed > 0 && it < MaxCcIterations) {
        // one join + ONE action per round: the next label and the
        // did-it-shrink flag come out of the same pass (the count also
        // materializes the persisted relation the next round reads)
        val viaNeighbors = edges.join(labels, edges("dst") === labels("id"))
          .groupBy($"src").agg(min($"label").as("nl"))
        val next = labels.join(viaNeighbors, labels("id") === viaNeighbors("src"), "left")
          .select(labels("id"), $"label".as("old"),
            least($"label", coalesce($"nl", $"label")).as("label"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        changed = next.filter($"label" < $"old").count()
        cached.unpersist()
        cached = next
        labels = next.select($"id", $"label")
        it += 1
      }
      // the convergence counts have materialized everything the final
      // labels cache needs — the edge relations are dead weight from here
      pairs.unpersist()
      edges.unpersist()
      if (changed > 0)
        System.err.println(
          s"[dedup] WARNING: label propagation hit MaxCcIterations=" +
            s"$MaxCcIterations before converging ($changed labels still " +
            "moving) — cluster labels may not be component minima")
      // one join back to the corpus: subgraph labels broadcast (they are
      // tiny relative to the table whenever dedup is worth running; drop
      // the hint if a corpus ever inverts that), everyone else keeps itself
      Tables.documents(spark, dir)
        .join(broadcast(labels.select($"id".as("doc_id"), $"label")),
          Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"label", $"doc_id").as("cluster"))
  }

  /** The component fixpoint as oracle CTE text (`cl(doc_id, cluster)`) —
    * the recursive-CTE twin of [[clusterAssignment]], shared by the
    * cluster and keep-best oracles. */
  private def clusterCtes: String = s"""
      pairs AS ($minhashPairsSql),
      edges AS (
        SELECT ia AS u, ib AS v FROM pairs
        UNION SELECT ib, ia FROM pairs),
      reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (
        SELECT u AS doc_id, least(u, min(v)) AS cluster
        FROM reach GROUP BY u),
      cl AS (
        SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp c USING (doc_id))"""

  val qDedupClusters = GraftQuery(
    "q_dedup_clusters",
    (spark, dir) => clusterAssignment(spark, dir).orderBy(col("doc_id")),
    Some(s"""
      WITH RECURSIVE $clusterCtes
      SELECT doc_id, cluster FROM cl ORDER BY doc_id""")
  )

  /** Keep-BEST-in-cluster: the actionable dedup decision when documents are
    * not interchangeable — [[qDedupClusters]] keeps the minimum doc_id (the
    * deterministic default), but a curation run keeps the highest-QUALITY
    * member of each near-dup cluster (the C4/RefinedWeb practice: among
    * mirrored copies keep the cleanest, not the first-crawled). Keeper =
    * max quality, ties to the lower doc_id, using the engine's ONE quality
    * definition (TextAnalytics.qualityCol — an inlined copy here could
    * silently drift from q_quality_score on a weight change).
    *
    * Scale shape: quality is a map-side projection; labels join the corpus
    * once (broadcast, subgraph-sized + singletons resolved by coalesce is
    * already inside clusterAssignment); the keeper window shuffles on
    * `cluster` — cardinality ≈ corpus (mostly singleton partitions), no
    * skew beyond the largest near-dup cluster. */
  val qDedupKeepBest = GraftQuery(
    "q_dedup_keep_best",
    (spark, dir) => {
      import spark.implicits._
      val quality = Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", TextAnalytics.qualityCol.as("quality"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"cluster").orderBy($"quality".desc, $"doc_id".asc)
      clusterAssignment(spark, dir)
        .join(quality, Seq("doc_id"))
        .withColumn("keeper", first($"doc_id").over(w))
        .select($"doc_id", $"cluster", $"quality", $"keeper",
          ($"doc_id" === $"keeper").as("keep"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE $clusterCtes,
      q AS (
        SELECT doc_id, ${TextAnalytics.qualitySqlExpr} AS quality
        FROM documents),
      ranked AS (
        SELECT cl.doc_id, cl.cluster, q.quality,
          first_value(cl.doc_id) OVER (
            PARTITION BY cl.cluster
            ORDER BY q.quality DESC, cl.doc_id ASC) AS keeper
        FROM cl JOIN q USING (doc_id))
      SELECT doc_id, cluster, quality, keeper,
        doc_id = keeper AS keep
      FROM ranked ORDER BY doc_id""")
  )

  /** Source-pair near-duplication pressure map: the verified MinHash pairs
    * rolled up to (source_a ≤ source_b) with pair counts and the exact
    * decimal-mean jaccard — the provenance view that catches MIRROR sites
    * (two sources whose pair count rivals their doc counts) and
    * self-duplicating feeds (the diagonal), which doc-level pair lists are
    * too granular to show. Scale shape: the rollup input is the verified
    * pair relation (already bounded by banding), joined twice against the
    * broadcast-size (doc_id, source) projection, then one tiny
    * source-pair aggregate. */
  val qNeardupSources = GraftQuery(
    "q_neardup_sources",
    (spark, dir) => {
      import spark.implicits._
      val src = Tables.documents(spark, dir).select($"doc_id", $"source")
      minhashPairs(spark, dir)
        .join(src.select($"doc_id".as("ia"), $"source".as("sa")), Seq("ia"))
        .join(src.select($"doc_id".as("ib"), $"source".as("sb")), Seq("ib"))
        .select(least($"sa", $"sb").as("source_a"),
          greatest($"sa", $"sb").as("source_b"), $"jaccard")
        .groupBy($"source_a", $"source_b")
        .agg(count(lit(1)).as("n_pairs"), Det.davg($"jaccard").as("avg_jaccard"))
        .orderBy($"source_a", $"source_b")
    },
    Some(s"""
      WITH pairs AS ($minhashPairsSql),
      lab AS (
        SELECT least(da.source, db.source) AS source_a,
          greatest(da.source, db.source) AS source_b, jaccard
        FROM pairs
        JOIN documents da ON pairs.ia = da.doc_id
        JOIN documents db ON pairs.ib = db.doc_id)
      SELECT source_a, source_b, count(*)::BIGINT AS n_pairs,
        ${Oracle.davg("jaccard")} AS avg_jaccard
      FROM lab GROUP BY source_a, source_b
      ORDER BY source_a, source_b""")
  )

  /** Declarative SimHash signature (explode → md5 → 32 conditional sums →
    * sign) — the relational twin of the native `simhash32` expression, kept
    * for DedupSpec's equivalence assertion. One (doc_id, term) shuffle. */
  private[graft] def simhashSigDeclarative(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = docs
      .select($"doc_id", explode(Text.tokens($"text")).as("term"))
      .withColumn("hv", expr("cast(conv(substr(md5(term), 1, 8), 16, 10) as bigint)"))
    val bitSums = (0 until 32).map(b =>
      sum(when(expr(s"(hv >> $b) & 1") === 1, lit(1L)).otherwise(lit(-1L)))
        .as(s"s$b"))
    toks.groupBy($"doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id",
        (0 until 32).map(b =>
          when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash: 32-bit tf-weighted signature; banded join (4 bands × 8 bits)
    * guarantees recall for hamming distance ≤ 3 by pigeonhole.
    *
    * Shape: the signature is ONE map-side pass per document via the native
    * `simhash32` codegen expression — no token explode, no aggregation
    * shuffle (the declarative twin above costs a full (doc_id, term)
    * shuffle; at 100 TB that shuffle IS the job). The only shuffles left are
    * the banded candidate join and the final dedup/sort.
    */
  /** Shared oracle fragment: the tf-weighted SimHash signature + 4×8-bit
    * banding as CTE text (`tf`, `bits`, `sig`, `banded`) — interpolated into
    * every simhash-based oracle so both engines always hash identically. */
  private[operators] val simhashBandedSql: String = """tf AS (
        SELECT doc_id, term, count(*) AS tf,
          CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS hv
        FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term FROM documents)
        GROUP BY doc_id, term),
      bits AS (
        SELECT doc_id, b, sum(tf * (((hv >> b) & 1) * 2 - 1)) AS s
        FROM tf CROSS JOIN (SELECT unnest(range(32)) AS b)
        GROUP BY doc_id, b),
      sig AS (
        SELECT doc_id,
          sum(CASE WHEN s >= 0 THEN 1::BIGINT << b ELSE 0 END) AS simhash
        FROM bits GROUP BY doc_id),
      banded AS (
        SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS bkey
        FROM sig CROSS JOIN (SELECT unnest(range(4)) AS band))"""

  /** (doc_id, simhash, band, bkey) — the Spark twin of `banded` above:
    * native map-side signature + 4×8-bit band keys. */
  private def simhashBanded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id", call_function("simhash32", $"text").as("simhash"))
      .select($"doc_id", $"simhash", explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bkey", expr("(simhash >> (band * 8)) & 255"))
  }

  val qDedupSimhash = GraftQuery(
    "q_dedup_simhash",
    (spark, dir) => {
      import spark.implicits._
      val banded = simhashBanded(spark, dir)
      banded.as("a").join(banded.as("b"),
          $"a.band" === $"b.band" && $"a.bkey" === $"b.bkey" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
          expr("cast(bit_count(a.simhash ^ b.simhash) as bigint)").as("hamming"))
        .filter($"hamming" <= 3)   // before distinct: cuts the band-join
        .distinct()                // output ~30x ahead of the dedup shuffle
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH $simhashBandedSql,
      pairs AS (
        SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
          bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
      SELECT ia, ib, hamming FROM pairs
      WHERE hamming <= 3
      ORDER BY ia, ib""")
  )

  /** Incremental (cross-run) near-dedup: the last 10% of doc_ids stand in
    * for a NEWLY ARRIVED batch, screened against the SimHash index of the
    * existing corpus — the production shape where an immutable signature
    * index is maintained across runs and only new data is hashed and probed.
    * Each new document gets its closest existing near-duplicate
    * (min hamming, ties to the lower doc_id) or null if none within
    * distance 3. Shapes: new-side signatures are one map pass; the
    * candidate join touches only shared (band, bkey) buckets — never
    * new × corpus; the final pick partial-aggregates to one row per new doc.
    */
  val qDedupIncremental = GraftQuery(
    "q_dedup_incremental",
    (spark, dir) => {
      import spark.implicits._
      // the split point is data-derived (count - count/10), computed
      // declaratively and broadcast — no driver-side action
      val cut = Tables.documents(spark, dir)
        .agg(count(lit(1)).as("n"))
        .select((col("n") - expr("n div 10")).cast(LongType).as("c"))
      val banded = simhashBanded(spark, dir).crossJoin(broadcast(cut))
      val idx = banded.filter($"doc_id" < $"c")
        .select($"doc_id".as("old_id"), $"simhash".as("old_sig"), $"band", $"bkey")
      val fresh = banded.filter($"doc_id" >= $"c")
      val cand = fresh.join(idx, Seq("band", "bkey"))
        .select($"doc_id", $"old_id",
          expr("cast(bit_count(simhash ^ old_sig) as bigint)").as("hamming"))
        .filter($"hamming" <= 3)
        .distinct()
      val best = cand.groupBy($"doc_id")
        .agg(min_by(struct($"old_id", $"hamming"), struct($"hamming", $"old_id"))
          .as("b"))
        .select($"doc_id", $"b.old_id".as("dup_of"), $"b.hamming".as("hamming"))
      Tables.documents(spark, dir).crossJoin(broadcast(cut))
        .filter($"doc_id" >= $"c").select($"doc_id")
        .join(best, Seq("doc_id"), "left")
        .select($"doc_id", $"dup_of", $"hamming")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH $simhashBandedSql,
      cut AS (SELECT count(*) - count(*) // 10 AS c FROM documents),
      cand AS (
        SELECT DISTINCT n.doc_id, o.doc_id AS old_id,
          bit_count(xor(n.simhash, o.simhash))::BIGINT AS hamming
        FROM banded n JOIN banded o
          ON n.band = o.band AND n.bkey = o.bkey
        CROSS JOIN cut
        WHERE n.doc_id >= cut.c AND o.doc_id < cut.c
          AND bit_count(xor(n.simhash, o.simhash)) <= 3),
      best AS (
        SELECT doc_id, old_id AS dup_of, hamming FROM (
          SELECT doc_id, old_id, hamming,
            row_number() OVER (PARTITION BY doc_id ORDER BY hamming, old_id) AS rn
          FROM cand)
        WHERE rn = 1)
      SELECT d.doc_id, b.dup_of, b.hamming
      FROM documents d CROSS JOIN cut LEFT JOIN best b USING (doc_id)
      WHERE d.doc_id >= cut.c
      ORDER BY d.doc_id""")
  )

  /** Document-frequency cap for the n-gram candidate join: shingles occurring
    * in more than max(2, n_docs/50) documents (2%) are "stop-shingles" and
    * are excluded from CANDIDATE GENERATION (not from verification). Integer
    * `div` so Spark and DuckDB compute the identical cap. */
  val NgramDfCapDivisor = 50
  val NgramDfCapFloor = 2

  /** Exact n-gram (3-shingle) Jaccard near-dup over the stop-shingle-pruned
    * feature set.
    *
    * The naive shared-shingle self-join is quadratic in the per-shingle
    * document frequency — ONE hot shingle ("in the end", boilerplate headers)
    * on a real corpus produces df² candidate rows. Standard fix (the same
    * stop-shingle rule MinHash-dedup pipelines apply): shingles with
    * df > max(2, n_docs/50) are dropped from the FEATURE SET — similarity is
    * Jaccard over the remaining discriminative shingles, in both engines.
    * The hot set is by construction tiny (≤ n_docs·avg_shingles/df_cap
    * values), so it broadcasts as a left-anti join; per-shingle fan-out in
    * the pair join is then provably ≤ df_cap, and intersection sizes come
    * straight from a codegen'd count over that bounded join — no per-pair
    * array materialization anywhere.
    */
  /** Df-capped 3-shingle posting rows (doc_id, shingle) — q_ngram_jaccard's
    * candidate-generation input. Persisted twice by design: the exploded
    * rows feed the df aggregation, the per-doc sizes, and both sides of the
    * pair join — without the barriers the (interpreted-HOF) projection
    * re-executes once per consumer. */
  private[graft] def ngramPostings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ex = docShingles(spark, dir, 3)
      .select($"doc_id", explode($"sh").as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val hot = ex.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter($"df" > greatest(lit(NgramDfCapFloor),
        expr(s"n_docs div $NgramDfCapDivisor")))
      .select($"shingle")
    // eager, not lazy persist: the df aggregate, the sizes aggregate and
    // BOTH sides of the pair self-join consume this relation through
    // concurrently-materialized AQE subqueries — Prof -stages showed the
    // whole scan→shingle→explode lineage executing up to 7× per run behind
    // the lazy persist (the cache-population race Tables.eager documents)
    Tables.eager(ex.join(broadcast(hot), Seq("shingle"), "left_anti"))
  }

  /** Candidate pair groups (ia, ib, na, nb, inter) BEFORE the similarity
    * threshold — the pair-join output whose growth rate is the scale risk
    * (ScaleLawSpec pins it). Shared verbatim by q_ngram_jaccard. */
  private[graft] def ngramCandidates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pruned = ngramPostings(spark, dir)
    val sizes = pruned.groupBy($"doc_id").agg(count(lit(1)).cast(LongType).as("ns"))
    // PPJoin-style length filter on candidate GENERATION: J(A,B) ≤
    // min(|A|,|B|)/max(|A|,|B|), so any retained pair needs
    // min/max ≥ LengthFilterNum/LengthFilterDen (the rounded-threshold-
    // inclusive bound — see the constant's comment). Kept in exact
    // INTEGER form (a double 0.6·ns can round across the boundary) —
    // provably prunes only pairs the verified filter would drop, so
    // results (and the oracle, which has no filter) are unchanged; rows
    // entering the count shuffle drop before grouping.
    // NO broadcast hint: sizes is one row per document — corpus-sized —
    // and must flow through a shuffle join at scale (AQE still broadcasts
    // it locally when it is actually small).
    // eager: BOTH sides of the pair self-join consume this relation; lazily
    // each side re-ran the sizes aggregate + the join (Prof -stages showed
    // the duplicated subtree), and exchange reuse does not collapse it
    val withNs = Tables.eager(pruned.join(sizes, Seq("doc_id")))
    withNs.as("a").join(withNs.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id" &&
          $"a.ns" * lit(LengthFilterDen) >= $"b.ns" * lit(LengthFilterNum) &&
          $"b.ns" * lit(LengthFilterDen) >= $"a.ns" * lit(LengthFilterNum))
      .groupBy($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        $"a.ns".as("na"), $"b.ns".as("nb"))
      .agg(count(lit(1)).as("inter"))
  }

  val qNgramJaccard = GraftQuery(
    "q_ngram_jaccard",
    (spark, dir) => {
      import spark.implicits._
      ngramCandidates(spark, dir)
        .select($"ia", $"ib",
          graft.functions.Det.qround($"inter" / ($"na" + $"nb" - $"inter")).as("jaccard"))
        .filter($"jaccard" >= JaccardThreshold)
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH sh AS (${shinglesSql(3)}),
      hot AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) > greatest($NgramDfCapFloor,
          (SELECT count(*) FROM documents) // $NgramDfCapDivisor)),
      pruned AS (
        SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
      sizes AS (SELECT doc_id, count(*) AS ns FROM pruned GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
        FROM pruned a JOIN pruned b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY ia, ib)
      SELECT ia, ib,
        ${graft.Oracle.qround("inter * 1.0 / (na.ns + nb.ns - inter)")} AS jaccard
      FROM inter
      JOIN sizes na ON ia = na.doc_id
      JOIN sizes nb ON ib = nb.doc_id
      WHERE ${graft.Oracle.qround("inter * 1.0 / (na.ns + nb.ns - inter)")}
          >= $JaccardThreshold
      ORDER BY ia, ib""")
  )

  /** Containment threshold for [[qContainmentDedup]]. */
  val ContainThreshold = 0.9

  /** Containment (asymmetric Jaccard) near-dedup: C = |A∩B| / min(|A|,|B|)
    * — the subset-duplication signal symmetric Jaccard is BLIND to. A short
    * document wholly embedded in a long one (a quoted post, a concatenated
    * dump, a boilerplate-wrapped article) has C ≈ 1 but Jaccard ≈
    * |small|/|large|, far below any dedup threshold — and q_ngram_jaccard's
    * PPJoin length filter deliberately never even PAIRS such documents.
    * This query therefore runs on the SAME df-capped shingle postings
    * (ngramPostings — shared relation, no drift) but WITHOUT the length
    * filter: the widened candidate space is precisely the price of
    * catching subset duplication, and the df-cap still bounds every
    * shingle's join multiplicity, so the pair join stays
    * Σ O(df_capped²), never all-pairs. `jaccard_blind` marks the pairs
    * q_ngram_jaccard's threshold would never report — the actionable
    * output for a dedup pipeline that already ran the symmetric pass.
    */
  /** Exact-rational widened containment threshold, the LengthFilterNum
    * convention: the verified filter keeps qROUNDED containment ≥ 0.9,
    * which admits raw inter/min as low as 1799999/2000000 — the required
    * overlap α(X) = ⌈ns·1799999/2000000⌉ must use the widened bound or the
    * prefix could prune a pair the rounded filter keeps. */
  val ContainNum = 1799999L
  val ContainDen = 2000000L

  /** Containment candidate pairs (ia, ib, na, nb, inter) on the SAME
    * df-capped postings as [[ngramCandidates]] — generated by the
    * asymmetric overlap PREFIX filter (the containment-join adaptation of
    * AllPairs): each doc indexes only its ns − α + 1 rarest-first shingles
    * (α = the widened ⌈t·ns⌉ above); a pair with |A∩B| ≥ α(smaller) MUST
    * share a shingle between the SMALLER side's prefix and the larger
    * side's FULL posting list (if the whole prefix misses B, at most
    * α − 1 of A's remaining shingles can hit), so probing small-prefix ×
    * large-full has NO false negatives at the verified threshold — unlike
    * the symmetric Jaccard prefix join, the large side cannot be
    * prefix-truncated because α depends on the SMALLER partner. Verify =
    * exact intersection of the carried capped shingle sets (the
    * qJaccardPrefix discipline). Shared by [[qContainmentDedup]] and the
    * scale rehearsal: the (df, shingle) canonical order is
    * replica-invariant (all dfs scale uniformly), so the replica growth
    * law holds as an equality here too. */
  private[graft] def containmentCandidates(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val pruned = ngramPostings(spark, dir)
    val dfreq = pruned.groupBy($"shingle").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy($"doc_id")
    // eager: the prefix side and the full side below both read this ranked
    // relation — lazily persisted (or bare) it is computed once per side
    // (join + window, two exchanges each); materialized it computes once
    val ranked = Tables.eager(pruned.join(dfreq, Seq("shingle"))
      .select($"doc_id", $"shingle",
        row_number().over(wDoc.orderBy($"df", $"shingle")).as("rk"),
        count(lit(1)).over(wDoc).cast(LongType).as("ns")))
    val prefix = ranked
      .filter($"rk" <=
        $"ns" - expr(s"(ns * $ContainNum + ${ContainDen - 1}) div $ContainDen")
          + lit(1))
      .select($"doc_id", $"shingle", $"ns")
    val full = ranked.select($"doc_id", $"shingle", $"ns")
    val cand = prefix.as("a").join(full.as("b"),
        $"a.shingle" === $"b.shingle" &&
          ($"a.ns" < $"b.ns" ||
            ($"a.ns" === $"b.ns" && $"a.doc_id" =!= $"b.doc_id")))
      .select(least($"a.doc_id", $"b.doc_id").as("ia"),
        greatest($"a.doc_id", $"b.doc_id").as("ib"))
      .distinct()
    // eager: consumed twice (ia- and ib-side verify joins) — see ranked
    val sets = Tables.eager(pruned.groupBy($"doc_id")
      .agg(collect_list($"shingle").as("sh"),
        count(lit(1)).cast(LongType).as("ns")))
    cand
      .join(sets.select($"doc_id".as("ia"), $"sh".as("sha"), $"ns".as("na")),
        Seq("ia"))
      .join(sets.select($"doc_id".as("ib"), $"sh".as("shb"), $"ns".as("nb")),
        Seq("ib"))
      .select($"ia", $"ib", $"na", $"nb",
        size(array_intersect($"sha", $"shb")).cast(LongType).as("inter"))
  }

  val qContainmentDedup = GraftQuery(
    "q_containment_dedup",
    (spark, dir) => {
      import spark.implicits._
      containmentCandidates(spark, dir)
        .select($"ia", $"ib",
          graft.functions.Det.qround($"inter" / least($"na", $"nb"))
            .as("containment"),
          graft.functions.Det.qround($"inter" / ($"na" + $"nb" - $"inter"))
            .as("jaccard"))
        .filter($"containment" >= ContainThreshold)
        .withColumn("jaccard_blind", $"jaccard" < JaccardThreshold)
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH sh AS (${shinglesSql(3)}),
      hot AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) > greatest($NgramDfCapFloor,
          (SELECT count(*) FROM documents) // $NgramDfCapDivisor)),
      pruned AS (
        SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
      sizes AS (SELECT doc_id, count(*) AS ns FROM pruned GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
        FROM pruned a JOIN pruned b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY ia, ib),
      scored AS (
        SELECT ia, ib,
          ${graft.Oracle.qround("inter * 1.0 / least(na.ns, nb.ns)")} AS containment,
          ${graft.Oracle.qround("inter * 1.0 / (na.ns + nb.ns - inter)")} AS jaccard
        FROM inter
        JOIN sizes na ON ia = na.doc_id
        JOIN sizes nb ON ib = nb.doc_id)
      SELECT ia, ib, containment, jaccard,
        (jaccard < $JaccardThreshold) AS jaccard_blind
      FROM scored
      WHERE containment >= $ContainThreshold
      ORDER BY ia, ib""")
  )

  /** Character budget for the edit-distance audit: distances are computed
    * on the first EditPrefix characters of each document, bounding the
    * O(len²) DP at EditPrefix² per pair regardless of document length
    * (the standard trick — full-text edit distance on long documents is
    * never run pairwise at scale). */
  val EditPrefix = 96

  /** Edit-distance audit of the LSH candidates: Levenshtein distance
    * between the lowercased EditPrefix-char prefixes of every candidate
    * pair — the character-level complement of the token-set Jaccard
    * verify (token sets are blind to word order and inflection;
    * Levenshtein is exactly sensitive to them). Emits ALL candidate pairs
    * with their distance, so the result doubles as a calibration table for
    * picking a distance threshold against the Jaccard-verified truth.
    * Scale shape: the distance DP runs only on LSH-candidate pairs (O(n)
    * with bounded bucket sizes, never O(n²)), and both engines implement
    * textbook Levenshtein (unit insert/delete/substitute), so the oracle
    * is exact. */
  val qEditDistance = GraftQuery(
    "q_edit_distance",
    (spark, dir) => {
      import spark.implicits._
      val cand = minhashCandidates(docShingles(spark, dir, 2))
      val pref = Tables.documents(spark, dir)
        .select($"doc_id", substring(lower($"text"), 1, EditPrefix).as("pref"))
      cand
        .join(pref.select($"doc_id".as("ia"), $"pref".as("pa")), Seq("ia"))
        .join(pref.select($"doc_id".as("ib"), $"pref".as("pb")), Seq("ib"))
        .select($"ia", $"ib",
          levenshtein($"pa", $"pb").cast(LongType).as("edit_dist"))
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH $minhashCandCtes
      SELECT ia, ib,
        levenshtein(substr(lower(da.text), 1, $EditPrefix),
                    substr(lower(db.text), 1, $EditPrefix))::BIGINT AS edit_dist
      FROM cand
      JOIN documents da ON ia = da.doc_id
      JOIN documents db ON ib = db.doc_id
      ORDER BY ia, ib""")
  )

  /** Span length for exact-substring dedup: 8 tokens. Short enough to catch
    * partial overlap the document-level sketches miss, long enough that a
    * shared span is evidence of copying rather than collocation. */
  val SpanN = 8

  /** Span-level (exact-substring) dedup coverage — the document-granularity
    * complement of the sketch family above, after Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better"): a span
    * repeated ACROSS documents marks copied boilerplate even when the
    * containing documents are globally dissimilar. Emits, per document, the
    * fraction of token positions covered by at least one 8-token span that
    * also occurs in another document — the statistic the
    * remove-repeated-substrings pass thresholds on.
    *
    * Scale shape: the positional span stream comes from ONE map-side
    * codegen projection (`word_shingles_all` + posexplode — no window, no
    * per-doc sort); cross-doc spans are found by a partial+final aggregate
    * on the span key, and rejoined via LEFT SEMI on the same key (two
    * shuffles of the span stream, both on the span hash — never a pair
    * join, never O(n²)). Coverage is the classic interval-union-by-
    * position-explode: each surviving span occurrence expands to its 8
    * positions (bounded ×8) and distinct-counts per document. */
  val qSpanDedup = GraftQuery(
    "q_span_dedup",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.spread(Tables.documents(spark, dir))
      // deliberately LAZY: spans feeds the df aggregate and the semi-join
      // side, but an eager persist A/B-measured SLOWER (r17: 2.33/2.55/2.96
      // vs 2.63/3.22/2.64 s interleaved min-of-3) — the exploded relation
      // is ~SpanN× the input text, so caching it costs more than the
      // second shingle pass it saves; same law as the IngestHub token view
      val spans = docs.select($"doc_id",
        posexplode(call_function("word_shingles_all", $"text", lit(SpanN)))
          .as(Seq("pos", "s")))
      val shared = spans.groupBy($"s")
        .agg(countDistinct($"doc_id").as("df"))
        .filter($"df" >= 2)
        .select($"s")
      val covered = spans
        .join(shared, Seq("s"), "left_semi")
        .select($"doc_id", explode(sequence($"pos", $"pos" + lit(SpanN - 1))).as("p"))
        .distinct()
        .groupBy($"doc_id").agg(count(lit(1)).as("covered_tokens"))
      docs.select($"doc_id",
          element_at(call_function("rep_stats", $"text"), 1).as("n_tokens"))
        .join(covered, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          coalesce($"covered_tokens", lit(0L)).as("covered_tokens"),
          Det.qround(coalesce($"covered_tokens", lit(0L))
            .cast(DoubleType) / $"n_tokens").as("dup_frac"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(lower(text), '[[:space:]]+') AS ws
        FROM documents),
      spans AS (
        SELECT doc_id,
          unnest(range(1, greatest(len(ws) - ${SpanN - 2}, 1))) - 1 AS pos,
          unnest([array_to_string(ws[i:i+${SpanN - 1}], ' ')
                  for i in range(1, greatest(len(ws) - ${SpanN - 2}, 1))]) AS s
        FROM toks),
      shared AS (
        SELECT s FROM (
          SELECT s, count(DISTINCT doc_id) AS df FROM spans GROUP BY s)
        WHERE df >= 2),
      cov AS (
        SELECT doc_id, count(*) AS covered FROM (
          SELECT DISTINCT doc_id, pos + j AS p
          FROM spans JOIN shared USING (s)
          CROSS JOIN unnest(range(0, $SpanN)) AS t(j))
        GROUP BY doc_id),
      nt AS (SELECT doc_id, len(ws)::BIGINT AS n_tokens FROM toks)
      SELECT doc_id, n_tokens,
        coalesce(covered, 0)::BIGINT AS covered_tokens,
        ${Oracle.qround("coalesce(covered, 0)::DOUBLE / n_tokens")} AS dup_frac
      FROM nt LEFT JOIN cov USING (doc_id)
      ORDER BY doc_id""")
  )

  /** Candidate threshold for the prefix index as an exact rational. The
    * verified filter keeps pairs with qROUNDED jaccard ≥ 0.7, which admits
    * raw J as low as 0.6999995 = 1399999/2000000 — the same widening rule
    * as LengthFilterNum above: prefix lengths sized for the plain 7/10
    * could prune a pair the rounded filter keeps. */
  val PrefixThreshold = 0.7
  val PrefixNum = 1399999L
  val PrefixDen = 2000000L

  /** Lossless prefix-filtered exact-Jaccard self-join (AllPairs, Bayardo et
    * al. WWW'07; PPJoin, Xiao et al. WWW'08) — the EXACT complement of
    * q_ngram_jaccard's df-cap. There, hot shingles are dropped from the
    * feature set (a documented semantic change); here the FULL 3-shingle
    * sets are kept and only candidate GENERATION is pruned, provably
    * without changing the result.
    *
    * Global shingle order = (df ASC, shingle ASC) — rarest first — and each
    * document indexes only its first ns − ⌈t′·ns⌉ + 1 shingles under that
    * order. Prefix-filter lemma: two sets with |A∩B| ≥ α must collide
    * within their (|·| − α + 1)-prefixes, and J ≥ t′ forces
    * α ≥ ⌈t′·ns⌉ on each side — so every qualifying pair shares a prefix
    * shingle, while the hottest shingles (exactly the ones that explode a
    * naive shared-shingle join) fall out of every prefix. The symmetric
    * PPJoin length filter (min/max ≥ t′, exact integer form) rides in the
    * join condition.
    *
    * The oracle is the UNPRUNED full shared-shingle join — the gate
    * re-proves losslessness cross-engine on every run.
    *
    * Scale shape: df aggregate (one shuffle on shingle) → per-doc rank
    * (one window shuffle on doc_id) → prefix join keyed on shingle with
    * fan-out concentrated on rare keys → array-intersect verify only on
    * candidate pairs. No unbounded pair explosion anywhere; candidate
    * count shrinks as the corpus grows hotter, the opposite of the naive
    * join. */
  /** Ranked prefix posting rows (doc_id, shingle, ns) under the global
    * (df ASC, shingle ASC) order — the AllPairs/PPJoin candidate-generation
    * input (each doc indexes only its first ns − ⌈t′·ns⌉ + 1 shingles). */
  private[graft] def prefixPostings(spark: SparkSession, dir: String): DataFrame =
    prefixPostingsOf(docShingles(spark, dir, 3))

  /** [[prefixPostings]] over an explicit (doc_id, sh) shingle relation —
    * factored so [[qJaccardPrefix]] can feed ONE eager-persisted shingle
    * relation to candidate generation AND the verify joins (the shingle
    * projection over the corpus used to run three times per query). The
    * RESULT is eager-persisted too: both sides of the candidate self-join
    * read it, and lazily each side re-ran the df-join + window. */
  private[graft] def prefixPostingsOf(docsSh: DataFrame): DataFrame = {
    val spark = docsSh.sparkSession
    import spark.implicits._
    // eager: feeds the df aggregate AND the ranked prefix projection
    // through concurrent subqueries (see Tables.eager)
    val ex = Tables.eager(
      docsSh.select($"doc_id", explode($"sh").as("shingle")))
    val dfreq = ex.groupBy($"shingle").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy($"doc_id")
    Tables.eager(ex.join(dfreq, Seq("shingle"))
      .select($"doc_id", $"shingle",
        row_number().over(wDoc.orderBy($"df", $"shingle")).as("rk"),
        count(lit(1)).over(wDoc).as("ns"))
      .filter($"rk" <=
        $"ns" - expr(s"(ns * $PrefixNum + ${PrefixDen - 1}) div $PrefixDen")
          + lit(1))
      .select($"doc_id", $"shingle", $"ns"))
  }

  /** Distinct candidate pairs (ia, ib) from the prefix-shingle equi-join
    * with the symmetric in-join length filter — pre-verification. */
  private[graft] def prefixCandidates(spark: SparkSession, dir: String): DataFrame =
    prefixCandidatesOf(docShingles(spark, dir, 3))

  private[graft] def prefixCandidatesOf(docsSh: DataFrame): DataFrame = {
    val spark = docsSh.sparkSession
    import spark.implicits._
    val prefix = prefixPostingsOf(docsSh)
    prefix.as("a").join(prefix.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id" &&
          $"a.ns" * lit(PrefixDen) >= $"b.ns" * lit(PrefixNum) &&
          $"b.ns" * lit(PrefixDen) >= $"a.ns" * lit(PrefixNum))
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib")).distinct()
  }

  val qJaccardPrefix = GraftQuery(
    "q_jaccard_prefix",
    (spark, dir) => {
      import spark.implicits._
      // ONE eager shingle relation for candidate generation AND both
      // verify joins — was three independent corpus projections
      val docsSh = Tables.eager(docShingles(spark, dir, 3))
      prefixCandidatesOf(docsSh)
        .join(docsSh.select($"doc_id".as("ia"), $"sh".as("sha")), Seq("ia"))
        .join(docsSh.select($"doc_id".as("ib"), $"sh".as("shb")), Seq("ib"))
        .select($"ia", $"ib",
          size(array_intersect($"sha", $"shb")).as("inter"),
          size($"sha").as("na"), size($"shb").as("nb"))
        .select($"ia", $"ib",
          Det.qround($"inter" / ($"na" + $"nb" - $"inter")).as("jaccard"))
        .filter($"jaccard" >= PrefixThreshold)
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH sh AS (${shinglesSql(3)}),
      sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY ia, ib)
      SELECT ia, ib,
        ${Oracle.qround("inter * 1.0 / (na.ns + nb.ns - inter)")} AS jaccard
      FROM inter
      JOIN sizes na ON ia = na.doc_id
      JOIN sizes nb ON ib = nb.doc_id
      WHERE ${Oracle.qround("inter * 1.0 / (na.ns + nb.ns - inter)")}
          >= $PrefixThreshold
      ORDER BY ia, ib""")
  )

  /** Winnowing parameters (Schleimer/Wilkerson/Aiken SIGMOD'03): gram size
    * n, window size w. The paper's guarantee threshold is t = n + w − 1 = 6
    * tokens — any shared run of ≥ 6 tokens between two documents surfaces
    * at least one shared fingerprint — while only ~2/(w+1) of the gram
    * stream survives selection. */
  val WinnowN = 3
  val WinnowW = 4

  /** Minimum shared fingerprints for a pair to appear in the overlap
    * report (MOSS-style: 1 shared fingerprint is a 6-token coincidence;
    * ≥ 2 distinct shared local regions is the interesting signal). */
  val WinnowMinShared = 2

  /** Same df-cap discipline as [[qNgramJaccard]]: fingerprints selected in
    * more than max(floor, n_docs/divisor) documents are boilerplate, not
    * evidence of pairwise copying, and leave the overlap feature set. */
  val WinnowDfCapFloor = 2
  val WinnowDfCapDivisor = 50

  /** Per-document winnowing fingerprint profile: positional 3-gram md5
    * stream → window-4 minima → distinct selected set ([[graft.functions.
    * ArrayOps.winnowHashes]], one native codegen projection — no explode,
    * no shuffle until the final sort). `density` ≈ 2/(w+1) = 0.4 on random
    * text; a LOW density means long repeated runs inside the document
    * (few distinct minima), making this a self-repetition screen as well
    * as the fingerprint source for [[qWinnowOverlap]].
    *
    * Scale shape: map-only per-row projection inside whole-stage codegen;
    * the only exchange is the output ORDER BY. */
  val qWinnowStats = GraftQuery(
    "q_winnow_stats",
    (spark, dir) => {
      import spark.implicits._
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id",
          greatest(size(split(lower($"text"), "\\s+", -1)) - lit(WinnowN) + 1, lit(0))
            .cast(LongType).as("n_grams"),
          call_function("winnow_hashes", $"text", lit(WinnowN), lit(WinnowW)).as("fps"))
        .select($"doc_id", $"n_grams",
          size($"fps").cast(LongType).as("n_fp"),
          when($"n_grams" > 0, Det.qround(
            size($"fps") * lit(1.0) /
              greatest($"n_grams" - lit(WinnowW) + 1, lit(1))))
            .as("density"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id, string_split_regex(lower(text), '[[:space:]]+') AS ws
        FROM documents),
      hs AS (
        SELECT doc_id,
          [md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
           for i in range(1, len(ws) - 1)] AS h
        FROM base),
      fp AS (
        SELECT doc_id, len(h)::BIGINT AS n_grams,
          CASE WHEN len(h) = 0 THEN []::VARCHAR[]
            ELSE list_sort(list_distinct(
              [list_min(h[j:least(j + $WinnowW - 1, len(h))])
               for j in range(1, greatest(len(h) - $WinnowW + 1, 1) + 1)]))
          END AS fps
        FROM hs)
      SELECT doc_id, n_grams, len(fps)::BIGINT AS n_fp,
        CASE WHEN n_grams > 0 THEN ${Oracle.qround(
          s"len(fps) * 1.0 / greatest(n_grams - $WinnowW + 1, 1)")} END AS density
      FROM fp ORDER BY doc_id""")
  )

  /** MOSS-style local-overlap report over the winnowing fingerprints:
    * document pairs sharing ≥ [[WinnowMinShared]] selected fingerprints,
    * with `containment` = shared/min(|A|,|B|) as the copy-fraction
    * estimate. Complements the set-similarity family: Jaccard scores
    * whole-document similarity; winnowing overlap localizes SHARED RUNS
    * (≥ n+w−1 = 6 tokens), so a small plagiarized passage inside an
    * otherwise unrelated document still surfaces.
    *
    * Scale shape: fingerprint selection is the map-only [[qWinnowStats]]
    * projection (~2/(w+1) of the gram stream survives BEFORE any shuffle);
    * candidate generation is an equi-join keyed on the fingerprint hash
    * with the [[qNgramJaccard]] df-cap discipline (boilerplate
    * fingerprints leave via a broadcast anti-join, per-key fan-out then
    * provably ≤ cap) — never an all-pairs comparison. */
  /** Df-capped winnowing-fingerprint posting rows (doc_id, fp) — the
    * overlap report's candidate-generation input. Persisted twice by
    * design: the exploded rows feed the df cap, the per-doc sizes, and
    * both sides of the pair join. */
  private[graft] def winnowPostings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // fps stays a LAZY persist: its two consumers are SEQUENTIAL — the
    // df-cap broadcast (hot) must materialize before the anti-join can
    // run, so the first touch fills the cache with no race and an eager
    // count job is pure overhead (measured +0.3 s). pruned below is the
    // opposite case: sizes and both pair-join sides race.
    val fps = Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id",
        explode(call_function("winnow_hashes", $"text", lit(WinnowN), lit(WinnowW)))
          .as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val hot = fps.groupBy($"fp").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter($"df" > greatest(lit(WinnowDfCapFloor),
        expr(s"n_docs div $WinnowDfCapDivisor")))
      .select($"fp")
    Tables.eager(fps.join(broadcast(hot), Seq("fp"), "left_anti"))
  }

  /** Candidate pairs (ia, ib, shared, na, nb) BEFORE the MinShared
    * threshold — the pair-join output (Catalyst pushes the threshold
    * filter below the size joins, so q_winnow_overlap's plan is unchanged
    * by consuming this shared relation). */
  private[graft] def winnowCandidates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pruned = winnowPostings(spark, dir)
    // corpus-sized; must flow through a shuffle join at scale (AQE still
    // broadcasts it locally when it is actually small)
    val sizes = pruned.groupBy($"doc_id").agg(count(lit(1)).as("nf"))
    pruned.as("a").join(pruned.as("b"),
        $"a.fp" === $"b.fp" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("ia"), $"b.doc_id".as("ib"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select($"doc_id".as("ia"), $"nf".as("na")), Seq("ia"))
      .join(sizes.select($"doc_id".as("ib"), $"nf".as("nb")), Seq("ib"))
  }

  val qWinnowOverlap = GraftQuery(
    "q_winnow_overlap",
    (spark, dir) => {
      import spark.implicits._
      winnowCandidates(spark, dir)
        .filter($"shared" >= WinnowMinShared)
        .select($"ia", $"ib", $"shared", $"na", $"nb",
          Det.qround($"shared" * lit(1.0) / least($"na", $"nb")).as("containment"))
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id, string_split_regex(lower(text), '[[:space:]]+') AS ws
        FROM documents),
      hs AS (
        SELECT doc_id,
          [md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
           for i in range(1, len(ws) - 1)] AS h
        FROM base),
      sel AS (
        SELECT doc_id, unnest(list_distinct(
            [list_min(h[j:least(j + $WinnowW - 1, len(h))])
             for j in range(1, greatest(len(h) - $WinnowW + 1, 1) + 1)])) AS fp
        FROM hs WHERE len(h) > 0),
      hot AS (
        SELECT fp FROM sel GROUP BY fp
        HAVING count(*) > greatest($WinnowDfCapFloor,
          (SELECT count(*) FROM documents) // $WinnowDfCapDivisor)),
      pruned AS (
        SELECT * FROM sel WHERE fp NOT IN (SELECT fp FROM hot)),
      sizes AS (SELECT doc_id, count(*) AS nf FROM pruned GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS shared
        FROM pruned a JOIN pruned b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY ia, ib
        HAVING count(*) >= $WinnowMinShared)
      SELECT ia, ib, shared, na.nf AS na, nb.nf AS nb,
        ${Oracle.qround("shared * 1.0 / least(na.nf, nb.nf)")} AS containment
      FROM pairs
      JOIN sizes na ON ia = na.doc_id
      JOIN sizes nb ON ib = nb.doc_id
      ORDER BY ia, ib""")
  )

  /** Sketch-calibration audit: per verified near-dup pair, the MinHash
    * ESTIMATE of Jaccard (fraction of the K=MinHashK signature positions
    * that agree — the unbiased estimator the LSH banding is built on, with
    * stderr √(J(1−J)/K) ≈ 0.09 at K=12, J=0.9) next to the exact verified
    * value. The audit that answers "is K big enough", the same way
    * q_lsh_candidate_audit answers "are the bands right" and
    * q_ivf_recall_audit answers "are the probes enough": a drifting
    * |est − exact| distribution is the signal to raise K before trusting
    * estimate-only screening at the next scale-up.
    *
    * Scale shape: signatures come from the SAME native one-pass expression
    * as banding (minhash_bands with bandRows = 1 → the K raw minima);
    * agreement counting is a relational join of two K-row-per-doc
    * relations restricted to the VERIFIED pair list — bounded × K, never
    * corpus-sized, no interpreted HOF. */
  val qMinhashEstimate = GraftQuery(
    "q_minhash_estimate",
    (spark, dir) => {
      import spark.implicits._
      // ONE shingle pass feeds the signature projection AND the verified
      // pair pipeline (was two independent corpus shingle+minhash passes)
      val docsSh = Tables.eager(docShingles(spark, dir, 2))
      val sigs = Tables.eager(docsSh
        .select($"doc_id", posexplode(
          call_function("minhash_bands", $"sh", lit(MinHashK), lit(1)))
          .as(Seq("h", "mh"))))
      minhashPairsOf(docsSh)
        .join(sigs.select($"doc_id".as("ia"), $"h", $"mh".as("ma")), Seq("ia"))
        .join(sigs.select($"doc_id".as("ib"), $"h", $"mh".as("mb")), Seq("ib", "h"))
        .groupBy($"ia", $"ib", $"jaccard")
        .agg(count(when($"ma" === $"mb", 1)).as("agree"))
        .select($"ia", $"ib", $"jaccard", $"agree",
          Det.qround($"agree" * lit(1.0) / MinHashK).as("est"),
          Det.qround(abs($"agree" * lit(1.0) / MinHashK - $"jaccard")).as("abs_err"))
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH pairs AS ($minhashPairsSql),
      sh2 AS (${shinglesSql(2)}),
      hashed AS (
        SELECT doc_id, h, min(md5(h || ':' || shingle)) AS mh
        FROM sh2 CROSS JOIN (SELECT unnest(range($MinHashK)) AS h)
        GROUP BY doc_id, h),
      agr AS (
        SELECT p.ia, p.ib, p.jaccard,
          count(*) FILTER (WHERE a.mh = b.mh) AS agree
        FROM pairs p
        JOIN hashed a ON a.doc_id = p.ia
        JOIN hashed b ON b.doc_id = p.ib AND b.h = a.h
        GROUP BY p.ia, p.ib, p.jaccard)
      SELECT ia, ib, jaccard, agree::BIGINT AS agree,
        ${Oracle.qround(s"agree * 1.0 / $MinHashK")} AS est,
        ${Oracle.qround(s"abs(agree * 1.0 / $MinHashK - jaccard)")} AS abs_err
      FROM agr ORDER BY ia, ib""")
  )

  /** Expected content-defined chunk length in tokens (the boundary
    * divisor): a token ends a chunk when u32(md5(token)) % CdcDivisor == 0. */
  val CdcDivisor = 8

  /** Content-defined chunk dedup accounting: per document, how many of its
    * CDC chunks (variable boundaries from token-content hashes — see
    * [[graft.functions.ArrayOps.cdcChunkHashes]]) also occur elsewhere in
    * the corpus (or again in the same document). The property fixed-width
    * chunking lacks: an insertion near the head of a copied document shifts
    * every fixed window but only ONE content-defined chunk — the stream
    * re-aligns at the next boundary, so copied tails keep deduplicating.
    * Complements [[qSpanDedup]] (which counts token-level span coverage;
    * this is the storage-dedup view: whole-chunk hash identity, the
    * granularity a content-addressed store or training-shard cache
    * actually deduplicates at).
    *
    * Scale shape: chunking is one native map-side projection (~1/divisor
    * of the token stream emerges as chunk rows); the global chunk df is an
    * in-place window over ONE chunk-hash exchange, then one doc_id rollup
    * — the q_boilerplate_rate shape on a stream that is already
    * divisor-times smaller than the token stream. */
  val qCdcDedup = GraftQuery(
    "q_cdc_dedup",
    (spark, dir) => {
      import spark.implicits._
      val chunks = Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id",
          explode(call_function("cdc_chunk_hashes", $"text", lit(CdcDivisor)))
            .as("ch"))
      val wdf = chunks.withColumn("cdf",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"ch")))
      wdf.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          count(when($"cdf" >= 2, 1)).as("n_shared"))
        .select($"doc_id", $"n_chunks", $"n_shared",
          Det.qround($"n_shared" * lit(1.0) / $"n_chunks").as("shared_frac"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id, string_split_regex(lower(text), '[[:space:]]+') AS ws
        FROM documents),
      bf AS (
        SELECT doc_id, ws,
          [i for i in range(1, len(ws) + 1)
           if CAST(('0x' || substr(md5(ws[i]), 1, 8)) AS BIGINT) % $CdcDivisor = 0
              or i = len(ws)] AS bs
        FROM base),
      chunks AS (
        SELECT doc_id,
          unnest([md5(array_to_string(
              ws[(CASE WHEN k = 1 THEN 1 ELSE bs[k-1] + 1 END):bs[k]], ' '))
            for k in range(1, len(bs) + 1)]) AS ch
        FROM bf),
      w AS (
        SELECT doc_id, count(*) OVER (PARTITION BY ch) AS cdf
        FROM chunks)
      SELECT doc_id, count(*)::BIGINT AS n_chunks,
        count(*) FILTER (WHERE cdf >= 2)::BIGINT AS n_shared,
        ${Oracle.qround(
          "(count(*) FILTER (WHERE cdf >= 2)) * 1.0 / count(*)")} AS shared_frac
      FROM w GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Quality-decile × near-dup calibration: are low-quality documents also
    * the duplicated ones? Each document gets its quality decile (ntile 10
    * over the shared quality score, doc_id tie-break so the decile
    * assignment is total) and a dup flag (its cluster has ≥ 2 members);
    * the rollup reports per-decile doc counts, dup rate, and exact-decimal
    * mean quality. A flat dup-rate curve says dedup and quality filtering
    * remove DIFFERENT mass (both needed); a steep one says the quality
    * filter already removes most duplicates — the interaction every
    * curation pipeline needs before sequencing its filters, answered by
    * composing the engine's own cluster fixpoint and quality score rather
    * than new machinery.
    *
    * Scale shape: cluster sizes via one window over the label relation;
    * the decile is a deliberate SinglePartition window (rank over a
    * corpus-wide total order — the q_zipf_fit precedent, and the one
    * stage that would become a range-partitioned rank at 100 TB); rollup
    * is a 10-group aggregate. */
  val qQualityDedupCalibration = GraftQuery(
    "q_quality_dedup_calibration",
    (spark, dir) => {
      import spark.implicits._
      val quality = Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", TextAnalytics.qualityCol.as("quality"))
      val wc = org.apache.spark.sql.expressions.Window.partitionBy($"cluster")
      val wd = org.apache.spark.sql.expressions.Window
        .orderBy($"quality".asc, $"doc_id".asc)
      clusterAssignment(spark, dir)
        .withColumn("csize", count(lit(1)).over(wc))
        .join(quality, Seq("doc_id"))
        .withColumn("decile", ntile(10).over(wd))
        .groupBy($"decile")
        .agg(count(lit(1)).as("n_docs"),
          count(when($"csize" >= 2, 1)).as("n_dups"),
          Det.davg($"quality").as("avg_quality"))
        .select($"decile".cast(LongType).as("decile"), $"n_docs", $"n_dups",
          Det.qround($"n_dups" * lit(1.0) / $"n_docs").as("dup_rate"),
          $"avg_quality")
        .orderBy($"decile")
    },
    Some(s"""
      WITH RECURSIVE $clusterCtes,
      cs AS (
        SELECT doc_id, count(*) OVER (PARTITION BY cluster) AS csize
        FROM cl),
      q AS (
        SELECT doc_id, ${TextAnalytics.qualitySqlExpr} AS quality
        FROM documents),
      dec AS (
        SELECT cs.doc_id, cs.csize, q.quality,
          ntile(10) OVER (ORDER BY q.quality ASC, cs.doc_id ASC) AS decile
        FROM cs JOIN q USING (doc_id))
      SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_docs,
        count(*) FILTER (WHERE csize >= 2)::BIGINT AS n_dups,
        ${Oracle.qround(
          "(count(*) FILTER (WHERE csize >= 2)) * 1.0 / count(*)")} AS dup_rate,
        ${Oracle.davg("quality")} AS avg_quality
      FROM dec GROUP BY decile ORDER BY decile""")
  )

  /** Evidence rows for [[qPairEvidence]] per pair. */
  val EvidenceTopK = 3

  /** Near-dup pair EVIDENCE: for every verified MinHash pair, the
    * [[EvidenceTopK]] rarest shared shingles (global df ascending, shingle
    * tie-break) — the explainability row a human reviewer or an appeal
    * process reads ("these documents were merged because they share THESE
    * unusual phrases"). Rarest-first is the meaningful direction: shared
    * stopword shingles explain nothing, a shared df-2 shingle is a
    * fingerprint.
    *
    * Scale shape: shared-shingle rows exist only for VERIFIED pairs
    * (bounded by banding) via the verify-join pattern; the global shingle
    * df is one partial+final aggregate of the persisted shingle relation,
    * joined on the shingle key; the top-k is a window over pair-sized
    * groups. Nothing corpus×corpus. */
  val qPairEvidence = GraftQuery(
    "q_pair_evidence",
    (spark, dir) => {
      import spark.implicits._
      val ex = docShingles(spark, dir, 2)
        .select($"doc_id", explode($"sh").as("shingle"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df = ex.groupBy($"shingle").agg(count(lit(1)).as("df"))
      val shared = minhashPairs(spark, dir).select($"ia", $"ib")
        .join(ex.select($"doc_id".as("ia"), $"shingle"), Seq("ia"))
        .join(ex.select($"doc_id".as("ib"), $"shingle"), Seq("ib", "shingle"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"ia", $"ib").orderBy($"df".asc, $"shingle".asc)
      shared
        .join(df, Seq("shingle"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= EvidenceTopK)
        .select($"ia", $"ib", $"rk".cast(LongType).as("rk"), $"shingle", $"df")
        .orderBy($"ia", $"ib", $"rk")
    },
    Some(s"""
      WITH pairs AS ($minhashPairsSql),
      sh2 AS (${shinglesSql(2)}),
      dfr AS (SELECT shingle, count(*)::BIGINT AS df FROM sh2 GROUP BY shingle),
      shared AS (
        SELECT p.ia, p.ib, sa.shingle
        FROM pairs p
        JOIN sh2 sa ON sa.doc_id = p.ia
        JOIN sh2 sb ON sb.doc_id = p.ib AND sb.shingle = sa.shingle),
      ranked AS (
        SELECT ia, ib, shared.shingle, df,
          row_number() OVER (PARTITION BY ia, ib
            ORDER BY df ASC, shared.shingle ASC) AS rk
        FROM shared JOIN dfr ON shared.shingle = dfr.shingle)
      SELECT ia, ib, rk::BIGINT AS rk, shingle, df
      FROM ranked WHERE rk <= $EvidenceTopK
      ORDER BY ia, ib, rk""")
  )

  /** Split-leakage audit — the dedup × split interaction check neither
    * family can do alone: a verified near-dup pair whose members land in
    * DIFFERENT splits of q_train_split's hash assignment is train→eval
    * contamination that survives both passes (dedup found the pair but the
    * split ignored it; per-document hash splitting is blind to content).
    * Emits pair counts per (split_a, split_b) class with a `leaked` flag on
    * the off-diagonal classes — the number that says whether dedup must run
    * BEFORE splitting (cluster-then-split) for this corpus, and the audit
    * an eval-integrity review reads. Uses the SAME pair relation as
    * q_dedup_minhash and the SAME u32 split hash as q_train_split (one
    * definition each — a retune of either cannot desync this audit).
    *
    * Scale shape: pairs are the LSH-verified bounded set; the split label
    * is a map-only hash on each side; the rollup groups to ≤ 9 rows. */
  val qSplitLeakage = GraftQuery(
    "q_split_leakage",
    (spark, dir) => {
      import spark.implicits._
      def bucket(c: String) = expr(
        s"(${PipelineOps.u32Expr(s"concat('split:', cast($c as string))")}) % 10")
      def label(b: Column) =
        when(b <= 7, "train").when(b === 8, "val").otherwise("test")
      minhashPairs(spark, dir)
        .select(label(bucket("ia")).as("split_a"), label(bucket("ib")).as("split_b"))
        .groupBy($"split_a", $"split_b")
        .agg(count(lit(1)).as("n_pairs"))
        .select($"split_a", $"split_b", $"n_pairs",
          when($"split_a" =!= $"split_b", 1L).otherwise(0L).as("leaked"))
        .orderBy($"split_a", $"split_b")
    },
    Some(s"""
      WITH pairs AS ($minhashPairsSql),
      lab AS (
        SELECT
          CASE WHEN ba <= 7 THEN 'train' WHEN ba = 8 THEN 'val'
               ELSE 'test' END AS split_a,
          CASE WHEN bb <= 7 THEN 'train' WHEN bb = 8 THEN 'val'
               ELSE 'test' END AS split_b
        FROM (SELECT
                ${PipelineOps.u32Sql("'split:' || CAST(ia AS VARCHAR)")} % 10 AS ba,
                ${PipelineOps.u32Sql("'split:' || CAST(ib AS VARCHAR)")} % 10 AS bb
              FROM pairs))
      SELECT split_a, split_b, count(*) AS n_pairs,
        (CASE WHEN split_a <> split_b THEN 1 ELSE 0 END)::BIGINT AS leaked
      FROM lab GROUP BY split_a, split_b
      ORDER BY split_a, split_b""")
  )

  /** Sorted-neighborhood window: candidate pairs are documents within this
    * rank distance in normalized-text sort order. */
  val SnmWindow = 5

  /** Bucket prefix length for the two-phase global ranking (deepen on a
    * larger key space — it only has to keep per-bucket partitions
    * executor-sized). */
  val SnmPrefixLen = 2

  /** Sorted-neighborhood dedup (Hernández & Stolfo 1995) — the CLASSIC
    * blocking alternative to LSH banding: sort documents by a normalized
    * key (whitespace-squeezed lowercase text), pair every two documents
    * within [[SnmWindow]] ranks, verify with exact shingle Jaccard. It
    * catches what sort order puts together — shared-prefix near-dups —
    * for ONE sort instead of K hash passes, and misses what it spreads
    * apart; running it beside MinHash/SimHash/winnowing is how a real
    * curation pipeline covers the union.
    *
    * Scale shape: the global rank is NOT a corpus-sized unpartitioned
    * window — it is the two-phase range ranking (the q_psi_drift
    * escape hatch made real): bucket = [[SnmPrefixLen]]-char key prefix
    * (monotone in the key, so per-bucket row_numbers + bucket offsets ≡
    * the global row_number — the oracle computes it flat and hashes
    * identical), per-bucket windows are executor-sized, and the bucket
    * offset table is a bounded ≤|charset|² relation under an
    * unpartitioned window. Windowed pairing is the q_interval_join
    * canonical-cell join (cell = rank div W; a pair's b-side cell is
    * deterministically a.cell or a.cell+1, so each pair is emitted
    * EXACTLY once — no dedup shuffle). Verification joins the bounded
    * candidate list back to the shingle arrays (the MinHash verify
    * path). */
  /** SNM candidate pairs (ia, ib) BEFORE verification — exactly
    * (W−1)·n − W·(W−1)/2 rows for n ranked documents (every rank pairs
    * with its ≤W−1 successors): candidate volume is LINEAR in the corpus
    * BY CONSTRUCTION, the property that distinguishes sort-based blocking
    * from data-dependent LSH bucket volumes (DedupSpec pins the exact
    * formula). Shared by [[qSnmDedup]] and [[qBlockingRecall]]. */
  /** The two-phase-ranked (doc_id, r, cell) relation the windowed pairing
    * runs on — factored out so the scale rehearsal counts the SAME ranked
    * relation the query executes. Persisted: consumed twice (probe side +
    * build side of the cell join). */
  private[graft] def snmRanked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    // docs below the shingle width can never verify (empty 3-gram set —
    // and a 0/0 Jaccard is a cross-engine NaN hazard): exclude them from
    // the sort identically in both engines
    val keyed = Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id", Text.tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", concat_ws(" ", $"toks").as("key"))
      .withColumn("bucket", substring($"key", 1, SnmPrefixLen))
    val boff = keyed.groupBy($"bucket").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(
        sum($"bn").over(W.orderBy($"bucket")
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select($"bucket", $"off")
    keyed.join(broadcast(boff), Seq("bucket"))
      .withColumn("r", $"off" + row_number().over(
        W.partitionBy($"bucket").orderBy($"key", $"doc_id")))
      .select($"doc_id", $"r", ($"r" - ($"r" % SnmWindow)).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  private[graft] def snmCandidates(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    {
      val ranked = snmRanked(spark, dir)
      // canonical-cell pairing: a probes its own cell and the next one;
      // b's cell is determined by its rank, so each (ra < rb < ra+W)
      // pair matches exactly one probe row
      val probes = ranked.select($"doc_id", $"r",
        explode(array($"cell", $"cell" + SnmWindow)).as("pcell"))
      probes.as("a").join(ranked.as("b"),
          $"a.pcell" === $"b.cell" && $"b.r" > $"a.r" &&
            $"b.r" - $"a.r" < SnmWindow)
        .select(least($"a.doc_id", $"b.doc_id").as("ia"),
          greatest($"a.doc_id", $"b.doc_id").as("ib"))
    }
  }

  /** The verified SNM pair relation — shared by [[qSnmDedup]] (which just
    * is it) and [[qBlockingRecall]]. */
  private[graft] def snmPairs(spark: SparkSession, dir: String): DataFrame =
    verifyJaccard(snmCandidates(spark, dir), docShingles(spark, dir, 3))

  /** Oracle CTE block for [[snmPairs]] — exposes
    * `snm_pairs(ia, ib, jaccard)`; shared by the SNM query and the
    * blocking-recall audit. */
  private def snmPairsCtes: String = s"""
      keyed AS (
        SELECT doc_id, array_to_string(ws, ' ') AS key
        FROM (SELECT doc_id,
            string_split_regex(lower(text), '[[:space:]]+') AS ws
          FROM documents)
        WHERE len(ws) >= 3),
      ranked AS (
        SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS r
        FROM keyed),
      scand AS (
        SELECT least(a.doc_id, b.doc_id) AS ia,
          greatest(a.doc_id, b.doc_id) AS ib
        FROM ranked a JOIN ranked b
          ON b.r > a.r AND b.r - a.r < $SnmWindow),
      ssh AS (${shinglesSql(3)}),
      sssz AS (SELECT doc_id, count(*) AS ns FROM ssh GROUP BY doc_id),
      scommon AS (
        SELECT c.ia, c.ib, count(*) AS inter
        FROM scand c
        JOIN ssh s1 ON s1.doc_id = c.ia
        JOIN ssh s2 ON s2.doc_id = c.ib AND s2.shingle = s1.shingle
        GROUP BY c.ia, c.ib),
      sj AS (
        SELECT m.ia, m.ib,
          ${Oracle.qround("inter / (za.ns + zb.ns - inter)")} AS jaccard
        FROM scommon m
        JOIN sssz za ON za.doc_id = m.ia
        JOIN sssz zb ON zb.doc_id = m.ib),
      snm_pairs AS (
        SELECT ia, ib, jaccard FROM sj
        WHERE jaccard >= $JaccardThreshold)"""

  val qSnmDedup = GraftQuery(
    "q_snm_dedup",
    (spark, dir) => snmPairs(spark, dir),
    Some(s"""
      WITH $snmPairsCtes
      SELECT ia, ib, jaccard FROM snm_pairs
      ORDER BY ia, ib""")
  )

  /** Blocking-strategy recall audit — quantifies the "cover the union"
    * claim the dedup family's scaladocs make: run BOTH candidate
    * generators (MinHash-LSH banding and sorted-neighborhood) through the
    * SAME shingle-Jaccard verification and report each strategy's
    * verified-pair coverage of the union (pairs found by both / LSH only /
    * SNM only). One row. A curation run reads this before deciding
    * whether the second blocking pass pays for itself on its corpus.
    *
    * Scale shape: both pair relations are the bounded verified outputs
    * the standalone queries already produce; the overlap is a full outer
    * join on (ia, ib) of two pair-list-sized relations followed by a
    * global count — nothing corpus-sized beyond the generators
    * themselves. */
  val qBlockingRecall = GraftQuery(
    "q_blocking_recall",
    (spark, dir) => {
      import spark.implicits._
      val lsh = minhashPairs(spark, dir)
        .select($"ia", $"ib", lit(1).as("in_lsh"))
      val snm = snmPairs(spark, dir)
        .select($"ia", $"ib", lit(1).as("in_snm"))
      lsh.join(snm, Seq("ia", "ib"), "full_outer")
        .agg(
          sum(coalesce($"in_lsh", lit(0))).cast(LongType).as("n_lsh"),
          sum(coalesce($"in_snm", lit(0))).cast(LongType).as("n_snm"),
          sum(when($"in_lsh".isNotNull && $"in_snm".isNotNull, 1L)
            .otherwise(0L)).as("n_both"),
          sum(when($"in_lsh".isNotNull && $"in_snm".isNull, 1L)
            .otherwise(0L)).as("lsh_only"),
          sum(when($"in_lsh".isNull && $"in_snm".isNotNull, 1L)
            .otherwise(0L)).as("snm_only"),
          count(lit(1)).as("n_union"))
        .filter($"n_union" >= 0)
        .orderBy($"n_union")
    },
    Some(s"""
      WITH RECURSIVE pairs AS ($minhashPairsSql),
      $snmPairsCtes,
      u AS (
        SELECT coalesce(l.ia, s.ia) AS ia, coalesce(l.ib, s.ib) AS ib,
          (l.ia IS NOT NULL) AS in_lsh, (s.ia IS NOT NULL) AS in_snm
        FROM pairs l FULL OUTER JOIN snm_pairs s
          ON l.ia = s.ia AND l.ib = s.ib)
      SELECT
        sum(CASE WHEN in_lsh THEN 1 ELSE 0 END)::BIGINT AS n_lsh,
        sum(CASE WHEN in_snm THEN 1 ELSE 0 END)::BIGINT AS n_snm,
        sum(CASE WHEN in_lsh AND in_snm THEN 1 ELSE 0 END)::BIGINT AS n_both,
        sum(CASE WHEN in_lsh AND NOT in_snm THEN 1 ELSE 0 END)::BIGINT
          AS lsh_only,
        sum(CASE WHEN in_snm AND NOT in_lsh THEN 1 ELSE 0 END)::BIGINT
          AS snm_only,
        count(*)::BIGINT AS n_union
      FROM u
      ORDER BY n_union""")
  )

  /** Fellegi–Sunter m/u parameters for [[qRecordLinkage]]: P(field agrees |
    * same entity) / P(field agrees | different entities). Fixed
    * design-time literals (in production these come from EM estimation —
    * a fixed-iteration EM would follow the q_kmeans loop shape); u for
    * lang reflects the 5-language corpus (~1/5 chance agreement), source
    * likewise, the 50-char length bucket ~1/4, and a shingle-Jaccard ≥
    * 0.5 match is rare by chance (u = 0.02). Agreement/disagreement
    * weights ln(m/u) and ln((1−m)/(1−u)) are precomputed HERE and
    * interpolated into BOTH engines as decimal literals (Double.toString
    * round-trips, so both parse to the identical double — no cross-engine
    * ln-of-literal evaluation at query time at all). */
  val RlParams: Seq[(String, Double, Double)] = Seq(
    ("lang", 0.95, 0.20), ("source", 0.90, 0.10),
    ("lenb", 0.80, 0.25), ("jac", 0.90, 0.02))
  val RlUpper = 4.0
  val RlLower = 0.0

  private def rlWeights: Seq[(String, Double, Double)] =
    RlParams.map { case (f, m, u) =>
      (f, math.log(m / u), math.log((1 - m) / (1 - u))) }

  /** SQL score expression (shared text): Σ over fields of
    * CASE WHEN a_f THEN w_agree ELSE w_disagree END, in fixed field
    * order — one identical IEEE tree in both engines. */
  private def rlScoreSql: String =
    rlWeights.map { case (f, wa, wd) =>
      s"(CASE WHEN a_$f THEN CAST($wa AS DOUBLE) ELSE CAST($wd AS DOUBLE) END)"
    }.mkString(" + ")

  /** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969)
    * — the SCORING model of entity resolution, completing the ER ladder
    * the dedup family already climbs (blocking ×2: LSH banding and
    * sorted-neighborhood; verification: exact Jaccard; clustering:
    * connected components). Each SNM candidate pair gets an agreement
    * vector over (lang, source, 50-char length bucket, shingle-Jaccard ≥
    * 0.5); the match score is the sum of per-field log-likelihood-ratio
    * weights, and the decision is the classic three-way
    * match / possible / non_match threshold rule.
    *
    * Null semantics: field agreement is NULL-SAFE equality (`<=>` /
    * `IS NOT DISTINCT FROM`) — two missing values agree, missing-vs-
    * present disagrees (real linkage corpora are full of holes; the
    * nulls robustness suite exercises this path). Candidates with ZERO
    * shared shingles stay in the relation with jaccard 0 (LEFT join —
    * they are exactly the pairs the score should classify as
    * non-matches, dropping them would bias the readout).
    *
    * Scale shape: pair volume is the SNM linear bound; the two attribute
    * joins and the shingle verify are pair-list-sized; the score is one
    * map-side expression. */
  val qRecordLinkage = GraftQuery(
    "q_record_linkage",
    (spark, dir) => {
      import spark.implicits._
      rlAgreements(spark, dir)
        .withColumn("score", Det.qround(expr(rlScoreSql)))
        .select($"ia", $"ib",
          $"a_lang".cast(IntegerType).as("a_lang"),
          $"a_source".cast(IntegerType).as("a_source"),
          $"a_lenb".cast(IntegerType).as("a_lenb"),
          $"a_jac".cast(IntegerType).as("a_jac"),
          $"score",
          when($"score" >= RlUpper, "match")
            .when($"score" <= RlLower, "non_match")
            .otherwise("possible").as("decision"))
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH $snmPairsCtes,
      rl_jac AS (
        SELECT c.ia, c.ib,
          ${Oracle.qround(
            "coalesce(m.inter, 0) / (za.ns + zb.ns - coalesce(m.inter, 0))")}
            AS jaccard
        FROM scand c
        LEFT JOIN scommon m ON m.ia = c.ia AND m.ib = c.ib
        JOIN sssz za ON za.doc_id = c.ia
        JOIN sssz zb ON zb.doc_id = c.ib),
      attrs AS (
        SELECT doc_id, lang, source, n_chars // 50 AS lenb FROM documents),
      ag AS (
        SELECT j.ia, j.ib,
          (a.lang IS NOT DISTINCT FROM b.lang) AS a_lang,
          (a.source IS NOT DISTINCT FROM b.source) AS a_source,
          (a.lenb IS NOT DISTINCT FROM b.lenb) AS a_lenb,
          (j.jaccard >= 0.5) AS a_jac
        FROM rl_jac j
        JOIN attrs a ON a.doc_id = j.ia
        JOIN attrs b ON b.doc_id = j.ib),
      sc AS (SELECT *, ${Oracle.qround(rlScoreSql)} AS score FROM ag)
      SELECT ia, ib, a_lang::INT AS a_lang, a_source::INT AS a_source,
        a_lenb::INT AS a_lenb, a_jac::INT AS a_jac, score,
        CASE WHEN score >= $RlUpper THEN 'match'
          WHEN score <= $RlLower THEN 'non_match'
          ELSE 'possible' END AS decision
      FROM sc ORDER BY ia, ib""")
  )

  /** Pair-level agreement vectors over the SNM candidates — shared by
    * [[qRecordLinkage]] (which scores every pair) and [[qLinkageEm]]
    * (which collapses them to pattern counts). */
  private[graft] def rlAgreements(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    val cand = snmCandidates(spark, dir)
    val sh = docShingles(spark, dir, 3)
    val jac = cand
      .join(sh.select($"doc_id".as("ia"), $"sh".as("sha")), Seq("ia"))
      .join(sh.select($"doc_id".as("ib"), $"sh".as("shb")), Seq("ib"))
      .select($"ia", $"ib",
        size(array_intersect($"sha", $"shb")).as("inter"),
        size($"sha").as("na"), size($"shb").as("nb"))
      .select($"ia", $"ib",
        Det.qround($"inter" / ($"na" + $"nb" - $"inter")).as("jaccard"))
    val attrs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source",
        expr("n_chars div 50").as("lenb"))
    jac
      .join(attrs.select($"doc_id".as("ia"), $"lang".as("la"),
        $"source".as("sa"), $"lenb".as("ba")), Seq("ia"))
      .join(attrs.select($"doc_id".as("ib"), $"lang".as("lb"),
        $"source".as("sb"), $"lenb".as("bb")), Seq("ib"))
      .select($"ia", $"ib",
        ($"la" <=> $"lb").as("a_lang"),
        ($"sa" <=> $"sb").as("a_source"),
        ($"ba" <=> $"bb").as("a_lenb"),
        ($"jaccard" >= 0.5).as("a_jac"))
  }

  /** The ≤2⁴ agreement-pattern counts — the sufficient statistic of the
    * Fellegi–Sunter model (EM never needs the pairs again). */
  private[graft] def rlPatterns(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    rlAgreements(spark, dir)
      .select($"a_lang".cast(IntegerType).as("a1"),
        $"a_source".cast(IntegerType).as("a2"),
        $"a_lenb".cast(IntegerType).as("a3"),
        $"a_jac".cast(IntegerType).as("a4"))
      .groupBy($"a1", $"a2", $"a3", $"a4")
      .agg(count(lit(1)).as("cnt"))
  }

  /** SQL CTE body computing the same pattern relation (expects the
    * [[snmPairsCtes]] CTEs in scope); exposes `pat(a1, a2, a3, a4, cnt)`. */
  private def rlPatternsSql: String = s"""
      rl_jac AS (
        SELECT c.ia, c.ib,
          ${Oracle.qround(
            "coalesce(m.inter, 0) / (za.ns + zb.ns - coalesce(m.inter, 0))")}
            AS jaccard
        FROM scand c
        LEFT JOIN scommon m ON m.ia = c.ia AND m.ib = c.ib
        JOIN sssz za ON za.doc_id = c.ia
        JOIN sssz zb ON zb.doc_id = c.ib),
      attrs AS (
        SELECT doc_id, lang, source, n_chars // 50 AS lenb FROM documents),
      pat AS (
        SELECT (a.lang IS NOT DISTINCT FROM b.lang)::INT AS a1,
          (a.source IS NOT DISTINCT FROM b.source)::INT AS a2,
          (a.lenb IS NOT DISTINCT FROM b.lenb)::INT AS a3,
          (j.jaccard >= 0.5)::INT AS a4,
          count(*)::BIGINT AS cnt
        FROM rl_jac j
        JOIN attrs a ON a.doc_id = j.ia
        JOIN attrs b ON b.doc_id = j.ib
        GROUP BY 1, 2, 3, 4)"""

  /** One EM E+M step as shared SQL text over a 1-row params relation
    * (p, m1..m4, u1..u4) crossed with `pat`. Every cross-pattern sum
    * decimal-casts its addends (the ≤16-row reduction must be order-free
    * — the q_anova_f discipline); each updated parameter is
    * 6-dp-prerounded so the NEXT iteration's inputs are cross-engine
    * stable. */
  private def emGSql: String = {
    def prod(pre: String) = (1 to 4).map(i =>
      s"(CASE WHEN a$i = 1 THEN $pre$i ELSE 1.0 - $pre$i END)")
      .mkString(" * ")
    s"(p * ${prod("m")}) / (p * ${prod("m")} + (1.0 - p) * ${prod("u")})"
  }

  /** EM-estimated Fellegi–Sunter parameters — the production counterpart
    * of [[qRecordLinkage]]'s fixed design-time m/u: two unrolled EM
    * iterations (Winkler's standard estimation) over the ≤16-row
    * agreement-PATTERN relation, which is the model's sufficient
    * statistic — the pair list collapses once and EM never revisits it,
    * so estimation cost is independent of corpus size. Init p = 0.05,
    * m = 0.9, u = 0.1 for every field; output per field: m̂, û, the
    * fitted agreement weight ln(m̂/û) and the fitted match prevalence.
    *
    * Exactness: the E-step posterior is one fixed rational tree in
    * 6-dp-stable params; every M-step sum decimal-casts g·cnt addends;
    * every updated parameter is qround-prerounded before the next
    * iteration reads it. */
  val qLinkageEm = GraftQuery(
    "q_linkage_em",
    (spark, dir) => {
      import spark.implicits._
      val pat = rlPatterns(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val init = spark.range(1).select(
        lit(0.05).as("p"),
        lit(0.9).as("m1"), lit(0.9).as("m2"), lit(0.9).as("m3"),
        lit(0.9).as("m4"),
        lit(0.1).as("u1"), lit(0.1).as("u2"), lit(0.1).as("u3"),
        lit(0.1).as("u4"))
      def step(params: DataFrame): DataFrame = {
        val g = pat.crossJoin(broadcast(params))
          .withColumn("g", expr(emGSql))
        def dsum(e: String) =
          sum(expr(s"CAST($e AS DECIMAL(38,9))"))
        val aggCols: Seq[org.apache.spark.sql.Column] =
          dsum("g * cnt").as("sg") +: dsum("(1.0 - g) * cnt").as("s1g") +:
            sum($"cnt").as("sc") +:
            ((1 to 4).map(i => dsum(s"g * cnt * a$i").as(s"sga$i")) ++
             (1 to 4).map(i => dsum(s"(1.0 - g) * cnt * a$i").as(s"s1ga$i")))
        val outCols: Seq[org.apache.spark.sql.Column] =
          Det.qround(expr("CAST(sg AS DOUBLE) / sc")).as("p") +:
            ((1 to 4).map(i => Det.qround(
              expr(s"CAST(sga$i AS DOUBLE) / CAST(sg AS DOUBLE)")).as(s"m$i")) ++
             (1 to 4).map(i => Det.qround(
              expr(s"CAST(s1ga$i AS DOUBLE) / CAST(s1g AS DOUBLE)")).as(s"u$i")))
        g.agg(aggCols.head, aggCols.tail: _*).select(outCols: _*)
      }
      // persisted (1 row): the four field legs each prune different
      // m/u columns — the same differently-pruned-aggregate shape that
      // re-executed q_minhash_tune's verify leg six times
      val fitted = step(step(init))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fields = Seq("lang", "source", "lenb", "jac")
      fields.zipWithIndex.map { case (f, i0) =>
        val i = i0 + 1
        fitted.select(lit(f).as("field"),
          col(s"m$i").as("m_hat"), col(s"u$i").as("u_hat"),
          Det.qround(expr(s"ln(m$i / u$i)")).as("w_agree"),
          $"p".as("p_hat"))
      }.reduce(_.unionByName(_)).orderBy($"field")
    },
    Some {
      def stepSql(prev: String, out: String): String = {
        val dsums =
          (s"sum(CAST(g * cnt AS DECIMAL(38,9))) AS sg, " +
            s"sum(CAST((1.0 - g) * cnt AS DECIMAL(38,9))) AS s1g, " +
            s"sum(cnt)::BIGINT AS sc, ") +
          (1 to 4).map(i =>
            s"sum(CAST(g * cnt * a$i AS DECIMAL(38,9))) AS sga$i")
            .mkString(", ") + ", " +
          (1 to 4).map(i =>
            s"sum(CAST((1.0 - g) * cnt * a$i AS DECIMAL(38,9))) AS s1ga$i")
            .mkString(", ")
        val params =
          s"${Oracle.qround("CAST(sg AS DOUBLE) / sc")} AS p, " +
          (1 to 4).map(i => s"${Oracle.qround(
            s"CAST(sga$i AS DOUBLE) / CAST(sg AS DOUBLE)")} AS m$i")
            .mkString(", ") + ", " +
          (1 to 4).map(i => s"${Oracle.qround(
            s"CAST(s1ga$i AS DOUBLE) / CAST(s1g AS DOUBLE)")} AS u$i")
            .mkString(", ")
        s"""
      ${out}_g AS (
        SELECT pat.*, $emGSql AS g FROM pat CROSS JOIN $prev),
      ${out}_s AS (SELECT $dsums FROM ${out}_g),
      $out AS (SELECT $params FROM ${out}_s)"""
      }
      val fieldRows = Seq("lang" -> 1, "source" -> 2, "lenb" -> 3,
        "jac" -> 4).map { case (f, i) =>
        s"""SELECT '$f' AS field, m$i AS m_hat, u$i AS u_hat,
          ${Oracle.qround(s"ln(m$i / u$i)")} AS w_agree, p AS p_hat
        FROM e2"""
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH $snmPairsCtes,
      $rlPatternsSql,
      e0 AS (SELECT 0.05::DOUBLE AS p,
        0.9::DOUBLE AS m1, 0.9::DOUBLE AS m2, 0.9::DOUBLE AS m3,
        0.9::DOUBLE AS m4,
        0.1::DOUBLE AS u1, 0.1::DOUBLE AS u2, 0.1::DOUBLE AS u3,
        0.1::DOUBLE AS u4),
      ${stepSql("e0", "e1")},
      ${stepSql("e1", "e2")}
      SELECT * FROM (
        $fieldRows
      ) ORDER BY field"""
    }
  )

  val all: Seq[GraftQuery] = Seq(
    qDedupExact, qDedupMinhash, qLshCandidateAudit, qMinhashTune,
    qDedupClusters,
    qDedupSimhash, qDedupIncremental, qNgramJaccard, qEditDistance,
    qSpanDedup, qJaccardPrefix, qWinnowStats, qWinnowOverlap,
    qDedupKeepBest, qNeardupSources, qMinhashEstimate, qCdcDedup,
    qQualityDedupCalibration, qPairEvidence, qSplitLeakage,
    qContainmentDedup, qSnmDedup, qBlockingRecall, qRecordLinkage,
    qLinkageEm, qDedupThresholdSweep)
}
