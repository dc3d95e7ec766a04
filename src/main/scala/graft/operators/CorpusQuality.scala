package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.Det
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-hygiene operators for a training-data pipeline, over `documents`:
  *
  *  - repetition statistics (the Gopher repetition rules' raw signals:
  *    duplicate-token fraction, duplicate/top 2-gram fractions — cf. Rae et
  *    al. 2021 §A1.1, "repetition" filters);
  *  - PII redaction (C4-style scrub pass: regex families replaced inline,
  *    with a per-document redaction count);
  *  - train/eval contamination screening (n-gram overlap of every training
  *    document against a bounded benchmark/holdout partition — the standard
  *    decontamination step before a training run).
  *
  * Physical design: repetition counters come from ONE map-side pass per row
  * (native `rep_stats` codegen expression — no (doc, term) shuffle);
  * redaction is a pure projection; contamination joins the corpus' shingles
  * against the BROADCAST holdout side only (the benchmark set is bounded by
  * construction), so no corpus×corpus pair ever materializes.
  */
object CorpusQuality {

  /** A document is flagged repetitive when its most frequent 2-gram covers
    * at least this fraction of all its 2-gram instances (corpus median is
    * ~0.03; planted repetitive docs sit well above). */
  val RepetitiveThreshold = 0.08

  val qRepetitionStats = GraftQuery(
    "q_repetition_stats",
    (spark, dir) => {
      import spark.implicits._
      val st = call_function("rep_stats", $"text")
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", st.as("st"))
        .select($"doc_id",
          element_at($"st", 1).as("n_tokens"),
          element_at($"st", 2).as("n_distinct"),
          element_at($"st", 3).as("top_token_count"),
          Det.qround(lit(1.0) -
            element_at($"st", 2).cast(DoubleType) / element_at($"st", 1))
            .as("dup_token_frac"),
          when(element_at($"st", 4) > 0, Det.qround(
            element_at($"st", 6).cast(DoubleType) / element_at($"st", 4)))
            .as("top_2gram_frac"),
          when(element_at($"st", 4) > 0, Det.qround(lit(1.0) -
            element_at($"st", 5).cast(DoubleType) / element_at($"st", 4)))
            .as("dup_2gram_frac"))
        .withColumn("repetitive", $"top_2gram_frac" >= lit(RepetitiveThreshold))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
        FROM documents),
      tc AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY doc_id, term),
      ts AS (
        SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_distinct,
          max(c)::BIGINT AS top_token_count
        FROM tc GROUP BY doc_id),
      gr AS (
        SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS g
        FROM (SELECT doc_id, string_split_regex(lower(text), '[[:space:]]+') AS ws
              FROM documents)),
      gc AS (SELECT doc_id, g, count(*) AS c FROM gr GROUP BY doc_id, g),
      gs AS (
        SELECT doc_id, sum(c)::BIGINT AS n2, count(*)::BIGINT AS d2,
          max(c)::BIGINT AS top2
        FROM gc GROUP BY doc_id)
      SELECT d.doc_id, t.n_tokens, t.n_distinct, t.top_token_count,
        ${Oracle.qround("1.0 - t.n_distinct::DOUBLE / t.n_tokens")} AS dup_token_frac,
        CASE WHEN g.n2 > 0
          THEN ${Oracle.qround("g.top2::DOUBLE / g.n2")} END AS top_2gram_frac,
        CASE WHEN g.n2 > 0
          THEN ${Oracle.qround("1.0 - g.d2::DOUBLE / g.n2")} END AS dup_2gram_frac,
        (CASE WHEN g.n2 > 0
          THEN ${Oracle.qround("g.top2::DOUBLE / g.n2")} END) >= $RepetitiveThreshold
          AS repetitive
      FROM documents d
      LEFT JOIN ts t USING (doc_id)
      LEFT JOIN gs g USING (doc_id)
      ORDER BY doc_id""")
  )

  /** Redaction pattern families: emails, long digit runs (ids / phone-ish),
    * and an entity-token family generalized onto the driver vocabulary
    * (`\\w+er\\b` — the same generalization precedent as Text.refPatterns;
    * on a real corpus this slot holds the name/address patterns). Java and
    * RE2 agree on every construct used here. */
  val PiiPattern: String = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}|\d{6,}|\w+er\b"""

  val qRedactPii = GraftQuery(
    "q_redact_pii",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id",
          graft.functions.Text.refCount($"text", PiiPattern)
            .cast(LongType).as("n_redactions"),
          regexp_replace($"text", PiiPattern, "<redacted>").as("clean_text"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id,
        len(regexp_extract_all(text, '$PiiPattern'))::BIGINT AS n_redactions,
        regexp_replace(text, '$PiiPattern', '<redacted>', 'g') AS clean_text
      FROM documents
      ORDER BY doc_id""")
  )

  /** Documents with doc_id below this bound stand in for the benchmark /
    * eval partition the training corpus must be screened against. */
  val HoldoutMax = 25L
  val ContaminationThreshold = 0.5

  /** The ONE contamination-screen dataflow, shared by the exact and
    * Bloom-prefiltered variants so the two can never drift apart (their
    * contract is literally "identical output, identical oracle").
    * `prefilter(train, bench)` returns the train shingles that reach the
    * exact join — identity for the exact screen, the Bloom probe for the
    * scale screen. The output is prefilter-invariant for any prefilter
    * that never drops a shingle shared with the bench side: per-doc
    * totals (`ns`, the overlap denominator) are computed BEFORE the
    * prefilter, and dropped non-shared shingles contribute nothing to the
    * intersection counts. */
  private def contaminationScreen(
      spark: org.apache.spark.sql.SparkSession, dir: String)(
      prefilter: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)
        => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // persisted like Dedup's docShingles: the exploded shingle projection
    // feeds the bench side, the per-doc sizes, and the candidate join —
    // without the barrier the scan+shingle pass runs three times
    val sh = Tables.spread(Tables.documents(spark, dir))
      .select($"doc_id",
        explode(call_function("word_shingles", $"text", lit(2))).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = sh.filter($"doc_id" < HoldoutMax)
      .select($"doc_id".as("bench_id"), $"s")
    val train = sh.filter($"doc_id" >= HoldoutMax)
    val sizes = train.groupBy($"doc_id").agg(count(lit(1)).as("ns"))
    val inter = prefilter(train, bench).join(broadcast(bench), Seq("s"))
      .groupBy($"doc_id", $"bench_id").agg(count(lit(1)).as("i"))
    val best = inter.join(sizes, Seq("doc_id"))
      .groupBy($"doc_id")
      .agg(max($"i".cast(DoubleType) / $"ns").as("mf"))
    Tables.documents(spark, dir)
      .filter($"doc_id" >= HoldoutMax)
      .select($"doc_id")
      .join(best, Seq("doc_id"), "left")
      .select($"doc_id",
        Det.qround(coalesce($"mf", lit(0.0))).as("max_overlap_frac"),
        (coalesce($"mf", lit(0.0)) >= ContaminationThreshold).as("contaminated"))
      .orderBy($"doc_id")
  }

  val qContamination = GraftQuery(
    "q_contamination",
    (spark, dir) => contaminationScreen(spark, dir)((train, _) => train),
    Some(s"""
      WITH sh AS (${Dedup.shinglesSql(2)}),
      tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= $HoldoutMax),
      ho AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id < $HoldoutMax),
      ns AS (SELECT doc_id, count(*) AS ns FROM tr GROUP BY doc_id),
      ov AS (
        SELECT t.doc_id, h.bench_id, count(*) AS i
        FROM tr t JOIN ho h USING (shingle)
        GROUP BY t.doc_id, h.bench_id),
      mx AS (
        SELECT o.doc_id, max(o.i::DOUBLE / n.ns) AS mf
        FROM ov o JOIN ns n USING (doc_id)
        GROUP BY o.doc_id)
      SELECT d.doc_id,
        ${Oracle.qround("coalesce(m.mf, 0.0)")} AS max_overlap_frac,
        coalesce(m.mf, 0.0) >= $ContaminationThreshold AS contaminated
      FROM documents d LEFT JOIN mx m USING (doc_id)
      WHERE d.doc_id >= $HoldoutMax
      ORDER BY d.doc_id""")
  )

  /** Contamination screening with a Bloom-filter prefilter — the 100 TB
    * shape of [[qContamination]]. At scale the corpus side's exploded
    * shingles dominate the exact join's shuffle; here every train shingle is
    * first probed against a broadcast Bloom sketch of the HOLDOUT shingles
    * (`bloom_agg`/`bloom_contains`, Spark's own runtime-filter expressions),
    * so only the tiny might-match slice reaches the join. Correctness is
    * unchanged: a Bloom filter has no false negatives, and its false
    * positives are eliminated by the exact join that follows — which is why
    * this query shares [[qContamination]]'s oracle verbatim. Per-doc shingle
    * totals (`ns`) are computed BEFORE the prefilter: the denominator needs
    * every shingle, matched or not. */
  val qBloomContamination = GraftQuery(
    "q_bloom_contamination",
    (spark, dir) => contaminationScreen(spark, dir) { (train, bench) =>
      // bloom_contains requires its sketch side to be a constant or a
      // SCALAR SUBQUERY (the shape Spark's own injected runtime filters
      // use): the subquery executes first and its one-row binary result is
      // inlined into every probe task. The DataFrame API cannot state a
      // scalar subquery, so this one step goes through spark.sql over temp
      // views of the same plans. Bloom false negatives: none (so no shared
      // shingle is ever dropped — the contaminationScreen invariant);
      // false positives: eliminated by the exact join that follows.
      bench.createOrReplaceTempView("g_bloom_bench")
      train.createOrReplaceTempView("g_bloom_train")
      spark.sql("""
        SELECT doc_id, s FROM g_bloom_train
        WHERE bloom_contains(
          (SELECT bloom_agg(xxhash64(s), 100000L, 800000L)
           FROM g_bloom_bench),
          xxhash64(s))""")
    },
    // identical result to the exact screen => identical oracle
    qContamination.oracle
  )

  /** Number of equi-width buckets in [[qLengthHistogram]]. */
  val HistBuckets = 20L

  /** Equi-width histogram of document lengths — the first plot anyone draws
    * of a new corpus (length pathologies are the cheapest quality signal).
    * The bucket index is PURE INTEGER arithmetic,
    * `(n_chars − lo) · B ÷ (hi − lo + 1)`, identical by definition in both
    * engines — deliberately not Spark's `width_bucket`, whose
    * double-division bucket edges would have to be replicated bitwise in an
    * engine that lacks the function. Bounds come from one global min/max
    * pass; the histogram itself is a map-side-combined count per bucket —
    * at 100 TB the exchange carries B rows per partition, nothing more. */
  val qLengthHistogram = GraftQuery(
    "q_length_histogram",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val bounds = docs.agg(min($"n_chars").as("lo"), max($"n_chars").as("hi"))
      docs.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          expr(s"(n_chars - lo) * $HistBuckets div (hi - lo + 1)"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"),
          Det.davg($"n_chars").as("avg_chars"))
        .orderBy($"bucket")
    },
    Some(s"""
      WITH bounds AS (
        SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents)
      SELECT (n_chars - lo) * $HistBuckets // (hi - lo + 1) AS bucket,
        count(*) AS n_docs,
        min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        ${Oracle.davg("n_chars")} AS avg_chars
      FROM documents CROSS JOIN bounds
      GROUP BY bucket
      ORDER BY bucket""")
  )

  /** Pairwise source-level content overlap — the "does dump N duplicate
    * dump M" audit run before mixing corpora (two crawls of the same sites,
    * a filtered subset re-ingested beside its superset, a mirrored dataset
    * under two names): exact shingle-set Jaccard between every pair of
    * sources, from ONE distinct (source, shingle) relation. Document-level
    * dedup ([[Dedup]]) can't see this — two sources can share most of their
    * content without sharing one exact document.
    *
    * Scale shape: the corpus-priced step is the distinct (source, shingle)
    * aggregate — partial-aggregated map-side, one exchange, persisted for
    * its three consumers (per-source sizes + both sides of the pair join).
    * The self-join keys on `shingle`, whose per-key multiplicity is bounded
    * by |sources| — so the join output is ≤ C(|sources|, 2) rows PER
    * DISTINCT SHINGLE and never corpus×corpus; the result grid is ≤
    * C(|sources|, 2) rows total. With thousands of sources the ubiquitous-
    * shingle fan-out would get a df cap (the q_ngram_jaccard discipline);
    * at this corpus' 20 sources the bound is 190 rows per shingle. */
  val qSourceOverlap = GraftQuery(
    "q_source_overlap",
    (spark, dir) => {
      import spark.implicits._
      val sh = Tables.spread(Tables.documents(spark, dir))
        .select($"source",
          explode(call_function("word_shingles", $"text", lit(2))).as("s"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ns = sh.groupBy($"source").agg(count(lit(1)).as("ns"))
      val inter = sh.select($"source".as("src_a"), $"s")
        .join(sh.select($"source".as("src_b"), $"s"), Seq("s"))
        .filter($"src_a" < $"src_b")
        .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_shared"))
      inter
        .join(broadcast(ns.select($"source".as("src_a"), $"ns".as("ns_a"))),
          Seq("src_a"))
        .join(broadcast(ns.select($"source".as("src_b"), $"ns".as("ns_b"))),
          Seq("src_b"))
        .select($"src_a", $"src_b", $"ns_a", $"ns_b", $"n_shared",
          Det.qround($"n_shared".cast(DoubleType) /
            ($"ns_a" + $"ns_b" - $"n_shared").cast(DoubleType)).as("jaccard"))
        .orderBy($"src_a", $"src_b")
    },
    Some(s"""
      WITH sh AS (
        SELECT DISTINCT source, shingle FROM (
          SELECT source,
            unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])
              AS shingle
          FROM (SELECT source, string_split_regex(lower(text), '[[:space:]]+')
                  AS ws
                FROM documents))),
      ns AS (SELECT source, count(*) AS ns FROM sh GROUP BY source),
      iv AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, na.ns AS ns_a, nb.ns AS ns_b, n_shared,
        ${Oracle.qround(
          "n_shared::DOUBLE / (na.ns + nb.ns - n_shared)::DOUBLE")} AS jaccard
      FROM iv
      JOIN ns na ON na.source = iv.src_a
      JOIN ns nb ON nb.source = iv.src_b
      ORDER BY src_a, src_b""")
  )

  /** A 3-shingle is "source boilerplate" when it appears in at least this
    * many distinct documents of the SAME source (site chrome, templated
    * headers/footers, navigation text — the C4/RefinedWeb removal target).
    * At the driver corpus' 25-docs-per-source shape, df ≥ 3 flags ~0.15%
    * of shingle instances concentrated in a minority of documents — a
    * sparse, discriminative signal rather than a constant offset. */
  val BoilerplateDf = 3

  /** Per-document boilerplate rate: the fraction of a document's DISTINCT
    * 3-shingles that are source-common ([[BoilerplateDf]]). High-rate
    * documents are template shells whose token mass is site chrome — the
    * standard pre-training drop/clean candidate that per-document
    * repetition stats (q_repetition_stats) cannot see, because the
    * repetition lives ACROSS documents of a source, not inside any one.
    *
    * Scale shape: one exchange keyed (source, shingle) where the window
    * computes the within-source df in place — no self-join, no second
    * scan of the shingle stream — then one doc_id exchange for the rollup.
    * Both keys are high-cardinality (no source-level skew: the window key
    * includes the shingle), and the shingle stream enters the first
    * exchange already distinct-per-doc via the native `word_shingles`
    * projection. */
  val qBoilerplateRate = GraftQuery(
    "q_boilerplate_rate",
    (spark, dir) => {
      import spark.implicits._
      val ss = Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", $"source",
          explode(call_function("word_shingles", $"text", lit(3))).as("shingle"))
      val sdf = ss.withColumn("sdf",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"source", $"shingle")))
      sdf.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_sh"),
          count(when($"sdf" >= BoilerplateDf, 1)).as("n_common"))
        .select($"doc_id", $"n_sh", $"n_common",
          Det.qround($"n_common" * lit(1.0) / $"n_sh").as("boilerplate_rate"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH sh AS (${Dedup.shinglesSql(3)}),
      ss AS (
        SELECT s.doc_id, d.source, s.shingle
        FROM sh s JOIN documents d USING (doc_id)),
      w AS (
        SELECT doc_id,
          count(*) OVER (PARTITION BY source, shingle) AS sdf
        FROM ss)
      SELECT doc_id, count(*)::BIGINT AS n_sh,
        count(*) FILTER (WHERE sdf >= $BoilerplateDf)::BIGINT AS n_common,
        ${Oracle.qround(
          s"(count(*) FILTER (WHERE sdf >= $BoilerplateDf)) * 1.0 / count(*)")}
          AS boilerplate_rate
      FROM w GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Memorization-audit parameters: span length in tokens, the minimum
    * corpus-wide occurrence count that makes a span a memorization risk,
    * and the report cap. */
  val MemorizationN = 5
  val MemorizationMin = 3
  val MemorizationTopK = 50

  /** Memorization-risk audit: the most-repeated [[MemorizationN]]-token
    * spans corpus-wide — the sequences a model is most likely to emit
    * verbatim (the public dedup/memorization result: a sequence's
    * memorization probability grows with its training-set repetition
    * count, so the curve of top repeated n-grams is the pre-training
    * audit that says whether remove-repeated-substrings must run).
    * Counts include INTRA-document repeats (word_shingles_all's
    * positional stream, not the distinct shingle set) — a boilerplate
    * footer pasted 40× in one document is the same risk as one pasted
    * once in 40 documents; `n_docs` rides along to distinguish the two.
    *
    * Scale shape: one map-side codegen projection, one partial+final
    * aggregate on the span key, TakeOrderedAndProject for the capped
    * report — never a pair join (q_span_dedup covers the pairwise
    * question; this is the frequency curve).
    */
  val qMemorizationNgrams = GraftQuery(
    "q_memorization_ngrams",
    (spark, dir) => {
      import spark.implicits._
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id",
          explode(call_function("word_shingles_all", $"text",
            lit(MemorizationN))).as("ngram"))
        .groupBy($"ngram")
        .agg(count(lit(1)).as("occurrences"),
          countDistinct($"doc_id").as("n_docs"))
        .filter($"occurrences" >= MemorizationMin)
        .orderBy($"occurrences".desc, $"ngram")
        .limit(MemorizationTopK)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(lower(text), '[[:space:]]+') AS ws
        FROM documents),
      spans AS (
        SELECT doc_id,
          unnest([array_to_string(ws[i:i+${MemorizationN - 1}], ' ')
                  for i in range(1, greatest(len(ws) - ${MemorizationN - 2}, 1))]) AS ngram
        FROM toks)
      SELECT ngram, count(*) AS occurrences,
        count(DISTINCT doc_id) AS n_docs
      FROM spans
      GROUP BY ngram
      HAVING count(*) >= $MemorizationMin
      ORDER BY occurrences DESC, ngram
      LIMIT $MemorizationTopK""")
  )

  /** N-gram orders profiled by [[qNgramNovelty]]. */
  val NoveltyNs: Seq[Int] = Seq(1, 2, 3, 4)

  /** Per-n n-gram novelty profile of the holdout split against the train
    * split (doc_id < [[HoldoutMax]] vs the rest — the q_contamination
    * split): for each n ∈ [[NoveltyNs]], the fraction of holdout n-grams
    * NEVER seen in train, both type-level (distinct) and token-level
    * (instance-weighted). The RAVEN-style novelty curve (McCoy et al.
    * 2023): unigram novelty near 0 with novelty rising steeply in n is
    * the healthy generalization profile; LOW high-n novelty means the
    * holdout is largely stitched from training text — the corpus-level
    * complement of q_contamination's per-document screen and
    * q_memorization_ngrams' verbatim-span hunt.
    *
    * Scale shape: one exploded (n, gram) relation per order, unioned;
    * the join is keyed on (n, gram) — linear in corpus size with map-side
    * combine on both aggregates, never pairwise. At 100 TB the train side
    * would take the q_bloom_contamination prefilter verbatim (same join
    * key); rates are exact int/int quotients, [[Det.qround]]ed. */
  val qNgramNovelty = GraftQuery(
    "q_ngram_novelty",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.spread(Tables.documents(spark, dir))
      val grams = NoveltyNs.map { n =>
        docs.select($"doc_id", lit(n.toLong).as("n"),
          explode(call_function("word_shingles_all", $"text", lit(n)))
            .as("g"))
      }.reduce(_ union _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ho = grams.filter($"doc_id" < HoldoutMax)
        .groupBy($"n", $"g").agg(count(lit(1)).as("inst"))
      val tr = grams.filter($"doc_id" >= HoldoutMax)
        .select($"n", $"g").distinct()
        .withColumn("seen", lit(1))
      ho.join(tr, Seq("n", "g"), "left")
        .groupBy($"n")
        .agg(count(lit(1)).as("ho_types"),
          sum(when($"seen".isNull, 1L).otherwise(0L)).as("novel_types"),
          sum($"inst").as("ho_tokens"),
          sum(when($"seen".isNull, $"inst").otherwise(0L))
            .as("novel_tokens"))
        .select($"n", $"ho_types", $"novel_types", $"ho_tokens",
          $"novel_tokens",
          Det.qround($"novel_types".cast(DoubleType) / $"ho_types")
            .as("novelty_types"),
          Det.qround($"novel_tokens".cast(DoubleType) / $"ho_tokens")
            .as("novelty_tokens"))
        .orderBy($"n")
    },
    Some {
      def gramsOf(n: Int): String = {
        val cat = (0 until n).map(j =>
          if (j == 0) "ws[i]" else s"ws[i+$j]").mkString(" || ' ' || ")
        s"SELECT doc_id, ${n}::BIGINT AS n, unnest([$cat " +
          s"for i in range(1, len(ws) - ${n - 2})]) AS g FROM w"
      }
      s"""
      WITH w AS (
        SELECT doc_id,
          string_split_regex(lower(text), '[[:space:]]+') AS ws
        FROM documents),
      gi AS (${NoveltyNs.map(gramsOf).mkString("\n        UNION ALL ")}),
      ho AS (
        SELECT n, g, count(*)::BIGINT AS inst FROM gi
        WHERE doc_id < $HoldoutMax GROUP BY n, g),
      tr AS (
        SELECT DISTINCT n, g FROM gi WHERE doc_id >= $HoldoutMax),
      j AS (
        SELECT h.n, h.inst, (t.g IS NOT NULL) AS seen
        FROM ho h LEFT JOIN tr t ON h.n = t.n AND h.g = t.g),
      agg AS (
        SELECT n, count(*)::BIGINT AS ho_types,
          sum(CASE WHEN NOT seen THEN 1 ELSE 0 END)::BIGINT AS novel_types,
          sum(inst)::BIGINT AS ho_tokens,
          sum(CASE WHEN NOT seen THEN inst ELSE 0 END)::BIGINT
            AS novel_tokens
        FROM j GROUP BY n)
      SELECT n, ho_types, novel_types, ho_tokens, novel_tokens,
        ${Oracle.qround("novel_types::DOUBLE / ho_types")} AS novelty_types,
        ${Oracle.qround("novel_tokens::DOUBLE / ho_tokens")}
          AS novelty_tokens
      FROM agg
      ORDER BY n"""
    }
  )

  /** The 8 high-frequency English function words of the Gopher "stop word"
    * rule (Rae et al. 2021 §A1.1): a document must contain at least 2 of
    * them to pass — a cheap fluency prior that kills word-salad pages. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-rules document quality filter (Rae et al. 2021, Appendix A1.1
    * — the MassiveWeb heuristics every LLM data pipeline since has
    * re-implemented): per document, the five structural rules
    *
    *   1. word count in [50, 100,000];
    *   2. mean word length in [3, 10] characters;
    *   3. ≥ 80% of words contain at least one alphabetic character;
    *   4. symbol-to-word ratio (# or ellipsis) below 0.1;
    *   5. at least 2 of the 8 [[GopherStops]] function words present;
    *
    * each emitted as its own flag plus the conjunction, so a pipeline can
    * report WHICH rule rejected a document (the standard ablation
    * readout). On this synthetic corpus the word-count floor is the
    * discriminating rule (~55% pass at sf0.01) and the symbol rule is
    * trivially satisfied — the honest readout; the machinery (all five
    * predicates) is what is verified.
    *
    * Determinism: every threshold comparison is INTEGER cross-multiplied
    * (3n ≤ chars ≤ 10n, 5·alpha ≥ 4n, 10·sym < n) so no float boundary
    * can flip a flag cross-engine; the two emitted ratios are display-only
    * [[Det.qround]]ed doubles. Scale shape: pure per-row projection — one
    * map pass, no shuffle except the output sort. */
  /** The per-document integer statistics the five Gopher rules compare —
    * ONE definition shared by [[qGopherRules]] and [[qFilterAblation]]
    * (an inlined copy in either could silently drift on a rule change).
    * house single-space convention: chars-in-words = len − (n−1). */
  private[graft] def gopherStatCols: Seq[org.apache.spark.sql.Column] = {
    val toks = graft.functions.Text.tokens(col("text"))
    val nW = size(toks).cast(LongType)
    Seq(nW.as("n_words"),
      (length(col("text")) - nW + lit(1)).cast(LongType).as("chars"),
      size(filter(toks, t => t.rlike("[a-z]"))).cast(LongType)
        .as("n_alpha"),
      size(filter(toks, t => t.rlike("#|\\.\\.\\."))).cast(LongType)
        .as("n_sym"),
      size(array_intersect(array_distinct(toks),
        lit(GopherStops.toArray))).cast(LongType).as("stop_hits"))
  }

  /** The five rule predicates over the [[gopherStatCols]] names, as
    * (rule key, SQL text valid in BOTH engines) — integer
    * cross-multiplied, no float boundary. Shared by both queries'
    * Spark plans and DuckDB oracles. */
  private[graft] val GopherRuleSql: Seq[(String, String)] = Seq(
    "wordcount" -> "(n_words BETWEEN 50 AND 100000)",
    "wordlen" -> "(chars BETWEEN n_words * 3 AND n_words * 10)",
    "alpha" -> "(n_alpha * 5 >= n_words * 4)",
    "symbol" -> "(n_sym * 10 < n_words)",
    "stops" -> "(stop_hits >= 2)")

  val qGopherRules = GraftQuery(
    "q_gopher_rules",
    (spark, dir) => {
      import spark.implicits._
      // the output orderBy's range partitioner SAMPLES its child, so the
      // regex-HOF projection executes twice (sample pass + real exchange);
      // caching the narrow stat rows first A/B-measured SLOWER at bench
      // scale (r17: 1.31/1.40/1.55 vs 1.41/1.73/2.09 s — the extra count
      // job outweighs the duplicated single-task map), so the lazy
      // double-projection stays
      Tables.documents(spark, dir)
        .select(($"doc_id" +: gopherStatCols): _*)
        .select(Seq($"doc_id", $"n_words",
          Det.qround($"chars".cast(DoubleType) / $"n_words")
            .as("mean_word_len"),
          Det.qround($"n_alpha".cast(DoubleType) / $"n_words")
            .as("frac_alpha"),
          $"stop_hits") ++
          GopherRuleSql.map { case (k, sql) => expr(sql).as(s"r_$k") }: _*)
        .withColumn("passed",
          $"r_wordcount" && $"r_wordlen" && $"r_alpha" && $"r_symbol" &&
            $"r_stops")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH w AS (
        SELECT doc_id,
          string_split_regex(lower(text), '[[:space:]]+') AS words,
          length(text) AS n_chars
        FROM documents),
      t AS (
        SELECT doc_id,
          len(words)::BIGINT AS n_words,
          (n_chars - len(words) + 1)::BIGINT AS chars,
          len(list_filter(words, x -> regexp_matches(x, '[a-z]')))::BIGINT
            AS n_alpha,
          len(list_filter(words, x -> regexp_matches(x, '#|\\.\\.\\.')))::BIGINT
            AS n_sym,
          len(list_filter(${GopherStops.map(s => s"'$s'").mkString("[", ", ", "]")},
            s -> list_contains(words, s)))::BIGINT AS stop_hits
        FROM w)
      SELECT doc_id, n_words,
        ${Oracle.qround("chars * 1.0 / n_words")} AS mean_word_len,
        ${Oracle.qround("n_alpha * 1.0 / n_words")} AS frac_alpha,
        stop_hits,
        ${GopherRuleSql.map { case (k, sql) => s"$sql AS r_$k" }
          .mkString(",\n        ")},
        (${GopherRuleSql.map(_._2).mkString("\n          AND ")}) AS passed
      FROM t
      ORDER BY doc_id""")
  )

  /** The ablation variants: each Gopher rule ALONE as the training-set
    * gate, plus 'none' (unfiltered baseline) and 'all' (the production
    * conjunction). */
  private[graft] val AblationVariants: Seq[String] =
    "none" +: GopherRuleSql.map(_._1) :+ "all"

  /** Filter-ablation table — the "which filter buys perplexity" readout
    * (the RefinedWeb/DataComp methodology, instrumented on the unigram LM
    * this engine can fit exactly): for each [[AblationVariants]] variant,
    * train q_heldout_xent's add-1 unigram LM on the TRAIN-split documents
    * passing that variant's gate and score the SAME untouched val split
    * (q_train_split's salted-md5 buckets: ≤ 7 train, = 8 val). Per
    * variant: kept train docs/tokens, LM vocabulary, val OOV mass, val
    * cross-entropy (nats), and delta_vs_none = xent(none) − xent(v) — a
    * positive delta means the filter genuinely sharpens the LM, not just
    * shrinks the corpus. The val split is NEVER filtered (ablations that
    * filter eval with train are self-confirming — the honest protocol).
    *
    * Exactness: rule flags are the shared integer predicates
    * ([[GopherRuleSql]]); all counts are exact integers off conditional
    * sums; each xent addend is one ln of a double quotient of exact
    * integers (the q_heldout_xent precedent), decimal-summed; deltas are
    * differences of already-qround'd doubles, re-qround'd.
    *
    * Scale shape: ONE corpus token pass — the per-doc flags ride the
    * explode projection, the |variants|-way structure multiplies
    * CONDITIONAL-AGGREGATE COLUMNS of the one (term) exchange, never
    * corpus rows (the q_filter_threshold_sweep discipline); everything
    * after is vocabulary-sized (normalizers = 1 wide row broadcast back;
    * final stack = |variants| rows). The doc-count leg is a separate
    * map-only pass ending in a 1-row aggregate. */
  /** The per-variant gate over the `r_<rule>` flag columns. */
  private def ablGate(v: String): org.apache.spark.sql.Column = v match {
    case "none" => lit(true)
    case "all" => GopherRuleSql.map(r => col(s"r_${r._1}")).reduce(_ && _)
    case k => col(s"r_$k")
  }

  /** (bucket, text, r_<rule>…) — split bucket + rule flags per document;
    * the shared front of both ablation legs. */
  private[graft] def ablFlagged(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("bucket", expr(PipelineOps.u32Expr(
        "concat('split:', cast(doc_id as string))") + " % 10"))
      .filter($"bucket" <= 8)
      .select(Seq($"bucket", col("text")) ++ gopherStatCols: _*)
      .select(Seq($"bucket", col("text")) ++
        GopherRuleSql.map { case (k, sql) => expr(sql).as(s"r_$k") }: _*)
  }

  /** Appends the g_<variant> ablation-gate booleans to `docs` (which
    * must carry `text`) — the per-document half of [[ablTfw]], factored
    * out for IngestHub's tokenize-once path, which computes the gates
    * ONCE on its shared per-batch relation and reuses them for both
    * ablation legs. Unlike [[ablFlagged]] it neither derives the split
    * bucket nor filters on it (the caller carries a shared bucket
    * column). */
  private[graft] def withAblGates(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val base = docs.columns.toSeq.map(col)
    docs
      .select(base ++ gopherStatCols: _*)
      .select(base ++
        GopherRuleSql.map { case (k, sql) => expr(sql).as(s"r_$k") }: _*)
      .select(base ++
        AblationVariants.map(v => ablGate(v).as(s"g_$v")): _*)
  }

  /** The wide (term, c_<variant>…, vtf) conditional-count relation —
    * ADDITIVE over document slices (flags and split buckets are per-doc
    * constants), which is what lets graft.streaming.StreamAblate keep it
    * current per micro-batch and fold at read time. */
  private[graft] def ablTfw(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vs = AblationVariants
    ablFlagged(docs)
      .select(Seq($"bucket") ++ vs.map(v => ablGate(v).as(s"g_$v")) :+
        explode(graft.functions.Text.tokens($"text")).as("term"): _*)
      .groupBy($"term").agg(
        count(when($"bucket" <= 7 && col(s"g_${vs.head}"), 1))
          .as(s"c_${vs.head}"),
        vs.tail.map(v =>
          count(when($"bucket" <= 7 && col(s"g_$v"), 1)).as(s"c_$v"))
          :+ count(when($"bucket" === 8, 1)).as("vtf"): _*)
  }

  /** The 1-row kept-train-docs counts per variant — also additive. */
  private[graft] def ablDocsKept(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vs = AblationVariants
    ablFlagged(docs).filter($"bucket" <= 7).agg(
      count(when(ablGate(vs.head), 1)).as(s"d_${vs.head}"),
      vs.tail.map(v => count(when(ablGate(v), 1)).as(s"d_$v")): _*)
  }

  /** The |variants|-row ablation table from the two count relations —
    * shared by [[qFilterAblation]] and the streaming maintainer's fold. */
  private[graft] def ablReport(tfwIn: org.apache.spark.sql.DataFrame,
      docsKept: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = tfwIn.sparkSession
    import spark.implicits._
    val vs = AblationVariants
    val tfw = tfwIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    locally {
      val norm = tfw.agg(
        sum(col(s"c_${vs.head}")).as(s"n_${vs.head}"),
        vs.tail.map(v => sum(col(s"c_$v")).as(s"n_$v")) ++
          vs.map(v => count(when(col(s"c_$v") > 0, 1)).as(s"v_$v")) :+
          sum($"vtf").as("n_val"): _*)
      val scored = tfw.filter($"vtf" > 0).crossJoin(broadcast(norm))
        .agg(
          sum(expr(s"CAST(vtf * ln(CAST(n_${vs.head} + v_${vs.head} + 1 " +
            s"AS DOUBLE) / (c_${vs.head} + 1)) AS DECIMAL(38,9))"))
            .as(s"s_${vs.head}"),
          vs.tail.map(v =>
            sum(expr(s"CAST(vtf * ln(CAST(n_$v + v_$v + 1 AS DOUBLE) " +
              s"/ (c_$v + 1)) AS DECIMAL(38,9))")).as(s"s_$v")) ++
            vs.map(v => sum(when(col(s"c_$v") === 0, $"vtf")
              .otherwise(0L)).as(s"o_$v")) :+
            max($"n_val").as("n_val"): _*)
      val wide = scored.crossJoin(broadcast(norm.drop("n_val")))
        .select(vs.flatMap(v => Seq(
          col(s"n_$v"), col(s"v_$v"),
          Det.qround(col(s"o_$v").cast(DoubleType) / $"n_val")
            .as(s"oovr_$v"),
          Det.qround(col(s"s_$v").cast(DoubleType) / $"n_val")
            .as(s"x_$v"))) :+ $"n_val": _*)
      val stacked = wide.crossJoin(broadcast(docsKept)).selectExpr(
        s"stack(${vs.size}, ${vs.map(v =>
          s"'$v', d_$v, n_$v, v_$v, CAST(n_val AS BIGINT), oovr_$v, x_$v, " +
            // 1e6 parses as DOUBLE in Spark SQL text (bare 1000000.0 is a
            // DECIMAL literal — the q_filter_threshold_sweep lesson)
            s"floor((x_${vs.head} - x_$v) * 1e6 + 0.5) / 1e6")
          .mkString(", ")}) as (variant, kept_train_docs, n_train_tokens, " +
          "vocab, n_val_tokens, oov_rate, xent_nats, delta_vs_none)")
      stacked.orderBy($"variant")
    }
  }

  val qFilterAblation = GraftQuery(
    "q_filter_ablation",
    (spark, dir) => {
      val docs = Tables.spread(Tables.documents(spark, dir))
      // kept-train-docs is a map-only second doc pass ending in 1 row
      ablReport(ablTfw(docs), ablDocsKept(docs))
    },
    Some {
      val vs = AblationVariants
      def gateSql(v: String): String = v match {
        case "none" => "TRUE"
        case "all" => GopherRuleSql.map(_._2).mkString("(", " AND ", ")")
        case k => GopherRuleSql.toMap.apply(k)
      }
      s"""
      WITH w AS (
        SELECT doc_id, text,
          ${PipelineOps.u32Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10
            AS bucket,
          string_split_regex(lower(text), '[[:space:]]+') AS words,
          length(text) AS n_chars
        FROM documents),
      t AS (
        SELECT bucket, words,
          len(words)::BIGINT AS n_words,
          (n_chars - len(words) + 1)::BIGINT AS chars,
          len(list_filter(words, x -> regexp_matches(x, '[a-z]')))::BIGINT
            AS n_alpha,
          len(list_filter(words, x -> regexp_matches(x, '#|\\.\\.\\.')))::BIGINT
            AS n_sym,
          len(list_filter(${GopherStops.map(s => s"'$s'")
            .mkString("[", ", ", "]")},
            s -> list_contains(words, s)))::BIGINT AS stop_hits
        FROM w WHERE bucket <= 8),
      g AS (
        SELECT bucket, words,
          ${vs.map(v => s"${gateSql(v)} AS g_$v").mkString(",\n          ")}
        FROM t),
      toks AS (
        SELECT bucket, ${vs.map(v => s"g_$v").mkString(", ")},
          unnest(words) AS term
        FROM g),
      tfw AS (
        SELECT term,
          ${vs.map(v =>
            s"count(*) FILTER (WHERE bucket <= 7 AND g_$v) AS c_$v")
            .mkString(",\n          ")},
          count(*) FILTER (WHERE bucket = 8) AS vtf
        FROM toks GROUP BY term),
      norm AS (
        SELECT
          ${vs.map(v => s"sum(c_$v) AS n_$v").mkString(", ")},
          ${vs.map(v => s"count(*) FILTER (WHERE c_$v > 0) AS v_$v")
            .mkString(", ")},
          sum(vtf) AS n_val
        FROM tfw),
      scored AS (
        SELECT
          ${vs.map(v => s"sum(CAST(vtf * ln(CAST(n_$v + v_$v + 1 AS DOUBLE)" +
            s" / (c_$v + 1)) AS DECIMAL(38,9))) AS s_$v").mkString(",\n          ")},
          ${vs.map(v =>
            s"sum(CASE WHEN c_$v = 0 THEN vtf ELSE 0 END) AS o_$v")
            .mkString(", ")},
          max(n_val) AS n_val
        FROM tfw CROSS JOIN norm WHERE vtf > 0),
      wide AS (
        SELECT
          ${vs.map(v => s"n_$v, v_$v, " +
            s"${Oracle.qround(s"o_$v * 1.0 / n_val")} AS oovr_$v, " +
            s"${Oracle.qround(s"s_$v::DOUBLE / n_val")} AS x_$v")
            .mkString(",\n          ")},
          n_val
        FROM scored CROSS JOIN (SELECT ${vs.map(v => s"n_$v, v_$v")
          .mkString(", ")} FROM norm) n2),
      dk AS (
        SELECT
          ${vs.map(v =>
            s"count(*) FILTER (WHERE g_$v) AS d_$v").mkString(", ")}
        FROM g WHERE bucket <= 7)
      SELECT variant, kept_train_docs, n_train_tokens, vocab, n_val_tokens,
        oov_rate, xent_nats, delta_vs_none
      FROM (
        ${vs.map(v => s"SELECT '$v' AS variant, d_$v AS kept_train_docs, " +
          s"n_$v::BIGINT AS n_train_tokens, v_$v::BIGINT AS vocab, " +
          s"n_val::BIGINT AS n_val_tokens, oovr_$v AS oov_rate, " +
          s"x_$v AS xent_nats, " +
          s"floor((x_${vs.head} - x_$v) * 1e6 + 0.5) / 1e6 " +
          "AS delta_vs_none FROM wide CROSS JOIN dk")
          .mkString("\n        UNION ALL\n        ")})
      ORDER BY variant"""
    }
  )

  /** Tokens per canary / decoy sequence in [[qCanaryExposure]]. */
  val CanaryN = 3

  /** Canaries audited by [[qCanaryExposure]]. */
  val CanaryCount = 8

  /** Decoy candidates per canary — the candidate space is the canary plus
    * these, so max exposure = log2([[CanaryDecoys]] + 1) = 8 bits. */
  val CanaryDecoys = 255

  /** Canary-exposure memorization audit (Carlini et al. 2019, "The Secret
    * Sharer: Evaluating and Testing Unintended Memorization in Neural
    * Networks", USENIX Security — the rank-based `exposure` metric): treat
    * the corpus' singleton [[CanaryN]]-grams (sequences occurring exactly
    * ONCE — the planted-secret analogue) as canaries, score each against a
    * deterministic candidate set of [[CanaryDecoys]] random same-shape
    * sequences drawn from the corpus vocabulary, and report
    * `exposure = log2(|candidates|) − log2(rank)` where rank orders by
    * model NLL (lower NLL = more memorized-looking). Exposure near the
    * 8-bit ceiling means the model finds the secret FAR more likely than
    * chance — the extraction-risk signal. The scoring model here is the
    * corpus unigram LM (the [[graft.operators.LexicalStats]] surprisal
    * model); a production audit swaps in the trained network's NLL, and
    * the pipeline — candidate generation, broadcast scoring, rank,
    * exposure — is exactly this.
    *
    * Exactness: canary and decoy NLLs are decimal-summed surprisals
    * rounded once ([[Det.dsum]]); the rank compares those 6-dp doubles
    * strictly; decoy picks are md5-indexed vocabulary rows (the
    * stratified-sampling u32 machinery); exposure is one shared
    * `ln`-quotient expression tree.
    *
    * Scale shape: two corpus-priced passes, each ONE exchange (the
    * [[CanaryN]]-gram occurrence count on the shingle key; the unigram cf
    * on the term key — map-side combined). Everything downstream is
    * model-scale: the vocabulary window, [[CanaryCount]] canaries,
    * [[CanaryDecoys]]×[[CanaryN]] decoy picks, and a C×R rank cross of
    * ~2k rows — all broadcast work; no corpus-sized join ever forms. */
  /** Core of [[qCanaryExposure]] over the two collapsed relations —
    * `gramOcc` = ([[CanaryN]]-gram, occ) occurrence counts and `cf` =
    * (term, cf) vocabulary counts. Factored so the streaming maintainer
    * ([[graft.streaming.StreamCanary]]) can fold its additive logs into
    * exactly these shapes and reuse the whole readout bit-equal. `cf`
    * should arrive persisted (it feeds the LM, the ranked vocab and the
    * size scalar). */
  private[graft] def canaryExposureOf(gramOcc: org.apache.spark.sql.DataFrame,
      cf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = gramOcc.sparkSession
    import spark.implicits._
    val canaries = gramOcc
      .filter($"occ" === 1L)
      .orderBy($"canary").limit(CanaryCount)
      .select($"canary")
    val tot = cf.agg(sum($"cf").as("tot"))
    val lm = cf.crossJoin(broadcast(tot))
      .select($"term",
        log($"tot".cast(DoubleType) / $"cf".cast(DoubleType)).as("s"))
    val vocab = cf.select($"term").withColumn("rnk",
      row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"term")))
    val vsize = cf.agg(count(lit(1)).as("v"))
    val cScore = canaries
      .select($"canary", explode(split($"canary", " ")).as("term"))
      .join(broadcast(lm), Seq("term"))
      .groupBy($"canary").agg(Det.dsum($"s").as("nll"))
    val picks = spark.range(CanaryDecoys).toDF("j")
      .select($"j", explode(sequence(lit(0), lit(CanaryN - 1))).as("pos"))
      .crossJoin(broadcast(vsize))
      .withColumn("rnk", expr(PipelineOps.u32Expr(
        "concat('canary:', cast(j as string), ':', cast(pos as string))"))
        % $"v" + lit(1L))
    val dScore = vocab.join(broadcast(picks), Seq("rnk"))
      .join(broadcast(lm), Seq("term"))
      .groupBy($"j").agg(Det.dsum($"s").as("dnll"))
    cScore.crossJoin(broadcast(dScore))
      .groupBy($"canary", $"nll")
      .agg((sum(when($"dnll" < $"nll", 1L).otherwise(0L)) + lit(1L))
        .as("cand_rank"))
      .select($"canary", $"nll", $"cand_rank",
        Det.qround(expr(s"(ln(${CanaryDecoys + 1}.0) - " +
          "ln(CAST(cand_rank AS DOUBLE))) / ln(2.0)")).as("exposure_bits"))
        .orderBy($"canary")
  }

  val qCanaryExposure = GraftQuery(
    "q_canary_exposure",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.spread(Tables.documents(spark, dir))
      val gramOcc = docs
        .select(explode(call_function("word_shingles_all", $"text",
          lit(CanaryN))).as("canary"))
        .groupBy($"canary").agg(count(lit(1)).as("occ"))
      // vocab-sized; feeds the LM, the ranked vocab AND the size scalar —
      // persist so the corpus term exchange runs once (q_dsir discipline)
      val cf = docs
        .select(explode(graft.functions.Text.tokens($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("cf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      canaryExposureOf(gramOcc, cf)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(lower(text), '[[:space:]]+') AS ws
        FROM documents),
      grams AS (
        SELECT unnest([array_to_string(ws[i:i+${CanaryN - 1}], ' ')
                for i in range(1, greatest(len(ws) - ${CanaryN - 2}, 1))])
          AS canary
        FROM toks),
      canaries AS (
        SELECT canary FROM (
          SELECT canary, count(*) AS occ FROM grams GROUP BY canary)
        WHERE occ = 1 ORDER BY canary LIMIT $CanaryCount),
      cf AS (
        SELECT term, count(*) AS cf
        FROM (SELECT unnest(ws) AS term FROM toks) GROUP BY term),
      tot AS (SELECT sum(cf) AS tot FROM cf),
      lm AS (SELECT term, ln(tot::DOUBLE / cf::DOUBLE) AS s
             FROM cf CROSS JOIN tot),
      vocab AS (SELECT term, row_number() OVER (ORDER BY term) AS rnk
                FROM cf),
      vsize AS (SELECT count(*) AS v FROM cf),
      cscore AS (
        SELECT canary, ${Oracle.dsum("s")} AS nll
        FROM (SELECT canary, unnest(string_split(canary, ' ')) AS term
              FROM canaries)
        JOIN lm USING (term) GROUP BY canary),
      picks AS (
        SELECT j, pos,
          ${PipelineOps.u32Sql(
            "'canary:' || CAST(j AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")}
            % v + 1 AS rnk
        FROM (SELECT unnest(range(0, $CanaryDecoys)) AS j)
        CROSS JOIN (SELECT unnest(range(0, $CanaryN)) AS pos)
        CROSS JOIN vsize),
      dscore AS (
        SELECT j, ${Oracle.dsum("s")} AS dnll
        FROM picks JOIN vocab USING (rnk) JOIN lm USING (term)
        GROUP BY j),
      ranked AS (
        SELECT canary, nll,
          1 + sum(CASE WHEN dnll < nll THEN 1 ELSE 0 END)::BIGINT
            AS cand_rank
        FROM cscore CROSS JOIN dscore GROUP BY canary, nll)
      SELECT canary, nll, cand_rank,
        ${Oracle.qround(s"(ln(${CanaryDecoys + 1}.0) - " +
          "ln(CAST(cand_rank AS DOUBLE))) / ln(2.0)")} AS exposure_bits
      FROM ranked
      ORDER BY canary""")
  )

  val all: Seq[GraftQuery] =
    Seq(qRepetitionStats, qRedactPii, qContamination, qBloomContamination,
      qLengthHistogram, qSourceOverlap, qBoilerplateRate,
      qMemorizationNgrams, qGopherRules, qNgramNovelty, qFilterAblation,
      qCanaryExposure)
}
