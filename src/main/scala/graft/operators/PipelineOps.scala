package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data-pipeline operators beyond the reference's surface: the
  * corpus-preparation steps a 100 TB pretraining pipeline runs between "raw
  * documents" and "training batches" — deterministic sampling / data mixing,
  * text normalization, sequence packing, and a reproducible corpus shuffle.
  *
  * All four are oracle-checkable because every pseudo-random decision is an
  * md5 derivation shared byte-for-byte with DuckDB — no engine-private RNG
  * (`rand()` / `sample()`) appears anywhere in the verified surface.
  */
object PipelineOps {

  /** Per-language sampling rates (data-mixing weights). Thresholds are exact
    * integers against a 32-bit hash so both engines compare identically:
    * keep doc iff u32(md5(doc_id)) < rate · 2³². */
  val SampleRates: Seq[(String, Double)] = Seq(
    "en" -> 0.75, "zh" -> 0.50, "de" -> 0.50, "es" -> 0.25, "fr" -> 0.25)

  private val TwoPow32 = 4294967296L
  private[operators] def thresholds: Seq[(String, Long)] =
    SampleRates.map { case (l, r) => l -> (r * TwoPow32).toLong }

  /** u32(md5(e)) — the deterministic 32-bit hash EVERY sampling/splitting
    * decision in this file derives from; `e` is a SQL string expression.
    * One definition per engine so the sites can never drift apart.
    * (graft-wide: IngestHub derives the shared split bucket with it.) */
  private[graft] def u32Expr(e: String): String =
    s"cast(conv(substr(md5($e), 1, 8), 16, 10) as bigint)"
  private[operators] def u32Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"

  private[operators] def thresholdsSql: String =
    thresholds.map { case (l, t) => s"('$l', $t)" }
      .mkString("(VALUES ", ", ", ") AS rates(lang, thr)")

  /** Deterministic stratified sampling — the data-mixing primitive: each
    * language is downsampled to its mixing weight by hashing the STABLE key
    * (doc_id), not by `rand()`. Same rows on every run, every engine, any
    * partitioning; adding executors cannot change the sample.
    *
    * Scale shape: map-only — the rates relation is a broadcast of 5 rows and
    * the hash-compare is per-row codegen; the only cost beyond the scan is
    * the output ORDER BY. */
  val qStratifiedSample = GraftQuery(
    "q_stratified_sample",
    (spark, dir) => {
      import spark.implicits._
      val rates = thresholds.toDF("lang", "thr")
      Tables.documents(spark, dir)
        .withColumn("u32", expr(u32Expr("cast(doc_id as string)")))
        .join(broadcast(rates), Seq("lang"))
        .filter($"u32" < $"thr")
        .select($"doc_id", $"lang", $"u32")
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, lang,
        ${u32Sql("CAST(doc_id AS VARCHAR)")} AS u32
      FROM documents
      JOIN $thresholdsSql USING (lang)
      WHERE ${u32Sql("CAST(doc_id AS VARCHAR)")} < thr
      ORDER BY doc_id""")
  )

  /** Tokens per context window when packing documents back-to-back. */
  val PackSize = 512

  /** Sequence packing: assign each document to its context-window id and
    * in-window offset by cumulative token count, per language partition —
    * the "concatenate and chop into 512-token windows" step of a training
    * pipeline, expressed as a running-sum window (each doc's pack is decided
    * by the tokens BEFORE it; long docs spill into subsequent windows, which
    * the consumer handles by reading offset + n_tokens).
    *
    * Scale shape: the cumulative sum partitions by `lang`, so parallelism =
    * number of strata. That is the honest shape of any order-dependent
    * packing; for a single giant stratum the standard two-phase prefix-sum
    * (per-partition partials, broadcast offsets) applies — here each stratum
    * already fits one task's streaming window pass. */
  /** Shared packing assignment — (doc_id, lang, text, n_tokens, cum_before,
    * pack_id) — used by BOTH q_pack_sequences and q_chunk_assembly so the
    * pack boundaries can never desynchronize between them. Tokenization is
    * `Text.tokens` (the engine-wide rule), matching [[packedSql]] exactly on
    * any corpus. */
  /** THE stratified budget-assignment scheme — one copy of the boundary
    * math for every consumer (token packing here, byte shard planning in
    * multimodal.Media): within each stratum, in stable id order, annotate
    * each row with the running value-sum BEFORE it (`cum_before`) and the
    * integer-division bucket `cum_before div budget`. Block-layout
    * semantics: a row whose value overruns the budget STRADDLES into the
    * next bucket (consumers read offset + value), exactly like sequences
    * straddling context windows in LLM packing — this is deliberately NOT
    * whole-object greedy packing, which has no closed prefix-sum form. */
  private[graft] def prefixDivAssign(df: org.apache.spark.sql.DataFrame,
      stratum: String, id: String, value: String, budget: Long,
      bucketCol: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col(stratum)).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum(col(value)).over(w), lit(0L)))
      .withColumn(bucketCol, expr(s"cum_before div $budget"))
  }

  private def packAssign(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    prefixDivAssign(
      Tables.documents(spark, dir)
        .select($"doc_id", $"lang", $"text",
          size(graft.functions.Text.tokens($"text")).cast(LongType).as("n_tokens")),
      "lang", "doc_id", "n_tokens", PackSize, "pack_id")
  }

  /** DuckDB twin of [[packAssign]]: a relation with the same columns. */
  private def packedSql: String = s"""
        SELECT doc_id, lang, text, n_tokens, cum_before,
          cum_before // $PackSize AS pack_id
        FROM (
          SELECT doc_id, lang, text, n_tokens,
            coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
              AS cum_before
          FROM (SELECT doc_id, lang, text,
                  len(string_split_regex(lower(text), '[[:space:]]+'))::BIGINT AS n_tokens
                FROM documents))"""

  val qPackSequences = GraftQuery(
    "q_pack_sequences",
    (spark, dir) => {
      import spark.implicits._
      packAssign(spark, dir)
        .select($"doc_id", $"lang", $"n_tokens", $"pack_id",
          ($"cum_before" % PackSize).as("pack_offset"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, lang, n_tokens, pack_id,
        cum_before % $PackSize AS pack_offset
      FROM ($packedSql)
      ORDER BY doc_id""")
  )

  /** Text normalization — the standard pre-tokenization scrub: lowercase,
    * non-alphanumerics to spaces, whitespace collapsed, trimmed. Pure
    * per-row codegen'd regex work, map-only. */
  val qNormalizeText = GraftQuery(
    "q_normalize_text",
    (spark, dir) => {
      import spark.implicits._
      val norm = trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " "))
      Tables.documents(spark, dir)
        .select($"doc_id", norm.as("norm_text"),
          length(norm).cast(LongType).as("norm_len"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, norm_text, length(norm_text)::BIGINT AS norm_len
      FROM (
        SELECT doc_id, trim(regexp_replace(
          regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
          ' +', ' ', 'g')) AS norm_text
        FROM documents)
      ORDER BY doc_id""")
  )

  /** Seed for the reproducible corpus shuffle. */
  val ShuffleSeed = 7

  /** Reproducible corpus shuffle for training order: sort by a seeded md5 of
    * the stable key. Changing the seed reshuffles; re-running does not.
    *
    * Scale shape: Spark's ORDER BY is a range-partitioned distributed sort
    * (sampled range boundaries, then per-partition sorts) — the canonical
    * scalable global shuffle; no single-partition window function is
    * involved. */
  val qShuffleOrder = GraftQuery(
    "q_shuffle_order",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id",
          md5(concat(lit(s"$ShuffleSeed:"), $"doc_id".cast(StringType)))
            .as("shuffle_key"))
        .orderBy($"shuffle_key")
    },
    Some(s"""
      SELECT doc_id, md5('$ShuffleSeed:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
      ORDER BY shuffle_key""")
  )

  /** Quality cutoff for the composite prep pipeline (corpus range at
    * sf0.01: 1.20–1.96, median ≈ 1.5). */
  val QualityThreshold = 1.5

  /** The end-to-end corpus-prep composition — what a user of this library
    * actually runs between "raw documents" and "training set": exact-dedup
    * keepers → quality filter → deterministic stratified sample, one
    * DataFrame DAG. Demonstrates that the operator surface composes: one
    * shuffle for the dedup window, everything after is map-side (the rate
    * table broadcasts), and Catalyst prunes the scan to the columns the
    * composition needs. */
  val qCorpusPrep = GraftQuery(
    "q_corpus_prep",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val rates = thresholds.toDF("lang", "thr")
      Tables.documents(spark, dir)
        .withColumn("keep_id",
          min($"doc_id").over(Window.partitionBy(md5($"text"))))
        .filter($"doc_id" === $"keep_id")
        .withColumn("quality", TextAnalytics.qualityCol)
        .filter($"quality" >= QualityThreshold)
        .withColumn("u32", expr(u32Expr("cast(doc_id as string)")))
        .join(broadcast(rates), Seq("lang"))
        .filter($"u32" < $"thr")
        .select($"doc_id", $"lang", $"quality")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH keepers AS (
        SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM documents),
      scored AS (
        SELECT doc_id, lang, ${TextAnalytics.qualitySqlExpr} AS quality
        FROM keepers
        WHERE doc_id = keep_id)
      SELECT doc_id, lang, quality
      FROM scored
      JOIN $thresholdsSql USING (lang)
      WHERE quality >= $QualityThreshold
        AND ${u32Sql("CAST(doc_id AS VARCHAR)")} < thr
      ORDER BY doc_id""")
  )

  /** Per-stratum selection size. */
  val TopPerLang = 20

  /** Training-data selection: the top-k documents per language by quality
    * score (ties: doc_id asc) — "take the best N per stratum", the selection
    * primitive quality-filtered corpora are built with.
    *
    * Scale shape: rank is a per-stratum window (one hash exchange on
    * `lang`, in-partition sort); with k ≪ stratum size the post-filter
    * discards most rows immediately after ranking. The quality expression
    * itself is per-row codegen. */
  val qTopQualityPerLang = GraftQuery(
    "q_top_quality_per_lang",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      Tables.documents(spark, dir)
        .select($"doc_id", $"lang", TextAnalytics.qualityCol.as("quality"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"lang").orderBy($"quality".desc, $"doc_id")))
        .filter($"rk" <= TopPerLang)
        .select($"doc_id", $"lang", $"quality", $"rk".cast(LongType).as("rk"))
        .orderBy($"lang", $"rk")
    },
    Some(s"""
      SELECT doc_id, lang, quality, rk
      FROM (
        SELECT doc_id, lang, quality,
          row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id)
            AS rk
        FROM (SELECT doc_id, lang, ${TextAnalytics.qualitySqlExpr} AS quality
              FROM documents))
      WHERE rk <= $TopPerLang
      ORDER BY lang, rk""")
  )

  /** Deterministic train/val/test assignment: bucket = u32(md5("split:" ||
    * doc_id)) mod 10 → 0-7 train, 8 val, 9 test. Hash-of-stable-key, like
    * the stratified sampler: the split survives re-runs, repartitioning,
    * engine changes, and incremental corpus growth (a document's split
    * never changes when others are added — the property date- or
    * position-based splits lack). Map-only. */
  val qTrainSplit = GraftQuery(
    "q_train_split",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .withColumn("bucket",
          expr(u32Expr("concat('split:', cast(doc_id as string))") + " % 10"))
        .withColumn("split",
          when($"bucket" <= 7, "train")
            .when($"bucket" === 8, "val").otherwise("test"))
        .select($"doc_id", $"bucket", $"split")
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, bucket,
        CASE WHEN bucket <= 7 THEN 'train'
             WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id,
              ${u32Sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10 AS bucket
            FROM documents)
      ORDER BY doc_id""")
  )

  /** Chunk assembly — the step after [[qPackSequences]]: materialize each
    * (lang, pack) context window by concatenating its documents in corpus
    * order. Output carries the md5 of the packed text (not the text) so the
    * verified result stays small while still pinning every byte.
    *
    * Scale shape: one hash exchange on (lang, pack_id) with the per-group
    * collect bounded by PackSize tokens per window — groups are
    * constant-sized by construction, so the collect_list can never blow a
    * task (the property that makes per-group array assembly safe here and
    * unsafe in general). */
  val qChunkAssembly = GraftQuery(
    "q_chunk_assembly",
    (spark, dir) => {
      import spark.implicits._
      packAssign(spark, dir)
        .groupBy($"lang", $"pack_id")
        .agg(count(lit(1)).as("n_docs"),
          md5(array_join(transform(
            array_sort(collect_list(struct($"doc_id", $"text"))),
            s => s.getField("text")), " ")).as("chunk_md5"))
        .orderBy($"lang", $"pack_id")
    },
    Some(s"""
      SELECT lang, pack_id, count(*) AS n_docs,
        md5(string_agg(text, ' ' ORDER BY doc_id)) AS chunk_md5
      FROM ($packedSql)
      GROUP BY lang, pack_id
      ORDER BY lang, pack_id""")
  )

  /** Tokens per context-window chunk for q_doc_chunks. */
  val ChunkTokens = 32

  /** Fixed-size context chunking — the other half of sequence packing:
    * q_pack_sequences/q_chunk_assembly pack SHORT docs up to a token budget;
    * this SPLITS each document into non-overlapping `ChunkTokens`-token
    * windows (trailing partial kept, so concatenating a doc's chunks in
    * chunk_idx order reproduces it losslessly). The chunker is the native
    * codegen `word_chunks` expression — one tight loop per row, no
    * interpreted higher-order functions.
    *
    * Scale shape: map-side only (scan → chunk → posexplode); output grows by
    * the chunk factor but no shuffle exists except the oracle-grade final
    * ORDER BY. At 100 TB this is the shape you want: chunking parallelizes
    * per input split with zero coordination. */
  val qDocChunks = GraftQuery(
    "q_doc_chunks",
    (spark, dir) => {
      import spark.implicits._
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id",
          posexplode(graft.functions.F.wordChunks($"text", ChunkTokens)))
        .select($"doc_id", $"pos".cast(LongType).as("chunk_idx"),
          $"col".as("chunk_text"),
          length($"col").cast(LongType).as("chunk_chars"))
        .orderBy($"doc_id", $"chunk_idx")
    },
    // DuckDB twin: zipped unnest of the chunk-index range and the list
    // comprehension that joins each n-token slice (1-based inclusive
    // slicing, so [i : i+n-1]); list lengths agree by construction.
    Some(s"""
      WITH t AS (
        SELECT doc_id,
          string_split_regex(lower(text), '[[:space:]]+') AS ws
        FROM documents)
      SELECT doc_id,
        unnest(range((len(ws) + ${ChunkTokens - 1}) // $ChunkTokens))::BIGINT
          AS chunk_idx,
        unnest([array_to_string(ws[i : i + ${ChunkTokens - 1}], ' ')
                for i in range(1, len(ws) + 1, $ChunkTokens)]) AS chunk_text,
        unnest([length(array_to_string(ws[i : i + ${ChunkTokens - 1}], ' '))
                for i in range(1, len(ws) + 1, $ChunkTokens)])::BIGINT
          AS chunk_chars
      FROM t
      ORDER BY doc_id, chunk_idx""")
  )

  private val HourUs = 3600L * 1000000

  /** Z-order (Morton curve) layout key over (user_id, hour): the
    * space-filling-curve sort that makes a table clustered for BOTH
    * per-user and per-time range scans at once — what Delta/Iceberg OPTIMIZE
    * ZORDER does before writing files. The key is the native codegen
    * `zorder2` bit-interleave (map-side, one tight loop); at 100 TB the only
    * distributed work is the final range-partitioned sort, which a rewrite
    * job needs anyway to lay files out. Readers then prune files on either
    * dimension: rows close in (user, hour) are close in z, so min/max file
    * stats stay tight.
    *
    * Both dimensions are bucketed below 2^21 EXPLICITLY (zorder2's input
    * contract) so the quantization decision lives in the query, visible to
    * the oracle — not in zorder2's silent bit truncation. `% 2^21` is the
    * identity on this data (dense user ids, epoch-hours < 2^21 until
    * year 2209); a corpus with wider ids would pick its own bucketing
    * here, and a missed one now fails loudly in review rather than
    * degrading the clustering invisibly. */
  val qZorderLayout = GraftQuery(
    "q_zorder_layout",
    (spark, dir) => {
      import spark.implicits._
      val m = 1L << 21
      Tables.events(spark, dir)
        .withColumn("hr", expr(s"ts_us div $HourUs"))
        .select($"event_id", $"user_id", $"hr",
          graft.functions.F.zorder2($"user_id" % m, $"hr" % m).as("z"))
        .orderBy($"z", $"event_id")
    },
    Some(s"""
      SELECT event_id, user_id, hr,
        list_sum([((((user_id % ${1L << 21}) >> i) & 1) << (2*i))
                  + ((((hr % ${1L << 21}) >> i) & 1) << (2*i+1))
                  for i in range(21)])::BIGINT AS z
      FROM (SELECT event_id, user_id, epoch_us(ts) // $HourUs AS hr FROM events)
      ORDER BY z, event_id""")
  )

  /** Quality quartiles per language (ntile ranking window): the curriculum /
    * quality-mix report — how many docs and what mean quality in each
    * quarter of the per-language quality distribution. Uses the ONE shared
    * quality definition (TextAnalytics.qualityCol). ntile is exact and
    * needs a per-language sort, fine while the heaviest language fits a
    * sort spill; the 100 TB variant swaps ntile for bucketing against
    * `approx_percentile` cutpoints (same output schema), trading exactness
    * at the boundaries for a map-only second pass. */
  val qQualityQuartiles = GraftQuery(
    "q_quality_quartiles",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"lang").orderBy($"quality".desc, $"doc_id")
      Tables.documents(spark, dir)
        .select($"doc_id", $"lang", TextAnalytics.qualityCol.as("quality"))
        .withColumn("quartile", ntile(4).over(w).cast(LongType))
        .groupBy($"lang", $"quartile")
        .agg(count(lit(1)).as("n_docs"),
          graft.functions.Det.davg($"quality").as("avg_quality"))
        .orderBy($"lang", $"quartile")
    },
    Some(s"""
      WITH q AS (
        SELECT doc_id, lang, ${TextAnalytics.qualitySqlExpr} AS quality
        FROM documents),
      t AS (
        SELECT lang, quality,
          ntile(4) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id)::BIGINT
            AS quartile
        FROM q)
      SELECT lang, quartile, count(*) AS n_docs,
        ${graft.Oracle.davg("quality")} AS avg_quality
      FROM t GROUP BY lang, quartile
      ORDER BY lang, quartile""")
  )

  /** Distribution ranking windows: every document's percent_rank and
    * cume_dist within its language's quality distribution — the
    * continuous-rank complement of [[qQualityQuartiles]]'s ntile buckets
    * (curriculum ordering wants the exact percentile position, not just the
    * quarter). The window order carries a doc_id tiebreak so ranks are
    * total and both engines compute identical (rank−1)/(n−1) and rank/n
    * quotients — pure integer-derived doubles, qround-pinned. One
    * lang-partitioned sort, same shape (and same caveat: the 100 TB
    * variant ranks against approx_percentile cutpoints instead of sorting
    * every partition exactly). */
  val qRankWindows = GraftQuery(
    "q_rank_windows",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"lang").orderBy($"quality".desc, $"doc_id")
      Tables.documents(spark, dir)
        .select($"doc_id", $"lang", TextAnalytics.qualityCol.as("quality"))
        .select($"doc_id", $"lang", $"quality",
          graft.functions.Det.qround(percent_rank().over(w)).as("pct_rank"),
          graft.functions.Det.qround(cume_dist().over(w)).as("cume"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH q AS (
        SELECT doc_id, lang, ${TextAnalytics.qualitySqlExpr} AS quality
        FROM documents)
      SELECT doc_id, lang, quality,
        ${graft.Oracle.qround(
          "percent_rank() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id)")}
          AS pct_rank,
        ${graft.Oracle.qround(
          "cume_dist() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id)")}
          AS cume
      FROM q
      ORDER BY doc_id""")
  )

  /** JSONL export manifest — the last step before training: each document
    * rendered as one compact JSON line (`to_json(struct(...))`, the shape a
    * `.write.text` JSONL dump serializes). The verified surface exports a
    * MANIFEST (ids, lang, source, length, content md5) rather than raw
    * text, so the oracle can rebuild the byte-exact line by concatenation —
    * Spark's `to_json` emits `{"k":v,...}` with no whitespace, struct-field
    * order, and no escaping needed for these fields (`lang`/`source` are
    * plain alphanumerics in the driver corpus; raw-text escaping is
    * engine-private and stays off the oracle path).
    *
    * Scale shape: map-only projection over the pruned scan plus the output
    * sort — the export itself is embarrassingly parallel. */
  val qJsonlExport = GraftQuery(
    "q_jsonl_export",
    (spark, dir) => {
      import spark.implicits._
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id",
          to_json(struct($"doc_id", $"lang", $"source", $"n_chars",
            md5($"text").as("content_md5"))).as("line"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
        '{"doc_id":' || doc_id || ',"lang":"' || lang || '","source":"' ||
        source || '","n_chars":' || n_chars || ',"content_md5":"' ||
        md5(text) || '"}' AS line
      FROM documents
      ORDER BY doc_id""")
  )

  /** Global contiguous id assignment (gid = rank by doc_id, 0-based) — the
    * corpus-prep step that gives every document a dense training-example
    * index. The NAIVE formulation `row_number() OVER (ORDER BY doc_id)` is
    * the canonical scale anti-pattern: an empty window partition spec sends
    * THE WHOLE CORPUS through one task (Spark even warns "No Partition
    * Defined for Window"). This is the two-phase zipWithIndex shape,
    * declaratively: range-partition on the key (so partition p's keys all
    * precede partition p+1's), per-partition local ranks from a
    * PARTITIONED window, per-partition counts rolled into starting offsets
    * by a window over the 32-row partition histogram — bounded by the
    * partition count, not the corpus — and gid = offset + local rank.
    * Output is invariant to where the sampled range boundaries land
    * (offsets absorb any imbalance), so the trivially-sequential oracle
    * reproduces it exactly. */
  val qAssignIds = GraftQuery(
    "q_assign_ids",
    (spark, dir) => {
      import spark.implicits._
      val parts = spark.sparkContext.defaultParallelism
      val ranged = Tables.documents(spark, dir).select($"doc_id")
        .repartitionByRange(parts, $"doc_id")
        .withColumn("pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val offsets = ranged.groupBy($"pid").agg(count(lit(1)).as("cnt"))
        .withColumn("offset", coalesce(
          sum($"cnt").over(Window.orderBy($"pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select($"pid", $"offset")
      ranged
        .withColumn("lrank",
          row_number().over(Window.partitionBy($"pid").orderBy($"doc_id"))
            .cast(LongType))
        .join(broadcast(offsets), Seq("pid"))
        .select($"doc_id", ($"offset" + $"lrank" - 1).as("gid"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, (row_number() OVER (ORDER BY doc_id) - 1)::BIGINT AS gid
      FROM documents
      ORDER BY doc_id""")
  )

  /** Epoch upsampling manifest — the EXECUTION step after
    * [[Profiling.qMixtureWeights]] decides the allocation: each language's
    * repeat ratio `r = alloc / n_tokens` is realized per document as
    * `floor(r)` whole copies plus one fractional copy kept iff
    * `u32(md5('epoch:' || doc_id)) < frac(r)·2³²` — deterministic Bernoulli
    * rounding whose EXPECTED token count per language equals the allocation,
    * with no engine-private RNG. The hash input is salted with `'epoch:'`
    * so the fractional-copy decision is independent of the
    * [[qStratifiedSample]] / [[qTrainSplit]] decisions that hash the bare
    * doc_id (unsalted, a document unlucky in one draw would be unlucky in
    * every draw).
    *
    * Exactness: `alloc` and `n_tokens` are exact BIGINTs, so `r` is ONE
    * IEEE double quotient, `floor(r)` is exact, `r − floor(r)` and the
    * `·2³²` threshold are single IEEE ops — every engine computes the same
    * copy count by definition.
    *
    * Scale shape: the per-language ratio relation is language-count-sized
    * and BROADCAST onto the corpus; the manifest itself is one map pass
    * (native `rep_stats` token count + two md5s per row) — the corpus
    * never shuffles except the output sort. */
  /** The per-language (lang, n_tokens, r) epoch-rate relation — the
    * sqrt-temperature budget allocation as fractional epochs per
    * document. Shared by [[qEpochPlan]] (which materializes per-doc copy
    * counts from it) and [[qEpochDecay]] (which prices the repetition). */
  private[graft] def epochRates(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val per = Tables.spread(Tables.documents(spark, dir))
      .select($"lang",
        element_at(call_function("rep_stats", $"text"), 1).as("n_toks"))
      .groupBy($"lang").agg(sum($"n_toks").as("n_tokens"))
    val tot = per.agg(
      sum(sqrt($"n_tokens".cast(DoubleType)).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("tot_sqrt"))
    val weight = graft.functions.Det.qround(
      sqrt($"n_tokens".cast(DoubleType)) / $"tot_sqrt")
    per.crossJoin(broadcast(tot))
      .select($"lang", $"n_tokens",
        (floor(weight * lit(Profiling.MixtureBudget.toDouble))
          .cast(DoubleType) / $"n_tokens".cast(DoubleType)).as("r"))
  }

  /** The shared epoch-rate prelude as DuckDB CTEs ending in `rat`
    * (lang, n_tokens, r) — the oracle twin of [[epochRates]]. */
  private[graft] val EpochRateSql: String = s"""
      toks AS (
        SELECT doc_id, lang,
          len(string_split_regex(lower(text), '[[:space:]]+')) AS n_toks
        FROM documents),
      per AS (
        SELECT lang, sum(n_toks)::BIGINT AS n_tokens FROM toks GROUP BY lang),
      tot AS (
        SELECT sum(CAST(sqrt(n_tokens::DOUBLE) AS DECIMAL(38,12)))::DOUBLE
          AS tot_sqrt
        FROM per),
      rat AS (
        SELECT lang, n_tokens,
          floor((${graft.Oracle.qround("sqrt(n_tokens::DOUBLE) / tot_sqrt")})
              * ${Profiling.MixtureBudget}e0)
            / n_tokens::DOUBLE AS r
        FROM per CROSS JOIN tot)"""

  val qEpochPlan = GraftQuery(
    "q_epoch_plan",
    (spark, dir) => {
      import spark.implicits._
      val ratio = epochRates(spark, dir).select($"lang", $"r")
      Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id", $"lang",
          element_at(call_function("rep_stats", $"text"), 1).as("n_doc_tokens"),
          expr(u32Expr("concat('epoch:', cast(doc_id as string))")).as("u32"))
        .join(broadcast(ratio), Seq("lang"))
        .select($"doc_id", $"lang", $"n_doc_tokens",
          (floor($"r") +
            when($"u32" < floor(($"r" - floor($"r")) * lit(TwoPow32.toDouble))
              .cast(LongType), 1L).otherwise(0L)).as("n_copies"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH ${EpochRateSql}
      SELECT doc_id, lang, n_toks::BIGINT AS n_doc_tokens,
        (floor(r) + CASE
          WHEN ${u32Sql("'epoch:' || doc_id::VARCHAR")}
               < floor((r - floor(r)) * ${TwoPow32}e0)
          THEN 1 ELSE 0 END)::BIGINT AS n_copies
      FROM toks JOIN rat USING (lang)
      ORDER BY doc_id""")
  )

  /** Repeated-data decay constant — Muennighoff et al. 2023
    * ("Scaling Data-Constrained Language Models") fit R_D* ≈ 15.4: the
    * effective tokens of r planned epochs over U unique tokens are
    * U·(1 + R*·(1−e^{−(r−1)/R*})) — reducing to U at r = 1 and
    * saturating at U·(1+R*) as r → ∞ (the implemented form, both
    * engines); a LITERAL so both engines compare identically. */
  val EpochRStar: Double = 15.4

  /** Data-constrained repetition pricing for the epoch plan — per
    * language, the EFFECTIVE token count of the planned allocation under
    * the Muennighoff et al. 2023 repeated-data decay: a language planned
    * at r ≤ 1 epochs contributes its planned tokens at full value; one
    * planned at r > 1 contributes U + U·R*·(1−e^{−(r−1)/R*}) — the
    * diminishing value of repetition — and `efficiency` =
    * effective/planned is the number a budget owner reads before buying
    * more epochs of a small language instead of more data ("the 5th
    * epoch of fr buys 62% of a fresh-token epoch"). Rides the SAME
    * allocation relation as q_epoch_plan ([[epochRates]]), so the plan
    * and its pricing can never disagree.
    *
    * Exactness: r and U are the shared deterministic relation; exp runs
    * on the same IEEE double in both engines; outputs qround'd. Scale
    * shape: one corpus pass to per-lang token counts (shared), then
    * ≤|langs| rows of arithmetic. */
  val qEpochDecay = GraftQuery(
    "q_epoch_decay",
    (spark, dir) => {
      import spark.implicits._
      val rs = EpochRStar
      epochRates(spark, dir)
        .withColumn("planned",
          $"r" * $"n_tokens".cast(DoubleType))
        .withColumn("effective",
          when($"r" <= 1.0, $"planned").otherwise(
            $"n_tokens".cast(DoubleType) * (lit(1.0) + lit(rs) *
              (lit(1.0) - exp(-($"r" - lit(1.0)) / lit(rs))))))
        .select($"lang", $"n_tokens".as("unique_tokens"),
          graft.functions.Det.qround($"r").as("epochs"),
          graft.functions.Det.qround($"planned").as("planned_tokens"),
          graft.functions.Det.qround($"effective").as("effective_tokens"),
          graft.functions.Det.qround($"effective" / $"planned")
            .as("efficiency"))
        .orderBy($"lang")
    },
    Some(s"""
      WITH ${EpochRateSql},
      pr AS (
        SELECT lang, n_tokens, r,
          r * n_tokens::DOUBLE AS planned,
          CASE WHEN r <= 1.0 THEN r * n_tokens::DOUBLE
            ELSE n_tokens::DOUBLE * (1.0 + $EpochRStar *
              (1.0 - exp(-(r - 1.0) / $EpochRStar)))
          END AS effective
        FROM rat)
      SELECT lang, n_tokens AS unique_tokens,
        ${graft.Oracle.qround("r")} AS epochs,
        ${graft.Oracle.qround("planned")} AS planned_tokens,
        ${graft.Oracle.qround("effective")} AS effective_tokens,
        ${graft.Oracle.qround("effective / planned")} AS efficiency
      FROM pr
      ORDER BY lang""")
  )

  /** Sample size per language stratum for [[qWeightedSample]]. */
  val WeightedPerLang = 15

  /** Quality-weighted sampling WITHOUT replacement, per language —
    * distributed Efraimidis–Spirakis (2006) A-ES: every document draws the
    * key `ln(u) / w` (u = salted-md5 uniform in (0,1], w = the shared
    * quality score) and each stratum keeps its [[WeightedPerLang]] largest
    * keys. Inclusion probability is proportional to weight, the selection
    * is a true sample without replacement, and — unlike sequential weighted
    * reservoirs — the top-k-by-key formulation is embarrassingly parallel:
    * partial top-k per partition, merge at the exchange (exactly Spark's
    * WindowGroupLimit shape, shared with [[qTopQualityPerLang]]). The
    * [[qStratifiedSample]] complement: that query realizes FIXED per-stratum
    * rates; this one realizes per-DOCUMENT weights.
    *
    * Exactness: u = (u32+1)/2³² is an exact binary fraction (dividend ≤ 2³²
    * exactly representable, divisor a power of two), `ln` over the same
    * double is bit-identical across engines (the q_unigram_surprisal
    * precedent), w is the 6-dp-rounded shared quality score (> 0 by
    * construction — its log-length term alone is ≥ 0.3·ln 2), and the key
    * is ONE IEEE division — so both engines rank identical keys. Ties
    * cannot occur between distinct u (ln is injective) but the order
    * pins (key, doc_id) anyway.
    *
    * Scale shape: map-only scoring (two md5s + the quality projection per
    * row), per-stratum top-k with partial WindowGroupLimit before the one
    * lang exchange — the corpus never fully sorts. */
  val qWeightedSample = GraftQuery(
    "q_weighted_sample",
    (spark, dir) => {
      import spark.implicits._
      val u = (expr(u32Expr("concat('ws:', cast(doc_id as string))")) + 1L)
        .cast(DoubleType) / lit(TwoPow32.toDouble)
      val key = log(u) / TextAnalytics.qualityCol
      val w = Window.partitionBy($"lang").orderBy($"es_key".desc, $"doc_id")
      Tables.documents(spark, dir)
        .select($"doc_id", $"lang",
          TextAnalytics.qualityCol.as("quality"), key.as("es_key"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= WeightedPerLang)
        .select($"doc_id", $"lang", $"quality",
          graft.functions.Det.qround($"es_key").as("es_key"),
          $"rk".cast(LongType).as("rk"))
        .orderBy($"lang", $"rk")
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, lang,
          ${TextAnalytics.qualitySqlExpr} AS quality,
          ln((${u32Sql("'ws:' || doc_id::VARCHAR")} + 1)::DOUBLE
             / ${TwoPow32}e0)
            / (${TextAnalytics.qualitySqlExpr}) AS es_key
        FROM documents),
      ranked AS (
        SELECT doc_id, lang, quality, es_key,
          row_number() OVER (PARTITION BY lang
            ORDER BY es_key DESC, doc_id) AS rk
        FROM scored)
      SELECT doc_id, lang, quality,
        ${graft.Oracle.qround("es_key")} AS es_key, rk::BIGINT AS rk
      FROM ranked
      WHERE rk <= $WeightedPerLang
      ORDER BY lang, rk""")
  )

  /** Length-bucket boundaries for [[qLengthBuckets]] — powers of two from
    * 16 to 4096 (the fixed context lengths a batching system pads to).
    * The SAME Seq generates both the Spark `when` chain and the oracle's
    * CASE, so a boundary change cannot desync the engines. Documents longer
    * than the last boundary clamp into it (upstream chunking — q_doc_chunks
    * — guarantees ≤ context length in a real pipeline). */
  val PadBuckets: Seq[Long] = Seq(16, 32, 64, 128, 256, 512, 1024, 2048, 4096)

  /** Padding-waste audit for length-bucketed batch assembly: each document
    * is padded up to the smallest power-of-two bucket that holds it, and the
    * per-bucket waste ratio (padded tokens that carry no content) is what a
    * batching scheme trades against bucket-count overhead. The standard
    * sizing query behind dynamic batching / bucketed samplers: too few
    * buckets → waste; too many → tiny batches.
    *
    * Exactness: bucket assignment and token sums are pure integer
    * arithmetic; the waste ratio is one qround'd double quotient.
    *
    * Scale shape: map-only bucket assignment (a literal `when` chain —
    * no join, no distinct-collect), one partial+final aggregate on the
    * ≤|PadBuckets| bucket key. */
  val qLengthBuckets = GraftQuery(
    "q_length_buckets",
    (spark, dir) => {
      import spark.implicits._
      val n = size(graft.functions.Text.tokens($"text")).cast(LongType)
      val bucket = PadBuckets.init.foldRight(
        lit(PadBuckets.last): org.apache.spark.sql.Column) {
        (b, acc) => when(n <= b, lit(b)).otherwise(acc)
      }
      Tables.documents(spark, dir)
        .select(bucket.as("bucket"), n.as("n_tokens"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sum_tokens"))
        .select($"bucket", $"n_docs", $"sum_tokens",
          ($"bucket" * $"n_docs").as("padded_tokens"),
          graft.functions.Det.qround(lit(1.0) -
            $"sum_tokens".cast(DoubleType) / ($"bucket" * $"n_docs"))
            .as("waste"))
        .orderBy($"bucket")
    },
    Some(s"""
      WITH d AS (
        SELECT (CASE ${PadBuckets.init.map(b =>
            s"WHEN n_tokens <= $b THEN $b").mkString(" ")}
          ELSE ${PadBuckets.last} END)::BIGINT AS bucket, n_tokens
        FROM (SELECT len(string_split_regex(lower(text), '[[:space:]]+'))::BIGINT
                AS n_tokens FROM documents)),
      agg AS (
        SELECT bucket, count(*) AS n_docs, sum(n_tokens)::BIGINT AS sum_tokens
        FROM d GROUP BY bucket)
      SELECT bucket, n_docs, sum_tokens,
        (bucket * n_docs)::BIGINT AS padded_tokens,
        ${graft.Oracle.qround("1.0 - sum_tokens::DOUBLE / (bucket * n_docs)")} AS waste
      FROM agg
      ORDER BY bucket""")
  )

  /** Per-language quality–length Pareto frontier (2D skyline: minimize
    * n_tokens, maximize quality): the documents for which no other document
    * of the same language is both no-longer AND no-worse (strictly better in
    * at least one dimension). The data-selection view of "best value per
    * token" — the frontier is the efficient set when a token budget trades
    * off against the shared quality score; everything under the staircase is
    * dominated. Equal-quality ties at the same length are all kept (neither
    * dominates); a doc whose quality merely EQUALS a strictly-shorter doc's
    * is dominated (the shorter one is strictly better on length).
    *
    * Scale shape: the skyline is computed on the per-(lang, n_tokens)
    * max-quality AGGREGATE — one partial+final exchange over the corpus,
    * after which the relation is (langs × distinct lengths) rows, bounded by
    * the max document length, not the corpus. The prefix-max window runs
    * over that bounded relation, and the winning (lang, length, quality)
    * triples broadcast back onto the corpus scan to recover every frontier
    * document. No corpus-sized window, no pair join (the naive NOT EXISTS
    * dominance check is O(n²)). */
  val qParetoFront = GraftQuery(
    "q_pareto_front",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
        .select($"doc_id", $"lang",
          size(graft.functions.Text.tokens($"text")).cast(LongType).as("n_tokens"),
          TextAnalytics.qualityCol.as("quality"))
      val byLen = docs.groupBy($"lang", $"n_tokens")
        .agg(max($"quality").as("maxq"))
      val frontier = byLen
        .withColumn("prevq", max($"maxq").over(
          Window.partitionBy($"lang").orderBy($"n_tokens")
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter($"prevq".isNull || $"maxq" > $"prevq")
        .select($"lang", $"n_tokens", $"maxq")
      docs.join(broadcast(frontier), Seq("lang", "n_tokens"))
        .filter($"quality" === $"maxq")
        .select($"doc_id", $"lang", $"n_tokens", $"quality")
        .orderBy($"lang", $"n_tokens", $"doc_id")
    },
    Some(s"""
      WITH docs AS (
        SELECT doc_id, lang,
          len(string_split_regex(lower(text), '[[:space:]]+'))::BIGINT AS n_tokens,
          ${TextAnalytics.qualitySqlExpr} AS quality
        FROM documents),
      bylen AS (
        SELECT lang, n_tokens, max(quality) AS maxq
        FROM docs GROUP BY 1, 2),
      front AS (
        SELECT lang, n_tokens, maxq,
          max(maxq) OVER (PARTITION BY lang ORDER BY n_tokens
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevq
        FROM bylen)
      SELECT doc_id, d.lang, d.n_tokens, quality
      FROM docs d
      JOIN front f ON d.lang = f.lang AND d.n_tokens = f.n_tokens
        AND d.quality = f.maxq
      WHERE prevq IS NULL OR maxq > prevq
      ORDER BY d.lang, d.n_tokens, doc_id""")
  )

  /** Total token budget [[qTokenBudget]] allocates. A production run sets
    * this to the training-run token target; fixed here so the allocation is
    * a deterministic finite computation both engines reproduce. */
  val TokenBudgetT = 1000000L

  /** Integer token-budget allocation across languages by Hamilton's
    * largest-remainder method: each language's ideal share T·nᵢ/N is paid
    * as its floor, and the `T − Σ floor` leftover units go one each to the
    * largest fractional remainders (ties broken by language, so the
    * allocation is total). The result is the UNIQUE integer vector that (a)
    * sums exactly to T and (b) is within 1 token of every ideal share —
    * what a mixture-weighted training run actually needs after
    * q_mixture_weights produces real-valued proportions (naive per-language
    * rounding can miss T by ±|langs|/2 tokens, which a packed dataloader
    * rejects).
    *
    * Exactness: everything is int64 arithmetic on token counts (T·nᵢ stays
    * far below 2^63 for any real corpus shard); no doubles anywhere.
    *
    * Scale shape: ONE map-side `size(split())` projection + one lang
    * aggregate reduces the corpus to |langs| rows; the rank window and the
    * leftover scalar run on that tiny relation (the deliberate
    * SinglePartition window of the q_zipf_fit precedent). */
  /** (lang, n_tokens, base, alloc) — the Hamilton allocation relation,
    * shared by [[qTokenBudget]] (which just orders it) and
    * [[qBudgetSample]] (which realizes it as a document sample). */
  private def tokenBudgetAlloc(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val counts = Tables.spread(Tables.documents(spark, dir))
      .select($"lang",
        size(graft.functions.Text.tokens($"text")).cast(LongType).as("nt"))
      .groupBy($"lang").agg(sum($"nt").as("n_tokens"))
    val tot = counts.agg(sum($"n_tokens").as("n_total"))
    val shares = counts.crossJoin(broadcast(tot))
      .select($"lang", $"n_tokens",
        expr(s"$TokenBudgetT * n_tokens div n_total").as("base"),
        expr(s"($TokenBudgetT * n_tokens) % n_total").as("rem"))
    // |langs|-sized relation: the leftover count and the remainder rank
    // both come from deliberate single-partition windows over it
    val w = Window.orderBy($"rem".desc, $"lang".asc)
    val wAll = Window.orderBy($"rem".desc, $"lang".asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    shares
      .withColumn("rk", row_number().over(w))
      .withColumn("leftover", lit(TokenBudgetT) - sum($"base").over(wAll))
      .select($"lang", $"n_tokens", $"base",
        ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L)).as("alloc"))
  }

  /** The allocation as oracle CTE text ending in
    * `alloc_t(lang, n_tokens, base, alloc)`. */
  private def tokenBudgetCtes: String = s"""
      counts AS (
        SELECT lang,
          sum(len(string_split_regex(lower(text), '[[:space:]]+')))::BIGINT
            AS n_tokens
        FROM documents GROUP BY lang),
      tot AS (SELECT sum(n_tokens)::BIGINT AS n_total FROM counts),
      shares AS (
        SELECT lang, n_tokens,
          ($TokenBudgetT * n_tokens) // n_total AS base,
          ($TokenBudgetT * n_tokens) % n_total AS rem
        FROM counts CROSS JOIN tot),
      ranked AS (
        SELECT lang, n_tokens, base,
          row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk,
          $TokenBudgetT - sum(base) OVER () AS leftover
        FROM shares),
      alloc_t AS (
        SELECT lang, n_tokens, base::BIGINT AS base,
          (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS alloc
        FROM ranked)"""

  val qTokenBudget = GraftQuery(
    "q_token_budget",
    (spark, dir) => tokenBudgetAlloc(spark, dir).orderBy(col("lang")),
    Some(s"""
      WITH $tokenBudgetCtes
      SELECT lang, n_tokens, base, alloc FROM alloc_t ORDER BY lang""")
  )

  /** Realize the token-budget allocation as an actual document sample: per
    * language, documents enter in salted-hash order ('budget:' salt —
    * decorrelated from every other sampling/split decision, the
    * q_epoch_plan discipline) and the MAXIMAL PREFIX whose running token
    * total fits the language's alloc is kept (cum is monotone, so the keep
    * set is exactly one hash-order prefix — the deterministic dataloader
    * contract: same corpus, same budget → the same document set). Bin-fill
    * refinements (skipping an overshooting doc to admit smaller later
    * ones) are deliberately out: they'd make membership depend on the
    * whole prefix's composition instead of one running total, for at most
    * one extra document per language.
    *
    * Scale shape: one lang-partitioned window (running sum over the hash
    * order) and a broadcast join of the |langs| allocation — no
    * corpus-sized shuffle beyond the one sort-within-lang. */
  val qBudgetSample = GraftQuery(
    "q_budget_sample",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.spread(Tables.documents(spark, dir))
        .select($"lang", $"doc_id",
          size(graft.functions.Text.tokens($"text")).cast(LongType).as("n_tokens"),
          expr(u32Expr("concat('budget:', cast(doc_id as string))")).as("ord"))
      val w = Window.partitionBy($"lang").orderBy($"ord".asc, $"doc_id".asc)
      docs
        .withColumn("cum", sum($"n_tokens").over(w))
        .join(broadcast(tokenBudgetAlloc(spark, dir).select($"lang", $"alloc")),
          Seq("lang"))
        .filter($"cum" <= $"alloc")
        .select($"lang", $"doc_id", $"n_tokens", $"cum")
        .orderBy($"lang", $"cum")
    },
    Some(s"""
      WITH $tokenBudgetCtes,
      docs AS (
        SELECT lang, doc_id,
          len(string_split_regex(lower(text), '[[:space:]]+'))::BIGINT AS n_tokens,
          ${u32Sql("'budget:' || CAST(doc_id AS VARCHAR)")} AS ord
        FROM documents),
      c AS (
        SELECT lang, doc_id, n_tokens,
          sum(n_tokens) OVER (PARTITION BY lang ORDER BY ord ASC, doc_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        FROM docs)
      SELECT c.lang, doc_id, c.n_tokens, cum
      FROM c JOIN alloc_t a ON c.lang = a.lang
      WHERE cum <= a.alloc
      ORDER BY c.lang, cum""")
  )

  /** Hash-bucket count for [[qFeatureHash]]. 16 buckets against the
    * fixture's 31-term vocabulary GUARANTEES collisions (pigeonhole), so
    * the collision accounting below is non-vacuous at every SF; a real
    * deployment sets 2^18..2^22 against a multi-million-term vocabulary
    * and reads the same report. */
  val HashBuckets = 16

  /** Feature-hashing (hashing-trick) audit — the featurizer behind
    * fastText/VW-style linear models and the n-gram side of quality
    * classifiers: every corpus term is hashed into [[HashBuckets]] slots
    * (the same portable u32(md5) both engines share), and the report
    * quantifies what the trick costs on THIS corpus: how many buckets
    * load, the worst bucket's term count, how much of the vocabulary and
    * — the number that matters — how much of the TOKEN MASS collides
    * (shares a slot with a different term and so becomes inseparable to
    * a downstream linear model).
    *
    * Scale shape: one (term) exchange builds the tf relation, the bucket
    * assignment is map-side arithmetic on it, and the ≤B-row bucket
    * relation feeds one global aggregate — the corpus never shuffles
    * twice; at 100 TB the only state is vocabulary-sized. */
  val qFeatureHash = GraftQuery(
    "q_feature_hash",
    (spark, dir) => {
      import spark.implicits._
      val tf = Tables.spread(Tables.documents(spark, dir))
        .select(explode(graft.functions.Text.tokens($"text")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("tf"))
        .withColumn("bucket", expr(u32Expr("term") + s" % $HashBuckets"))
      val bs = tf.groupBy($"bucket")
        .agg(count(lit(1)).as("k"), sum($"tf").as("mass"))
      bs.agg(sum($"k").as("vocab"), count(lit(1)).as("buckets_used"),
          max($"k").as("max_bucket_terms"),
          coalesce(sum(when($"k" > 1, $"k")), lit(0L)).as("collided_vocab"),
          coalesce(sum(when($"k" > 1, $"mass")), lit(0L)).as("cm"),
          sum($"mass").as("tm"))
        .select(lit(HashBuckets.toLong).as("b"), $"vocab", $"buckets_used",
          $"max_bucket_terms", $"collided_vocab",
          graft.functions.Det.qround(expr("CAST(cm AS DOUBLE) / tm"))
            .as("collided_mass_rate"))
        .orderBy($"vocab")
    },
    Some(s"""
      WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), '[[:space:]]+')) AS term
        FROM documents),
      tf AS (SELECT term, count(*)::BIGINT AS tf FROM toks GROUP BY 1),
      bt AS (SELECT ${u32Sql("term")} % $HashBuckets AS bucket, tf FROM tf),
      bs AS (SELECT bucket, count(*)::BIGINT AS k, sum(tf)::BIGINT AS mass
             FROM bt GROUP BY 1)
      SELECT $HashBuckets::BIGINT AS b, sum(k)::BIGINT AS vocab,
        count(*)::BIGINT AS buckets_used, max(k)::BIGINT AS max_bucket_terms,
        coalesce(sum(k) FILTER (WHERE k > 1), 0)::BIGINT AS collided_vocab,
        ${graft.Oracle.qround(
          "coalesce(sum(mass) FILTER (WHERE k > 1), 0)::DOUBLE / sum(mass)")}
          AS collided_mass_rate
      FROM bs ORDER BY vocab""")
  )

  /** Skip-gram window (context positions per side), subsample threshold
    * (word2vec's t), and the readout cut. */
  val SgWindow = 2
  val SgT = 0.001
  val SgTopK = 100

  /** Skip-gram training-pair generation with frequency subsampling — the
    * word2vec/fastText data-prep step (Mikolov et al. 2013) as a
    * relational pipeline: tokens are DOWNSAMPLED by corpus frequency
    * (keep an occurrence with p = (√(f/t)+1)·t/f — frequent words mostly
    * drop, rare words always survive), the kept tokens are re-indexed
    * per document (windows close over removed tokens, the reference
    * implementations' semantics), and (center, context) pairs form
    * within ±[[SgWindow]] of the COMPACTED sequence. The readout is the
    * per-word pair economy — total/kept occurrences, the realized keep
    * rate, and the number of training pairs the word participates in —
    * for the top-[[SgTopK]] pair-mass words: what an embedding team
    * reads to check the subsample threshold before a training run.
    *
    * Determinism: the keep decision hashes (doc_id, pos, word) through
    * the shared u32(md5) (the sampling/splitting house hash), compared
    * against floor(p·2³²) — p is the same IEEE sqrt/÷/× tree in both
    * engines, so the kept set is bit-identical and every output column
    * is an integer (plus one qrounded rate). Scale shape: frequencies
    * are one vocab-sized aggregate joined back on `word` (one exchange);
    * the re-index is a per-document window (one doc_id exchange, ≤doc
    * rows per partition); pair formation is an EQUI-join on (doc_id,
    * ri + δ) over the [[SgWindow]]-exploded kept relation — banded by
    * construction, ≤ 2·W pairs per kept token, never doc². */
  val qSkipgramPairs = GraftQuery(
    "q_skipgram_pairs",
    (spark, dir) => {
      import spark.implicits._
      // eager: the token stream feeds the total, the vocab frequencies AND
      // the subsample filter (three racing consumers re-ran the posexplode
      // pass); freqs is vocab-sized and consumed by the filter join and the
      // final readout join
      val toks = Tables.eager(Tables.spread(Tables.documents(spark, dir))
        .select($"doc_id",
          posexplode(graft.functions.Text.tokens($"text"))
            .as(Seq("pos", "word"))))
      val tot = toks.agg(count(lit(1)).as("tot"))
      val freqs = Tables.eager(toks.groupBy($"word").agg(count(lit(1)).as("cnt")))
      val kept = toks
        .join(freqs, Seq("word"))
        .crossJoin(broadcast(tot))
        .withColumn("f", expr("CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)"))
        .withColumn("pk",
          (sqrt($"f" / lit(SgT)) + lit(1.0)) * (lit(SgT) / $"f"))
        // clamp at 1.0 BEFORE scaling: p >= 1 already means always-keep
        // (floor(2^32) > any u32), and at 100 TB a rare word's unclamped
        // p*2^32 exceeds Long.MaxValue - Spark's floor would saturate
        // while DuckDB's BIGINT cast throws
        .filter(
          expr(u32Expr(
            "concat(cast(doc_id as string), ':', cast(pos as string), ':', word)"))
            < floor(least($"pk", lit(1.0)) * lit(4294967296.0)))
        .select($"doc_id", $"pos", $"word")
      // eager: both self-join sides AND the kept-occurrence readout come
      // off this one windowed relation (unpersisted, the subsample filter
      // pipeline executed once per consumer)
      val seq2 = Tables.eager(kept.withColumn("ri", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"pos")))
        .select($"doc_id", $"ri", $"word"))
      val left = seq2
        .withColumn("d", explode(typedlit((1 to SgWindow).toList)))
        .select($"doc_id", $"word", ($"ri" + $"d").as("rj"))
      val adj = left.join( // equi-join on (doc_id, rj): banded pairs
        seq2.select($"doc_id", $"ri".as("rj"), $"word".as("wr")),
        Seq("doc_id", "rj"))
      val pairs = adj
        .select(explode(array($"word", $"wr")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("n_pairs"))
      // kept occurrences off the cached windowed relation (same rows —
      // the window only appends ri), not a second run of the filter
      val keptOcc = seq2.groupBy($"word").agg(count(lit(1)).as("kept_occ"))
      pairs
        .join(keptOcc, Seq("word"))
        .join(freqs.select($"word", $"cnt".as("total_occ")), Seq("word"))
        .select($"word", $"total_occ", $"kept_occ",
          graft.functions.Det.qround(
            expr("CAST(kept_occ AS DOUBLE) / total_occ")).as("keep_rate"),
          $"n_pairs")
        .orderBy($"n_pairs".desc, $"word")
        .limit(SgTopK)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, unnest(range(len(ws))) AS pos, unnest(ws) AS word
        FROM (SELECT doc_id,
                string_split_regex(lower(text), '[[:space:]]+') AS ws
              FROM documents)),
      tot AS (SELECT count(*)::BIGINT AS tot FROM toks),
      freqs AS (SELECT word, count(*)::BIGINT AS cnt FROM toks GROUP BY word),
      sc AS (
        SELECT t.doc_id, t.pos, t.word,
          CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS f
        FROM toks t JOIN freqs USING (word) CROSS JOIN tot),
      kept AS (
        SELECT doc_id, pos, word FROM sc
        WHERE ${u32Sql(
          "CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR) || ':' || word")}
          < CAST(floor(least((sqrt(f / ${SgT}e0) + 1.0) * (${SgT}e0 / f),
              1.0) * 4294967296.0) AS BIGINT)),
      seq2 AS (
        SELECT doc_id, word,
          row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS ri
        FROM kept),
      adj AS (
        SELECT a.word AS wl, b.word AS wr
        FROM seq2 a
        CROSS JOIN (SELECT unnest(range(1, ${SgWindow + 1})) AS d) ds
        JOIN seq2 b ON b.doc_id = a.doc_id AND b.ri = a.ri + ds.d),
      centers AS (
        SELECT wl AS word FROM adj UNION ALL SELECT wr AS word FROM adj),
      pairs AS (
        SELECT word, count(*)::BIGINT AS n_pairs FROM centers GROUP BY word),
      ko AS (
        SELECT word, count(*)::BIGINT AS kept_occ FROM kept GROUP BY word)
      SELECT p.word, f.cnt AS total_occ, k.kept_occ,
        ${graft.Oracle.qround("CAST(k.kept_occ AS DOUBLE) / f.cnt")}
          AS keep_rate,
        p.n_pairs
      FROM pairs p JOIN ko k USING (word) JOIN freqs f USING (word)
      ORDER BY n_pairs DESC, word LIMIT $SgTopK""")
  )

  /** Minimum quality margin for a preference pair to be marked usable —
    * pairs whose chosen/rejected scores are too close teach a preference
    * model nothing (the standard margin gate in DPO data curation). */
  val PrefMinMargin: Double = 0.5

  /** Preference-pair construction (the DPO/RLHF data-prep step): per
    * stratum — (lang, source) stands in for the prompt key this synthetic
    * corpus doesn't have; with a real prompt id the identical plan applies
    * verbatim — mine the exemplar pair (chosen = highest-quality document,
    * ties to the LOWER doc_id; rejected = lowest, ties to the HIGHER —
    * opposed tie-breaks, so a degenerate all-equal-quality stratum still
    * emits chosen_id ≠ rejected_id rather than pairing a document with
    * itself; its margin is 0, so the kept gate excludes it), report the
    * quality
    * margin, and gate usability at [[PrefMinMargin]] (emitted as a flag,
    * not a filter, so the readout doubles as the margin-distribution
    * audit a curation team reads before training). Singleton strata
    * cannot form a pair and are excluded; the quality score is the ONE
    * shared definition ([[TextAnalytics.qualityCol]]).
    *
    * Exactness: chosen/rejected are total-order picks ((quality desc,
    * doc_id asc) / (quality asc, doc_id desc)) over qround'd scores; the
    * margin is one IEEE subtraction of
    * bit-identical doubles in both engines, so the `kept` comparison can
    * never straddle.
    *
    * Scale shape: ONE (lang, source) exchange — min_by/max_by partial-
    * aggregate map-side (per-group state is two structs), so the corpus
    * never shuffles more than one row per (partition, stratum); output is
    * stratum-bounded. At 100 TB with a prompt-keyed corpus the key count
    * grows but the per-key state does not. */
  /** The readout tail over an aggregated (lang, source, n_docs, ch, rj)
    * relation — shared by [[qPreferencePairs]] and
    * graft.streaming.StreamPref's maintained fold (the chosen/rejected
    * picks are associative total-order extrema, so the per-batch
    * pre-aggregation folds to the identical pair table). */
  private[graft] def prefPairsFrom(grouped: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = grouped.sparkSession
    import spark.implicits._
    grouped
      .filter($"n_docs" >= 2)
      .select($"lang", $"source", $"n_docs",
        $"ch.doc_id".as("chosen_id"), $"ch.q".as("chosen_q"),
        $"rj.doc_id".as("rejected_id"), $"rj.q".as("rejected_q"),
        graft.functions.Det.qround($"ch.q" - $"rj.q").as("margin"),
        ($"ch.q" - $"rj.q" >= PrefMinMargin).as("kept"))
      .orderBy($"lang", $"source")
  }

  /** The per-stratum extrema aggregation over a (lang, source, doc_id, q)
    * relation — the same reduction [[qPreferencePairs]] runs per corpus
    * and StreamPref runs per micro-batch. */
  private[graft] def prefGrouped(scored: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        max_by(struct($"doc_id", $"q"), struct($"q", -$"doc_id"))
          .as("ch"),
        min_by(struct($"doc_id", $"q"), struct($"q", -$"doc_id"))
          .as("rj"))
  }

  val qPreferencePairs = GraftQuery(
    "q_preference_pairs",
    (spark, dir) => {
      import spark.implicits._
      prefPairsFrom(prefGrouped(Tables.documents(spark, dir)
        .select($"lang", $"source", $"doc_id",
          TextAnalytics.qualityCol.as("q"))))
    },
    Some(s"""
      WITH q AS (
        SELECT doc_id, lang, source, ${TextAnalytics.qualitySqlExpr} AS q
        FROM documents),
      c AS (
        SELECT lang, source, doc_id, q,
          row_number() OVER (PARTITION BY lang, source
            ORDER BY q DESC, doc_id) AS rc,
          row_number() OVER (PARTITION BY lang, source
            ORDER BY q ASC, doc_id DESC) AS rr,
          count(*) OVER (PARTITION BY lang, source) AS n_docs
        FROM q),
      ch AS (SELECT lang, source, n_docs, doc_id AS chosen_id,
               q AS chosen_q FROM c WHERE rc = 1),
      rj AS (SELECT lang, source, doc_id AS rejected_id, q AS rejected_q
             FROM c WHERE rr = 1)
      SELECT lang, source, n_docs::BIGINT AS n_docs, chosen_id, chosen_q,
        rejected_id, rejected_q,
        ${graft.Oracle.qround("chosen_q - rejected_q")} AS margin,
        (chosen_q - rejected_q >= $PrefMinMargin) AS kept
      FROM ch JOIN rj USING (lang, source)
      WHERE n_docs >= 2
      ORDER BY lang, source""")
  )

  /** Difficulty deciles / training epochs for [[qCurriculumPlan]]. */
  val CurrQ = 10
  val CurrEpochs = 5

  /** Competence-based curriculum schedule (Platanios et al. 2019 shape):
    * difficulty = per-document mean unigram surprisal (the ONE shared
    * definition, [[LexicalStats.docSurprisal]] — rare-word-dense docs are
    * hard), bucketed into [[CurrQ]] deciles by ntile over the
    * (surprisal, doc_id) total order; the linear competence schedule
    * c(e) = e/E admits buckets b ≤ c(e)·Q at epoch e, so epoch 1 trains
    * on the easiest 20% and epoch [[CurrEpochs]] on everything. Readout
    * per admitted (epoch, bucket): docs, tokens, plus the epoch's
    * cumulative token share — the "how much data does each epoch
    * actually see" table a curriculum run publishes next to its
    * q_epoch_plan.
    *
    * Exactness: ntile is an exact integer over a total order; counts are
    * integers; the share is one qround'd quotient of exact integers.
    *
    * Scale shape: the difficulty relation is the per-doc collapse (one
    * (doc, term) exchange + broadcast LM); the decile assignment is ONE
    * corpus-wide ntile window over the THIN 3-column doc relation (the
    * q_quality_quartiles precedent — a single-partition sort of doc
    * rows, not tokens; at 100 TB this becomes a 2-pass range-partitioned
    * rank, same semantics); the schedule join is a broadcast of the
    * [[CurrEpochs]]-row epoch grid against the [[CurrQ]]-row bucket
    * aggregate. */
  val qCurriculumPlan = GraftQuery(
    "q_curriculum_plan",
    (spark, dir) => {
      import spark.implicits._
      // eager: the CurrQ-row bucket aggregate feeds the grand total AND the
      // epoch join — unpersisted, the whole docSurprisal corpus chain
      // (unigram LM + per-doc rollup + ntile) executed once per consumer
      val buckets = Tables.eager(LexicalStats.docSurprisal(spark, dir)
        .withColumn("bucket", ntile(CurrQ).over(
          Window.orderBy($"mean_surprisal", $"doc_id")))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens")))
      val tot = buckets.agg(sum($"n_tokens").as("tot"))
      val epochs = (1 to CurrEpochs).map(_.toLong).toDF("epoch")
      buckets.join(broadcast(epochs),
          $"bucket".cast(LongType) * CurrEpochs <= $"epoch" * CurrQ)
        .crossJoin(broadcast(tot))
        .withColumn("cum_tokens", sum($"n_tokens").over(
          Window.partitionBy($"epoch").orderBy($"bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"epoch", $"bucket".cast(LongType).as("bucket"),
          $"n_docs", $"n_tokens",
          graft.functions.Det.qround(
            $"cum_tokens".cast(DoubleType) / $"tot").as("cum_share"))
        .orderBy($"epoch", $"bucket")
    },
    Some(s"""
      WITH ${LexicalStats.DocSurprisalSql},
      b AS (
        SELECT doc_id, n_tokens,
          ntile($CurrQ) OVER (ORDER BY mean_surprisal, doc_id) AS bucket
        FROM docsurp),
      buckets AS (
        SELECT bucket, count(*)::BIGINT AS n_docs,
          sum(n_tokens)::BIGINT AS n_tokens
        FROM b GROUP BY bucket),
      grand AS (SELECT sum(n_tokens) AS grand FROM buckets),
      epochs AS (SELECT unnest(range(1, ${CurrEpochs + 1})) AS epoch),
      adm AS (
        SELECT epoch, bucket, n_docs, n_tokens,
          sum(n_tokens) OVER (PARTITION BY epoch ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        FROM buckets JOIN epochs
          ON bucket * $CurrEpochs <= epoch * $CurrQ)
      SELECT epoch, bucket::BIGINT AS bucket, n_docs, n_tokens,
        ${graft.Oracle.qround("cum_tokens::DOUBLE / grand")} AS cum_share
      FROM adm CROSS JOIN grand
      ORDER BY epoch, bucket""")
  )

  val all: Seq[GraftQuery] =
    Seq(qStratifiedSample, qPackSequences, qNormalizeText, qShuffleOrder,
      qCorpusPrep, qTopQualityPerLang, qTrainSplit, qChunkAssembly, qDocChunks,
      qZorderLayout, qQualityQuartiles, qRankWindows, qJsonlExport, qAssignIds,
      qEpochPlan, qWeightedSample, qParetoFront, qLengthBuckets, qTokenBudget,
      qBudgetSample, qFeatureHash, qSkipgramPairs, qPreferencePairs,
      qCurriculumPlan, qEpochDecay)
}
