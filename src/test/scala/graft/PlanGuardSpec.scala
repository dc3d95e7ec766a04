package graft

import graft.operators.{Dedup, Profiling}

/** EXPLAIN-based guards for the three most expensive queries' scale-safe
  * shapes: a refactor that silently regressed one of them to an unbounded
  * form (all-pairs join, candidate generation without the df-cap, a second
  * Expand pass) would fail here long before a bench run noticed. Companions
  * to the existing plan assertions (BucketingSpec zero-Exchange join,
  * RelationalSpec Q5 broadcast stack, PartitionedLayoutSpec partition
  * pruning, TfIdfSpec TakeOrderedAndProject).
  */
class PlanGuardSpec extends SparkSpec {

  private def plan(q: GraftQuery): String =
    q.run(spark, fixtureDir).queryExecution.executedPlan.toString

  private def occurrences(hay: String, needle: String): Int =
    hay.split(java.util.regex.Pattern.quote(needle), -1).length - 1

  test("q_profile_table: single Expand pass, no joins") {
    // profiles `orders`, which the hand fixture doesn't carry — plan against
    // the smallest driver dir (structure only, nothing executes)
    val p = Profiling.qProfileTable.run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the 6 exact count(DISTINCT)s must share ONE Expand — a second Expand
    // (or any join) means the multi-distinct rewrite split into extra
    // corpus-sized passes
    assert(occurrences(p, "Expand") === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q_ngram_jaccard: df-cap anti-join + exact-rational length filter, no cartesian") {
    val p = plan(Dedup.qNgramJaccard)
    // stop-shingles leave candidate GENERATION via a left-anti join
    assert(p.contains("LeftAnti"), p)
    // the PPJoin length filter rides INSIDE the pair-join condition as the
    // exact integer rational (not a post-join filter over all pairs)
    assert(p.contains(s"* ${Dedup.LengthFilterNum}"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only Cross joins are broadcast scalar relations (the n_docs
    // 1-row aggregate), never a data-sized nested loop
    for (line <- p.linesIterator if line.contains("Cross,"))
      assert(line.contains("BroadcastNestedLoopJoin"), line)
  }

  test("q_span_dedup: LEFT SEMI rejoin, bounded shuffle count, no cartesian") {
    val p = plan(Dedup.qSpanDedup)
    // kept spans rejoin the span stream via LEFT SEMI (never materializing
    // a span × span product)
    assert(p.contains("LeftSemi"), p)
    // two span-key shuffles (span-df agg + distinct) and two doc-key
    // shuffles (coverage rollup + final join) — anything beyond means a
    // new corpus-sized exchange crept in
    assert(occurrences(p, "Exchange hashpartitioning") <= 4, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dsir_weights: LM broadcast onto the fact tf, tf exchange cached once") {
    val p = plan(graft.operators.LexicalStats.qDsirWeights)
    // the vocabulary-sized (term, ln-ratio) relation reaches the corpus tf
    // as a BroadcastHashJoin — a SortMergeJoin here means the corpus
    // shuffled on term
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // every consumer of the shared tf aggregate reads the cache (the
    // corpus-priced (doc, lang, term) exchange EXECUTES once; it merely
    // reprints inside each InMemoryTableScan's plan dump): all four
    // consumers — probe, cfc, cft, scalars — show as cache scans
    assert(occurrences(p, "InMemoryTableScan") >= 4, p)
  }

  test("q_kl_by_source: model-scale tail — broadcasts only after the one cfs exchange") {
    val p = plan(graft.operators.LexicalStats.qKlBySource)
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only Cross joins are broadcast scalar/vocabulary relations
    for (line <- p.linesIterator if line.contains("Cross,"))
      assert(line.contains("BroadcastNestedLoopJoin"), line)
  }

  test("q_vocab_coverage: both windows + final agg share one lang exchange") {
    val p = plan(graft.operators.LexicalStats.qVocabCoverage)
    // exchanges: the (lang, term) tf shuffle, the lang window shuffle, and
    // the output range sort — the unordered total-window and the final
    // rollup must REUSE the lang partitioning, not add exchanges
    assert(occurrences(p, "Exchange hashpartitioning") === 2, p)
    assert(occurrences(p, "Window") === 2, p)
    assert(!p.contains("Join"), p)
  }

  test("q_source_overlap: persisted shingle relation feeds all three consumers") {
    val p = plan(graft.operators.CorpusQuality.qSourceOverlap)
    // pair-join sides + per-source sizes all read the one cached distinct
    // (source, shingle) relation — fewer cache scans means the corpus-priced
    // distinct recomputes per consumer
    assert(occurrences(p, "InMemoryTableScan") >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_epoch_plan: broadcast ratio relation, no corpus-sized join shuffle") {
    val p = plan(graft.operators.PipelineOps.qEpochPlan)
    // the language-sized ratio relation must broadcast onto the manifest's
    // map pass; a SortMergeJoin means the corpus shuffled on lang
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_token_fertility: map-only projection — no explode, one lang exchange") {
    val p = plan(graft.operators.LexicalStats.qTokenFertility)
    // size(split(...)) must stay a scalar projection; a Generate here means
    // the token array materialized into corpus×tokens rows
    assert(!p.contains("Generate"), p)
    assert(occurrences(p, "Exchange hashpartitioning") === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q_zipf_fit: one corpus exchange; rank + moments on the vocab only") {
    val p = plan(graft.operators.LexicalStats.qZipfFit)
    // the only hash exchange is the (term) cf aggregate — the global
    // frequency rank is a deliberate vocab-sized SinglePartition window
    // and the regression moments collapse without another shuffle
    assert(occurrences(p, "Exchange hashpartitioning") === 1, p)
    assert(p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_jaccard_prefix: shingle-keyed candidate join, prefix cut in place") {
    val p = plan(Dedup.qJaccardPrefix)
    // candidates come from an equi-join on the prefix shingle — never a
    // pair enumeration
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the integer-exact prefix cut (ns·1399999 ceil-div) must ride as a
    // pre-join Filter on the ranked rows, not vanish into a post-join pass
    assert(p.contains(s"* ${Dedup.PrefixNum}"), p)
  }

  test("q_pca_power: checkpointed iterates — the final plan never re-embeds the covariance subtree") {
    val p = plan(graft.operators.Similarity.qPcaPower)
    // localCheckpoint truncates lineage after the one Gramian pass: the
    // executed plan of the LAST step must read materialized iterate RDDs,
    // not re-plan the covariance computation (which would grow 2^k copies
    // of the upper_products scan across the unrolled power iteration)
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("upper_products"), p)
    assert(!p.contains("FileScan"), p)
    assert(!p.contains("BatchScan"), p)
    // the norm rides in as a broadcast 1-row relation, never a shuffle join
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_winnow_overlap: df-capped fp equi-join, no cartesian") {
    val p = plan(Dedup.qWinnowOverlap)
    // boilerplate fingerprints leave candidate GENERATION via the anti-join
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only Cross joins are broadcast scalar relations (n_docs)
    for (line <- p.linesIterator if line.contains("Cross,"))
      assert(line.contains("BroadcastNestedLoopJoin"), line)
  }

  test("q_cdc_dedup: map-side chunking, in-place window, no joins") {
    val p = plan(Dedup.qCdcDedup)
    // chunk df comes from a window over the one chunk-hash exchange — a
    // Join here means the df aggregation regressed to a second scan
    assert(!p.contains("Join"), p)
    assert(occurrences(p, "Window") === 1, p)
  }

  test("q_boilerplate_rate: one (source, shingle) exchange + doc rollup, no joins") {
    val p = plan(graft.operators.CorpusQuality.qBoilerplateRate)
    assert(!p.contains("Join"), p)
    assert(occurrences(p, "Window") === 1, p)
  }

  test("q_heldout_xent: LM normalizers broadcast onto the cached tf relation") {
    val p = plan(graft.operators.LexicalStats.qHeldoutXent)
    // the per-lang stats relation joins the vocabulary as a broadcast; a
    // SortMergeJoin means the (lang, term) relation shuffled AGAIN on lang
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // both consumers (stats + probe) read the persisted tf exchange
    assert(occurrences(p, "InMemoryTableScan") >= 1, p)
  }

  test("q_correlated_scalar: exactly one aggregate over nation, broadcast back") {
    // the hand-decorrelated form must plan the per-nation average ONCE
    // (Catalyst's own decorrelation of the oracle text plans it twice —
    // the r8 wart this restructure removes) and return it to the customer
    // probe as a broadcast join, never a shuffle of the probe side
    val p = graft.operators.Relational.qCorrelatedScalar
      .run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(occurrences(p, "Exchange hashpartitioning(c_nationkey") === 1, p)
    assert(occurrences(p, "partial_sum") === 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_asof_join: one union + window pass, never a pair join") {
    val p = plan(graft.operators.TemporalJoins.qAsofJoin)
    // the AS-OF semantics come from tag-union-carry-forward: any Join node
    // means the composition regressed to an event x purchase pairing
    assert(!p.contains("Join"), p)
    assert(occurrences(p, "Union") === 1, p)
    // exactly two windows: the right-side (user, ts) dedup and the
    // last(ignoreNulls) carry-forward — a third means an extra pass
    assert(occurrences(p, "Window [") === 2, p)
  }

  test("q_range_join: bucket equi-join with in-join residual, no range nested loop") {
    val p = plan(graft.operators.TemporalJoins.qRangeJoin)
    // events meet campaigns on the bucket as a hash join, with the residual
    // BETWEEN riding INSIDE the join condition (not a post-join filter)
    val bhj = p.linesIterator.filter(_.contains("BroadcastHashJoin")).toSeq
    assert(bhj.exists(l => l.contains("[bucket") && l.contains(">=")), p)
    // the only nested-loop joins are Cross broadcasts of the 1-row bounds
    // relation — an Inner BNLJ here means the BETWEEN predicate became the
    // join itself (the unbounded pair enumeration this query exists to avoid)
    for (line <- p.linesIterator if line.contains("BroadcastNestedLoopJoin"))
      assert(line.contains("Cross"), line)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_pareto_front: skyline on the aggregate; frontier broadcast back") {
    val p = plan(graft.operators.PipelineOps.qParetoFront)
    // the prefix-max window runs on the (lang, n_tokens) AGGREGATE and the
    // winning triples must come back to the corpus as a broadcast join —
    // a SortMergeJoin means the corpus shuffled on (lang, n_tokens)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  /** Every node of the FINAL adaptive plan, descending through completed
    * query stages. The `toString` dump also prints the superseded
    * `== Initial Plan ==` section, whose pre-AQE join picks depend on
    * stat estimates (and thus on what other suites cached in a shared
    * JVM) — asserting on the string flakes when AQE demotes an initial
    * SortMergeJoin to the broadcast the guard wants. The executed tree
    * is the deterministic surface. */
  private def finalNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      finalNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: finalNodes(q.plan)
    case other => other +: other.children.flatMap(finalNodes)
  }

  test("iterative ml/EM queries: broadcast-model shape, no SMJ, no cartesian") {
    // every round of the iterative fits (IRLS Gramian, EM steps, k-center
    // distance updates, CV fold scoring) must reach the corpus as a
    // BROADCAST of model-sized state - a SortMergeJoin or a real
    // CartesianProduct means a refactor turned a model broadcast into a
    // data-sized shuffle
    val names = Seq("q_logistic_irls", "q_crossval_ols", "q_gmm_em",
      "q_linkage_em", "q_kcenter_select")
    for (n <- names) {
      val df = Queries.byName(n).run(spark, "/root/testdata/sf0.001")
      df.collect() // materialize persists so the executed shape is real
      val nodes = finalNodes(df.queryExecution.executedPlan)
      val bad = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      }
      assert(bad.isEmpty, s"$n: ${bad.map(_.nodeName).mkString(", ")}")
    }
  }

  test("q_spearman: marginal relations broadcast onto the grid") {
    // the bounded marginal relations must reach the grid as
    // BroadcastHashJoins — a SortMergeJoin means the bounded relation
    // shuffled as if corpus-sized
    val p = Queries.byName("q_spearman").run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"q_spearman\n$p")
    assert(!p.contains("SortMergeJoin"), s"q_spearman\n$p")
    assert(!p.contains("CartesianProduct"), s"q_spearman\n$p")
  }

  test("q_raking: IPF margins are windows, only broadcast joins remain") {
    // each IPF round's margin is a partitioned window sum inside one
    // plan (round 17 — was two groupBy+broadcast-join barriers per
    // round); the only joins left may be broadcasts of bounded
    // relations, and the per-round Window nodes must be PARTITIONED
    // (an unpartitioned window would single-task the grid)
    val p = Queries.byName("q_raking").run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), s"q_raking\n$p")
    assert(!p.contains("CartesianProduct"), s"q_raking\n$p")
    for (line <- p.linesIterator if line.contains("Join"))
      assert(line.contains("Broadcast"), s"q_raking non-broadcast join: $line")
    val margins = p.linesIterator.count(_.contains("windowspecdefinition("))
    assert(margins >= 6, s"q_raking: expected >=6 margin windows, got $margins\n$p")
    assert(!p.contains("windowspecdefinition(specified"), s"q_raking: unpartitioned window\n$p")
  }

  test("q_textrank_keywords / q_mauve_frontier / q_rbo_overlap: no pair enumeration") {
    for (n <- Seq("q_textrank_keywords", "q_mauve_frontier",
        "q_rbo_overlap")) {
      val df = Queries.byName(n).run(spark, "/root/testdata/sf0.001")
      df.collect() // materialize persists so the executed shape is real
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$n\n$p")
      // the only Cross joins are BROADCAST nested loops of bounded
      // relations (centroid/threshold rows), never a data-sized product
      for (line <- p.linesIterator if line.contains("Cross,"))
        assert(line.contains("BroadcastNestedLoopJoin"), s"$n: $line")
    }
  }

  test("q_skipgram_pairs: banded equi-join pairs, no cartesian") {
    val p = plan(graft.operators.PipelineOps.qSkipgramPairs)
    // the (center, context) pair formation must plan as an EQUI-join on
    // (doc_id, ri + d) -- a cartesian/BNLJ here is doc^2 at scale
    assert(!p.contains("CartesianProduct"), p)
    for (line <- p.linesIterator if line.contains("Cross,"))
      assert(line.contains("BroadcastNestedLoopJoin"), line)
    // exactly one corpus window pass (the per-doc re-index)
    assert(occurrences(p, "RunningWindowFunction") <= 1, p)
  }

  test("q_minhash_tune: codegen bucket keys, no interpreted HOF aggregates") {
    val p = plan(Dedup.qMinhashTune)
    // the 6 banding re-groups must stay plain codegen'd aggregates --
    // collect_list/array_sort falling back in would re-introduce the
    // interpreted HOF in the 12-row-per-doc exchange
    assert(!p.contains("collect_list"), p)
    assert(!p.contains("array_sort"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_paragraph_ppl: no cartesian; the tercile window runs on the value domain") {
    val p = plan(graft.operators.LexicalStats.qParagraphPpl)
    // the LM and tercile relations cross back as broadcast 1-row/model
    // relations, never a CartesianProduct; the only Window is the
    // cumulative tercile scan over the bounded rounded-score value
    // domain (a second window would mean a per-paragraph rank sneaked in)
    // (the one-posexplode-pass property is enforced by the ptf persist —
    // the cached subtree reprints inside every InMemoryRelation scan, so
    // a Generate string count cannot pin it here)
    assert(!p.contains("CartesianProduct"), p)
    assert(occurrences(p, "Window [") === 1, p)
  }

  test("q_preference_pairs: one stratum exchange, no joins, no windows") {
    val p = plan(graft.operators.PipelineOps.qPreferencePairs)
    // chosen/rejected are min_by/max_by picks inside ONE (lang, source)
    // aggregate — a refactor to per-stratum windows or a self-join would
    // shuffle the corpus twice (the oracle's window form is fine for
    // DuckDB; the Spark side must keep the single-aggregate shape)
    assert(occurrences(p, "Exchange hashpartitioning") === 1, p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_plsa_topics: EM rounds never enumerate pairs; crosses are 1-row models") {
    val df = graft.operators.Clustering.qPlsaTopics
      .run(spark, "/root/testdata/sf0.001")
    df.collect() // materialize persists so the executed shape is real
    val p = df.queryExecution.executedPlan.toString
    // the E-step must reach the corpus as keyed joins (doc_id / term) —
    // a CartesianProduct or a data-sized nested loop means the wide-column
    // K-topic structure regressed to a K-way row fan-out or worse
    assert(!p.contains("CartesianProduct"), p)
    for (line <- p.linesIterator if line.contains("Cross,"))
      assert(line.contains("BroadcastNestedLoopJoin"), line)
  }

  test("q_filter_ablation / q_mix_rebalance / q_stopword_discovery: " +
      "wide-column corpus passes, model-sized crosses only") {
    for (n <- Seq("q_filter_ablation", "q_mix_rebalance",
        "q_stopword_discovery")) {
      val df = Queries.byName(n).run(spark, "/root/testdata/sf0.001")
      df.collect() // materialize persists so the executed shape is real
      val p = df.queryExecution.executedPlan.toString
      // the variant/source/term structure must multiply aggregate
      // COLUMNS, never corpus rows: no cartesian, and every Cross is a
      // broadcast of a 1-row normalizer relation
      assert(!p.contains("CartesianProduct"), s"$n\n$p")
      for (line <- p.linesIterator if line.contains("Cross,"))
        assert(line.contains("BroadcastNestedLoopJoin"), s"$n: $line")
    }
  }

  test("q_curriculum_plan: decile window runs on the thin doc relation") {
    val df = graft.operators.PipelineOps.qCurriculumPlan
      .run(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // ntile must window the per-doc collapse (3 thin columns), with the
    // epoch grid arriving broadcast — a SortMergeJoin here means the
    // 5-row grid shuffled as if corpus-sized
    assert(p.contains("ntile"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("StreamIndex: the term filter reaches the postings parquet scan") {
    // write a tiny index log, then check the readout's scan carries the
    // term pushdown -- at 100 TB this is what makes a query posting-
    // bounded instead of a full index rescan
    import spark.implicits._
    val logDir = java.nio.file.Files
      .createTempDirectory("graft-planguard-index").toString
    graft.streaming.StreamIndex.processBatch(
      Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
        .select($"doc_id", $"text"),
      0L, logDir)
    val p = graft.streaming.StreamIndex.bm25(spark, logDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(term,"), p)
  }
}
