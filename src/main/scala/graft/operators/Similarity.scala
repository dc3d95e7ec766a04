package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.Det
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Three tiers:
  *  1. `q_ann_cosine_topk` — exact brute-force top-k for a bounded query set.
  *  2. `q_ann_cosine_fast` — the same semantics with plain-double fold math
  *     (fastest path); verified through its recall contract vs tier 1
  *     (set overlap ≥ 0.9·k), since float fold order is engine-internal.
  *  3. `q_embed_neardup_lsh` — random-hyperplane (sign) LSH bucketing, then
  *     exact cosine verification *within buckets only*: the O(n²)-free
  *     near-dup path. Hyperplane weights are a deterministic integer formula
  *     so the oracle can reproduce them.
  *
  * Physical design: every dot product / projection is a per-row
  * higher-order-function fold over the embedding arrays — there is NO
  * per-dimension explode and NO per-(vector, dimension) shuffle anywhere.
  * Exactness vs the DuckDB oracle is preserved by accumulating in
  * DECIMAL(38,12): each addend (an IEEE double product) is cast to decimal
  * before summation, and decimal addition is exact, hence order-independent —
  * the oracle's per-dimension-row formulation produces bit-identical values.
  *
  * Scale: tier 3's bucket join is the 100 TB design (candidates ∝ bucket
  * sizes, not n²); tier 1 pins correctness at small n.
  *
  * Beyond search, the object also carries the IVF probe (`q_ann_ivf`),
  * product-quantization ADC (`q_ann_pq`), the int8 quantization audit
  * (`q_embed_int8`), and SemDeDup cell-scoped semantic dedup
  * (`q_semantic_dedup`).
  */
object Similarity {

  val TopK = 5
  val NQueryVecs = 10
  val NPlanes = 8
  val CosineThreshold = 0.9

  /** Exact decimal dot product of two float arrays: Σ dec₁₂(double(aᵢ)·double(bᵢ)),
    * emitted as double. Order-independent (decimal addition is exact).
    * Backed by the native codegen expression graft.functions.DotF32 — the
    * declarative zip_with/aggregate twin is CodegenFallback and ~100×
    * slower per element. */
  private def decDot(a: Column, b: Column): Column =
    call_function("dot_f32", a, b)

  /** (vec_id, embedding, nrm) with the exact decimal L2 norm.
    *
    * Repartitioned before the fold projections: higher-order functions are
    * CodegenFallback (interpreted), so their per-row cost must be spread
    * across cores — a real multi-split table gets this from the scan, the
    * driver's single small parquet file does not. */
  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    withNormOf(Tables.spread(Tables.embeddings(spark, dir)))

  /** The norm projection over any (vec_id, embedding) relation — shared
    * with graft.streaming.StreamIvf, whose per-batch deltas must carry
    * the identical exact norms. */
  private[graft] def withNormOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
      sqrt(decDot(col("embedding"), col("embedding"))).as("nrm"))

  private[operators] val explodedSql = """
    SELECT vec_id, unnest(range(len(embedding))) AS pos,
           unnest(embedding)::DOUBLE AS v
    FROM embeddings"""

  private[operators] val normsSql = s"""
    SELECT vec_id,
      sqrt(sum(CAST(v * v AS DECIMAL(38,12)))::DOUBLE) AS nrm
    FROM ($explodedSql) GROUP BY vec_id"""

  /** Exact cosine top-k (qid, rk, tid, cosine), unordered — the body of
    * [[qAnnCosineTopk]], shared with the IVF recall audit (one definition
    * of "ground truth", no drift). The (small) query side is broadcast
    * against the full table; each pair's dot product is one codegen'd
    * array fold; ranking happens over the ROUNDED cosine (ties to the
    * lower tid), matching the oracle exactly. */
  private def exactTopk(spark: SparkSession, dir: String): DataFrame =
    topkOf(withNorm(spark, dir))

  /** The exact-cosine top-k pipeline over any (vec_id, embedding, nrm)
    * relation — shared by [[exactTopk]] (full vectors), the MRL
    * truncation audit (prefix vectors), and StreamIvf's recall audit
    * (the folded assignment log). */
  private[graft] def topkOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.filter($"vec_id" < NQueryVecs)
      .select($"vec_id".as("qid"), $"embedding".as("qe"), $"nrm".as("qn"))
    emb.select($"vec_id".as("tid"), $"embedding".as("te"), $"nrm".as("tn"))
      .join(broadcast(q), $"qid" =!= $"tid")
      .select($"qid", $"tid",
        Det.qround(decDot($"qe", $"te") / ($"qn" * $"tn")).as("cosine"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid").orderBy($"cosine".desc, $"tid")))
      .filter($"rk" <= TopK)
      .select($"qid", $"rk".cast(LongType).as("rk"), $"tid", $"cosine")
  }

  /** Tier 1: exact cosine top-k neighbors for query vectors vec_id < 10. */
  val qAnnCosineTopk = GraftQuery(
    "q_ann_cosine_topk",
    (spark, dir) => exactTopk(spark, dir).orderBy("qid", "rk"),
    Some(s"""
      WITH ex AS ($explodedSql),
      nrm AS ($normsSql),
      $exactTopkCtes
      SELECT qid, rk, tid, cosine FROM exact_topk
      ORDER BY qid, rk""")
  )

  /** Oracle CTE block for [[exactTopk]] — assumes `ex` and `nrm` are in
    * scope, exposes `exact_topk(qid, rk, tid, cosine)`. Shared by the
    * exact query and the IVF recall audit. */
  private def exactTopkCtes: String = s"""
      xdots AS (
        SELECT q.vec_id AS qid, t.vec_id AS tid,
          sum(CAST(q.v * t.v AS DECIMAL(38,12)))::DOUBLE AS dot
        FROM ex q JOIN ex t ON q.pos = t.pos AND q.vec_id <> t.vec_id
        WHERE q.vec_id < $NQueryVecs
        GROUP BY q.vec_id, t.vec_id),
      xcos AS (
        SELECT qid, tid,
          ${Oracle.qround("dot / (qn.nrm * tn.nrm)")} AS cosine
        FROM xdots
        JOIN nrm qn ON qid = qn.vec_id
        JOIN nrm tn ON tid = tn.vec_id),
      exact_topk AS (
        SELECT qid, rk, tid, cosine FROM (
          SELECT qid, tid, cosine,
            row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, tid)
              AS rk
          FROM xcos)
        WHERE rk <= $TopK)"""

  /** Tier 2: same query through the native plain-double fold
    * (`dot_f32_fast`, whole-stage codegen) — the cheapest possible path.
    * Double fold order is engine-internal, so the fast ranking's raw rows
    * cannot go to the SQL oracle; the verified output is the recall
    * contract instead: per query vector, `overlap_ok = 1` iff the fast
    * top-k SET covers ≥ 0.9·k of the exact decimal top-k
    * ([[exactTopk]] — the same ground-truth relation the IVF audit uses).
    * With 6-dp rounding before ranking on both paths the overlap is
    * expected to be k/k; a fold-order regression that perturbs the set now
    * FAILS the hash compare instead of being skipped. */
  val qAnnCosineFast = GraftQuery(
    "q_ann_cosine_fast",
    (spark, dir) => {
      import spark.implicits._
      val emb = Tables.spread(Tables.embeddings(spark, dir))
        .select($"vec_id", $"embedding".as("e"))
      def dot(a: Column, b: Column) = call_function("dot_f32_fast", a, b)
      val wn = emb.withColumn("nrm", sqrt(dot($"e", $"e")))
      val q = wn.filter($"vec_id" < NQueryVecs)
        .select($"vec_id".as("qid"), $"e".as("qe"), $"nrm".as("qn"))
      val fast = wn.select($"vec_id".as("tid"), $"e".as("te"), $"nrm".as("tn"))
        .join(broadcast(q), $"qid" =!= $"tid")
        .select($"qid", $"tid",
          Det.qround(dot($"qe", $"te") / ($"qn" * $"tn")).as("cosine"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"qid").orderBy($"cosine".desc, $"tid")))
        .filter($"rk" <= TopK)
      // k_actual (not TopK) is the denominator: with fewer than TopK+1
      // vectors the exact set is smaller than k, and the contract is over
      // the set that exists
      exactTopk(spark, dir).select($"qid", $"tid")
        .join(fast.select($"qid", $"tid", lit(1).as("m")),
          Seq("qid", "tid"), "left")
        .groupBy($"qid")
        .agg(count(lit(1)).as("k_actual"), count($"m").as("n_hit"))
        .select($"qid",
          when($"n_hit".cast(DoubleType)
            >= lit(0.9) * $"k_actual".cast(DoubleType), 1L)
            .otherwise(0L).as("overlap_ok"))
        .orderBy($"qid")
    },
    Some(s"""
      SELECT vec_id AS qid, 1::BIGINT AS overlap_ok
      FROM embeddings
      WHERE vec_id < $NQueryVecs
      ORDER BY qid""")
  )

  /** Tier 3: sign-LSH bucketing + exact cosine ≥ threshold within buckets.
    * Plane weights w(j,d) = ((1103515245*(j*64+d) + 12345) div 65536) % 19 - 9
    * — a plain LCG step, integer-exact in both engines; bucket bits are the
    * signs of decimal-exact projections (graft.functions.LshBucket), so
    * they match the oracle's per-dimension decimal sums bit-for-bit.
    *
    * The bucketed relation is persisted — it IS the LSH index, shared by
    * both sides of the candidate self-join; without the barrier Catalyst
    * pushes an `isnotnull(bucket)` derived predicate through the
    * repartition to the scan and evaluates the bucketing there too.
    */
  val qEmbedNeardupLsh = GraftQuery(
    "q_embed_neardup_lsh",
    (spark, dir) => {
      import spark.implicits._
      val emb = withNorm(spark, dir)
      val buckets = emb.select($"vec_id", $"embedding", $"nrm",
        call_function("lsh_bucket", $"embedding", lit(NPlanes)).as("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Cheap-prefilter-then-exact-verify (the standard two-phase shape):
      // the plain-double fold rejects ~all candidate pairs before any
      // decimal math runs; the exact decimal cosine — the one the oracle
      // reproduces — is evaluated only for near-hits, and its threshold
      // filter is unchanged, so results are identical. The guard compares
      // DOTS, not cosines (fastdot ≥ thr·nn − (1e-9 + 1e-9·nn)): a
      // cosine-space guard divides the dot-space error by nn and silently
      // stops covering small-norm vectors, while this band dominates both
      // the decimal per-term rounding (≤ 64·5e-13 absolute) and the fold's
      // relative error (≲1e-14·nn) at every norm scale.
      buckets.as("a").join(buckets.as("b"),
          $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
          $"a.embedding".as("ea"), $"b.embedding".as("eb"),
          ($"a.nrm" * $"b.nrm").as("nn"),
          call_function("dot_f32_fast", $"a.embedding", $"b.embedding")
            .as("fastdot"))
        .filter($"fastdot" >=
          lit(CosineThreshold) * $"nn" - (lit(1e-9) + lit(1e-9) * $"nn"))
        .select($"ia", $"ib", Det.qround(decDot($"ea", $"eb") / $"nn").as("cosine"))
        .filter($"cosine" >= CosineThreshold)
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH ex AS ($explodedSql),
      planes AS (
        SELECT j, d, ((1103515245 * (j * 64 + d) + 12345) // 65536) % 19 - 9 AS w
        FROM (SELECT unnest(range($NPlanes)) AS j)
        CROSS JOIN (SELECT unnest(range(64)) AS d)),
      signs AS (
        SELECT vec_id, j,
          CASE WHEN sum(CAST(w * v AS DECIMAL(38,12))) >= 0 THEN 1 ELSE 0 END AS bit
        FROM ex JOIN planes ON pos = d
        GROUP BY vec_id, j),
      buckets AS (
        SELECT vec_id, sum(bit::BIGINT << j) AS bucket FROM signs GROUP BY vec_id),
      cand AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
      nrm AS ($normsSql),
      dots AS (
        SELECT ia, ib, sum(CAST(ea.v * eb.v AS DECIMAL(38,12)))::DOUBLE AS dot
        FROM cand
        JOIN ex ea ON ia = ea.vec_id
        JOIN ex eb ON ib = eb.vec_id AND ea.pos = eb.pos
        GROUP BY ia, ib)
      SELECT ia, ib,
        floor(dot / (na.nrm * nb.nrm) * 1000000.0 + 0.5) / 1000000.0 AS cosine
      FROM dots
      JOIN nrm na ON ia = na.vec_id
      JOIN nrm nb ON ib = nb.vec_id
      WHERE floor(dot / (na.nrm * nb.nrm) * 1000000.0 + 0.5) / 1000000.0
        >= $CosineThreshold
      ORDER BY ia, ib""")
  )

  val NCells = 16
  val NProbe = 2

  /** IVF-style ANN: a 16-entry coarse codebook TRAINED by one
    * deterministic spherical-k-means Lloyd round (init = the first 16
    * vectors, so the oracle can replay the training exactly), every
    * vector assigned to its nearest centroid by cosine, and each query
    * probing only its `NProbe` nearest cells. The scale path for top-k
    * search: per query the candidate set is ∝ probed-cell sizes
    * (n·NProbe/NCells on balanced cells), never the full table; the
    * codebook is broadcast, so assignment is one map-side pass over the
    * vectors. */
  /** The IVF candidate relation (qid, tid, cosine) — every target in a
    * probed cell, with its exact rounded cosine. Shared by [[qAnnIvf]]
    * (which ranks it) and the recall audit (which also counts it: the
    * candidate volume IS the per-query work the cell probe performs). */
  /** The IVF candidate relation at probe depth `maxP`, with the probe
    * rank (`prk` = rank of the target's cell in the query's probe list)
    * carried — shared by [[ivfPairs]] (at the production [[NProbe]]) and
    * the [[qIvfTune]] sweep (at the deepest tier; the nested tiers are
    * `prk` filters, never re-probes). */
  private def ivfCand(spark: SparkSession, dir: String,
      maxP: Int): DataFrame = {
    // persisted: the corpus feeds the training round (init filter + the
    // assignment pass inside the codebook lineage) AND the final scoring
    // pass — three scans otherwise
    val emb = withNorm(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted: `scored` (the n×NCells centroid-distance pass) feeds BOTH
    // `assign` and `probes`; without the barrier the whole crossJoin +
    // decimal dot products execute twice (BENCH_r01: 8.2 s → the fix is
    // the same persist the LSH index query already uses)
    val scored = ivfScored(emb, ivfTrainedCentroids(emb))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ivfCandOf(ivfProbesOf(scored, maxP), ivfAssignOf(scored))
  }

  /** The deterministic codebook INIT (cid, ce, cn): the first [[NCells]]
    * corpus vectors, components cast to double (so the init and trained
    * codebooks share one schema and one scoring path). Until round 17
    * this WAS the codebook; now it seeds [[ivfTrainedCentroids]]. */
  private[graft] def ivfInitCentroids(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < NCells)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), v => v.cast(DoubleType)).as("ce"),
        col("nrm").as("cn"))

  /** The TRAINED coarse codebook (cid, ce, cn): one spherical-k-means
    * Lloyd round from the deterministic init — every corpus vector joins
    * its nearest init centroid by exact cosine ([[ivfAssignOf]], the same
    * assignment rule the index itself uses), and each cell's centroid
    * becomes the per-dimension decimal-exact mean of its members (the
    * q_kmeans update shape: one (cell, pos) shuffle with map-side
    * combine, array reassembly on [[NCells]] rows only). Empty cells keep
    * their init centroid — the standard k-means guard, and what keeps the
    * codebook exactly [[NCells]] entries on degenerate corpora. Norms are
    * recomputed decimal-exact so downstream cosines stay bit-equal to the
    * DuckDB replay. One round from a deterministic seed keeps the oracle
    * CTE chain tractable; more rounds are the same plan repeated.
    * graft.streaming.StreamIvf FREEZES this relation (collected — it is
    * model-sized) and assigns every micro-batch against it, which is what
    * keeps its per-batch deltas bit-equal to the batch queries on the
    * grown corpus. */
  private[graft] def ivfTrainedCentroids(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    val c0 = ivfInitCentroids(emb)
    val means = ivfAssignOf(ivfScored(emb, c0))
      .select($"cell", posexplode($"te").as(Seq("pos", "v")))
      .groupBy($"cell", $"pos")
      .agg((sum($"v".cast(DecimalType(38, 12))).cast(DoubleType) /
        count(lit(1))).as("c"))
      .groupBy($"cell")
      // NCells rows only: the HOF reassembly is off the hot path
      .agg(transform(array_sort(collect_list(struct($"pos", $"c"))),
          s => s.getField("c")).as("mce"),
        sqrt(sum(($"c" * $"c").cast(DecimalType(38, 12))).cast(DoubleType))
          .as("mcn"))
    c0.join(means, $"cid" === $"cell", "left")
      .select($"cid", coalesce($"mce", $"ce").as("ce"),
        coalesce($"mcn", $"cn").as("cn"))
  }

  /** The n×NCells centroid-scoring pass over a (vec_id, embedding, nrm)
    * relation: one broadcast crossJoin, exact decimal cosines (mixed
    * float-vector × double-centroid dots — the codebook entries are
    * trained means). */
  private[graft] def ivfScored(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"),
        (call_function("dot_f32_f64", col("embedding"), col("ce")) /
          (col("nrm") * col("cn"))).as("ccos"))

  /** Cell assignment (tid, te, tn, cell): nearest centroid by cosine,
    * ties to the lower cid — a per-vector decision (depends only on the
    * vector + the frozen codebook), which is the additivity that lets
    * StreamIvf assign per micro-batch. */
  private[graft] def ivfAssignOf(scored: DataFrame): DataFrame = {
    import scored.sparkSession.implicits._
    val byCcos = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cid")
    scored
      .withColumn("rk", row_number().over(byCcos)).filter($"rk" === 1)
      .select($"vec_id".as("tid"), $"embedding".as("te"), $"nrm".as("tn"),
        $"cid".as("cell"))
  }

  /** Probe lists (qid, qe, qn, cell, prk) for the query vectors
    * (vec_id < [[NQueryVecs]]) at probe depth `maxP` — per-vector like
    * the assignment, so probe sets computed per batch equal the batch
    * pass's. */
  private[graft] def ivfProbesOf(scored: DataFrame, maxP: Int): DataFrame = {
    import scored.sparkSession.implicits._
    val byCcos = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cid")
    scored.filter($"vec_id" < NQueryVecs)
      .withColumn("rk", row_number().over(byCcos)).filter($"rk" <= maxP)
      .select($"vec_id".as("qid"), $"embedding".as("qe"), $"nrm".as("qn"),
        $"cid".as("cell"), $"rk".as("prk"))
  }

  /** The candidate relation from probe lists × assignments: cell-bounded
    * equi-join, exact decimal cosines computed on the joined pair. */
  private[graft] def ivfCandOf(probes: DataFrame,
      assign: DataFrame): DataFrame = {
    import probes.sparkSession.implicits._
    probes.join(assign, Seq("cell"))
      .filter($"qid" =!= $"tid")
      .select($"qid", $"tid",
        Det.qround(decDot($"qe", $"te") / ($"qn" * $"tn")).as("cosine"),
        $"prk")
  }

  private def ivfPairs(spark: SparkSession, dir: String): DataFrame =
    ivfCand(spark, dir, NProbe)
      .select(col("qid"), col("tid"), col("cosine"))

  /** IVF top-k (qid, rk, tid, cosine), unordered, over an [[ivfPairs]]
    * relation (taken as a parameter so the audit can rank the same
    * instance it counts — and so StreamIvf can rank its folded
    * candidates). */
  private[graft] def ivfTopk(pairs: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    pairs
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid").orderBy($"cosine".desc, $"tid")))
      .filter($"rk" <= TopK)
      .select($"qid", $"rk".cast(LongType).as("rk"), $"tid", $"cosine")
  }

  val qAnnIvf = GraftQuery(
    "q_ann_ivf",
    (spark, dir) => ivfTopk(ivfPairs(spark, dir)).orderBy("qid", "rk"),
    Some(s"""
      WITH ex AS ($explodedSql),
      nrm AS ($normsSql),
      $ivfCtes
      SELECT qid, rk, tid, cosine FROM ivf_topk
      ORDER BY qid, rk""")
  )

  /** Oracle CTE block for [[ivfPairs]]/[[ivfTopk]] — assumes `ex` and `nrm`
    * are in scope, exposes `ivf_pairs(qid, tid, cosine)` and
    * `ivf_topk(qid, rk, tid, cosine)`. Shared by the IVF query and the
    * recall audit. */
  private def ivfCtes: String = s"""
      c0 AS (SELECT vec_id AS cid, pos, v AS c FROM ex
             WHERE vec_id < $NCells),
      c0n AS (SELECT cid, sqrt(sum(CAST(c * c AS DECIMAL(38,12)))::DOUBLE)
                AS cn
              FROM c0 GROUP BY cid),
      tdots AS (
        SELECT e.vec_id, c.cid,
          sum(CAST(e.v * c.c AS DECIMAL(38,12)))::DOUBLE AS dot
        FROM ex e JOIN c0 c ON e.pos = c.pos
        GROUP BY e.vec_id, c.cid),
      tccos AS (
        SELECT t.vec_id, t.cid, t.dot / (nv.nrm * c0n.cn) AS ccos
        FROM tdots t
        JOIN nrm nv ON t.vec_id = nv.vec_id
        JOIN c0n ON t.cid = c0n.cid),
      tassign AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (
            PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rk
          FROM tccos)
        WHERE rk = 1),
      cmeans AS (
        SELECT a.cell AS cid, e.pos,
          sum(CAST(e.v AS DECIMAL(38,12)))::DOUBLE / count(*) AS c
        FROM tassign a JOIN ex e ON a.vec_id = e.vec_id
        GROUP BY a.cell, e.pos),
      cb AS (
        SELECT c0.cid, c0.pos, coalesce(m.c, c0.c) AS c
        FROM c0 LEFT JOIN cmeans m ON c0.cid = m.cid AND c0.pos = m.pos),
      cbn AS (SELECT cid, sqrt(sum(CAST(c * c AS DECIMAL(38,12)))::DOUBLE)
                AS cn
              FROM cb GROUP BY cid),
      cdots AS (
        SELECT a.vec_id AS vec_id, b.cid AS cid,
          sum(CAST(a.v * b.c AS DECIMAL(38,12)))::DOUBLE AS dot
        FROM ex a JOIN cb b ON a.pos = b.pos
        GROUP BY a.vec_id, b.cid),
      ccos AS (
        SELECT c.vec_id, c.cid, c.dot / (nv.nrm * nc.cn) AS ccos
        FROM cdots c
        JOIN nrm nv ON c.vec_id = nv.vec_id
        JOIN cbn nc ON c.cid = nc.cid),
      cranked AS (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rk
        FROM ccos),
      assign AS (SELECT vec_id AS tid, cid AS cell FROM cranked WHERE rk = 1),
      probes AS (SELECT vec_id AS qid, cid AS cell FROM cranked
                 WHERE rk <= $NProbe AND vec_id < $NQueryVecs),
      cand AS (
        SELECT p.qid, a.tid FROM probes p
        JOIN assign a ON p.cell = a.cell AND a.tid <> p.qid),
      idots AS (
        SELECT qid, tid, sum(CAST(q.v * t.v AS DECIMAL(38,12)))::DOUBLE AS dot
        FROM cand
        JOIN ex q ON qid = q.vec_id
        JOIN ex t ON tid = t.vec_id AND q.pos = t.pos
        GROUP BY qid, tid),
      ivf_pairs AS (
        SELECT qid, tid,
          ${Oracle.qround("dot / (qn.nrm * tn.nrm)")} AS cosine
        FROM idots
        JOIN nrm qn ON qid = qn.vec_id
        JOIN nrm tn ON tid = tn.vec_id),
      ivf_topk AS (
        SELECT qid, rk, tid, cosine FROM (
          SELECT qid, tid, cosine, row_number() OVER (
            PARTITION BY qid ORDER BY cosine DESC, tid) AS rk
          FROM ivf_pairs)
        WHERE rk <= $TopK)"""

  /** IVF parameter audit — the ANN sibling of q_lsh_candidate_audit /
    * q_semdedup_cell_audit, for tuning NCells/NProbe: per query, the
    * candidate volume the probe actually scanned (the per-query work — on
    * balanced cells ≈ n·NProbe/NCells) and recall@k against the exact
    * brute-force top-k, both built from the SAME shared relations the two
    * search queries rank ([[ivfPairs]], [[exactTopk]]) so a parameter
    * retune can never desync the audit from the operators it measures.
    * The standard IVF tuning loop reads exactly this pair: raise NProbe
    * until recall clears the product bar, watching candidates/query as
    * the price. Fully oracle-checkable (both sides deterministic). */
  /** The audit tail over a candidate-pairs relation and an exact-top-k
    * ground truth — shared by [[qIvfRecallAudit]] and StreamIvf's
    * maintained readout (identical relations in → identical table
    * out). */
  private[graft] def ivfRecallAuditOf(pairsIn: DataFrame,
      exact: DataFrame): DataFrame = {
    import pairsIn.sparkSession.implicits._
    // persisted: the candidate relation feeds the volume count AND the
    // top-k ranking (without the barrier the probe join's exact decimal
    // cosines execute twice)
    val pairs = pairsIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = pairs.groupBy($"qid").agg(count(lit(1)).as("n_cand"))
    val hits = exact.select($"qid", $"tid")
      .join(ivfTopk(pairs).select($"qid", $"tid", lit(1).as("m")),
        Seq("qid", "tid"), "left")
      .groupBy($"qid").agg(count($"m").as("n_hit"))
    hits.join(cands, Seq("qid"))
      .select($"qid", $"n_cand", $"n_hit",
        Det.qround($"n_hit" / lit(TopK)).as("recall"))
      .orderBy($"qid")
  }

  val qIvfRecallAudit = GraftQuery(
    "q_ivf_recall_audit",
    (spark, dir) =>
      ivfRecallAuditOf(ivfPairs(spark, dir), exactTopk(spark, dir)),
    Some(s"""
      WITH ex AS ($explodedSql),
      nrm AS ($normsSql),
      $exactTopkCtes,
      $ivfCtes,
      cands AS (SELECT qid, count(*) AS n_cand FROM ivf_pairs GROUP BY qid),
      hits AS (
        SELECT e.qid, count(i.tid) AS n_hit
        FROM exact_topk e
        LEFT JOIN ivf_topk i ON e.qid = i.qid AND e.tid = i.tid
        GROUP BY e.qid)
      SELECT h.qid, n_cand, n_hit,
        ${Oracle.qround(s"n_hit * 1.0 / $TopK")} AS recall
      FROM hits h JOIN cands c ON h.qid = c.qid
      ORDER BY h.qid""")
  )

  /** Probe depths swept by [[qIvfTune]] (production [[NProbe]] included). */
  val IvfTuneTiers: Seq[Int] = Seq(1, 2, 4, 8)

  /** IVF probe auto-tuner — the "should we re-probe" decision table, the
    * ANN sibling of q_minhash_tune's banding table: for each probe depth
    * p ∈ [[IvfTuneTiers]], the candidate volume the probe would scan and
    * the recall@k against the exact brute-force top-k. The K raw cell
    * rankings are computed ONCE at the deepest tier; every shallower tier
    * is a `prk ≤ p` CONDITIONAL-SUM COLUMN of the same relation (probe
    * sets nest), so the |tiers|-way sweep multiplies aggregate columns,
    * never candidate rows — and the candidate leg never even computes the
    * exact cosines (column pruning drops them; the tune counts work, it
    * doesn't redo it). Recall uses the membership identity: an exact
    * top-k pair found among tier-p candidates is necessarily in the
    * tier-p candidate TOP-k (anything outranking it there would outrank
    * it globally, and globally at most k−1 do) — so hits are a LEFT-JOIN
    * count, no per-tier window; SimilaritySpec pins the production row
    * against q_ivf_recall_audit's totals to witness the identity. Tie
    * caveat: the identity assumes a tie-free k-boundary — when qround'd
    * cosines tie exactly at rank k, the audit's candidate-top-k (ties to
    * the lower tid) may exclude an exact pair this membership count
    * includes, so tune recall can read ≥ audit recall on such corpora;
    * the spec witnesses equality at the production tier on the driver
    * corpora, which are tie-free at the boundary.
    *
    * Scale shape: one n×NCells broadcast scoring pass (shared with the
    * search queries), the candidate relation at the deepest tier
    * (Σ probed-cell sizes), two 1-row wide aggregates, a |tiers|-row
    * stack. */
  val qIvfTune = GraftQuery(
    "q_ivf_tune",
    (spark, dir) => {
      import spark.implicits._
      val ts = IvfTuneTiers
      val cand = ivfCand(spark, dir, ts.max)
        .select($"qid", $"tid", $"prk")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vol = cand.agg(
        sum(when($"prk" <= ts.head, 1L).otherwise(0L)).as(s"c_${ts.head}"),
        ts.tail.map(p =>
          sum(when($"prk" <= p, 1L).otherwise(0L)).as(s"c_$p")): _*)
      val hx = exactTopk(spark, dir).select($"qid", $"tid")
        .join(cand, Seq("qid", "tid"), "left")
        .agg(count(lit(1)).as("n_exact"),
          ts.map(p =>
            sum(when($"prk" <= p, 1L).otherwise(0L)).as(s"h_$p")): _*)
      vol.crossJoin(broadcast(hx))
        .selectExpr(s"stack(${ts.size}, ${ts.map(p =>
          s"CAST($p AS BIGINT), c_$p, " +
            s"floor(CAST(c_$p AS DOUBLE) / $NQueryVecs * 1e6 + 0.5) / 1e6, " +
            s"h_$p, n_exact, " +
            s"floor(CAST(h_$p AS DOUBLE) / n_exact * 1e6 + 0.5) / 1e6")
          .mkString(", ")}) as (nprobe, n_candidates, cand_per_query, " +
          "n_hits, n_exact, recall)")
        .orderBy($"nprobe")
    },
    Some {
      val ts = IvfTuneTiers
      s"""
      WITH ex AS ($explodedSql),
      nrm AS ($normsSql),
      $exactTopkCtes,
      $ivfCtes,
      probes_t AS (
        SELECT vec_id AS qid, cid AS cell, rk AS prk FROM cranked
        WHERE rk <= ${ts.max} AND vec_id < $NQueryVecs),
      cand_t AS (
        SELECT p.qid, a.tid, p.prk FROM probes_t p
        JOIN assign a ON p.cell = a.cell AND a.tid <> p.qid),
      vol AS (
        SELECT ${ts.map(p =>
          s"sum(CASE WHEN prk <= $p THEN 1 ELSE 0 END) AS c_$p")
          .mkString(", ")}
        FROM cand_t),
      hx AS (
        SELECT count(*) AS n_exact,
          ${ts.map(p =>
            s"sum(CASE WHEN prk <= $p THEN 1 ELSE 0 END) AS h_$p")
            .mkString(", ")}
        FROM exact_topk e
        LEFT JOIN cand_t c ON e.qid = c.qid AND e.tid = c.tid)
      SELECT nprobe, n_candidates, cand_per_query, n_hits, n_exact, recall
      FROM (
        ${ts.map(p => s"SELECT $p::BIGINT AS nprobe, c_$p::BIGINT " +
          s"AS n_candidates, floor(c_$p::DOUBLE / $NQueryVecs * 1e6 + 0.5) " +
          s"/ 1e6 AS cand_per_query, h_$p::BIGINT AS n_hits, " +
          s"n_exact::BIGINT AS n_exact, " +
          s"floor(h_$p::DOUBLE / n_exact * 1e6 + 0.5) / 1e6 AS recall " +
          "FROM vol CROSS JOIN hx").mkString("\n        UNION ALL\n        ")})
      ORDER BY nprobe"""
    }
  )

  val PqSubspaces = 8             // M: number of subvectors
  val PqSubDims = 64 / PqSubspaces // dims per subvector (distinct from M —
                                   // they only coincide at M=8)
  val PqCodes = 16                // K: codebook entries per subspace

  /** Product-quantization ANN — the memory-compression tier: each vector is
    * encoded as M=8 one-byte codes (nearest codebook entry per 8-dim
    * subvector), and query-to-target distance is approximated by ADC
    * (asymmetric distance computation): the query precomputes its distance
    * to every codebook entry once (M×K=128 values), and each target costs M
    * lookups + a sum — never a touch of the original vector. At 100 TB this
    * is what makes the index fit in memory (64 floats → 8 bytes per
    * vector, 32×).
    *
    * Codebook = subvectors of the first K vectors (the same deterministic
    * trained-model stand-in as q_ann_ivf / q_kmeans, so the oracle replays
    * it). Every distance is decimal-exact (`dist2_f32_f64` ↔ the oracle's
    * `sum(CAST((v-c)² AS DECIMAL(38,12)))`), code ties to the lower id, and
    * the ADC sum accumulates in decimals — bit-identical engines end to
    * end. The encode join is ∝ n·M·K bounded rows (a production build
    * hoists the trained codebook into a broadcast native expression; the
    * shape stays map-side either way — no pair of ORIGINAL vectors ever
    * meets).
    */
  /** The full ADC relation (qid, tid, ad2) with RAW (un-rounded) sums —
    * [[qAnnPq]] ranks it; the distortion audit compares it against exact
    * distances on the pairs the ranking selected. */
  /** The (vec_id, s, sub) subvector relation of any (vec_id, embedding)
    * relation — the PQ slicing, shared by the batch model build and
    * graft.streaming.StreamIvf's per-batch encode. */
  private[graft] def pqSubvOf(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    emb
      .select($"vec_id", explode(expr(s"sequence(0, ${PqSubspaces - 1})")).as("s"),
        $"embedding")
      .select($"vec_id", $"s",
        expr(s"slice(embedding, s * $PqSubDims + 1, $PqSubDims)").as("sub"))
  }

  /** The PQ codebook (cid, s, ce): subvectors of the first [[PqCodes]]
    * vectors, components cast to double — the deterministic trained-model
    * stand-in the oracle replays (StreamIvf freezes a collect of it). */
  private[graft] def pqCentsOf(subv: DataFrame): DataFrame = {
    import subv.sparkSession.implicits._
    subv.filter($"vec_id" < PqCodes)
      .select($"vec_id".as("cid"), $"s",
        transform($"sub", v => v.cast(DoubleType)).as("ce"))
  }

  /** The per-(vector, subspace) code assignment (vec_id, s, code) of any
    * subvector relation against a codebook — a PER-VECTOR decision
    * (subvector + frozen codebook only), which is the additivity that
    * lets StreamIvf encode per micro-batch.
    *
    * One-pass encode: the K distance rows of each (vector, subspace)
    * group come from ONE source row's broadcast fan-out, so they sit in
    * the same partition and the argmin collapses in the partial
    * aggregate — no shuffle ever carries the fan-out. (A two-phase
    * fast-rank/exact-confirm variant was measured: its per-(vec, s)
    * group-min join adds an n·M·K-row shuffle, which at scale costs
    * more than the map-side decimal CPU it saves.) */
  private[graft] def pqCodesOf(subv: DataFrame, cents: DataFrame): DataFrame = {
    import subv.sparkSession.implicits._
    subv.join(broadcast(cents), Seq("s"))
      .select(subv("vec_id"), $"s", $"cid",
        call_function("dist2_f32_f64", $"sub", $"ce").as("d2"))
      .groupBy($"vec_id", $"s")
      .agg(min_by($"cid", struct($"d2", $"cid")).as("code"))
  }

  /** The query-side M×K exact lookup table (qid, s, cid, d2) — tiny,
    * broadcast downstream; ADC needs the EXACT distance to every entry,
    * so no prefilter here. Per-vector like the codes, so a readout can
    * rebuild it from stored query embeddings bit-equal. */
  private[graft] def pqQlutOf(subv: DataFrame, cents: DataFrame): DataFrame = {
    import subv.sparkSession.implicits._
    subv.filter($"vec_id" < NQueryVecs)
      .join(broadcast(cents), Seq("s"))
      .select($"vec_id".as("qid"), $"s", $"cid",
        call_function("dist2_f32_f64", $"sub", $"ce").as("d2"))
  }

  /** The PQ model relations — codes + query LUT — shared by [[pqAdc]]
    * (full-corpus ADC) and the IVF-PQ composite (candidate-restricted
    * ADC). */
  private def pqModel(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val subv = pqSubvOf(Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding")))
    val cents = pqCentsOf(subv)
    (pqCodesOf(subv, cents), pqQlutOf(subv, cents))
  }

  private def pqAdc(spark: SparkSession, dir: String): DataFrame = {
    val (codes, qlut) = pqModel(spark, dir)
    pqAdcOf(codes, qlut)
  }

  /** Full-corpus ADC over explicit model relations — lets
    * [[qIvfpqRecall]] encode the corpus ONCE and feed both the full-PQ
    * and the composite rankings (the encode join — n·M·K decimal
    * distances into the per-(vector, subspace) argmin — is the dominant
    * cost and used to run twice there). */
  private def pqAdcOf(codes: DataFrame, qlut: DataFrame): DataFrame = {
    import codes.sparkSession.implicits._
    codes.join(broadcast(qlut),
        codes("s") === qlut("s") && codes("code") === qlut("cid") &&
          codes("vec_id") =!= qlut("qid"))
      .groupBy($"qid", codes("vec_id").as("tid"))
      .agg(sum($"d2".cast(DecimalType(38, 12))).cast(DoubleType).as("ad2"))
  }

  /** PQ top-k (qid, rk, tid, ad2 RAW) over [[pqAdc]] — ranking happens on
    * the raw ADC sum (ties to the lower tid), as in the oracle. */
  private def pqTopk(adc: DataFrame): DataFrame = {
    import adc.sparkSession.implicits._
    adc
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid").orderBy($"ad2", $"tid")))
      .filter($"rk" <= TopK)
      .select($"qid", $"rk".cast(LongType).as("rk"), $"tid", $"ad2")
  }

  /** Oracle CTE block for [[pqAdc]]/[[pqTopk]] — assumes `ex` is in scope,
    * exposes `adc(qid, tid, ad2)` and `pq_topk(qid, rk, tid, ad2)`. */
  private def pqCtes: String = s"""
      sub AS (SELECT vec_id, pos // $PqSubDims AS s, pos % $PqSubDims AS o, v
              FROM ex),
      pcents AS (SELECT vec_id AS cid, s, o, v AS c FROM sub
                 WHERE vec_id < $PqCodes),
      enc_d AS (
        SELECT t.vec_id, t.s, c.cid,
          sum(CAST((t.v - c.c) * (t.v - c.c) AS DECIMAL(38,12)))::DOUBLE AS d2
        FROM sub t JOIN pcents c ON t.s = c.s AND t.o = c.o
        GROUP BY t.vec_id, t.s, c.cid),
      codes AS (
        SELECT vec_id, s, cid AS code FROM (
          SELECT vec_id, s, cid,
            row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
          FROM enc_d)
        WHERE rn = 1),
      adc AS (
        SELECT q.vec_id AS qid, t.vec_id AS tid,
          sum(CAST(q.d2 AS DECIMAL(38,12)))::DOUBLE AS ad2
        FROM codes t
        JOIN enc_d q ON q.s = t.s AND q.cid = t.code
          AND q.vec_id < $NQueryVecs AND q.vec_id <> t.vec_id
        GROUP BY q.vec_id, t.vec_id),
      pq_topk AS (
        SELECT qid, rk, tid, ad2 FROM (
          SELECT qid, tid, ad2,
            row_number() OVER (PARTITION BY qid ORDER BY ad2, tid) AS rk
          FROM adc)
        WHERE rk <= $TopK)"""

  val qAnnPq = GraftQuery(
    "q_ann_pq",
    (spark, dir) => {
      import spark.implicits._
      pqTopk(pqAdc(spark, dir))
        .select($"qid", $"rk", $"tid",
          Det.qround($"ad2").as("approx_dist2"))
        .orderBy($"qid", $"rk")
    },
    Some(s"""
      WITH ex AS ($explodedSql),
      $pqCtes
      SELECT qid, rk, tid, ${Oracle.qround("ad2")} AS approx_dist2
      FROM pq_topk
      ORDER BY qid, rk""")
  )

  /** PQ distortion audit — the quantization-quality complement of the
    * recall audits, for tuning M×K (subspaces × codebook size): on the
    * pairs the ADC ranking actually selected, compare the approximate
    * distance against the exact squared distance between the ORIGINAL
    * vectors. Per query: mean exact distance, mean ADC distance, and mean
    * absolute error — the number that says whether 32× compression is
    * distorting the ranking (raise M or K when avg_abs_err approaches the
    * gap between neighbor distances). Both sides are decimal-exact sums,
    * so the audit is fully oracle-checkable.
    *
    * Scale shape: the selected pairs are a TopK·NQueryVecs-row relation,
    * broadcast onto the embeddings scan twice (query side, target side) —
    * the exact-distance pass costs 2·|pairs| array folds, never a corpus
    * pair join. */
  val qPqDistortion = GraftQuery(
    "q_pq_distortion",
    (spark, dir) => {
      import spark.implicits._
      val top = pqTopk(pqAdc(spark, dir)).select($"qid", $"tid", $"ad2")
      val emb = Tables.spread(Tables.embeddings(spark, dir))
      val withQ = emb.join(broadcast(top), $"vec_id" === $"qid")
        .select($"qid", $"tid", $"ad2", $"embedding".as("qe"))
      val pairs = emb.join(broadcast(withQ), $"vec_id" === $"tid")
        .select($"qid", $"tid", $"ad2",
          // dist2_f32_f64 takes (float[], double[]) — the float→double
          // cast of the target side is exact, matching the oracle's
          // all-double formulation
          call_function("dist2_f32_f64", $"qe",
            transform($"embedding", v => v.cast(DoubleType))).as("d2"))
      pairs.groupBy($"qid")
        .agg(count(lit(1)).as("n_pairs"),
          Det.davg($"d2").as("avg_d2"),
          Det.davg($"ad2").as("avg_ad2"),
          Det.davg(abs($"ad2" - $"d2")).as("avg_abs_err"))
        .orderBy($"qid")
    },
    Some(s"""
      WITH ex AS ($explodedSql),
      $pqCtes,
      pd2 AS (
        SELECT p.qid, p.tid, p.ad2,
          sum(CAST((q.v - t.v) * (q.v - t.v) AS DECIMAL(38,12)))::DOUBLE AS d2
        FROM pq_topk p
        JOIN ex q ON p.qid = q.vec_id
        JOIN ex t ON p.tid = t.vec_id AND q.pos = t.pos
        GROUP BY p.qid, p.tid, p.ad2)
      SELECT qid, count(*) AS n_pairs,
        ${Oracle.davg("d2")} AS avg_d2,
        ${Oracle.davg("ad2")} AS avg_ad2,
        ${Oracle.davg("abs(ad2 - d2)")} AS avg_abs_err
      FROM pd2 GROUP BY qid
      ORDER BY qid""")
  )

  /** IVF-PQ composite ANN (qid, rk, tid, ad2 RAW) — the production index
    * shape (FAISS IndexIVFPQ, non-residual variant): the TRAINED coarse
    * quantizer bounds each query's candidate set to its probed cells
    * ([[ivfCandOf]] at [[NProbe]] — n·NProbe/NCells work per query on
    * balanced cells), and the candidates are ranked by PQ ADC instead of
    * exact cosine — M code lookups + a sum per candidate, never a touch
    * of the original vector. The composition is what serves at 100 TB:
    * IVF bounds WHICH vectors are scored, PQ bounds what scoring one
    * COSTS (and shrinks the index 32×, [[PqSubspaces]] bytes/vector).
    * Residual encoding (PQ over v − centroid, per-cell) is the standard
    * refinement; this variant quantizes the vectors themselves so the
    * SAME codebook serves q_ann_pq and the composite, and the oracle
    * replays both chains verbatim.
    *
    * The exact cosines [[ivfCandOf]] defines are PRUNED out of the plan
    * (only (qid, tid) is selected — the q_ivf_tune column-pruning
    * property): an IVF-PQ search never computes an exact pair distance.
    *
    * Scale shape: the candidate pair relation joins the codes on tid
    * (pairs×M rows), the query LUT is broadcast, and the ADC sum
    * partial-aggregates before its (qid, tid) exchange. */
  private[graft] def ivfPqTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = ivfCand(spark, dir, NProbe).select($"qid", $"tid")
    val (codes, qlut) = pqModel(spark, dir)
    ivfPqRank(pairs, codes, qlut)
  }

  /** The ADC ranking tail over a candidate-pair relation, a codes
    * relation and a query LUT — shared by [[ivfPqTopk]] and StreamIvf's
    * maintained readout (identical relations in → identical ranking
    * out). */
  private[graft] def ivfPqRank(pairs: DataFrame, codes: DataFrame,
      qlut: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    pairs
      .join(codes, pairs("tid") === codes("vec_id"))
      .join(broadcast(qlut),
        codes("s") === qlut("s") && codes("code") === qlut("cid") &&
          pairs("qid") === qlut("qid"))
      .groupBy(pairs("qid"), pairs("tid"))
      .agg(sum($"d2".cast(DecimalType(38, 12))).cast(DoubleType).as("ad2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid").orderBy($"ad2", $"tid")))
      .filter($"rk" <= TopK)
      .select($"qid", $"rk".cast(LongType).as("rk"), $"tid", $"ad2")
  }

  /** Oracle CTE block for [[ivfPqTopk]] — assumes `ex`, `$ivfCtes`
    * (for `cand`) and `$pqCtes` (for `codes`/`enc_d`) are in scope,
    * exposes `ivfpq_topk(qid, rk, tid, ad2)`. */
  private def ivfPqCtes: String = s"""
      ivfpq_adc AS (
        SELECT c.qid, c.tid, sum(CAST(q.d2 AS DECIMAL(38,12)))::DOUBLE AS ad2
        FROM cand c
        JOIN codes t ON t.vec_id = c.tid
        JOIN enc_d q ON q.s = t.s AND q.cid = t.code AND q.vec_id = c.qid
        GROUP BY c.qid, c.tid),
      ivfpq_topk AS (
        SELECT qid, rk, tid, ad2 FROM (
          SELECT qid, tid, ad2,
            row_number() OVER (PARTITION BY qid ORDER BY ad2, tid) AS rk
          FROM ivfpq_adc)
        WHERE rk <= $TopK)"""

  val qAnnIvfpq = GraftQuery(
    "q_ann_ivfpq",
    (spark, dir) => {
      import spark.implicits._
      ivfPqTopk(spark, dir)
        .select($"qid", $"rk", $"tid", Det.qround($"ad2").as("approx_dist2"))
        .orderBy($"qid", $"rk")
    },
    Some(s"""
      WITH ex AS ($explodedSql),
      nrm AS ($normsSql),
      $ivfCtes,
      $pqCtes,
      $ivfPqCtes
      SELECT qid, rk, tid, ${Oracle.qround("ad2")} AS approx_dist2
      FROM ivfpq_topk
      ORDER BY qid, rk""")
  )

  /** IVF-PQ recall decomposition — per query, hits@k against the exact
    * brute-force top-k for the FULL-corpus PQ ranking ([[pqTopk]] — the
    * quantization cost alone) and for the IVF-PQ composite ([[ivfPqTopk]]
    * — quantization + the probe's candidate restriction). Reading the
    * pair tells an index tuner WHERE lost recall went: recall_pq is the
    * ceiling more probes could recover to; the gap between the columns is
    * the probe restriction's price (raise [[NProbe]]); lifting the
    * ceiling itself means more codebook bits ([[PqCodes]]/[[PqSubspaces]])
    * — the two knobs of a production IVF-PQ, each with its own column.
    * (No containment either way: restricting candidates can also ADMIT a
    * true pair that full-PQ ranked below an out-of-cell competitor.) */
  val qIvfpqRecall = GraftQuery(
    "q_ivfpq_recall",
    (spark, dir) => {
      import spark.implicits._
      // encode the corpus ONCE: the eager codes/LUT relations (model-sized
      // — M ints per vector, M·K LUT rows) feed BOTH the full-PQ ranking
      // and the IVF-PQ composite; the n·M·K encode join used to run twice
      val (codes0, qlut0) = pqModel(spark, dir)
      val codes = Tables.eager(codes0)
      val qlut = Tables.eager(qlut0)
      val pairs = ivfCand(spark, dir, NProbe).select($"qid", $"tid")
      exactTopk(spark, dir).select($"qid", $"tid")
        .join(pqTopk(pqAdcOf(codes, qlut))
          .select($"qid", $"tid", lit(1).as("mp")), Seq("qid", "tid"), "left")
        .join(ivfPqRank(pairs, codes, qlut)
          .select($"qid", $"tid", lit(1).as("mi")), Seq("qid", "tid"), "left")
        .groupBy($"qid")
        .agg(count($"mp").as("n_pq_hits"), count($"mi").as("n_ivfpq_hits"))
        .select($"qid", $"n_pq_hits", $"n_ivfpq_hits",
          Det.qround($"n_pq_hits" / lit(TopK)).as("recall_pq"),
          Det.qround($"n_ivfpq_hits" / lit(TopK)).as("recall_ivfpq"))
        .orderBy($"qid")
    },
    Some(s"""
      WITH ex AS ($explodedSql),
      nrm AS ($normsSql),
      $exactTopkCtes,
      $ivfCtes,
      $pqCtes,
      $ivfPqCtes,
      hp AS (
        SELECT e.qid, count(p.tid) AS n_pq_hits
        FROM exact_topk e
        LEFT JOIN pq_topk p ON e.qid = p.qid AND e.tid = p.tid
        GROUP BY e.qid),
      hi AS (
        SELECT e.qid, count(i.tid) AS n_ivfpq_hits
        FROM exact_topk e
        LEFT JOIN ivfpq_topk i ON e.qid = i.qid AND e.tid = i.tid
        GROUP BY e.qid)
      SELECT hp.qid, n_pq_hits, n_ivfpq_hits,
        ${Oracle.qround(s"n_pq_hits * 1.0 / $TopK")} AS recall_pq,
        ${Oracle.qround(s"n_ivfpq_hits * 1.0 / $TopK")} AS recall_ivfpq
      FROM hp JOIN hi ON hp.qid = hi.qid
      ORDER BY hp.qid""")
  )

  /** Symmetric int8 quantization audit — the compression step a 100 TB
    * embedding store runs before serving (4× smaller, then ADC/dot on int8):
    * per vector, the quantization scale (max_abs/127) and the total absolute
    * round-trip error. One map-side pass per row via the native `q8_stats`
    * codegen expression; the per-element errors are exploded and summed
    * through the usual decimal-exact path so the oracle matches
    * bit-for-bit. Every float step is written in the same IEEE association
    * as the DuckDB twin (see ArrayOps.q8Stats). */
  val qEmbedInt8 = GraftQuery(
    "q_embed_int8",
    (spark, dir) => {
      import spark.implicits._
      Tables.spread(Tables.embeddings(spark, dir))
        .select($"vec_id", call_function("q8_stats", $"embedding").as("st"))
        .select($"vec_id", $"st.max_abs".as("max_abs"),
          explode($"st.errs").as("err"))
        .groupBy($"vec_id", $"max_abs")
        .agg(Det.dsum($"err").as("q8_abs_err"))
        .orderBy($"vec_id")
    },
    Some(s"""
      WITH q AS (
        SELECT vec_id,
          coalesce(list_max([abs(x::DOUBLE) for x in embedding]), 0.0)
            AS max_abs,
          embedding
        FROM embeddings),
      e AS (
        SELECT vec_id, max_abs,
          unnest(CASE WHEN max_abs = 0.0
            THEN [0.0 for x in embedding]
            ELSE [abs(floor(x::DOUBLE * 127.0 / max_abs + 0.5)
                      * (max_abs / 127.0) - x::DOUBLE)
                  for x in embedding] END) AS err
        FROM q)
      SELECT vec_id, max_abs, ${Oracle.dsum("err")} AS q8_abs_err
      FROM e GROUP BY vec_id, max_abs ORDER BY vec_id""")
  )

  /** SQ8 recall audit — the retrieval-quality half of the int8 story
    * ([[qEmbedInt8]] measures per-vector distortion; this measures what
    * that distortion DOES to search): per query vector, how many of the
    * exact cosine top-[[TopK]] survive when every database vector is
    * replaced by its symmetric-int8 reconstruction (the scalar
    * quantization tier production vector stores deploy most — 4× smaller
    * than float32, no codebook training, cf. FAISS SQ8). Same audit
    * framing as [[qIvfRecallAudit]]/[[qMrlRecall]]: every approximate
    * tier ships with its recall readout, or it does not ship.
    *
    * Quantization is [[qEmbedInt8]]'s exact scheme (code = floor(x·127 /
    * max_abs + 0.5), reconstruct code·max_abs/127, all-zero vectors pass
    * through), with the reconstruction rounded through REAL — the dtype
    * an int8 store actually serves — identically in both engines. Scale
    * shape: reconstruction is one map-only HOF pass; the ranking reuses
    * [[topkOf]] (broadcast query side, native decimal dot); the recall
    * join is ≤ NQueryVecs·TopK rows. */
  val qSq8Recall = GraftQuery(
    "q_sq8_recall",
    (spark, dir) => {
      import spark.implicits._
      val rec = Tables.spread(Tables.embeddings(spark, dir))
        .select($"vec_id", $"embedding",
          coalesce(array_max(transform($"embedding",
            x => abs(x.cast(DoubleType)))), lit(0.0)).as("ma"))
        .select($"vec_id",
          when($"ma" === 0.0, $"embedding")
            .otherwise(transform($"embedding", x =>
              (floor(x.cast(DoubleType) * lit(127.0) / $"ma" + lit(0.5))
                * ($"ma" / lit(127.0))).cast("float")))
            .as("embedding"))
        .select($"vec_id", $"embedding",
          sqrt(decDot($"embedding", $"embedding")).as("nrm"))
      exactTopk(spark, dir).select($"qid", $"tid")
        .join(topkOf(rec).select($"qid", $"tid", lit(1).as("m")),
          Seq("qid", "tid"), "left")
        .groupBy($"qid").agg(count($"m").as("n_hit"))
        .select($"qid", $"n_hit",
          Det.qround($"n_hit" / lit(TopK)).as("recall"))
        .orderBy($"qid")
    },
    Some(s"""
      WITH ex AS ($explodedSql),
      nrm AS ($normsSql),
      $exactTopkCtes,
      qm AS (
        SELECT vec_id,
          coalesce(list_max([abs(x::DOUBLE) for x in embedding]), 0.0)
            AS ma,
          embedding
        FROM embeddings),
      rex AS (
        SELECT vec_id, unnest(range(len(embedding))) AS pos,
          unnest(CASE WHEN ma = 0.0
            THEN [x::DOUBLE for x in embedding]
            ELSE [(floor(x::DOUBLE * 127.0 / ma + 0.5)
                   * (ma / 127.0))::REAL::DOUBLE for x in embedding] END)
            AS v
        FROM qm),
      rnrm AS (
        SELECT vec_id, sqrt(sum(CAST(v * v AS DECIMAL(38,12)))::DOUBLE)
          AS nrm
        FROM rex GROUP BY vec_id),
      rdots AS (
        SELECT q.vec_id AS qid, t.vec_id AS tid,
          sum(CAST(q.v * t.v AS DECIMAL(38,12)))::DOUBLE AS dot
        FROM rex q JOIN rex t ON q.pos = t.pos AND q.vec_id <> t.vec_id
        WHERE q.vec_id < $NQueryVecs
        GROUP BY q.vec_id, t.vec_id),
      rcos AS (
        SELECT qid, tid,
          ${Oracle.qround("dot / (qn.nrm * tn.nrm)")} AS cosine
        FROM rdots
        JOIN rnrm qn ON qid = qn.vec_id
        JOIN rnrm tn ON tid = tn.vec_id),
      sq8_topk AS (
        SELECT qid, tid FROM (
          SELECT qid, tid,
            row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, tid)
              AS rk
          FROM rcos)
        WHERE rk <= $TopK),
      hits AS (
        SELECT e.qid, count(t.tid) AS n_hit
        FROM exact_topk e
        LEFT JOIN sq8_topk t ON e.qid = t.qid AND e.tid = t.tid
        GROUP BY e.qid)
      SELECT qid, n_hit,
        ${Oracle.qround(s"n_hit * 1.0 / $TopK")} AS recall
      FROM hits
      ORDER BY qid""")
  )

  /** Cluster count and cosine threshold for [[qSemanticDedup]]. K follows
    * the q_kmeans/q_ann_ivf deterministic first-K init; the threshold is
    * tuned to the synthetic corpus' cosine range (max in-cell cosine ≈
    * 0.47-0.53 across SFs — random vectors, no planted twins), exactly as
    * the MinHash band/threshold constants are tuned to its vocabulary. */
  val SemK = 8
  val SemThreshold = 0.35

  /** SemDeDup (Abbas et al. 2023): semantic dedup = k-means the embedding
    * space, then call two documents duplicates when their cosine similarity
    * exceeds a threshold WITHIN the same cluster — the cluster scoping is
    * what turns an O(n²) corpus problem into Σ O(cell²). Emits the
    * duplicate pairs (cell, keeper ia < dropped ib, cosine).
    *
    * Scale shape: assignment is the broadcast-centroid map-only pass
    * (native `dist2_f32_f64`, exact decimal — ties break to the lower
    * centroid like the oracle's row_number); the pair join shuffles on the
    * cell key only; candidates pass a cheap double-fold cosine prefilter
    * (guard band 1e-6, ≳7 orders above the fold's error — the
    * q_embed_neardup_lsh discipline) before the exact decimal cosine. At
    * real scale K grows with n (the paper uses ~11k clusters for 100M
    * docs) to keep cells bounded; K is a library parameter. */
  /** (vec_id, embedding, nrm, cell) — the SemDeDup k-means-cell assignment,
    * shared by the dedup query and the cell audit (one definition, no
    * drift). The norm'd relation is persisted: it feeds the centroid init
    * AND the assignment (and, downstream, both sides of the pair join). */
  private def semAssigned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = withNorm(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = emb.filter($"vec_id" < SemK)
      .select($"vec_id".as("cid"),
        transform($"embedding", v => v.cast(DoubleType)).as("ce"))
    emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"embedding", $"nrm", $"cid",
        call_function("dist2_f32_f64", $"embedding", $"ce").as("d2"))
      .groupBy($"vec_id")
      .agg(min_by($"cid", struct($"d2", $"cid")).as("cell"),
        first($"embedding").as("embedding"), first($"nrm").as("nrm"))
  }

  /** The assignment + verified in-cell duplicate pairs as oracle CTEs
    * (`a1(vec_id, cell)`, `cos(cell, ia, ib, cosine)` — filter `cos` by the
    * threshold to get duplicates), shared by both SemDeDup oracles. */
  private def semCtes: String = s"""
      ex AS ($explodedSql),
      c0 AS (SELECT vec_id AS cid, pos, v AS c FROM ex WHERE vec_id < $SemK),
      d1 AS (
        SELECT e.vec_id, c.cid,
          sum(CAST((e.v - c.c) * (e.v - c.c) AS DECIMAL(38,12)))::DOUBLE AS d2
        FROM ex e JOIN c0 c ON e.pos = c.pos
        GROUP BY e.vec_id, c.cid),
      a1 AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
          FROM d1)
        WHERE rn = 1),
      nrm AS ($normsSql),
      pairs AS (
        SELECT x.cell, x.vec_id AS ia, y.vec_id AS ib
        FROM a1 x JOIN a1 y ON x.cell = y.cell AND x.vec_id < y.vec_id),
      dots AS (
        SELECT p.cell, p.ia, p.ib,
          sum(CAST(ea.v * eb.v AS DECIMAL(38,12)))::DOUBLE AS dot
        FROM pairs p
        JOIN ex ea ON ea.vec_id = p.ia
        JOIN ex eb ON eb.vec_id = p.ib AND ea.pos = eb.pos
        GROUP BY p.cell, p.ia, p.ib),
      cos AS (
        SELECT cell, ia, ib,
          ${Oracle.qround("dot / (na.nrm * nb.nrm)")} AS cosine
        FROM dots
        JOIN nrm na ON ia = na.vec_id
        JOIN nrm nb ON ib = nb.vec_id)"""

  /** Verified in-cell duplicate pairs (cell, ia, ib, cosine ≥ threshold) —
    * the two-phase fold-prefilter / exact-decimal-verify pipeline over the
    * shared assignment. */
  private def semDupPairs(assigned: DataFrame): DataFrame = {
    import assigned.sparkSession.implicits._
    val x = assigned.select($"cell", $"vec_id".as("ia"),
      $"embedding".as("ea"), $"nrm".as("na"))
    val y = assigned.select($"cell", $"vec_id".as("ib"),
      $"embedding".as("eb"), $"nrm".as("nb"))
    x.join(y, Seq("cell")).filter($"ia" < $"ib")
      .filter(call_function("dot_f32_fast", $"ea", $"eb") / ($"na" * $"nb")
        >= lit(SemThreshold - 1e-6))
      .select($"cell", $"ia", $"ib",
        Det.qround(decDot($"ea", $"eb") / ($"na" * $"nb")).as("cosine"))
      .filter($"cosine" >= SemThreshold)
  }

  val qSemanticDedup = GraftQuery(
    "q_semantic_dedup",
    (spark, dir) =>
      semDupPairs(semAssigned(spark, dir))
        .orderBy(col("cell"), col("ia"), col("ib")),
    Some(s"""
      WITH $semCtes
      SELECT cell, ia, ib, cosine FROM cos
      WHERE cosine >= $SemThreshold
      ORDER BY cell, ia, ib""")
  )

  /** SemDeDup parameter audit — the semantic sibling of the dedup family's
    * q_lsh_candidate_audit, for tuning SemK/SemThreshold: non-empty cell
    * count, largest cell, Σ C(cell,2) candidate pairs (the EXACT pair-join
    * work the cell scoping performs — the number that says whether K is
    * large enough, since the paper grows K with n precisely to bound it),
    * verified duplicates, duplicate rate among candidates, and cell skew
    * (max cell over mean cell — balanced cells ≈ 1; a skewed quantizer
    * concentrates pair work). Pure integer/quotient arithmetic on top of
    * the shared assignment — fully oracle-checkable. */
  val qSemdedupCellAudit = GraftQuery(
    "q_semdedup_cell_audit",
    (spark, dir) => {
      import spark.implicits._
      // persisted: feeds the cell histogram AND both sides of the pair join
      val assigned = semAssigned(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nstats = assigned.agg(count(lit(1)).as("n_vecs"))
      val cstats = assigned.groupBy($"cell").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_cells"), max($"sz").as("max_cell"),
          sum(expr("(sz * (sz - 1)) div 2")).as("cell_pairs"))
      val dstats = semDupPairs(assigned).agg(count(lit(1)).as("n_dup"))
      cstats.crossJoin(broadcast(dstats)).crossJoin(broadcast(nstats))
        .select($"n_cells", $"max_cell", $"cell_pairs", $"n_dup",
          Det.qround($"n_dup" / $"cell_pairs").as("dup_rate"),
          Det.qround(($"max_cell" * $"n_cells") / $"n_vecs").as("cell_skew"))
    },
    Some(s"""
      WITH $semCtes,
      nstats AS (SELECT count(*) AS n_vecs FROM a1),
      cells AS (SELECT cell, count(*) AS sz FROM a1 GROUP BY cell),
      cstats AS (SELECT count(*) AS n_cells, max(sz) AS max_cell,
        sum((sz * (sz - 1)) // 2)::BIGINT AS cell_pairs FROM cells),
      dstats AS (SELECT count(*) AS n_dup FROM cos
                 WHERE cosine >= $SemThreshold)
      SELECT n_cells, max_cell, cell_pairs, n_dup,
        ${Oracle.qround("n_dup * 1.0 / cell_pairs")} AS dup_rate,
        ${Oracle.qround("(max_cell * n_cells) * 1.0 / n_vecs")} AS cell_skew
      FROM cstats, dstats, nstats""")
  )

  /** Semantic (embedding-space) contamination against a held-out split —
    * the SemDeDup machinery aimed at q_contamination's question: the
    * n-gram contamination queries catch VERBATIM leakage of eval data
    * into training data, but a paraphrased or re-chunked leak shares no
    * 13-gram while sitting at cosine ≥ τ of a holdout vector. Split
    * vectors 90/10 by salted hash (the q_train_split discipline — split
    * membership is a pure function of vec_id, so ANY engine recomputes
    * it identically), then count, per k-means cell, the train vectors
    * with at least one ≥τ holdout neighbor IN-CELL. A leaked train doc
    * is one the eval set can grade by memory.
    *
    * Scale shape: the shared [[semAssigned]] cell assignment is the one
    * corpus exchange; cross-split pairs are CELL-scoped (≈ 0.1·Σ cell²
    * with a 10% holdout, never all-pairs) with the fast-dot prefilter /
    * exact-decimal verify two-phase; the readout is ≤[[SemK]] rows.
    * Exactness: counts are integers, cosine rides the shared decimal-dot
    * qround, leak_rate is one guarded qround division. */
  val qSemanticContamination = GraftQuery(
    "q_semantic_contamination",
    (spark, dir) => {
      import spark.implicits._
      val assigned = semAssigned(spark, dir)
        .withColumn("holdout",
          expr(PipelineOps.u32Expr(
            "concat('semsplit:', cast(vec_id as string))") + " % 10 = 9"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tr = assigned.filter(!$"holdout").select($"cell",
        $"vec_id".as("ia"), $"embedding".as("ea"), $"nrm".as("na"))
      val ho = assigned.filter($"holdout").select($"cell",
        $"vec_id".as("ib"), $"embedding".as("eb"), $"nrm".as("nb"))
      val leaks = tr.join(ho, Seq("cell"))
        .filter(call_function("dot_f32_fast", $"ea", $"eb") / ($"na" * $"nb")
          >= lit(SemThreshold - 1e-6))
        .select($"cell", $"ia",
          Det.qround(decDot($"ea", $"eb") / ($"na" * $"nb")).as("cosine"))
        .filter($"cosine" >= SemThreshold)
      val cellStats = assigned.groupBy($"cell").agg(
        sum(when(!$"holdout", 1L).otherwise(0L)).as("n_train"),
        sum(when($"holdout", 1L).otherwise(0L)).as("n_holdout"))
      val leakStats = leaks.groupBy($"cell")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct($"ia").as("n_leaked"))
      cellStats.join(leakStats, Seq("cell"), "left")
        .select($"cell", $"n_train", $"n_holdout",
          coalesce($"n_pairs", lit(0L)).as("n_pairs"),
          coalesce($"n_leaked", lit(0L)).as("n_leaked"),
          when($"n_train" > 0, Det.qround(
            expr("CAST(coalesce(n_leaked, 0) AS DOUBLE) / n_train")))
            .as("leak_rate"))
        .orderBy($"cell")
    },
    Some(s"""
      WITH $semCtes,
      sp AS (
        SELECT vec_id,
          ${PipelineOps.u32Sql("'semsplit:' || CAST(vec_id AS VARCHAR)")}
            % 10 = 9 AS holdout
        FROM a1),
      cellstats AS (
        SELECT cell,
          sum(CASE WHEN NOT holdout THEN 1 ELSE 0 END)::BIGINT AS n_train,
          sum(CASE WHEN holdout THEN 1 ELSE 0 END)::BIGINT AS n_holdout
        FROM a1 JOIN sp USING (vec_id) GROUP BY 1),
      xp AS (
        SELECT x.cell, x.vec_id AS ia, y.vec_id AS ib
        FROM a1 x JOIN sp sx ON x.vec_id = sx.vec_id AND NOT sx.holdout
        JOIN a1 y ON x.cell = y.cell
        JOIN sp sy ON y.vec_id = sy.vec_id AND sy.holdout),
      xdots AS (
        SELECT p.cell, p.ia, p.ib,
          sum(CAST(ea.v * eb.v AS DECIMAL(38,12)))::DOUBLE AS dot
        FROM xp p
        JOIN ex ea ON ea.vec_id = p.ia
        JOIN ex eb ON eb.vec_id = p.ib AND ea.pos = eb.pos
        GROUP BY 1, 2, 3),
      xcos AS (
        SELECT cell, ia, ib,
          ${Oracle.qround("dot / (na.nrm * nb.nrm)")} AS cosine
        FROM xdots
        JOIN nrm na ON ia = na.vec_id
        JOIN nrm nb ON ib = nb.vec_id),
      lk AS (
        SELECT cell, count(*)::BIGINT AS n_pairs,
          count(DISTINCT ia)::BIGINT AS n_leaked
        FROM xcos WHERE cosine >= $SemThreshold GROUP BY 1)
      SELECT c.cell, c.n_train, c.n_holdout,
        coalesce(lk.n_pairs, 0)::BIGINT AS n_pairs,
        coalesce(lk.n_leaked, 0)::BIGINT AS n_leaked,
        CASE WHEN c.n_train > 0 THEN ${Oracle.qround(
          "CAST(coalesce(lk.n_leaked, 0) AS DOUBLE) / c.n_train")}
        END AS leak_rate
      FROM cellstats c LEFT JOIN lk USING (cell)
      ORDER BY c.cell""")
  )

  /** Embedding covariance matrix (population, upper triangle) — the
    * whitening/PCA-prep statistic of the embedding space (decorrelating
    * dimensions before product quantization or IVF routing is the standard
    * OPQ-style preprocessing; the diagonal alone is the per-dimension
    * variance audit): `cov(i,j) = (Σvᵢvⱼ − ΣvᵢΣvⱼ/n)/n` over all vectors.
    *
    * Scale shape: the native codegen `upper_products` expression streams
    * each row's d(d+1)/2 (i, j, p) products into a partial+final aggregate
    * keyed on the dimension pair — the shuffle carries d(d+1)/2 rows per
    * partition HOWEVER large the corpus (the MLlib RowMatrix.computeGramian
    * treeAggregate shape, expressed relationally so it stays on the
    * oracle-verified surface); the d-row moment relations then broadcast.
    *
    * Exactness: float→double widening is exact, each product is one IEEE
    * multiply, both sums go through the scale-12 decimal cast
    * (order-independent), and the covariance combination is a pinned
    * sequence of IEEE double ops over identical inputs. */
  /** Upper-triangle covariance relation (i, j, cov) with the 6-dp-rounded
    * entries — shared by [[qEmbedCovariance]] (which just orders it) and
    * [[qPcaPower]] (which iterates on it; sharing the ROUNDED matrix is
    * what keeps both engines' power iterations on bit-identical inputs). */
  private def covUpper(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val embT = Tables.embeddings(spark, dir)
    val emb = Tables.spread(embT)
    // count off the bare scan: spread()'s repartition exists for the per-row
    // product work, a row count through it would pay the exchange for nothing
    val n = embT.agg(count(lit(1)).as("n"))
    // eager: consumed twice below under DIFFERENT projections (i-keyed and
    // j-renamed broadcasts canonicalize differently, so exchange reuse never
    // fires and the corpus posexplode pass ran twice — the q_minhash_tune law)
    val sx = Tables.eager(emb
      .select(posexplode($"embedding").as(Seq("i", "v")))
      .groupBy($"i")
      .agg(sum($"v".cast(DoubleType).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("sx")))
    emb
      .select(explode(call_function("upper_products", $"embedding")).as("c"))
      .select($"c.i".as("i"), $"c.j".as("j"), $"c.p".as("p"))
      .groupBy($"i", $"j")
      .agg(sum($"p".cast(DecimalType(38, 12))).cast(DoubleType).as("sxy"))
      .join(broadcast(sx), Seq("i"))
      .join(broadcast(sx.select($"i".as("j"), $"sx".as("sy"))), Seq("j"))
      .crossJoin(broadcast(n))
      .select($"i".cast(LongType).as("i"), $"j".cast(LongType).as("j"),
        Det.qround(($"sxy" - $"sx" * $"sy" / $"n".cast(DoubleType))
          / $"n".cast(DoubleType)).as("cov"))
  }

  /** Oracle CTE chain ending in `cov(i, j, cov)` — the DuckDB twin of
    * [[covUpper]]. */
  private def covSql: String = s"""
      pr AS (
        SELECT unnest(flatten(
          [[{'i': i, 'j': j,
             'p': embedding[i+1]::DOUBLE * embedding[j+1]::DOUBLE}
            for j in range(i, len(embedding))]
           for i in range(0, len(embedding))])) AS c
        FROM embeddings),
      sxy AS (
        SELECT c.i AS i, c.j AS j,
          sum(CAST(c.p AS DECIMAL(38,12)))::DOUBLE AS sxy
        FROM pr GROUP BY c.i, c.j),
      sx AS (
        SELECT pos AS i, sum(CAST(v AS DECIMAL(38,12)))::DOUBLE AS sx
        FROM ($explodedSql) GROUP BY pos),
      nn AS (SELECT count(*)::DOUBLE AS n FROM embeddings),
      cov AS (
        SELECT sxy.i::BIGINT AS i, sxy.j::BIGINT AS j,
          ${Oracle.qround("(sxy - x.sx * y.sx / n) / n")} AS cov
        FROM sxy
        JOIN sx x ON x.i = sxy.i
        JOIN sx y ON y.i = sxy.j
        CROSS JOIN nn)"""

  val qEmbedCovariance = GraftQuery(
    "q_embed_covariance",
    (spark, dir) =>
      covUpper(spark, dir).orderBy(col("i"), col("j")),
    Some(s"""
      WITH $covSql
      SELECT i, j, cov FROM cov ORDER BY i, j""")
  )

  /** Power-iteration count for [[qPcaPower]]. Fixed (not convergence-
    * tested) so the computation is a deterministic finite plan in both
    * engines; 4 steps resolve the top component to well past the 6-dp
    * output rounding whenever the spectral gap is moderate (error decays
    * as (λ₂/λ₁)^k). */
  val PowerIters = 4

  /** Top principal component of the embedding space by power iteration —
    * the OPQ/whitening prep step on top of [[qEmbedCovariance]]: the
    * dominant eigenvector is the rotation axis PCA-based dimension
    * reduction, ANN pre-rotation, and embedding-drift monitoring all start
    * from. Output: one row per dimension with its loading, plus the
    * Rayleigh-quotient eigenvalue estimate (the L2 norm of the last
    * un-normalized iterate — since its input is unit-norm, ‖Cv‖ → λ₁).
    *
    * Exactness: both engines iterate on the SAME 6-dp-rounded covariance
    * entries ([[covUpper]]); each mat-vec addend `cov·vⱼ` is one IEEE
    * multiply summed through the scale-12 decimal cast
    * (order-independent), the norm is one sqrt of such a sum, and v₀ =
    * 1/√d is a pinned double expression — so every iterate is
    * bit-identical across engines and the 6-dp output rounding is safe.
    *
    * Scale shape: the corpus-priced work is covUpper's d(d+1)/2-per-
    * partition Gramian exchange (done ONCE — the d(d+1)/2-row TRIANGLE is
    * `localCheckpoint`ed before the d²-row mirror union, so the union's two
    * branches read the materialized leaf instead of each re-running the
    * Gramian; MLlib's own iterative-algorithm discipline:
    * without lineage truncation each of the [[PowerIters]] unrolled steps
    * re-embeds the whole covariance subtree TWICE — once under the norm,
    * once under the normalized iterate — and the logical plan grows 2^k
    * copies that Catalyst re-optimizes from scratch); each d-row iterate is
    * likewise checkpointed, so every step plans as one flat
    * matrix-join-broadcast over materialized leaves. No corpus re-scan, no
    * driver-side collect. */
  val qPcaPower = GraftQuery(
    "q_pca_power",
    (spark, dir) => {
      import spark.implicits._
      // checkpoint the UPPER triangle, not the mirrored union: the union's
      // two branches both embed covUpper, so checkpointing only the union
      // ran the corpus-priced Gramian exchange TWICE inside the one
      // materialization job (Prof -stages: two ~1.5 s product-agg stages).
      // The mirror is then a flat d²-row map over the materialized leaf.
      val up = covUpper(spark, dir).localCheckpoint()
      val full = up.union(
        up.filter($"i" =!= $"j").select($"j".as("i"), $"i".as("j"), $"cov"))
      // d and v₀ off the d-row DIAGONAL slice of the checkpointed triangle
      // (every dimension has its (i,i) row) — not a distinct over the
      // d²-row mirrored relation
      val diag = up.filter($"i" === $"j").select($"i")
      val d = diag.agg(count(lit(1)).as("d"))
      // only `w` needs truncating: each iterate's norm and normalization
      // derive FLATLY from the checkpointed w, so checkpointing them too
      // would just add eager jobs (~130 ms each) without shrinking any plan
      var v = diag
        .crossJoin(broadcast(d))
        .select($"i", (lit(1.0) / sqrt($"d".cast(DoubleType))).as("v"))
      var lambda: DataFrame = null
      for (_ <- 1 to PowerIters) {
        val w = full
          .join(broadcast(v.select($"i".as("j"), $"v".as("vj"))), Seq("j"))
          .groupBy($"i")
          .agg(sum(($"cov" * $"vj").cast(DecimalType(38, 12)))
            .cast(DoubleType).as("w"))
          .localCheckpoint()
        val nrm = w.agg(
          sqrt(sum(($"w" * $"w").cast(DecimalType(38, 12))).cast(DoubleType))
            .as("nrm"))
        lambda = nrm
        v = w.crossJoin(broadcast(nrm)).select($"i", ($"w" / $"nrm").as("v"))
      }
      v.crossJoin(broadcast(lambda))
        .select($"i".as("dim"), Det.qround($"v").as("loading"),
          Det.qround($"nrm").as("lambda"))
        .orderBy($"dim")
    },
    Some {
      val iters = (1 to PowerIters).map { k =>
        val prev = if (k == 1) "v0" else s"v${k - 1}"
        s"""
      w$k AS (
        SELECT f.i, sum(CAST(f.cov * p.v AS DECIMAL(38,12)))::DOUBLE AS w
        FROM full_m f JOIN $prev p ON p.i = f.j GROUP BY f.i),
      n$k AS (
        SELECT sqrt(sum(CAST(w * w AS DECIMAL(38,12)))::DOUBLE) AS nrm
        FROM w$k),
      v$k AS (SELECT i, w / nrm AS v FROM w$k, n$k)"""
      }.mkString(",")
      s"""
      WITH $covSql,
      full_m AS (
        SELECT i, j, cov FROM cov
        UNION ALL
        SELECT j AS i, i AS j, cov FROM cov WHERE i <> j),
      dd AS (SELECT count(DISTINCT i)::DOUBLE AS d FROM full_m),
      v0 AS (SELECT DISTINCT i, 1.0 / sqrt(d) AS v FROM full_m, dd),$iters
      SELECT i AS dim,
        ${Oracle.qround("v")} AS loading,
        ${Oracle.qround("nrm")} AS lambda
      FROM v$PowerIters, n$PowerIters
      ORDER BY dim"""
    }
  )

  /** Class-conditional embedding profile: per (label, dimension) mean and
    * variance, plus the per-label exact-decimal mean vector norm — the
    * drift-monitoring table an embedding pipeline diffs across ingestion
    * batches (a dimension whose per-label mean moved is an encoder or
    * preprocessing change; a norm shift is a normalization regression; the
    * global twin [[qEmbedCovariance]] sees neither once classes move in
    * opposite directions and cancel).
    *
    * Exactness: float→double widening is exact; first/second moments go
    * through the scale-12 decimal cast (order-independent); the variance
    * combination `(sxx − sx²/n)/n` is the covSql-precedent pinned IEEE
    * sequence; norms are one sqrt of a decimal-summed dot each
    * (map-side native dot_f32, the normsSql twin).
    *
    * Scale shape: ONE posexplode exchange keyed (label, dim) — d rows per
    * vector, partial+final aggregated — plus a label-keyed rollup of the
    * map-side norms; output is |labels|·d rows. */
  val qEmbedLabelProfile = GraftQuery(
    "q_embed_label_profile",
    (spark, dir) => {
      import spark.implicits._
      val emb = Tables.spread(Tables.embeddings(spark, dir))
      val moments = emb
        .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
        .groupBy($"label", $"dim")
        .agg(count(lit(1)).as("n"),
          sum($"v".cast(DoubleType).cast(DecimalType(38, 12)))
            .cast(DoubleType).as("sx"),
          sum(($"v".cast(DoubleType) * $"v".cast(DoubleType))
            .cast(DecimalType(38, 12))).cast(DoubleType).as("sxx"))
      val norms = emb
        .select($"label",
          sqrt(call_function("dot_f32", $"embedding", $"embedding")).as("nrm"))
        .groupBy($"label")
        .agg(Det.davg($"nrm").as("avg_norm"))
      moments
        .join(broadcast(norms), Seq("label"))
        .select($"label", $"dim".cast(LongType).as("dim"), $"n",
          Det.qround($"sx" / $"n".cast(DoubleType)).as("mean"),
          Det.qround(($"sxx" - $"sx" * $"sx" / $"n".cast(DoubleType))
            / $"n".cast(DoubleType)).as("variance"),
          $"avg_norm")
        .orderBy($"label", $"dim")
    },
    Some(s"""
      WITH ex AS (
        SELECT label, unnest(range(len(embedding))) AS dim,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      m AS (
        SELECT label, dim, count(*) AS n,
          sum(CAST(v AS DECIMAL(38,12)))::DOUBLE AS sx,
          sum(CAST(v * v AS DECIMAL(38,12)))::DOUBLE AS sxx
        FROM ex GROUP BY label, dim),
      nr AS (
        SELECT label,
          sqrt(sum(CAST(vv.p AS DECIMAL(38,12)))::DOUBLE) AS nrm
        FROM (SELECT vec_id, label,
                unnest([x::DOUBLE * x::DOUBLE for x in embedding]) AS p
              FROM embeddings) vv
        GROUP BY label, vec_id),
      an AS (SELECT label, ${Oracle.davg("nrm")} AS avg_norm FROM nr GROUP BY label)
      SELECT m.label, dim::BIGINT AS dim, n::BIGINT AS n,
        ${Oracle.qround("sx / n")} AS mean,
        ${Oracle.qround("(sxx - sx * sx / n) / n")} AS variance,
        an.avg_norm
      FROM m JOIN an ON m.label = an.label
      ORDER BY m.label, dim""")
  )

  /** Pairwise label-centroid cosine matrix: how separated the embedding
    * classes are — the drift companion to [[qEmbedLabelProfile]] (per-class
    * moments say a class MOVED; this says whether classes are COLLAPSING
    * toward each other, the failure mode that degrades every downstream
    * classifier and IVF routing table). Centroids are 6-dp-rounded before
    * the pairing (the covUpper discipline: both engines compute the
    * pairwise math on bit-identical inputs).
    *
    * Scale shape: centroids via one (label, dim) exchange; the pairing is
    * a |labels|·d × |labels|·d dim-keyed join of a MODEL-SIZED relation —
    * never touches the corpus again. */
  val qLabelCentroidDist = GraftQuery(
    "q_label_centroid_dist",
    (spark, dir) => {
      import spark.implicits._
      val cent = Tables.spread(Tables.embeddings(spark, dir))
        .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
        .groupBy($"label", $"dim")
        .agg(Det.qround(
          sum($"v".cast(DoubleType).cast(DecimalType(38, 12))).cast(DoubleType)
            / count(lit(1))).as("c"))
      cent.as("a").join(cent.as("b"),
          $"a.dim" === $"b.dim" && $"a.label" < $"b.label")
        .groupBy($"a.label".as("label_a"), $"b.label".as("label_b"))
        .agg(
          sum(($"a.c" * $"b.c").cast(DecimalType(38, 12)))
            .cast(DoubleType).as("dot"),
          sum(($"a.c" * $"a.c").cast(DecimalType(38, 12)))
            .cast(DoubleType).as("na"),
          sum(($"b.c" * $"b.c").cast(DecimalType(38, 12)))
            .cast(DoubleType).as("nb"))
        .select($"label_a", $"label_b",
          when($"na" > 0 && $"nb" > 0,
            Det.qround($"dot" / (sqrt($"na") * sqrt($"nb")))).as("cosine"))
        .orderBy($"label_a", $"label_b")
    },
    Some(s"""
      WITH ex AS (
        SELECT label, unnest(range(len(embedding))) AS dim,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      cent AS (
        SELECT label, dim,
          ${Oracle.qround("sum(CAST(v AS DECIMAL(38,12)))::DOUBLE / count(*)")}
            AS c
        FROM ex GROUP BY label, dim),
      p AS (
        SELECT a.label AS label_a, b.label AS label_b,
          sum(CAST(a.c * b.c AS DECIMAL(38,12)))::DOUBLE AS dot,
          sum(CAST(a.c * a.c AS DECIMAL(38,12)))::DOUBLE AS na,
          sum(CAST(b.c * b.c AS DECIMAL(38,12)))::DOUBLE AS nb
        FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        GROUP BY label_a, label_b)
      SELECT label_a, label_b,
        CASE WHEN na > 0 AND nb > 0
          THEN ${Oracle.qround("dot / (sqrt(na) * sqrt(nb))")} END AS cosine
      FROM p ORDER BY label_a, label_b""")
  )


  /** Retained prefix dimensions for the MRL truncation audit (64 → 32). */
  val MrlDims = 32

  /** Matryoshka-truncation recall audit (Kusupati et al. 2022): rank with
    * only the first [[MrlDims]] of 64 dimensions and measure how much of
    * the full-precision top-k survives — the evaluation a deployment runs
    * before shipping prefix-truncated embeddings (2× memory/bandwidth cut
    * on every ANN tier). The third recall audit beside IVF (probe loss)
    * and PQ (quantization loss); this one measures DIMENSION loss, and
    * like them it is the retuning surface: a recall drop at 100 TB says
    * "keep more dims", measured on the same relation the index serves.
    *
    * Exactness: the truncated ranking reuses the exact-decimal cosine
    * pipeline ([[topkOf]]) over `slice(embedding, 1, 32)`, so both
    * rankings are bit-identical cross-engine and the overlap count is an
    * integer — no float enters the audit row beyond the recall ratio.
    * On the driver's RANDOM embeddings recall reads 0–0.2: random vectors
    * have no Matryoshka structure (information is uniform across dims,
    * not front-loaded by MRL training), so halving dims genuinely
    * destroys the ranking — the audit reporting that is it working.
    * Scale shape: identical to the exact tier (broadcast query side, one
    * codegen'd fold per pair, per-qid top-k window over the bounded
    * candidate relation). */
  val qMrlRecall = GraftQuery(
    "q_mrl_recall",
    (spark, dir) => {
      import spark.implicits._
      val trunc = Tables.spread(Tables.embeddings(spark, dir))
        .select($"vec_id", slice($"embedding", 1, MrlDims).as("embedding"))
        .select($"vec_id", $"embedding",
          sqrt(decDot($"embedding", $"embedding")).as("nrm"))
      exactTopk(spark, dir).select($"qid", $"tid")
        .join(topkOf(trunc).select($"qid", $"tid", lit(1).as("m")),
          Seq("qid", "tid"), "left")
        .groupBy($"qid").agg(count($"m").as("n_hit"))
        .select($"qid", $"n_hit",
          Det.qround($"n_hit" / lit(TopK)).as("recall"))
        .orderBy($"qid")
    },
    Some(s"""
      WITH ex AS ($explodedSql),
      nrm AS ($normsSql),
      $exactTopkCtes,
      tex AS (SELECT vec_id, pos, v FROM ex WHERE pos < $MrlDims),
      tnrm AS (
        SELECT vec_id, sqrt(sum(CAST(v * v AS DECIMAL(38,12)))::DOUBLE) AS nrm
        FROM tex GROUP BY vec_id),
      tdots AS (
        SELECT q.vec_id AS qid, t.vec_id AS tid,
          sum(CAST(q.v * t.v AS DECIMAL(38,12)))::DOUBLE AS dot
        FROM tex q JOIN tex t ON q.pos = t.pos AND q.vec_id <> t.vec_id
        WHERE q.vec_id < $NQueryVecs
        GROUP BY q.vec_id, t.vec_id),
      tcos AS (
        SELECT qid, tid,
          ${Oracle.qround("dot / (qn.nrm * tn.nrm)")} AS cosine
        FROM tdots
        JOIN tnrm qn ON qid = qn.vec_id
        JOIN tnrm tn ON tid = tn.vec_id),
      trunc_topk AS (
        SELECT qid, tid FROM (
          SELECT qid, tid,
            row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, tid)
              AS rk
          FROM tcos)
        WHERE rk <= $TopK),
      hits AS (
        SELECT e.qid, count(t.tid) AS n_hit
        FROM exact_topk e
        LEFT JOIN trunc_topk t ON e.qid = t.qid AND e.tid = t.tid
        GROUP BY e.qid)
      SELECT qid, n_hit,
        ${Oracle.qround(s"n_hit * 1.0 / $TopK")} AS recall
      FROM hits
      ORDER BY qid""")
  )

  /** Embedding-space health audit — norm statistics and ANISOTROPY, the
    * "is this embedding space collapsing" signals (Arora et al.'s partition
    *-function view; Ethayarajh 2019): mean norm and its coefficient of
    * variation (norm concentration), and ‖mean vector‖² / E[‖v‖²] — 0 for
    * a perfectly isotropic cloud, → 1 as all vectors collapse onto one
    * direction. The metric every retrieval/semantic-dedup stack should
    * read before trusting cosine distances.
    *
    * Scale shape: TWO bounded collapses of one persisted scan — per-vector
    * ‖v‖² via the exact-decimal `dot_f32` (map-side) into a 1-row moment
    * aggregate, and the per-dimension mean vector via the q_kmeans
    * (pos)-keyed decimal aggregate (d rows cross the exchange per
    * partition); everything downstream is d-sized. Norm variance needs NO
    * extra moment: Var‖v‖ = E[‖v‖²] − E[‖v‖]². */
  /** UNROUNDED norm-moment partials (n, Σ‖v‖, Σ‖v‖² as exact decimals) —
    * ADDITIVE, maintained per batch by graft.streaming.StreamIso. */
  private[graft] def isoNormsDec(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    emb.select(call_function("dot_f32", $"embedding", $"embedding").as("n2"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(sqrt(n2) AS DECIMAL(38,9))")).as("sn_d"),
        sum(expr("CAST(n2 AS DECIMAL(38,9))")).as("sn2_d"))
  }

  /** UNROUNDED per-dimension sum partials (pos, cnt, Σv as decimal) —
    * additive likewise. */
  private[graft] def isoPosDec(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    emb.select(posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"pos")
      .agg(count(lit(1)).as("cnt"),
        sum($"v".cast(DecimalType(38, 12))).as("sv_d"))
  }

  /** The isotropy readout from the two partial relations — shared by
    * [[qEmbedIsotropy]] and the streaming maintainer's fold. */
  private[graft] def isoReport(normsDec: DataFrame,
      posDec: DataFrame): DataFrame = {
    val spark = normsDec.sparkSession
    import spark.implicits._
    val ns = normsDec.select($"n",
      $"sn_d".cast(DoubleType).as("sn"),
      $"sn2_d".cast(DoubleType).as("sn2"))
    val md = posDec.select($"pos",
      ($"sv_d".cast(DoubleType) / $"cnt").as("m"))
    val mm = md.agg(count(lit(1)).as("dims"),
      sum(expr("CAST(m * m AS DECIMAL(38,9))")).cast(DoubleType).as("m2"))
    ns.crossJoin(broadcast(mm))
      .select($"n".as("n_vecs"), $"dims",
        Det.qround(expr("sn / n")).as("mean_norm"),
        Det.qround(expr(
          "sqrt(greatest(sn2 / n - (sn / n) * (sn / n), 0.0)) / (sn / n)"))
          .as("norm_cv"),
        Det.qround(expr("m2 / (sn2 / n)")).as("anisotropy"))
      .orderBy($"n_vecs")
  }

  val qEmbedIsotropy = GraftQuery(
    "q_embed_isotropy",
    (spark, dir) => {
      import spark.implicits._
      val emb = Tables.spread(Tables.embeddings(spark, dir))
        .select($"vec_id", $"embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      isoReport(isoNormsDec(emb), isoPosDec(emb))
    },
    Some(s"""
      WITH ex AS (
        SELECT vec_id, unnest(range(len(embedding))) AS pos,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      n2 AS (
        SELECT vec_id,
          (sum(CAST(v * v AS DECIMAL(38,12))))::DOUBLE AS n2
        FROM ex GROUP BY 1),
      ns AS (
        SELECT count(*)::BIGINT AS n,
          (sum(CAST(sqrt(n2) AS DECIMAL(38,9))))::DOUBLE AS sn,
          (sum(CAST(n2 AS DECIMAL(38,9))))::DOUBLE AS sn2
        FROM n2),
      md AS (
        SELECT pos, (sum(CAST(v AS DECIMAL(38,12))))::DOUBLE / count(*) AS m
        FROM ex GROUP BY pos),
      mm AS (
        SELECT count(*)::BIGINT AS dims,
          (sum(CAST(m * m AS DECIMAL(38,9))))::DOUBLE AS m2
        FROM md)
      SELECT n AS n_vecs, dims,
        ${Oracle.qround("sn / n")} AS mean_norm,
        ${Oracle.qround(
          "sqrt(greatest(sn2 / n - (sn / n) * (sn / n), 0.0)) / (sn / n)")}
          AS norm_cv,
        ${Oracle.qround("m2 / (sn2 / n)")} AS anisotropy
      FROM ns CROSS JOIN mm ORDER BY n_vecs""")
  )

  /** Weiszfeld rounds for [[qGeomedian]]. */
  val GmIters = 3

  /** Geometric median of the embedding corpus by Weiszfeld iteration
    * (Weiszfeld 1937; the robust-aggregation primitive — unlike the mean,
    * a coordinate-wise breakdown needs 50% adversarial mass, which is why
    * robust distributed aggregation and outlier-resistant corpus
    * centroids use it): x⁺ = Σ v/‖v−x‖ / Σ 1/‖v−x‖, [[GmIters]] rounds
    * seeded at the mean, points coincident with the estimate excluded
    * (the standard Weiszfeld guard). Emits each dimension's robust
    * coordinate BESIDE the mean's — the gap profile is the outlier-mass
    * readout.
    *
    * Scale shape (the q_kcenter_select lesson applied): each round is ONE
    * broadcast-model map pass (native `dist2_f32_f64` against the 1-row
    * estimate) plus ONE (dim)-keyed weighted-mean shuffle (64 rows out,
    * map-side combined); the 64-double estimate is driver-collected and
    * re-entered as a LITERAL between rounds — the licensed driver-side
    * state, no per-round broadcast exchange. Exactness: d² decimal-
    * accumulated, w = 1/√d² one IEEE tree, w·v addends ride
    * DECIMAL(38,12); the oracle unrolls the rounds (q_pagerank
    * discipline). */
  val qGeomedian = GraftQuery(
    "q_geomedian",
    (spark, dir) => {
      import spark.implicits._
      val emb = Tables.spread(Tables.embeddings(spark, dir))
        .select($"vec_id", $"embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def weightedCoords(est: Seq[Double]): Array[Double] = {
        val ce = lit(est.toArray)
        emb
          .withColumn("d2", call_function("dist2_f32_f64", $"embedding", ce))
          .filter($"d2" > 0)
          .withColumn("w", lit(1.0) / sqrt($"d2"))
          .select($"w", posexplode($"embedding").as(Seq("pos", "v")))
          .groupBy($"pos")
          .agg((sum(($"w" * $"v").cast(DecimalType(38, 12)))
            .cast(DoubleType) /
            sum($"w".cast(DecimalType(38, 12))).cast(DoubleType)).as("c"))
          .orderBy($"pos").select($"c").as[Double].collect()
      }
      val mean = emb
        .select(posexplode($"embedding").as(Seq("pos", "v")))
        .groupBy($"pos")
        .agg((sum($"v".cast(DecimalType(38, 12))).cast(DoubleType) /
          count(lit(1))).as("c"))
        .orderBy($"pos").select($"c").as[Double].collect()
      var est = mean.toSeq
      for (_ <- 1 to GmIters) est = weightedCoords(est).toSeq
      est.zip(mean).zipWithIndex
        .map { case ((g, m), i) => (i.toLong, g, m) }
        .toDF("pos", "gm0", "mean0")
        .select($"pos", Det.qround($"gm0").as("gm_coord"),
          Det.qround($"mean0").as("mean_coord"))
        .orderBy($"pos")
    },
    Some {
      def round(i: Int): String = {
        val prev = if (i == 1) "m0" else s"m${i - 1}"
        s"""
      d$i AS (
        SELECT e.vec_id,
          sum(CAST((e.v - p.c) * (e.v - p.c) AS DECIMAL(38,12)))::DOUBLE
            AS d2
        FROM ex e JOIN $prev p ON e.pos = p.pos
        GROUP BY e.vec_id),
      w$i AS (
        SELECT vec_id, 1e0 / sqrt(d2) AS w FROM d$i WHERE d2 > 0),
      m$i AS (
        SELECT e.pos,
          sum(CAST(w.w * e.v AS DECIMAL(38,12)))::DOUBLE /
          sum(CAST(w.w AS DECIMAL(38,12)))::DOUBLE AS c
        FROM ex e JOIN w$i w ON e.vec_id = w.vec_id
        GROUP BY e.pos)"""
      }
      s"""
      WITH ex AS (
        SELECT vec_id, unnest(range(len(embedding))) AS pos,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      m0 AS (
        SELECT pos, sum(CAST(v AS DECIMAL(38,12)))::DOUBLE / count(*) AS c
        FROM ex GROUP BY pos),
      ${(1 to GmIters).map(round).mkString(",")}
      SELECT g.pos::BIGINT AS pos,
        ${Oracle.qround("g.c")} AS gm_coord,
        ${Oracle.qround("m.c")} AS mean_coord
      FROM m$GmIters g JOIN m0 m USING (pos)
      ORDER BY pos"""
    }
  )

  // ------------------------------------------------------- MMD drift —

  /** One-vs-rest mean/moment deltas for [[qMmdDrift]] — NULL-guarded for
    * the degenerate single-group corpus (no rest to compare against).
    * Shared textually with the oracle over columns (sx|sxy, tx|txy, ngd,
    * ntd). */
  private val MmdD1 =
    "CASE WHEN ntd > ngd THEN sx / ngd - (tx - sx) / (ntd - ngd) END"
  private val MmdD2 =
    "CASE WHEN ntd > ngd THEN sxy / ngd - (txy - sxy) / (ntd - ngd) END"

  /** Off-diagonal Frobenius weight: the upper triangle stores each (i<j)
    * entry once, the symmetric matrix counts it twice. */
  private val MmdW2 = "(CASE WHEN i = j THEN 1.0 ELSE 2.0 END) * d2 * d2"

  /** Core of [[qMmdDrift]] over any (label, embedding) relation —
    * factored so specs can plant distributions with known moments. */
  private[graft] def mmdDriftOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val nl = emb.groupBy($"label").agg(count(lit(1)).as("ng"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nt = nl.agg(sum($"ng").as("nt_"))
    val s1 = emb
      .select($"label", posexplode($"embedding").as(Seq("i", "v")))
      .groupBy($"label", $"i")
      .agg(sum($"v".cast(DoubleType).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("sx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t1 = s1.groupBy($"i")
      .agg(sum($"sx".cast(DecimalType(38, 12))).cast(DoubleType).as("tx"))
    val s2 = emb
      .select($"label",
        explode(call_function("upper_products", $"embedding")).as("c"))
      .select($"label", $"c.i".as("i"), $"c.j".as("j"), $"c.p".as("p"))
      .groupBy($"label", $"i", $"j")
      .agg(sum($"p".cast(DecimalType(38, 12))).cast(DoubleType).as("sxy"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t2 = s2.groupBy($"i", $"j")
      .agg(sum($"sxy".cast(DecimalType(38, 12))).cast(DoubleType).as("txy"))
    val lin = s1.join(broadcast(t1), Seq("i"))
      .join(broadcast(nl), Seq("label")).crossJoin(broadcast(nt))
      .withColumn("ngd", $"ng".cast(DoubleType))
      .withColumn("ntd", $"nt_".cast(DoubleType))
      .withColumn("d1", expr(MmdD1))
      .groupBy($"label").agg(Det.dsum(expr("d1 * d1")).as("mmd2_lin"))
    val quad = s2.join(broadcast(t2), Seq("i", "j"))
      .join(broadcast(nl), Seq("label")).crossJoin(broadcast(nt))
      .withColumn("ngd", $"ng".cast(DoubleType))
      .withColumn("ntd", $"nt_".cast(DoubleType))
      .withColumn("d2", expr(MmdD2))
      .groupBy($"label").agg(Det.dsum(expr(MmdW2)).as("mmd2_quad"))
    nl.join(lin, Seq("label")).join(quad, Seq("label"))
      .select($"label", $"ng".as("n_vecs"), $"mmd2_lin", $"mmd2_quad")
      .orderBy($"label")
  }

  /** Kernel two-sample drift between each label's embedding distribution
    * and the rest of the corpus (Gretton et al. 2012, "A Kernel
    * Two-Sample Test", JMLR 13 — the biased V-statistic MMD²), in the
    * two kernels whose population MMD collapses to CLOSED-FORM moment
    * algebra: linear k(x,y)=x·y gives MMD² = ‖μ_g − μ_rest‖² (pure mean
    * shift), and the homogeneous quadratic k(x,y)=(x·y)² gives
    * MMD² = ‖M_g − M_rest‖²_F with M = E[xxᵀ] (covariance/shape shift —
    * E[(x·y)²] = ⟨E[xxᵀ], E[yyᵀ]⟩_F), so the label-conditional
    * distribution-shift audit needs NO pairwise kernel evaluations at
    * all. A label with near-zero linear but large quadratic MMD drifted
    * in spread, not location — the embedding-space companion to the
    * scalar q_psi_drift/q_jsd_drift monitors.
    *
    * Exactness: per-(label, dim[, dim]) moment sums go through the
    * scale-12 decimal cast (the q_embed_covariance contract); rest
    * moments are total − group on those doubles; the delta and Frobenius
    * terms are shared IEEE strings; each label's sum is a [[Det.dsum]];
    * single-group corpora yield NULL (no rest), not NaN.
    *
    * Scale shape: two corpus-priced map-side generates (posexplode for
    * means, the codegen `upper_products` stream for second moments),
    * each collapsing into a partial+final aggregate whose exchange
    * carries at most |labels|·d(d+1)/2 rows per partition however large
    * the corpus; totals are re-aggregations of the model-sized per-label
    * relations, and everything downstream is broadcast model-scale. */
  val qMmdDrift = GraftQuery(
    "q_mmd_drift",
    (spark, dir) =>
      mmdDriftOf(Tables.spread(Tables.embeddings(spark, dir))
        .select(col("label"), col("embedding"))),
    Some(s"""
      WITH ex AS (
        SELECT label, unnest(range(len(embedding))) AS i,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      s1 AS MATERIALIZED (
        SELECT label, i, sum(CAST(v AS DECIMAL(38,12)))::DOUBLE AS sx
        FROM ex GROUP BY 1, 2),
      t1 AS (
        SELECT i, sum(CAST(sx AS DECIMAL(38,12)))::DOUBLE AS tx
        FROM s1 GROUP BY 1),
      pr AS (
        SELECT label, unnest(flatten(
          [[{'i': i, 'j': j,
             'p': embedding[i+1]::DOUBLE * embedding[j+1]::DOUBLE}
            for j in range(i, len(embedding))]
           for i in range(0, len(embedding))])) AS c
        FROM embeddings),
      s2 AS MATERIALIZED (
        SELECT label, c.i AS i, c.j AS j,
          sum(CAST(c.p AS DECIMAL(38,12)))::DOUBLE AS sxy
        FROM pr GROUP BY 1, 2, 3),
      t2 AS (
        SELECT i, j, sum(CAST(sxy AS DECIMAL(38,12)))::DOUBLE AS txy
        FROM s2 GROUP BY 1, 2),
      nl AS MATERIALIZED (
        SELECT label, count(*)::BIGINT AS ng FROM embeddings GROUP BY 1),
      nt AS (SELECT sum(ng)::BIGINT AS nt_ FROM nl),
      lin AS (
        SELECT label, ${Oracle.dsum("d1 * d1")} AS mmd2_lin
        FROM (
          SELECT label, $MmdD1 AS d1
          FROM (
            SELECT s1.label, s1.sx, t1.tx,
              CAST(ng AS DOUBLE) AS ngd, CAST(nt_ AS DOUBLE) AS ntd
            FROM s1 JOIN t1 USING (i) JOIN nl USING (label) CROSS JOIN nt))
        GROUP BY label),
      quad AS (
        SELECT label, ${Oracle.dsum(MmdW2)} AS mmd2_quad
        FROM (
          SELECT label, i, j, $MmdD2 AS d2
          FROM (
            SELECT s2.label, s2.i, s2.j, s2.sxy, t2.txy,
              CAST(ng AS DOUBLE) AS ngd, CAST(nt_ AS DOUBLE) AS ntd
            FROM s2 JOIN t2 USING (i, j) JOIN nl USING (label)
            CROSS JOIN nt))
        GROUP BY label)
      SELECT nl.label, ng AS n_vecs, mmd2_lin, mmd2_quad
      FROM nl JOIN lin USING (label) JOIN quad USING (label)
      ORDER BY nl.label""")
  )

  val all: Seq[GraftQuery] =
    Seq(qAnnCosineTopk, qAnnCosineFast, qEmbedNeardupLsh, qAnnIvf,
      qIvfRecallAudit, qIvfTune, qAnnPq, qPqDistortion, qAnnIvfpq,
      qIvfpqRecall, qEmbedInt8, qSq8Recall,
      qSemanticDedup,
      qSemdedupCellAudit, qSemanticContamination, qEmbedCovariance,
      qPcaPower, qEmbedLabelProfile, qLabelCentroidDist, qMrlRecall,
      qEmbedIsotropy, qGeomedian, qMmdDrift)
}
