package graft.operators

import graft.{GraftQuery, Oracle, Tables}
import graft.functions.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-space clustering for a training-data pipeline (the backbone of
  * semantic dedup / data-mixing buckets): Lloyd's k-means over the
  * `embeddings` table with a deterministic seed so the oracle can replay it.
  *
  *  - init: the first K vectors are the centroids (the same deterministic
  *    stand-in for a trained init that q_ann_ivf uses for its codebook);
  *  - assign: every vector goes to its nearest centroid by squared L2,
  *    computed map-side against the BROADCAST centroid table via the native
  *    `dist2_f32_f64` expression (exact decimal accumulation — bit-identical
  *    to the oracle's `sum(CAST((v-c)*(v-c) AS DECIMAL(38,12)))`), ties to
  *    the lower centroid id; the per-vector argmin partial-aggregates before
  *    its 1-row-per-vector exchange;
  *  - update: new centroid = per-dimension mean of the members — ONE
  *    (cell, dim) shuffle per round, decimal-exact sum over each dimension,
  *    then the 64 components reassembled into an array on K rows;
  *  - two assignment rounds (assign → update → assign) — enough to exercise
  *    the full loop shape; more rounds are the same plan repeated.
  *
  * At 100 TB: assignment is embarrassingly parallel (broadcast model,
  * map-only), the update shuffle carries K×64 partial sums per partition
  * (map-side combine), and nothing driver-side ever sees a vector.
  */
object Clustering {

  val K = 8

  private def assignTo(emb: DataFrame, cents: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"embedding", $"cid",
        call_function("dist2_f32_f64", $"embedding", $"ce").as("d2"))
      .groupBy($"vec_id")
      .agg(min_by(struct($"cid", $"d2"), struct($"d2", $"cid")).as("best"),
        first($"embedding").as("embedding"))
      .select($"vec_id", $"embedding",
        $"best.cid".as("cell"), $"best.d2".as("d2"))
  }

  private def updateCentroids(assigned: DataFrame): DataFrame = {
    import assigned.sparkSession.implicits._
    assigned
      .select($"cell", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"cell", $"pos")
      .agg((sum($"v".cast(DecimalType(38, 12))).cast(DoubleType) / count(lit(1)))
        .as("c"))
      .groupBy($"cell")
      // K rows only: the HOF array reassembly is off the hot path
      .agg(transform(array_sort(collect_list(struct($"pos", $"c"))),
        s => s.getField("c")).as("ce"))
      .select($"cell".as("cid"), $"ce")
  }

  val qKmeans = GraftQuery(
    "q_kmeans",
    (spark, dir) => {
      import spark.implicits._
      // persisted: the scan feeds cents0, round-1 assignment (inside the
      // centroid-update lineage) AND the final assignment — three scans
      // otherwise, the same barrier rationale as q_contamination's shingles
      val emb = Tables.spread(Tables.embeddings(spark, dir))
        .select($"vec_id", $"embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cents0 = emb.filter($"vec_id" < K)
        .select($"vec_id".as("cid"),
          transform($"embedding", v => v.cast(DoubleType)).as("ce"))
      val round1 = assignTo(emb, cents0)
      val cents1 = updateCentroids(round1)
      assignTo(emb, cents1)
        .select($"vec_id", $"cell".as("cluster"), Det.qround($"d2").as("dist2"))
        .orderBy($"vec_id")
    },
    Some(s"""
      WITH ex AS (
        SELECT vec_id, unnest(range(len(embedding))) AS pos,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      c0 AS (SELECT vec_id AS cid, pos, v AS c FROM ex WHERE vec_id < $K),
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
      c1 AS (
        SELECT a.cell AS cid, e.pos,
          sum(CAST(e.v AS DECIMAL(38,12)))::DOUBLE / count(*) AS c
        FROM a1 a JOIN ex e ON a.vec_id = e.vec_id
        GROUP BY a.cell, e.pos),
      d2r AS (
        SELECT e.vec_id, c.cid,
          sum(CAST((e.v - c.c) * (e.v - c.c) AS DECIMAL(38,12)))::DOUBLE AS d2
        FROM ex e JOIN c1 c ON e.pos = c.pos
        GROUP BY e.vec_id, c.cid)
      SELECT vec_id, cluster, ${Oracle.qround("d2")} AS dist2 FROM (
        SELECT vec_id, cid AS cluster, d2,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d2r)
      WHERE rn = 1
      ORDER BY vec_id""")
  )

  /** Selected-set size for [[qKcenterSelect]] (rounds of the greedy). */
  val KC = 6

  /** Farthest-point (Gonzalez k-center) coreset selection over the
    * embeddings — the DIVERSITY-selection primitive of data curation
    * ("pick k docs that cover the embedding space"), the greedy 2-approx
    * for the k-center objective and the classic seeding for clustering /
    * coreset construction. Round 0 seeds with the lowest vec_id; each
    * later round selects the vector FARTHEST from the selected set (ties
    * to the lower id) and reports its distance — the coverage RADIUS
    * CURVE, whose decay tells a curator when additional selections stop
    * buying diversity; a final row reports the residual covering radius
    * of the whole corpus (the k-center objective value at k = [[KC]]).
    *
    * Scale shape: the min-distance state is one (vec_id, d2) column
    * updated map-side per round against the BROADCAST 1-row new center
    * (`least(d2, dist2)` — running min, no history); each round is one
    * map pass + one TakeOrdered(1). k passes total, nothing pairwise,
    * nothing driver-side but the k selected rows. Exactness: distances
    * via the same decimal-accumulating `dist2_f32_f64` as q_kmeans;
    * `least` of doubles is exact; the oracle unrolls the rounds
    * (q_pagerank discipline). */
  val qKcenterSelect = GraftQuery(
    "q_kcenter_select",
    (spark, dir) => {
      import spark.implicits._
      // NOT spread: per-row work is one 64-float distance (light); the
      // greedy is STAGE-COUNT-bound on this corpus, so the r12 profiling
      // pass (NOTES) collapsed each round to EXACTLY ONE job: the 1-row
      // pick is collected to the driver (the k selected rows are the one
      // thing this operator is ALLOWED to hold driver-side — the scaladoc
      // contract above) and re-enters the plan as a LITERAL center, which
      // removes the per-round broadcast exchange, the 1-row pick persist,
      // and the eager-materialize job the first unpersist fix paid for.
      // Measured at sf0.1, Prof WARM second run (the NOTES measurement
      // mode): 5.2 s (r11 broadcast-subquery shape) → 1.2 s, hash
      // unchanged; the cold first run reads ~5.9 s, dominated by the
      // initial parquet scan + cache build, not the greedy rounds.
      // The next round's TakeOrdered action materializes
      // the new state's cache, after which the state two rounds back
      // unpersists — at most TWO corpus-sized (vec_id, embedding, d2)
      // relations are ever resident (the ADVICE k-cache fix), and at real
      // scale each round is still one map pass + one TakeOrdered(1).
      val emb = Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val first = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id",
          transform($"embedding", v => v.cast(DoubleType)).as("ce"))
        .as[(Long, Array[Double])].collect().headOption
      first match {
        case None =>
          // zero-row corpus: only the covering-radius row, all-null —
          // the same single row the pre-refactor plan produced
          Seq(KC.toLong).toDF("round")
            .select($"round", lit(null).cast(LongType).as("vec_id"),
              lit(null).cast(DoubleType).as("radius2"))
        case Some((cid0, ce0)) =>
          var md = emb.select($"vec_id", $"embedding",
              call_function("dist2_f32_f64", $"embedding", typedLit(ce0))
                .as("d2"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          var prev: Option[DataFrame] = None
          val picks = scala.collection.mutable.ListBuffer(
            (0L, cid0, Option.empty[Double]))
          for (r <- 1 until KC) {
            // ONE job: TakeOrdered(1) over md — this action also fills
            // md's cache, so the state from round r−2 is now safe to drop
            val (pid, pce, pd2) = md.orderBy($"d2".desc, $"vec_id").limit(1)
              .select($"vec_id",
                transform($"embedding", v => v.cast(DoubleType)).as("ce"),
                $"d2")
              .as[(Long, Array[Double], Double)].head()
            picks += ((r.toLong, pid, Some(pd2)))
            prev.foreach(_.unpersist())
            prev = Some(md)
            md = md.select($"vec_id", $"embedding",
                least($"d2",
                  call_function("dist2_f32_f64", $"embedding", typedLit(pce)))
                  .as("d2"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          }
          // the collected doubles re-enter EXACTLY as the executors
          // produced them; rounding stays in the plan (Det.qround), so
          // the output is bit-identical to the broadcast-subquery shape
          val rows = picks.toSeq.toDF("round", "vec_id", "r2")
            .select($"round", $"vec_id", Det.qround($"r2").as("radius2"))
          val cover = md.agg(max($"d2").as("m"))
            .select(lit(KC.toLong).as("round"),
              lit(null).cast(LongType).as("vec_id"),
              Det.qround($"m").as("radius2"))
          rows.unionByName(cover).orderBy($"round")
      }
    },
    Some {
      val rounds = (1 until KC).map { r =>
        val prev = s"m${r - 1}"
        s"""
      p$r AS (SELECT vec_id, d2 FROM $prev ORDER BY d2 DESC, vec_id LIMIT 1),
      m$r AS (
        SELECT m.vec_id, least(m.d2, d.d2) AS d2
        FROM $prev m JOIN (
          SELECT e.vec_id,
            sum(CAST((e.v - c.v) * (e.v - c.v) AS DECIMAL(38,12)))::DOUBLE AS d2
          FROM ex e JOIN (SELECT pos, v FROM ex JOIN p$r USING (vec_id)) c
            USING (pos)
          GROUP BY e.vec_id) d USING (vec_id))"""
      }.mkString(",")
      val pickRows = (1 until KC).map { r =>
        s"UNION ALL SELECT $r::BIGINT, vec_id, ${Oracle.qround("d2")} FROM p$r"
      }.mkString("\n      ")
      s"""
      WITH ex AS (
        SELECT vec_id, unnest(range(len(embedding))) AS pos,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      s0 AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 1),
      m0 AS (
        SELECT e.vec_id,
          sum(CAST((e.v - c.v) * (e.v - c.v) AS DECIMAL(38,12)))::DOUBLE AS d2
        FROM ex e JOIN (SELECT pos, v FROM ex JOIN s0 USING (vec_id)) c
          USING (pos)
        GROUP BY e.vec_id),
      $rounds
      SELECT * FROM (
        SELECT 0::BIGINT AS round, vec_id, NULL::DOUBLE AS radius2 FROM s0
        $pickRows
        UNION ALL SELECT $KC::BIGINT, NULL::BIGINT,
          ${Oracle.qround(s"(SELECT max(d2) FROM m${KC - 1})")} FROM s0
      ) ORDER BY round"""
    }
  )

  /** Shared E-step SQL: the component-1 responsibility of a distinct
    * value `v` under 1-row params (w1, w2, mu1, mu2, s1, s2). The 1/√2π
    * constant cancels in the ratio and is omitted. */
  private def gmmGSql: String = {
    def phi(k: Int) =
      s"(exp(0.0 - (v - mu$k) * (v - mu$k) / (2.0 * s$k * s$k)) / s$k)"
    s"(w1 * ${phi(1)}) / (w1 * ${phi(1)} + w2 * ${phi(2)})"
  }

  /** Full-pdf SQL for the final log-likelihood readout. */
  private def gmmPdfSql: String = {
    def pdf(k: Int) =
      s"(0.3989422804014327 * exp(0.0 - (v - mu$k) * (v - mu$k) / " +
        s"(2.0 * s$k * s$k)) / s$k)"
    s"ln(w1 * ${pdf(1)} + w2 * ${pdf(2)})"
  }

  /** Two-component 1-D Gaussian mixture fit by EM over event values — the
    * continuous companion of [[graft.operators.Dedup.qLinkageEm]]'s
    * discrete EM and the model-based alternative to q_length_buckets'
    * hard thresholds ("is the value distribution one population or
    * two?"). Two unrolled EM iterations from fixed literal inits
    * (μ = 50/250, σ = 100, π = ½); output per component: fitted weight,
    * mean, sigma, and the shared final average log-likelihood.
    *
    * Scale design: the corpus collapses ONCE to the distinct-value
    * domain with counts (the q_roc_auc collapse — bounded by the 2-dp
    * grid, not the corpus); every E-step is a map expression over that
    * bounded relation against the broadcast 1-row params, every M-step a
    * decimal-cast weighted aggregate (σ via the moment identity
    * Σγcv²/n − μ² — no second pass); iteration cost is independent of
    * corpus size. Exactness: exp/ln on identical doubles (the q_ks_test
    * / q_kaplan_meier parity precedent), params 6-dp-prerounded between
    * iterations, all cross-row sums decimal-cast. */
  /** The full mixture fit from a (v, c) value-domain count relation —
    * shared by [[qGmmEm]] and [[graft.streaming.StreamGmm]]'s fold (the
    * counts are additive, so the maintained twin re-runs the SAME EM over
    * the folded log: a maintained model REFIT, not just maintained
    * statistics). */
  private[graft] def gmmReport(vcIn: DataFrame): DataFrame = {
      val spark = vcIn.sparkSession
      import spark.implicits._
      val vc = vcIn
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val init = spark.range(1).select(
        lit(0.5).as("w1"), lit(0.5).as("w2"),
        lit(50.0).as("mu1"), lit(250.0).as("mu2"),
        lit(100.0).as("s1"), lit(100.0).as("s2"))
      def step(params: DataFrame): DataFrame = {
        val g = vc.crossJoin(broadcast(params))
          .withColumn("g", expr(gmmGSql))
        def d(e: String) = sum(expr(s"CAST($e AS DECIMAL(38,9))"))
        val s = g.agg(
          d("g * c").as("n1"), d("(1.0 - g) * c").as("n2"),
          d("g * c * v").as("sv1"), d("(1.0 - g) * c * v").as("sv2"),
          d("g * c * v * v").as("sq1"), d("(1.0 - g) * c * v * v").as("sq2"))
        val mu = s.select(
          Det.qround(expr(
            "CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"))
            .as("w1"),
          Det.qround(expr(
            "CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"))
            .as("w2"),
          Det.qround(expr("CAST(sv1 AS DOUBLE) / CAST(n1 AS DOUBLE)"))
            .as("mu1"),
          Det.qround(expr("CAST(sv2 AS DOUBLE) / CAST(n2 AS DOUBLE)"))
            .as("mu2"),
          expr("CAST(sq1 AS DOUBLE) / CAST(n1 AS DOUBLE)").as("q1"),
          expr("CAST(sq2 AS DOUBLE) / CAST(n2 AS DOUBLE)").as("q2"))
        mu.select($"w1", $"w2", $"mu1", $"mu2",
          Det.qround(expr("sqrt(greatest(q1 - mu1 * mu1, 0.000001))"))
            .as("s1"),
          Det.qround(expr("sqrt(greatest(q2 - mu2 * mu2, 0.000001))"))
            .as("s2"))
      }
      // persisted (1 row): the log-likelihood leg and the two component
      // legs each prune this to different columns, so without the
      // barrier the 2-step EM lineage re-executes per consumer (the
      // q_minhash_tune exchange-reuse lesson: differently-pruned
      // aggregates never canonicalize equal)
      val fitted = step(step(init))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ll = vc.crossJoin(broadcast(fitted))
        .agg(
          sum(expr(s"CAST(c * ($gmmPdfSql) AS DECIMAL(38,9))"))
            .cast(DoubleType).as("lls"),
          sum($"c").as("n"))
        .select(Det.qround(expr("lls / n")).as("avg_ll"))
      val rows = Seq(1, 2).map { k =>
        fitted.select(lit(k.toLong).as("component"),
          col(s"w$k").as("weight"), col(s"mu$k").as("mu"),
          col(s"s$k").as("sigma"))
      }.reduce(_.unionByName(_))
      rows.crossJoin(broadcast(ll)).orderBy($"component")
  }

  /** The (v, c) value-domain collapse [[gmmReport]] consumes. */
  private[graft] def gmmValueCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.groupBy($"value".as("v")).agg(count(lit(1)).as("c"))
  }

  val qGmmEm = GraftQuery(
    "q_gmm_em",
    (spark, dir) =>
      gmmReport(gmmValueCounts(Tables.events(spark, dir))),
    Some {
      def stepSql(prev: String, out: String): String = s"""
      ${out}_g AS (
        SELECT vc.*, $gmmGSql AS g FROM vc CROSS JOIN $prev),
      ${out}_s AS (
        SELECT sum(CAST(g * c AS DECIMAL(38,9))) AS n1,
          sum(CAST((1.0 - g) * c AS DECIMAL(38,9))) AS n2,
          sum(CAST(g * c * v AS DECIMAL(38,9))) AS sv1,
          sum(CAST((1.0 - g) * c * v AS DECIMAL(38,9))) AS sv2,
          sum(CAST(g * c * v * v AS DECIMAL(38,9))) AS sq1,
          sum(CAST((1.0 - g) * c * v * v AS DECIMAL(38,9))) AS sq2
        FROM ${out}_g),
      ${out}_m AS (
        SELECT
          ${Oracle.qround(
            "CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))")}
            AS w1,
          ${Oracle.qround(
            "CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))")}
            AS w2,
          ${Oracle.qround("CAST(sv1 AS DOUBLE) / CAST(n1 AS DOUBLE)")} AS mu1,
          ${Oracle.qround("CAST(sv2 AS DOUBLE) / CAST(n2 AS DOUBLE)")} AS mu2,
          CAST(sq1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS q1,
          CAST(sq2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS q2
        FROM ${out}_s),
      $out AS (
        SELECT w1, w2, mu1, mu2,
          ${Oracle.qround("sqrt(greatest(q1 - mu1 * mu1, 0.000001))")} AS s1,
          ${Oracle.qround("sqrt(greatest(q2 - mu2 * mu2, 0.000001))")} AS s2
        FROM ${out}_m)"""
      s"""
      WITH vc AS (
        SELECT value AS v, count(*)::BIGINT AS c FROM events GROUP BY value),
      e0 AS (SELECT 0.5::DOUBLE AS w1, 0.5::DOUBLE AS w2,
        50.0::DOUBLE AS mu1, 250.0::DOUBLE AS mu2,
        100.0::DOUBLE AS s1, 100.0::DOUBLE AS s2),
      ${stepSql("e0", "e1")},
      ${stepSql("e1", "e2")},
      ll AS (
        SELECT ${Oracle.qround(
          s"(sum(CAST(c * ($gmmPdfSql) AS DECIMAL(38,9))))::DOUBLE / sum(c)")}
          AS avg_ll
        FROM vc CROSS JOIN e2)
      SELECT * FROM (
        SELECT 1::BIGINT AS component, w1 AS weight, mu1 AS mu, s1 AS sigma,
          avg_ll FROM e2 CROSS JOIN ll
        UNION ALL
        SELECT 2::BIGINT, w2, mu2, s2, avg_ll FROM e2 CROSS JOIN ll
      ) ORDER BY component"""
    }
  )

  /** Per-cluster simplified silhouette over the q_kmeans model — the
    * standard cluster-quality readout (Rousseeuw 1987; the "simplified"
    * centroid form is the one that scales, used by every large-k library
    * since it needs no pairwise member distances): for each vector,
    * a = distance to its OWN centroid, b = distance to the NEAREST OTHER
    * centroid, s = (b−a)/max(a,b) ∈ [−1, 1]; the per-cluster mean tells a
    * curator which semantic-dedup buckets are tight and which are noise.
    *
    * Because a is the minimum of the K centroid distances and b the
    * second-smallest, BOTH come from the two smallest entries of the same
    * per-vector distance list — one broadcast-model map pass and one
    * groupBy whose per-vector state is a K-bounded sorted array (map-side
    * combinable), never a pairwise join; the readout is K rows. Exactness:
    * distances ride the decimal-accumulating `dist2_f32_f64` like q_kmeans;
    * `sqrt` is correctly rounded IEEE; s is 6-dp-prerounded before the
    * decimal mean (the q_anova_f discipline); degenerate a = b = 0 (vector
    * equal to two centroids) defines s = 0. */
  val qSilhouette = GraftQuery(
    "q_silhouette",
    (spark, dir) => {
      import spark.implicits._
      val emb = Tables.spread(Tables.embeddings(spark, dir))
        .select($"vec_id", $"embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cents0 = emb.filter($"vec_id" < K)
        .select($"vec_id".as("cid"),
          transform($"embedding", v => v.cast(DoubleType)).as("ce"))
      val cents1 = updateCentroids(assignTo(emb, cents0))
      val top2 = emb.crossJoin(broadcast(cents1))
        .select($"vec_id", $"cid",
          call_function("dist2_f32_f64", $"embedding", $"ce").as("d2"))
        .groupBy($"vec_id")
        .agg(slice(array_sort(collect_list(struct($"d2", $"cid"))), 1, 2)
          .as("t2"))
        .select($"vec_id",
          $"t2".getItem(0).getField("cid").as("cluster"),
          sqrt($"t2".getItem(0).getField("d2")).as("a"),
          sqrt($"t2".getItem(1).getField("d2")).as("b"))
      val sil = top2.select($"cluster",
        Det.qround(when(greatest($"a", $"b") > 0,
          ($"b" - $"a") / greatest($"a", $"b")).otherwise(0.0)).as("s"))
      sil.groupBy($"cluster")
        .agg(count(lit(1)).as("n"),
          Det.qround(sum($"s".cast(DecimalType(38, 9))).cast(DoubleType) /
            count(lit(1))).as("mean_sil"),
          min($"s").as("min_sil"), max($"s").as("max_sil"))
        .orderBy($"cluster")
    },
    Some(s"""
      WITH ex AS (
        SELECT vec_id, unnest(range(len(embedding))) AS pos,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      c0 AS (SELECT vec_id AS cid, pos, v AS c FROM ex WHERE vec_id < $K),
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
      c1 AS (
        SELECT a.cell AS cid, e.pos,
          sum(CAST(e.v AS DECIMAL(38,12)))::DOUBLE / count(*) AS c
        FROM a1 a JOIN ex e ON a.vec_id = e.vec_id
        GROUP BY a.cell, e.pos),
      d2r AS (
        SELECT e.vec_id, c.cid,
          sum(CAST((e.v - c.c) * (e.v - c.c) AS DECIMAL(38,12)))::DOUBLE AS d2
        FROM ex e JOIN c1 c ON e.pos = c.pos
        GROUP BY e.vec_id, c.cid),
      t2 AS (
        SELECT vec_id, cid, d2,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM d2r),
      ab AS (
        SELECT x.vec_id, x.cid AS cluster, sqrt(x.d2) AS a, sqrt(y.d2) AS b
        FROM t2 x JOIN t2 y ON x.vec_id = y.vec_id
        WHERE x.rn = 1 AND y.rn = 2),
      s AS (
        SELECT cluster,
          ${Oracle.qround(
            "CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b) ELSE 0e0 END")}
            AS s
        FROM ab)
      SELECT cluster, count(*)::BIGINT AS n,
        ${Oracle.qround("sum(CAST(s AS DECIMAL(38,9)))::DOUBLE / count(*)")}
          AS mean_sil,
        min(s) AS min_sil, max(s) AS max_sil
      FROM s GROUP BY cluster
      ORDER BY cluster""")
  )

  /** Mixture weights at which [[qMauveFrontier]] samples the divergence
    * frontier — exact binary fractions. */
  val MauveLambdas: Seq[Double] = Seq(0.25, 0.5, 0.75)

  /** MAUVE-style divergence frontier between two embedding distributions
    * (Pillutla et al. 2021, NeurIPS best paper — the standard measure of
    * how close a generated-text distribution is to a human one): both
    * sets are quantized by ONE shared k-means model (the q_kmeans
    * two-round centroids), giving each set a histogram over the k cells;
    * the frontier then reads KL(P‖M_λ) and KL(Q‖M_λ) against the mixture
    * M_λ = λP + (1−λ)Q at each λ ∈ [[MauveLambdas]] — λ = ½ is twice the
    * Jensen–Shannon midpoint, the ends approach the one-sided KLs. Sets
    * here: P = even labels, Q = odd labels (the user_id%2 honest-split
    * discipline — expected to be CLOSE, and the readout honestly small).
    *
    * Exactness: cell histograms are integers; probabilities take the
    * q_psi_drift add-half smoothing over the observed-cell domain (KL
    * needs full support); each KL term is [[Det.qround]]ed then
    * decimal-summed (the PSI term discipline); λ and ½ are exact binary.
    * Scale shape: assignment is the broadcast-model map pass q_kmeans
    * already made; everything after is arithmetic on a ≤K-cell relation
    * with a 1-row broadcast of the totals. */
  val qMauveFrontier = GraftQuery(
    "q_mauve_frontier",
    (spark, dir) => {
      import spark.implicits._
      // lazy persist is right here: the consumer chain (cents0 → cents1 →
      // final assignment → g join) is SEQUENTIAL, so the first full scan
      // materializes the cache with no concurrent-recompute race and an
      // eager count job would be pure overhead (measured +0.5 s)
      val emb = Tables.spread(Tables.embeddings(spark, dir))
        .select($"vec_id", $"embedding", ($"label" % 2).as("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cents0 = emb.filter($"vec_id" < K)
        .select($"vec_id".as("cid"),
          transform($"embedding", v => v.cast(DoubleType)).as("ce"))
      val cents1 = updateCentroids(
        assignTo(emb.select($"vec_id", $"embedding"), cents0))
      val hist = assignTo(emb.select($"vec_id", $"embedding"), cents1)
        .select($"vec_id", $"cell")
        .join(emb.select($"vec_id", $"g"), Seq("vec_id"))
        .groupBy($"cell")
        .agg(sum(when($"g" === 0, 1L).otherwise(0L)).as("n_p"),
          sum(when($"g" === 1, 1L).otherwise(0L)).as("n_q"))
      val tot = hist.agg(sum($"n_p").as("tp"), sum($"n_q").as("tq"),
        count(lit(1)).as("ncells")).filter($"tp" > 0 && $"tq" > 0)
      val lams = MauveLambdas.toDF("lambda")
      val probs = hist.crossJoin(broadcast(tot))
        .select($"cell",
          (($"n_p" + lit(0.5)) / ($"tp" + $"ncells" / lit(2.0))).as("p"),
          (($"n_q" + lit(0.5)) / ($"tq" + $"ncells" / lit(2.0))).as("q"))
      val terms = probs.crossJoin(broadcast(lams))
        .withColumn("m", $"lambda" * $"p" + (lit(1.0) - $"lambda") * $"q")
        .select($"lambda",
          Det.qround($"p" * log($"p" / $"m")).as("term_p"),
          Det.qround($"q" * log($"q" / $"m")).as("term_q"))
      terms.groupBy($"lambda")
        .agg(
          round(sum($"term_p".cast(DecimalType(38, 9))), 6)
            .cast(DoubleType).as("kl_p_m"),
          round(sum($"term_q".cast(DecimalType(38, 9))), 6)
            .cast(DoubleType).as("kl_q_m"))
        .orderBy($"lambda")
    },
    Some(s"""
      WITH ex AS (
        SELECT vec_id, unnest(range(len(embedding))) AS pos,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      c0 AS (SELECT vec_id AS cid, pos, v AS c FROM ex WHERE vec_id < $K),
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
      c1 AS (
        SELECT a.cell AS cid, e.pos,
          sum(CAST(e.v AS DECIMAL(38,12)))::DOUBLE / count(*) AS c
        FROM a1 a JOIN ex e ON a.vec_id = e.vec_id
        GROUP BY a.cell, e.pos),
      d2r AS (
        SELECT e.vec_id, c.cid,
          sum(CAST((e.v - c.c) * (e.v - c.c) AS DECIMAL(38,12)))::DOUBLE AS d2
        FROM ex e JOIN c1 c ON e.pos = c.pos
        GROUP BY e.vec_id, c.cid),
      a2 AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid,
            row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
          FROM d2r)
        WHERE rn = 1),
      hist AS (
        SELECT a.cell,
          sum(CASE WHEN em.label % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_p,
          sum(CASE WHEN em.label % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_q
        FROM a2 a JOIN embeddings em ON a.vec_id = em.vec_id
        GROUP BY a.cell),
      tot AS (
        SELECT sum(n_p)::BIGINT AS tp, sum(n_q)::BIGINT AS tq,
          count(*)::BIGINT AS ncells
        FROM hist),
      probs AS (
        SELECT cell,
          (n_p + 0.5) / (tp + ncells / 2.0) AS p,
          (n_q + 0.5) / (tq + ncells / 2.0) AS q
        FROM hist CROSS JOIN tot WHERE tp > 0 AND tq > 0),
      terms AS (
        SELECT l.lambda,
          ${Oracle.qround("p * ln(p / (l.lambda * p + (1.0 - l.lambda) * q))")}
            AS term_p,
          ${Oracle.qround("q * ln(q / (l.lambda * p + (1.0 - l.lambda) * q))")}
            AS term_q
        FROM probs
        CROSS JOIN (SELECT unnest([${MauveLambdas.mkString(", ")}])
          AS lambda) l)
      SELECT lambda,
        round(sum(CAST(term_p AS DECIMAL(38,9))), 6)::DOUBLE AS kl_p_m,
        round(sum(CAST(term_q AS DECIMAL(38,9))), 6)::DOUBLE AS kl_q_m
      FROM terms GROUP BY lambda
      ORDER BY lambda""")
  )

  /** Topics / unrolled EM rounds / topic-card width for [[qPlsaTopics]]. */
  val PlsaK = 3
  val PlsaRounds = 2
  val PlsaTopTerms = 8

  /** The (doc_id, term, n) count relation PLSA factorizes — the same
    * doc-term collapse the TF-IDF/retrieval family makes. */
  private[graft] def plsaTf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id",
        explode(graft.functions.Text.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("n"))
  }

  /** PLSA topic model (Hofmann 1999) fit by `rounds` unrolled EM rounds,
    * emitting the topic-card readout — shared by [[qPlsaTopics]] (at
    * [[PlsaRounds]]) and ClusteringSpec's likelihood-monotonicity check
    * (which varies `rounds`).
    *
    * Parameterization is WIDE — p(z|d) is one doc-keyed relation with K
    * probability COLUMNS (p1..pK), p(w|z) one vocab-keyed relation with K
    * columns (q1..qK) — so the E-step is a plain two-join projection and
    * the K-way structure multiplies aggregate columns, never corpus rows
    * (the q_filter_threshold_sweep discipline). Init: p(z|d) uniform;
    * p(w|z) hash-perturbed near-uniform (h_k(w) = 1000 + u32(md5) % 1000,
    * exact integers normalized per topic) — deterministic symmetry
    * breaking both engines derive byte-identically.
    *
    * Exactness: every E-step responsibility is the same IEEE quotient of
    * products of 6-dp-prerounded doubles in both engines (den = 0 rows —
    * possible only if every q_k prerounds to 0 — fall back to uniform);
    * every M-step numerator rides DECIMAL(38,9) sums; params are
    * [[Det.qround]]ed between rounds so drift cannot compound (the gmm
    * discipline). The 1e-6 preround grid is fidelity-only (both engines
    * share it): at a production-scale vocabulary where p(w|z) ~ 1e-8 the
    * grid constant moves to 1e-12, same machinery.
    *
    * Scale shape: per round, ONE doc-keyed exchange (tf ⋈ p(z|d) — the
    * inherent PLSA cost) and one vocabulary-sized join (p(w|z) —
    * broadcast-able); both M-steps are partial+final aggregates of the
    * SAME persisted E-step relation (two consumers — the persist is
    * query-lifetime under the clearCache protocol); the readout is
    * K×[[PlsaTopTerms]] rows + two 1-row metric relations. Nothing
    * driver-side ever sees a per-doc row. */
  private[graft] def plsaReport(tfIn: DataFrame,
      rounds: Int = PlsaRounds): DataFrame = {
    val spark = tfIn.sparkSession
    import spark.implicits._
    val ks = 1 to PlsaK
    val uni = s"(1.0 / ${PlsaK}.0)"
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val tf = tfIn.persist(mem)
    // init p(w|z): hash-perturbed near-uniform, exact-integer normalizers
    val hRel = tf.select($"term").distinct()
      .select(($"term" +: ks.map(k => expr(
        s"1000 + ${PipelineOps.u32Expr(s"concat('plsa$k:', term)")} % 1000")
        .as(s"h$k"))): _*)
    val hTot = hRel.agg(sum($"h1").as("ht1"),
      ks.tail.map(k => sum(col(s"h$k")).as(s"ht$k")): _*)
    var pwz: DataFrame = hRel.crossJoin(broadcast(hTot))
      .select(($"term" +: ks.map(k => Det.qround(
        col(s"h$k").cast(DoubleType) / col(s"ht$k").cast(DoubleType))
        .as(s"q$k"))): _*)
    // init p(z|d): uniform; dl rides along so the mass readout needs no
    // extra join (both engines keep dl through every round)
    var pzd: DataFrame = tf.groupBy($"doc_id").agg(sum($"n").as("dl"))
      .select(($"doc_id" +: ks.map(k => expr(uni).as(s"p$k"))) :+ $"dl": _*)
    for (r <- 1 to rounds) {
      if (r == 1) {
        // UNIFORM-init collapse: with p(z|d) constant across docs, the
        // round-1 responsibilities are term-only — r_k(w) = q_k / Σq —
        // so p(w|z) updates from pure vocabulary arithmetic
        // (s_k = cf·r_k) and p(z|d) from ONE term-broadcast corpus pass.
        // The oracle uses the identical collapsed formulas for round 1.
        val den = ks.map(k => s"q$k").mkString(" + ")
        val rw = pwz.select(($"term" +: ks.map(k => expr(
          s"CASE WHEN ($den) > 0 THEN q$k / ($den) ELSE $uni END")
          .as(s"r$k"))): _*)
        val cf = tf.groupBy($"term").agg(sum($"n").as("cf"))
        val sw = cf.join(rw, "term")
          .select(($"term" +: ks.map(k =>
            expr(s"CAST(cf * r$k AS DECIMAL(38,9))").as(s"s$k"))): _*)
        val tot = sw.agg(sum($"s1").as("t1"),
          ks.tail.map(k => sum(col(s"s$k")).as(s"t$k")): _*)
        pwz = sw.crossJoin(broadcast(tot))
          .select(($"term" +: ks.map(k => Det.qround(
            col(s"s$k").cast(DoubleType) / col(s"t$k").cast(DoubleType))
            .as(s"q$k"))): _*)
        pzd = tf.join(broadcast(rw), "term").groupBy($"doc_id").agg(
          sum(expr("CAST(n * r1 AS DECIMAL(38,9))")).as("u1"),
          ks.tail.map(k =>
            sum(expr(s"CAST(n * r$k AS DECIMAL(38,9))")).as(s"u$k"))
            :+ sum($"n").as("dl"): _*)
          .select(($"doc_id" +: ks.map(k => Det.qround(
            col(s"u$k").cast(DoubleType) / col("dl").cast(DoubleType))
            .as(s"p$k"))) :+ $"dl": _*)
      } else {
        // generic round: E-step responsibilities on the (d, w) relation;
        // the MODEL relations (doc-keyed p(z|d), vocab-keyed p(w|z)) are
        // the persisted state — corpus-sized intermediates are never
        // cached, the two M-steps each stream the tf cache once
        val den = ks.map(k => s"(p$k * q$k)").mkString(" + ")
        val e = tf.join(pzd, "doc_id").join(pwz, "term")
          .withColumn("den", expr(den))
          .select(($"doc_id" +: $"term" +: $"n" +: ks.map(k => expr(
            s"CASE WHEN den > 0 THEN (p$k * q$k) / den ELSE $uni END")
            .as(s"r$k"))): _*)
        val sw = e.groupBy($"term").agg(
          sum(expr("CAST(n * r1 AS DECIMAL(38,9))")).as("s1"),
          ks.tail.map(k =>
            sum(expr(s"CAST(n * r$k AS DECIMAL(38,9))")).as(s"s$k")): _*)
        val tot = sw.agg(sum($"s1").as("t1"),
          ks.tail.map(k => sum(col(s"s$k")).as(s"t$k")): _*)
        pwz = sw.crossJoin(broadcast(tot))
          .select(($"term" +: ks.map(k => Det.qround(
            col(s"s$k").cast(DoubleType) / col(s"t$k").cast(DoubleType))
            .as(s"q$k"))): _*)
        pzd = e.groupBy($"doc_id").agg(
          sum(expr("CAST(n * r1 AS DECIMAL(38,9))")).as("u1"),
          ks.tail.map(k =>
            sum(expr(s"CAST(n * r$k AS DECIMAL(38,9))")).as(s"u$k"))
            :+ sum($"n").as("dl"): _*)
          .select(($"doc_id" +: ks.map(k => Det.qround(
            col(s"u$k").cast(DoubleType) / col("dl").cast(DoubleType))
            .as(s"p$k"))) :+ $"dl": _*)
      }
      // model relations are small (docs × K+1 / vocab × K) and
      // multi-consumed (next round + mass/ll readouts) — persist them,
      // never the corpus-sized E-step
      pzd = pzd.persist(mem)
      pwz = pwz.persist(mem)
    }
    // readout: topic masses P(z), held-in avg log-likelihood, top terms
    val mass = pzd.agg(
        sum(expr("CAST(p1 * dl AS DECIMAL(38,9))")).as("m1"),
        ks.tail.map(k =>
          sum(expr(s"CAST(p$k * dl AS DECIMAL(38,9))")).as(s"m$k"))
          :+ sum($"dl").as("nn"): _*)
      .select(ks.map(k => Det.qround(
        col(s"m$k").cast(DoubleType) / col("nn").cast(DoubleType))
        .as(s"mass$k")): _*)
    val mix = ks.map(k => s"(p$k * q$k)").mkString(" + ")
    val ll = tf.join(pzd, "doc_id").join(pwz, "term")
      .agg(sum(expr(s"CAST(CASE WHEN $mix > 0 THEN n * ln($mix) " +
        "ELSE 0.0 END AS DECIMAL(38,9))")).cast(DoubleType).as("lls"),
        sum($"n").as("nn"))
      .select(Det.qround($"lls" / $"nn".cast(DoubleType)).as("avg_ll"))
    val unp = pwz.selectExpr("term",
      s"stack($PlsaK, ${ks.map(k => s"CAST($k AS BIGINT), q$k").mkString(", ")}) " +
        "as (topic, p_wz)")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"topic").orderBy($"p_wz".desc, $"term")))
      .filter($"rk" <= PlsaTopTerms)
    unp.crossJoin(broadcast(mass)).crossJoin(broadcast(ll))
      .select($"topic", $"rk".cast(LongType).as("rk"), $"term", $"p_wz",
        expr(s"CASE ${ks.map(k => s"WHEN topic = $k THEN mass$k")
          .mkString(" ")} END").as("topic_mass"),
        $"avg_ll")
      .orderBy($"topic", $"rk")
  }

  /** PLSA topic model over the document corpus — the classic latent-topic
    * factorization of the doc-term matrix (Hofmann 1999; the aspect-model
    * ancestor of LDA), fit by [[PlsaRounds]] unrolled EM rounds and read
    * out as the standard "topic card": per topic, the [[PlsaTopTerms]]
    * highest-probability terms with p(w|z), the corpus topic mass P(z),
    * and the shared held-in average log-likelihood — the clustering view
    * of the corpus a data-mixing plan reads next to q_kl_by_source's
    * divergence table (WHAT the latent groups are, not just how far apart
    * sources sit). See [[plsaReport]] for the EM machinery, exactness
    * discipline, and 100 TB shape. */
  val qPlsaTopics = GraftQuery(
    "q_plsa_topics",
    (spark, dir) =>
      plsaReport(plsaTf(Tables.spread(Tables.documents(spark, dir)))),
    Some {
      def qr(e: String) = Oracle.qround(e)
      val ks = 1 to PlsaK
      val uni = s"(1.0 / ${PlsaK}.0)"
      def u32(e: String) =
        s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"
      def roundSql(r: Int, pzdPrev: String, pwzPrev: String): String = {
        // round 1 uses the uniform-init collapse (term-only
        // responsibilities; p(w|z) from vocabulary arithmetic) — the
        // exact formulas the Spark side computes
        val e =
          if (r == 1) {
            val den = ks.map(k => s"q$k").mkString(" + ")
            s"""
      rw$r AS (
        SELECT term,
          ${ks.map(k => s"CASE WHEN ($den) > 0 THEN q$k / ($den) " +
            s"ELSE $uni END AS r$k").mkString(", ")}
        FROM $pwzPrev),
      e$r AS (
        SELECT t.doc_id, t.term, t.n, ${ks.map(k => s"r$k").mkString(", ")}
        FROM tf t JOIN rw$r USING (term)),
      sw$r AS (
        SELECT term,
          ${ks.map(k => s"CAST(cf * r$k AS DECIMAL(38,9)) AS s$k")
            .mkString(", ")}
        FROM (SELECT term, sum(n)::BIGINT AS cf FROM tf GROUP BY term)
          JOIN rw$r USING (term)),"""
          } else {
            val den = ks.map(k => s"(p$k * q$k)").mkString(" + ")
            s"""
      e$r AS (
        SELECT t.doc_id, t.term, t.n,
          ${ks.map(k => s"CASE WHEN ($den) > 0 THEN (p$k * q$k) / ($den) " +
            s"ELSE $uni END AS r$k").mkString(", ")}
        FROM tf t JOIN $pzdPrev USING (doc_id) JOIN $pwzPrev USING (term)),
      sw$r AS (
        SELECT term,
          ${ks.map(k => s"sum(CAST(n * r$k AS DECIMAL(38,9))) AS s$k")
            .mkString(", ")}
        FROM e$r GROUP BY term),"""
          }
        s"""$e
      tot$r AS (
        SELECT ${ks.map(k => s"sum(s$k) AS t$k").mkString(", ")} FROM sw$r),
      pwz$r AS (
        SELECT term,
          ${ks.map(k => s"${qr(s"s$k::DOUBLE / t$k::DOUBLE")} AS q$k")
            .mkString(", ")}
        FROM sw$r CROSS JOIN tot$r),
      pzd$r AS (
        SELECT doc_id,
          ${ks.map(k => s"${qr(s"sum(CAST(n * r$k AS DECIMAL(38,9)))::DOUBLE" +
            " / sum(n)")} AS p$k").mkString(", ")},
          sum(n)::BIGINT AS dl
        FROM e$r GROUP BY doc_id)"""
      }
      val mix = ks.map(k => s"(p$k * q$k)").mkString(" + ")
      s"""
      WITH tf AS (
        SELECT doc_id, term, count(*)::BIGINT AS n
        FROM (SELECT doc_id,
                unnest(string_split_regex(lower(text), '[[:space:]]+'))
                  AS term FROM documents)
        GROUP BY doc_id, term),
      h AS (
        SELECT term,
          ${ks.map(k => s"1000 + ${u32(s"'plsa$k:' || term")} % 1000 AS h$k")
            .mkString(", ")}
        FROM (SELECT DISTINCT term FROM tf)),
      ht AS (SELECT ${ks.map(k => s"sum(h$k) AS ht$k").mkString(", ")} FROM h),
      pwz0 AS (
        SELECT term,
          ${ks.map(k => s"${qr(s"h$k::DOUBLE / ht$k::DOUBLE")} AS q$k")
            .mkString(", ")}
        FROM h CROSS JOIN ht),
      pzd0 AS (
        SELECT doc_id, ${ks.map(k => s"$uni AS p$k").mkString(", ")},
          sum(n)::BIGINT AS dl
        FROM tf GROUP BY doc_id),
      ${(1 to PlsaRounds).map(r => roundSql(r, s"pzd${r - 1}", s"pwz${r - 1}"))
        .mkString(",")},
      mass AS (
        SELECT
          ${ks.map(k => s"${qr(s"sum(CAST(p$k * dl AS DECIMAL(38,9)))::DOUBLE" +
            " / sum(dl)")} AS mass$k").mkString(", ")}
        FROM pzd$PlsaRounds),
      ll AS (
        SELECT ${qr(s"sum(CAST(CASE WHEN ($mix) > 0 THEN n * ln($mix) " +
          "ELSE 0.0 END AS DECIMAL(38,9)))::DOUBLE / sum(n)")} AS avg_ll
        FROM tf JOIN pzd$PlsaRounds USING (doc_id)
          JOIN pwz$PlsaRounds USING (term)),
      unp AS (
        SELECT topic, term, p_wz,
          row_number() OVER (PARTITION BY topic ORDER BY p_wz DESC, term)
            AS rk
        FROM (SELECT term,
                unnest([${ks.mkString(", ")}])::BIGINT AS topic,
                unnest([${ks.map(k => s"q$k").mkString(", ")}]) AS p_wz
              FROM pwz$PlsaRounds))
      SELECT topic, rk::BIGINT AS rk, term, p_wz,
        CASE ${ks.map(k => s"WHEN topic = $k THEN mass$k").mkString(" ")} END
          AS topic_mass,
        avg_ll
      FROM unp CROSS JOIN mass CROSS JOIN ll
      WHERE rk <= $PlsaTopTerms
      ORDER BY topic, rk"""
    }
  )

  val all: Seq[GraftQuery] =
    Seq(qKmeans, qKcenterSelect, qGmmEm, qSilhouette, qMauveFrontier,
      qPlsaTopics)
}
