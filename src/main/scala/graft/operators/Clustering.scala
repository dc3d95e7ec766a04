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
      val emb = Tables.spread(Tables.embeddings(spark, dir))
        .select($"vec_id", $"embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c0 = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id".as("cid"),
          transform($"embedding", v => v.cast(DoubleType)).as("ce"))
      var md = emb.crossJoin(broadcast(c0))
        .select($"vec_id", $"embedding",
          call_function("dist2_f32_f64", $"embedding", $"ce").as("d2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var rows = c0.select(lit(0L).as("round"), $"cid".as("vec_id"),
        lit(null).cast(DoubleType).as("radius2"))
      for (r <- 1 until KC) {
        // persisted: the pick feeds BOTH the report row and the state
        // update; the state re-persists per round or the crossJoin
        // lineage doubles (the q_pagerank barrier rationale)
        val pick = md.orderBy($"d2".desc, $"vec_id").limit(1)
          .select($"vec_id".as("cid"),
            transform($"embedding", v => v.cast(DoubleType)).as("ce"),
            $"d2".as("r2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        rows = rows.unionByName(pick.select(lit(r.toLong).as("round"),
          $"cid".as("vec_id"), Det.qround($"r2").as("radius2")))
        md = md.crossJoin(broadcast(pick.select($"ce")))
          .select($"vec_id", $"embedding",
            least($"d2", call_function("dist2_f32_f64", $"embedding", $"ce"))
              .as("d2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      val cover = md.agg(max($"d2").as("m"))
        .select(lit(KC.toLong).as("round"),
          lit(null).cast(LongType).as("vec_id"),
          Det.qround($"m").as("radius2"))
      rows.unionByName(cover).orderBy($"round")
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

  val all: Seq[GraftQuery] = Seq(qKmeans, qKcenterSelect)
}
