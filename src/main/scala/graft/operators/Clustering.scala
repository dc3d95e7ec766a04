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

  val all: Seq[GraftQuery] = Seq(qKmeans)
}
