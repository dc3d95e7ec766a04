package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Three tiers:
  *  1. `q_ann_cosine_topk` — exact brute-force top-k for a bounded query set,
  *     computed through posexplode + exact decimal dot products so the DuckDB
  *     oracle (parallel unnest) matches bit-for-bit. Correctness baseline.
  *  2. `q_ann_cosine_fast` — the same semantics through the codegen'd
  *     higher-order-function dot product (zip_with + aggregate, no explode,
  *     no shuffle per dimension). The bench/scale path; excluded from the SQL
  *     oracle only because float fold order differs from DuckDB's list ops.
  *  3. `q_embed_neardup_lsh` — random-hyperplane (sign) LSH bucketing, then
  *     exact cosine verification *within buckets only*: the O(n²)-free
  *     near-dup path. Hyperplane weights are a deterministic integer formula
  *     so the oracle can reproduce them.
  *
  * Scale: tier 3's bucket join is the 100 TB design (candidates ∝ bucket
  * sizes, not n²); tier 1 pins correctness at small n.
  */
object Similarity {

  val TopK = 5
  val NQueryVecs = 10
  val NPlanes = 8
  val CosineThreshold = 0.9

  /** (vec_id, pos, v_double) exploded view of the embeddings. */
  private def exploded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
      .select($"vec_id", $"pos", $"v".cast(DoubleType).as("v"))
  }

  private val explodedSql = """
    SELECT vec_id, unnest(range(len(embedding))) AS pos,
           unnest(embedding)::DOUBLE AS v
    FROM embeddings"""

  /** Exact decimal L2 norm per vector (order-independent sum of squares). */
  private def norms(ex: DataFrame): DataFrame = {
    import ex.sparkSession.implicits._
    ex.groupBy($"vec_id")
      .agg(sqrt(sum(($"v" * $"v").cast(DecimalType(38, 12))).cast(DoubleType)).as("nrm"))
  }

  private val normsSql = s"""
    SELECT vec_id,
      sqrt(sum(CAST(v * v AS DECIMAL(38,12)))::DOUBLE) AS nrm
    FROM ($explodedSql) GROUP BY vec_id"""

  /** Tier 1: exact cosine top-k neighbors for query vectors vec_id < 10. */
  val qAnnCosineTopk = GraftQuery(
    "q_ann_cosine_topk",
    (spark, dir) => {
      import spark.implicits._
      val ex = exploded(spark, dir).cache()
      val nrm = norms(ex)
      val q = ex.filter($"vec_id" < NQueryVecs)
        .select($"vec_id".as("qid"), $"pos", $"v".as("qv"))
      val dots = q.join(ex.select($"vec_id".as("tid"), $"pos", $"v".as("tv")), Seq("pos"))
        .filter($"qid" =!= $"tid")
        .groupBy($"qid", $"tid")
        .agg(sum(($"qv" * $"tv").cast(DecimalType(38, 12))).cast(DoubleType).as("dot"))
      val cos = dots
        .join(nrm.select($"vec_id".as("qid"), $"nrm".as("qn")), Seq("qid"))
        .join(nrm.select($"vec_id".as("tid"), $"nrm".as("tn")), Seq("tid"))
        .select($"qid", $"tid", round($"dot" / ($"qn" * $"tn"), Det.OutScale).as("cosine"))
      cos
        .withColumn("rk", row_number().over(
          Window.partitionBy($"qid").orderBy($"cosine".desc, $"tid")))
        .filter($"rk" <= TopK)
        .select($"qid", $"rk".cast(LongType).as("rk"), $"tid", $"cosine")
        .orderBy($"qid", $"rk")
    },
    Some(s"""
      WITH ex AS ($explodedSql),
      nrm AS ($normsSql),
      dots AS (
        SELECT q.vec_id AS qid, t.vec_id AS tid,
          sum(CAST(q.v * t.v AS DECIMAL(38,12)))::DOUBLE AS dot
        FROM ex q JOIN ex t ON q.pos = t.pos AND q.vec_id <> t.vec_id
        WHERE q.vec_id < $NQueryVecs
        GROUP BY q.vec_id, t.vec_id),
      cos AS (
        SELECT qid, tid, round(dot / (qn.nrm * tn.nrm), 6) AS cosine
        FROM dots
        JOIN nrm qn ON qid = qn.vec_id
        JOIN nrm tn ON tid = tn.vec_id)
      SELECT qid, rk, tid, cosine FROM (
        SELECT qid, tid, cosine,
          row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, tid) AS rk
        FROM cos)
      WHERE rk <= $TopK
      ORDER BY qid, rk""")
  )

  /** Tier 2: same query through zip_with/aggregate — single pass, codegen,
    * no per-dimension explode/shuffle. Float fold order is Spark-internal,
    * so this stays out of the SQL oracle (rows-only check). */
  val qAnnCosineFast = GraftQuery(
    "q_ann_cosine_fast",
    (spark, dir) => {
      import spark.implicits._
      val emb = Tables.embeddings(spark, dir)
        .select($"vec_id", transform($"embedding", v => v.cast(DoubleType)).as("e"))
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val withNorm = emb.withColumn("nrm", sqrt(dot($"e", $"e")))
      val q = withNorm.filter($"vec_id" < NQueryVecs)
        .select($"vec_id".as("qid"), $"e".as("qe"), $"nrm".as("qn"))
      q.join(broadcast(withNorm.select($"vec_id".as("tid"), $"e".as("te"), $"nrm".as("tn"))),
          $"qid" =!= $"tid")
        .select($"qid", $"tid",
          round(dot($"qe", $"te") / ($"qn" * $"tn"), Det.OutScale).as("cosine"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"qid").orderBy($"cosine".desc, $"tid")))
        .filter($"rk" <= TopK)
        .select($"qid", $"rk".cast(LongType).as("rk"), $"tid", $"cosine")
        .orderBy($"qid", $"rk")
    },
    None
  )

  /** Tier 3: sign-LSH bucketing + exact cosine ≥ threshold within buckets.
    * Plane weights w(j,d) = ((1103515245*(j*64+d) + 12345) div 65536) % 19 - 9
    * — a plain LCG step, integer-exact in both engines. */
  val qEmbedNeardupLsh = GraftQuery(
    "q_embed_neardup_lsh",
    (spark, dir) => {
      import spark.implicits._
      val ex = exploded(spark, dir).cache()
      val planes = spark.range(NPlanes).toDF("j")
        .crossJoin(spark.range(64).toDF("d"))
        .select($"j", $"d",
          (expr("((1103515245 * (j * 64 + d) + 12345) div 65536) % 19") - lit(9L)).as("w"))
      val signs = ex.join(broadcast(planes), $"pos" === $"d")
        .groupBy($"vec_id", $"j")
        .agg(sum(($"w" * $"v").cast(DecimalType(38, 12))).as("proj"))
        .select($"vec_id", $"j",
          when($"proj" >= 0, lit(1L)).otherwise(lit(0L)).as("bit"))
      val buckets = signs
        .groupBy($"vec_id")
        .agg(sum(expr("shiftleft(bit, cast(j as int))")).as("bucket"))
      val cand = buckets.as("a").join(buckets.as("b"),
          $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"))
      val nrm = norms(ex)
      val dots = cand
        .join(ex.select($"vec_id".as("ia"), $"pos", $"v".as("va")), Seq("ia"))
        .join(ex.select($"vec_id".as("ib"), $"pos", $"v".as("vb")), Seq("ib", "pos"))
        .groupBy($"ia", $"ib")
        .agg(sum(($"va" * $"vb").cast(DecimalType(38, 12))).cast(DoubleType).as("dot"))
      dots
        .join(nrm.select($"vec_id".as("ia"), $"nrm".as("na")), Seq("ia"))
        .join(nrm.select($"vec_id".as("ib"), $"nrm".as("nb")), Seq("ib"))
        .select($"ia", $"ib", round($"dot" / ($"na" * $"nb"), Det.OutScale).as("cosine"))
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
      SELECT ia, ib, round(dot / (na.nrm * nb.nrm), 6) AS cosine
      FROM dots
      JOIN nrm na ON ia = na.vec_id
      JOIN nrm nb ON ib = nb.vec_id
      WHERE round(dot / (na.nrm * nb.nrm), 6) >= $CosineThreshold
      ORDER BY ia, ib""")
  )

  val all: Seq[GraftQuery] = Seq(qAnnCosineTopk, qAnnCosineFast, qEmbedNeardupLsh)
}
