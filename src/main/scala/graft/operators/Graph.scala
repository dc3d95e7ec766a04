package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph centrality over the document-similarity graph: PageRank on the
  * MinHash-LSH candidate-pair edge set (the same `cand(ia, ib)` relation the
  * near-dup family verifies) — the "which document is the hub of its
  * near-dup neighborhood" signal used to pick cluster representatives.
  *
  * Determinism: the ranks are computed in SCALED INTEGER arithmetic
  * (micro-units of 1e-12) — every step is a bigint `div`/`sum`, so the
  * fixed-iteration result is bit-identical across engines, where a
  * float PageRank's order-dependent partial sums could never be oracled.
  * Update rule per node v (damping 85/100, N = node count, deg from the
  * undirected edge set):
  *
  *   pr'(v) = (SCALE div N) · 15 div 100  +  85 · Σ_{u→v} (pr(u) div deg(u)) div 100
  *
  * [[Iterations]] rounds from the uniform start; truncation loses ≤ 1
  * micro-unit per op in both engines identically.
  *
  * Physical design (the standard distributed PageRank shape): the edge list
  * is persisted once and re-joined per iteration — each round is one
  * src-keyed broadcast-or-shuffle join plus a dst-keyed partial+final
  * aggregate; ranks live in a nodes-sized table, never on the driver. At
  * 100 TB the edge relation is the near-dup candidate set (O(n) with
  * bounded LSH buckets, never O(n²)), and iteration count is fixed — the
  * whole run is `Iterations` shuffles of a bounded pair list.
  */
object Graph {

  val Iterations = 3
  val Scale = 1000000000000L // rank micro-units: 1.0 == 1e12

  private[graft] def iterate(edges: DataFrame, state: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val msgs = edges
      .join(state.select($"id".as("src"), expr("pr div deg").as("contrib")),
        Seq("src"))
      .groupBy($"dst".as("id")).agg(sum($"contrib").as("m"))
    state.drop("pr").join(msgs, Seq("id"), "left")
      .select($"id", $"deg", $"n",
        expr(s"(($Scale div n) * 15) div 100 + (coalesce(m, 0L) * 85) div 100")
          .as("pr"))
  }

  val qPagerank = GraftQuery(
    "q_pagerank",
    (spark, dir) => {
      import spark.implicits._
      val cand = Dedup.minhashCandidates(Dedup.docShingles(spark, dir, 2))
      // both directions of every undirected candidate edge; persisted — the
      // edge list is re-joined every iteration
      val edges = cand.select($"ia".as("src"), $"ib".as("dst"))
        .union(cand.select($"ib".as("src"), $"ia".as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy($"src".as("id")).agg(count(lit(1)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = deg.agg(count(lit(1)).as("n"))
      var state = deg.crossJoin(broadcast(n))
        .select($"id", $"deg", $"n", expr(s"$Scale div n").as("pr"))
      // each round consumes the previous state TWICE (message join + rank
      // carry-over): without a barrier the unpersisted lineage doubles per
      // iteration — persist cuts the plan to one computation per round
      for (_ <- 1 to Iterations)
        state = iterate(edges, state).persist(StorageLevel.MEMORY_AND_DISK)
      state.select($"id".as("doc_id"), $"deg", $"pr")
        .orderBy($"pr".desc, $"doc_id")
    },
    Some {
      // unrolled fixed-iteration twin over the shared candidate CTEs
      val rounds = (1 to Iterations).map { i =>
        val prev = if (i == 1) "p0" else s"p${i - 1}"
        s"""
      m$i AS (
        SELECT e.dst AS id, sum(p.pr // p.deg) AS m
        FROM edges e JOIN $prev p ON e.src = p.id GROUP BY e.dst),
      p$i AS (
        SELECT d.id, d.deg,
          (($Scale // n.n) * 15) // 100 + (coalesce(m.m, 0) * 85) // 100 AS pr
        FROM deg d CROSS JOIN nn n LEFT JOIN m$i m ON d.id = m.id)"""
      }.mkString(",")
      s"""
      WITH ${Dedup.minhashCandCtes},
      edges AS (
        SELECT ia AS src, ib AS dst FROM cand
        UNION ALL
        SELECT ib, ia FROM cand),
      deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
      nn AS (SELECT count(*) AS n FROM deg),
      p0 AS (
        SELECT id, deg, ($Scale // n) AS pr FROM deg CROSS JOIN nn),
      $rounds
      SELECT id AS doc_id, deg::BIGINT AS deg, pr::BIGINT AS pr
      FROM p$Iterations
      ORDER BY pr DESC, doc_id"""
    }
  )

  /** Triangle count + global clustering coefficient over the same
    * candidate-pair graph — the density signal that separates "chains of
    * borderline near-dups" from "tight duplicate cliques" (a triangle-rich
    * neighborhood is a copy cluster; a triangle-free one is transitive
    * noise worth re-verifying).
    *
    * The canonical-orientation join (a < b < c, edges kept as `ia < ib`)
    * counts each triangle exactly once with TWO self-joins of the edge
    * list — never an all-pairs expansion; wedges come from the degree
    * relation (nodes-sized). Coefficient = 3·triangles / wedges as one
    * double division + qround. At 100 TB the edge list is the LSH
    * candidate set (O(n) with bounded buckets), and the e1⋈e2 join is
    * bounded by Σ deg² — the same wedge count the output reports. */
  /** Triangle/wedge statistics of a canonically-oriented edge list
    * `(ia < ib)` — factored out so the join logic is unit-testable on a
    * constructed graph with KNOWN triangles (GraphSpec), not only on the
    * triangle-free fixture corpus. */
  private[graft] def triangleStats(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.ib") === col("e2.ia"))
      .join(e.as("e3"),
        col("e3.ia") === col("e1.ia") && col("e3.ib") === col("e2.ib"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e.select($"ia".as("id")).union(e.select($"ib".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("d"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(tri).crossJoin(edges)
      .select($"n_nodes", $"n_edges", $"n_triangles", $"n_wedges",
        when($"n_wedges" > 0,
          graft.functions.Det.qround(
            (lit(3L) * $"n_triangles").cast("double") / $"n_wedges"))
          .as("clustering_coeff"))
  }

  val qTriangleCount = GraftQuery(
    "q_triangle_count",
    (spark, dir) => {
      // persisted: e1/e2/e3 self-joins AND the degree scan read it; the
      // query is lazy so it cannot unpersist before returning — cache
      // lifetime is bounded by the Verify/Bench/Prof clearCache-between-
      // queries protocol (same lifecycle as the pagerank and LSH persists)
      val e = Dedup.minhashCandidates(Dedup.docShingles(spark, dir, 2))
        .persist(StorageLevel.MEMORY_AND_DISK)
      triangleStats(e)
    },
    Some(s"""
      WITH ${Dedup.minhashCandCtes},
      tri AS (
        SELECT count(*) AS n_triangles
        FROM cand e1
        JOIN cand e2 ON e1.ib = e2.ia
        JOIN cand e3 ON e3.ia = e1.ia AND e3.ib = e2.ib),
      deg AS (
        SELECT id, count(*) AS d
        FROM (SELECT ia AS id FROM cand UNION ALL SELECT ib FROM cand)
        GROUP BY id),
      st AS (
        SELECT count(*)::BIGINT AS n_nodes,
          sum(d * (d - 1) // 2)::BIGINT AS n_wedges
        FROM deg),
      ne AS (SELECT count(*)::BIGINT AS n_edges FROM cand)
      SELECT n_nodes, n_edges, n_triangles::BIGINT AS n_triangles, n_wedges,
        CASE WHEN n_wedges > 0 THEN
          ${graft.Oracle.qround("(3 * n_triangles)::DOUBLE / n_wedges")}
        END AS clustering_coeff
      FROM st CROSS JOIN tri CROSS JOIN ne""")
  )

  /** Keywords reported by [[qTextrankKeywords]]. */
  val TextrankTopK = 20

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    * PageRank over the word co-occurrence graph — nodes are non-stopword
    * terms, an undirected edge weighted by how often two terms appear
    * ADJACENT (window 2) in the filtered token stream. The graph-based
    * keyword extractor that needs no training data, complementing
    * q_top_keywords' frequency-based TF-IDF pick: TextRank surfaces terms
    * CENTRAL to the corpus' co-occurrence structure, not merely frequent.
    *
    * Determinism: the [[qPagerank]] integer fixed-point discipline —
    * ranks in [[Scale]] micro-units, every operation an integer div/mul.
    * The weighted message is `(pr div wdeg) * w` rather than
    * `(pr * w) div wdeg`: since w ≤ wdeg, every intermediate stays ≤ pr ≤
    * ~[[Scale]], so the arithmetic cannot overflow Long at ANY corpus
    * size (pr·w would pass 2⁶³ once edge weights reach ~10⁶ at 100 TB).
    *
    * Scale shape: pair generation is one map pass (zip of the filtered
    * token array with its own tail — no posexplode self-join); the edge
    * relation aggregates to the model-sized term-pair domain before any
    * iteration; each of the [[Iterations]] rounds is one edges⋈state join
    * keyed on the term — vocabulary-sized state, never corpus-sized. */
  val qTextrankKeywords = GraftQuery(
    "q_textrank_keywords",
    (spark, dir) => {
      import spark.implicits._
      val t = filter(graft.functions.Text.tokens($"text"),
        w => !w.isin(graft.functions.Text.stopwords: _*))
      val len1 = greatest(size(t) - 1, lit(0))
      val pairs = zip_with(slice(t, lit(1), len1), slice(t, lit(2), len1),
        (x, y) => struct(x.as("wa"), y.as("wb")))
      val und = graft.Tables.spread(graft.Tables.documents(spark, dir))
        .select(explode(pairs).as("p"))
        .select($"p.wa", $"p.wb")
        .filter($"wa" =!= $"wb") // no self-loops, the TextRank convention
        .groupBy(least($"wa", $"wb").as("u"), greatest($"wa", $"wb").as("v"))
        .agg(count(lit(1)).as("w"))
      val edges = und.select($"u".as("src"), $"v".as("dst"), $"w")
        .union(und.select($"v".as("src"), $"u".as("dst"), $"w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy($"src".as("id")).agg(sum($"w").as("wdeg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = deg.agg(count(lit(1)).as("n"))
      var state = deg.crossJoin(broadcast(n))
        .select($"id", $"wdeg", $"n", expr(s"$Scale div n").as("pr"))
      for (_ <- 1 to Iterations) {
        val msgs = edges
          .join(state.select($"id".as("src"),
            expr("pr div wdeg").as("share")),
            Seq("src"))
          .groupBy($"dst".as("id")).agg(sum(expr("share * w")).as("m"))
        state = state.drop("pr").join(msgs, Seq("id"), "left")
          .select($"id", $"wdeg", $"n",
            expr(s"(($Scale div n) * 15) div 100 + " +
              "(coalesce(m, 0L) * 85) div 100").as("pr"))
          .persist(StorageLevel.MEMORY_AND_DISK)
      }
      state.select($"id".as("term"), $"wdeg", $"pr")
        .orderBy($"pr".desc, $"term").limit(TextrankTopK)
    },
    Some {
      val rounds = (1 to Iterations).map { i =>
        val prev = if (i == 1) "p0" else s"p${i - 1}"
        s"""
      m$i AS (
        SELECT e.dst AS id, sum((p.pr // p.wdeg) * e.w) AS m
        FROM edges e JOIN $prev p ON e.src = p.id GROUP BY e.dst),
      p$i AS (
        SELECT d.id, d.wdeg,
          (($Scale // n.n) * 15) // 100 + (coalesce(m.m, 0) * 85) // 100 AS pr
        FROM deg d CROSS JOIN nn n LEFT JOIN m$i m ON d.id = m.id)"""
      }.mkString(",")
      s"""
      WITH fl AS (
        SELECT doc_id, list_filter(
          string_split_regex(lower(text), '[[:space:]]+'),
          w -> w NOT IN ${graft.functions.Text.stopwordsSqlList}) AS t
        FROM documents),
      pr AS (
        SELECT t[i + 1] AS wa, t[i + 2] AS wb
        FROM (SELECT t, unnest(range(len(t) - 1)) AS i FROM fl)),
      und AS (
        SELECT least(wa, wb) AS u, greatest(wa, wb) AS v, count(*) AS w
        FROM pr WHERE wa <> wb
        GROUP BY 1, 2),
      edges AS (
        SELECT u AS src, v AS dst, w FROM und
        UNION ALL
        SELECT v, u, w FROM und),
      deg AS (SELECT src AS id, sum(w) AS wdeg FROM edges GROUP BY src),
      nn AS (SELECT count(*) AS n FROM deg),
      p0 AS (
        SELECT id, wdeg, ($Scale // n) AS pr FROM deg CROSS JOIN nn),
      $rounds
      SELECT id AS term, wdeg::BIGINT AS wdeg, pr::BIGINT AS pr
      FROM p$Iterations
      ORDER BY pr DESC, term LIMIT $TextrankTopK"""
    }
  )

  val all: Seq[GraftQuery] =
    Seq(qPagerank, qTriangleCount, qTextrankKeywords)
}
