package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Integer PageRank: the iteration hand-checked on a 3-node path graph
  * (every step a bigint div/sum — the values below are computed by hand in
  * the scaladoc arithmetic), plus symmetry/conservation properties of the
  * full query on the fixture near-dup graph. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("iterate matches the hand-computed path graph a-b-c") {
    // undirected path 10-20-30: deg(10)=deg(30)=1, deg(20)=2, N=3
    val cand = Seq((10L, 20L), (20L, 30L)).toDF("ia", "ib")
    val edges = cand.select($"ia".as("src"), $"ib".as("dst"))
      .union(cand.select($"ib".as("src"), $"ia".as("dst")))
    val deg = edges.groupBy($"src".as("id")).agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n"))
    var state = deg.crossJoin(broadcast(n))
      .select($"id", $"deg", $"n", expr(s"${Graph.Scale} div n").as("pr"))
    // p0: uniform 333333333333
    assert(state.select($"pr").distinct().as[Long].collect().toSeq
      === Seq(333333333333L))
    state = Graph.iterate(edges, state)
    val p1 = state.select($"id", $"pr").as[(Long, Long)].collect().toMap
    assert(p1 === Map(10L -> 191666666665L, 20L -> 616666666665L,
      30L -> 191666666665L))
    state = Graph.iterate(edges, state)
    val p2 = state.select($"id", $"pr").as[(Long, Long)].collect().toMap
    assert(p2 === Map(10L -> 312083333331L, 20L -> 375833333329L,
      30L -> 312083333331L))
    state = Graph.iterate(edges, state)
    val p3 = state.select($"id", $"pr").as[(Long, Long)].collect().toMap
    assert(p3 === Map(10L -> 209729166663L, 20L -> 580541666661L,
      30L -> 209729166663L))
  }

  test("q_pagerank on the fixture: symmetric near-dup twins rank equally") {
    val rows = Graph.qPagerank.run(spark, fixtureDir)
      .as[(Long, Long, Long)].collect()
    val pr = rows.map(r => r._1 -> r._3).toMap
    // the exact-duplicate pair (2,3) shares every band → always an edge;
    // the graph is invariant under swapping them, so their ranks are equal
    assert(pr.contains(2L) && pr.contains(3L))
    assert(pr(2L) === pr(3L))
    assert(rows.forall(_._3 > 0L))
    // truncating integer division only ever loses mass
    assert(rows.map(_._3).sum <= Graph.Scale)
    // output ordering is (pr desc, doc_id asc)
    assert(rows.sortBy(r => (-r._3, r._1)).toSeq === rows.toSeq)
  }

  test("triangle count: fixture graph has two disjoint edges, no triangles") {
    // cand on the fixture corpus: (2,3) exact dups and (4,5) near dups —
    // 4 nodes, 2 edges, every degree 1 -> 0 wedges, 0 triangles, null coeff
    val r = Graph.qTriangleCount.run(spark, fixtureDir)
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(r === Seq((4L, 2L, 0L, 0L, None)))
  }

  test("triangle count satisfies the wedge bound on sf0.001") {
    val r = Graph.qTriangleCount.run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    val (nodes, edges, tris, wedges, coeff) = r
    assert(nodes > 0 && edges > 0 && wedges >= 0)
    assert(3 * tris <= wedges.max(0L)) // each triangle closes 3 wedges
    coeff.foreach(c => assert(c >= 0.0 && c <= 1.0))
  }


  test("triangleStats counts a known triangle once, with exact wedges") {
    // K3 on {1,2,3} plus pendant edge (3,4): 1 triangle; degrees 2,2,3,1
    // -> wedges 1+1+3+0 = 5; coefficient 3*1/5 = 0.6
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("ia", "ib")
    val r = Graph.triangleStats(e)
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(r === Seq((4L, 4L, 1L, 5L, Some(0.6))))
    // two disjoint triangles: counted once each
    val e2 = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 20L), (20L, 30L), (10L, 30L)).toDF("ia", "ib")
    val r2 = Graph.triangleStats(e2)
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(r2 === Seq((6L, 6L, 2L, 6L, Some(1.0))))
  }

  test("textrank: hand-traced integer PageRank on a 3-term word graph") {
    // filtered streams: d0 [fast,fast,slow] (self-loop dropped), d1
    // [fast,big] ("the" removed BEFORE pairing, so fast-big touch),
    // d2=d3 [slow,slow,slow,big] -> big-slow w=2. Edges: (big,fast) 1,
    // (big,slow) 2, (fast,slow) 1; wdeg big=3, fast=2, slow=3. Three
    // integer fixed-point rounds traced by hand (Scale=1e12, d=0.85).
    val dir = java.nio.file.Files.createTempDirectory("graft-trank").toString
    Seq(
      (0L, "fast fast slow"), (1L, "fast the big"),
      (2L, "slow slow slow big"), (3L, "slow slow slow big"))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Graph.qTextrankKeywords.run(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("big", 3L, 370966820982L),
      ("slow", 3L, 370966820982L),
      ("fast", 2L, 258066358020L)))
  }

  test("textrank at sf0.001: exactly top-K central terms, none a stopword") {
    val got = Graph.qTextrankKeywords.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect().toSeq
    assert(got.size === Graph.TextrankTopK)
    assert(got.map(_._1).distinct.size === got.size)
    assert(got.forall(r => !graft.functions.Text.stopwords.contains(r._1)))
  }
}
