package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (q_winnow_stats / q_winnow_overlap): the native
  * `winnow_hashes` expression against a plain-Scala replica of the published
  * algorithm, hand-checkable edge cases, the SIGMOD'03 guarantee on the
  * fixture's planted near-dup pair, and codegen participation.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Independent plain-Scala winnowing: lowercase whitespace tokens →
    * positional n-grams → md5 hex → per-window minima (window w, one
    * window spanning everything when grams < w) → distinct sorted. */
  private def winnowRef(text: String, n: Int, w: Int): Seq[String] = {
    val toks = text.toLowerCase.split("\\s+", -1).toSeq
    val grams =
      if (toks.length < n) Seq.empty[String]
      else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = grams.map { g =>
      md.reset()
      md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    if (hs.isEmpty) Seq.empty
    else {
      val nWindows = math.max(hs.size - w + 1, 1)
      (0 until nWindows)
        .map(j => hs.slice(j, math.min(j + w, hs.size)).min)
        .distinct.sorted
    }
  }

  test("winnow_hashes matches the plain-Scala replica on every fixture doc") {
    val got = Tables.documents(spark, fixtureDir)
      .select($"doc_id", call_function("winnow_hashes", $"text",
        lit(Dedup.WinnowN), lit(Dedup.WinnowW)).as("fps"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    for ((id, text, _, _) <- SparkSpec.fixtureDocs)
      assert(got(id) == winnowRef(text, Dedup.WinnowN, Dedup.WinnowW), s"doc $id")
  }

  test("edge cases: short texts and tie-heavy repeats") {
    def run(text: String, n: Int, w: Int): Seq[String] =
      Seq(text).toDF("text")
        .select(call_function("winnow_hashes", $"text", lit(n), lit(w)))
        .collect().head.getSeq[String](0)
    // fewer than n tokens: no grams, empty set
    assert(run("one two", 3, 4).isEmpty)
    // exactly n tokens: one gram, one window, one fingerprint
    assert(run("a b c", 3, 4).size == 1)
    assert(run("a b c", 3, 4) == winnowRef("a b c", 3, 4))
    // grams < w: single window spanning all grams → exactly one minimum
    assert(run("a b c d e", 3, 4) == winnowRef("a b c d e", 3, 4))
    assert(run("a b c d e", 3, 4).size == 1)
    // all-identical grams: every window min is the same hash → one fp
    assert(run("x x x x x x x x x x", 3, 4).size == 1)
  }

  test("guarantee: a shared run of >= n+w-1 tokens yields a shared fingerprint") {
    // fixture docs 4 and 5 share the 29-token prefix w1..w29 — far above
    // the t = 6 guarantee threshold, so their selected sets must intersect
    val a = winnowRef(SparkSpec.fixtureDocs(4)._2, Dedup.WinnowN, Dedup.WinnowW).toSet
    val b = winnowRef(SparkSpec.fixtureDocs(5)._2, Dedup.WinnowN, Dedup.WinnowW).toSet
    assert((a & b).nonEmpty)
  }

  test("q_winnow_stats matches replica-derived profile on the fixture") {
    val rows = Dedup.qWinnowStats.run(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((id, text, _, _) <- SparkSpec.fixtureDocs) {
      val toks = text.toLowerCase.split("\\s+", -1).length
      val grams = math.max(toks - Dedup.WinnowN + 1, 0)
      val fps = winnowRef(text, Dedup.WinnowN, Dedup.WinnowW).size
      assert(rows(id) == ((grams.toLong, fps.toLong)), s"doc $id")
    }
  }

  test("q_winnow_overlap surfaces exactly the planted near-dup pair on the fixture") {
    // docs 2 and 3 are identical but 4 tokens long (2 grams → 1 fingerprint
    // each): below WinnowMinShared, correctly treated as coincidence-level.
    // docs 4 and 5 share 27 of 28 grams; their pair must survive with
    // shared >= 2 and containment reflecting the selected-set overlap.
    val rows = Dedup.qWinnowOverlap.run(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(t => (t._1, t._2)).toSeq == Seq((4L, 5L)), rows.mkString(","))
    val a = winnowRef(SparkSpec.fixtureDocs(4)._2, Dedup.WinnowN, Dedup.WinnowW).toSet
    val b = winnowRef(SparkSpec.fixtureDocs(5)._2, Dedup.WinnowN, Dedup.WinnowW).toSet
    assert(rows.head._3 == (a & b).size.toLong)
  }

  test("winnow_hashes stays inside whole-stage codegen") {
    val plan = Tables.documents(spark, fixtureDir)
      .select(call_function("winnow_hashes", $"text", lit(3), lit(4)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [winnow_hashes"), plan)
  }
}
