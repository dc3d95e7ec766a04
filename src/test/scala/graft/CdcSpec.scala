package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Content-defined chunking (cdc_chunk_hashes / q_cdc_dedup): the native
  * expression against a plain-Scala replica, the boundary/partition laws,
  * the shift-robustness property fixed-width chunking lacks, and codegen
  * participation.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** Independent plain-Scala CDC: boundary after every token whose
    * u32(md5(token)) % divisor == 0 and after the last token; md5 of each
    * chunk's space-joined text, in order. */
  private def cdcRef(text: String, divisor: Int): Seq[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def u32(s: String): Long = java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)
    val toks = text.toLowerCase.split("\\s+", -1).toSeq
    val out = scala.collection.mutable.Buffer[String]()
    val cur = scala.collection.mutable.Buffer[String]()
    for ((t, i) <- toks.zipWithIndex) {
      cur += t
      if (u32(t) % divisor == 0 || i == toks.length - 1) {
        out += md5hex(cur.mkString(" "))
        cur.clear()
      }
    }
    out.toSeq
  }

  private def run(text: String, divisor: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(call_function("cdc_chunk_hashes", $"text", lit(divisor)))
      .collect().head.getSeq[String](0)

  test("cdc_chunk_hashes matches the plain-Scala replica on every fixture doc") {
    val got = Tables.documents(spark, fixtureDir)
      .select($"doc_id",
        call_function("cdc_chunk_hashes", $"text", lit(Dedup.CdcDivisor)).as("chs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for ((id, text, _, _) <- SparkSpec.fixtureDocs)
      assert(got(id) == cdcRef(text, Dedup.CdcDivisor), s"doc $id")
  }

  test("partition law: chunks cover the document exactly once, divisor 1 = per-token") {
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    // divisor 1: every token is a boundary → one chunk per token
    assert(run(text, 1).size == 40)
    assert(run(text, 1) == cdcRef(text, 1))
    // huge divisor: (almost surely) one chunk = the whole document
    assert(run(text, 1 << 28) == cdcRef(text, 1 << 28))
    // single token (also covers the "" text, which tokenizes to [""])
    assert(run("", 8).size == 1)
    assert(run("solo", 8) == cdcRef("solo", 8))
  }

  test("shift-robustness: a prefix insertion leaves the shared tail's chunks intact") {
    val tail = (1 to 60).map(i => s"w$i").mkString(" ")
    val a = run(tail, 4)
    val b = run(s"inserted prefix tokens $tail", 4)
    // everything after the first boundary inside the shared region is
    // identical — at least all but one of a's chunks must reappear in b
    val shared = a.toSet & b.toSet
    assert(shared.size >= a.size - 1, s"only ${shared.size} of ${a.size} chunks survived")
    assert(a != b) // the head chunk genuinely differs
  }

  test("q_cdc_dedup: identical fixture docs share every chunk, unique docs share none") {
    val rows = Dedup.qCdcDedup.run(spark, fixtureDir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // docs 2 and 3 are identical → all their chunks have df >= 2
    val (n2, s2, f2) = rows(2L)
    assert(n2 == cdcRef(SparkSpec.fixtureDocs(2)._2, Dedup.CdcDivisor).size.toLong)
    assert(s2 == n2 && f2 == 1.0)
    assert(rows(3L) == rows(2L))
    // docs 0 and 1 share no chunk with anything
    assert(rows(0L)._2 == 0L && rows(1L)._2 == 0L)
    // near-dups 4/5 (differ in last token): shared fraction strictly between
    val (n4, s4, _) = rows(4L)
    assert(s4 >= 0L && s4 <= n4)
  }

  test("cdc_chunk_hashes stays inside whole-stage codegen") {
    val plan = Tables.documents(spark, fixtureDir)
      .select(call_function("cdc_chunk_hashes", $"text", lit(8)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cdc_chunk_hashes"), plan)
  }
}
