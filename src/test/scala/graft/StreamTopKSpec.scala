package graft

import graft.functions.Text
import graft.streaming.StreamTopK
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming SpaceSaving heavy hitters: exactness when the table fits the
  * vocabulary (the regime the batch group-by can check as an equality),
  * and the order-independent SpaceSaving invariants when it cannot. */
class StreamTopKSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def runStream(slices: Seq[Seq[(String, String)]], capacity: Int,
      name: String): org.apache.spark.sql.DataFrame = {
    val in = MemoryStream[(String, String)](spark)
    val stream = in.toDF().toDF("lang", "term")
    val ckpt = Files.createTempDirectory("graft-topk-ckpt").toString
    val q = StreamTopK.tracked(stream, capacity)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      for (s <- slices) { in.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  test("capacity >= vocabulary: streamed table equals the exact batch counts") {
    val toks = Tables.spread(Tables.documents(spark, dir))
      .select($"lang", explode(Text.tokens($"text")).as("term"))
      .as[(String, String)].collect().toSeq
    val nVocab = toks.map(_._2).distinct.size
    val slices = toks.grouped(math.max(1, (toks.size + 2) / 3)).toSeq

    val snaps = runStream(slices, capacity = nVocab + 1, name = "topk_exact")
    val streamed = StreamTopK.report(snaps)
      .select($"lang", $"term", $"est", $"err")
      .as[(String, String, Long, Long)].collect().toSeq

    val batch = toks.groupBy(identity).map { case ((l, t), v) =>
      (l, t, v.size.toLong, 0L)
    }.toSeq
    assert(streamed.sorted === batch.sorted)
    assert(streamed.forall(_._4 == 0L)) // err 0 == every count exact
  }

  test("overflow regime: SpaceSaving invariants hold, heavy term tracked") {
    // 1 group, capacity 3, 6 distinct terms; "hot" holds 10 of 19
    // arrivals (> n/m = 19/3), so SpaceSaving MUST track it at the end
    val data: Seq[(String, String)] =
      Seq.fill(10)(("en", "hot")) ++
        Seq(("en", "a"), ("en", "b"), ("en", "c"), ("en", "d"), ("en", "e"),
          ("en", "a"), ("en", "b"), ("en", "a"), ("en", "d"))
    val truth = data.groupBy(_._2).view.mapValues(_.size.toLong).toMap

    val snaps = runStream(Seq(data.take(7), data.drop(7)), capacity = 3,
      name = "topk_overflow")
    val fin = StreamTopK.report(snaps)
      .as[(String, String, Long, Long, Long)].collect().toSeq

    assert(fin.size === 3) // table capped at m
    assert(fin.map(_._5).distinct === Seq(data.size.toLong)) // n_seen total
    assert(fin.exists(_._2 == "hot")) // frequency > n/m can never be evicted
    fin.foreach { case (_, term, est, err, _) =>
      val t = truth(term)
      assert(est >= t, s"$term undercounted")         // one-sided error
      assert(est - err <= t, s"$term bound violated") // inherited overcount
    }
    // the hot term was never evicted so its count is exact
    val hot = fin.find(_._2 == "hot").get
    assert(hot._3 === 10L && hot._4 === 0L)
  }
}
