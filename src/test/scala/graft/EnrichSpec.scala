package graft

import graft.streaming.Enrich
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Stream-static broadcast enrichment end-to-end, with observe() metrics
  * read back from the streaming progress (single-pass data-quality
  * counters — no extra action). */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static enrichment broadcasts the dim and reports unmatched keys") {
    val srcDir = Files.createTempDirectory("graft-enrich-src").toString
    Files.write(Paths.get(srcDir, "b0.txt"), Seq(
      """{"user_id": 1, "value": 10.0}""",
      """{"user_id": 2, "value": 20.0}""",
      """{"user_id": 9, "value": 90.0}""").mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val stream = spark.readStream.format("text").load(srcDir)
      .select(from_json($"value", schema).as("r"))
      .select($"r.user_id", $"r.value")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")

    val q = Enrich.withDim(stream, dim, "user_id", probe = "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "enrichment query did not terminate")
    assert(q.exception.isEmpty, q.exception)

    val got = spark.table("enriched")
      .as[(Long, Double, Option[String])].collect().toSet
    assert(got === Set((1L, 10.0, Some("gold")), (2L, 20.0, Some("basic")),
      (9L, 90.0, None)))

    // the observed metrics rode along with the batch — no second pass
    val metrics = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get(Enrich.MetricsName)))
    assert(metrics.nonEmpty, "no observed metrics in progress")
    assert(metrics.map(m => (m.getAs[Long]("rows"), m.getAs[Long]("unmatched")))
      .contains((3L, 1L)))
  }
}
