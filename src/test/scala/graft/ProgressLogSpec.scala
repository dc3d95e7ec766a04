package graft

import graft.streaming.ProgressLog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Engine-metrics listener end-to-end: per-batch progress rows land in the
  * metrics dir with the right batch ids and row counts. */
class ProgressLogSpec extends SparkSpec {
  import spark.implicits._

  test("progress log records one row per completed micro-batch") {
    val dir = Files.createTempDirectory("graft-progress").toString
    val l = ProgressLog.attach(spark, s"$dir/metrics")
    try {
      val in = MemoryStream[Long](spark)
      val q = in.toDF().toDF("v")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      try {
        in.addData(1L, 2L, 3L)
        q.processAllAvailable()
        in.addData(4L)
        q.processAllAvailable()
      } finally q.stop()

      // listener-bus delivery is async; poll briefly for both rows
      def rows(): Seq[(Long, Long)] =
        try spark.read.parquet(s"$dir/metrics")
          .select($"batch_id", $"input_rows").as[(Long, Long)]
          .collect().toSeq.sortBy(_._1)
        catch { case _: Throwable => Seq.empty }
      val deadline = System.nanoTime() + 30e9.toLong
      var got = rows()
      while (got.size < 2 && System.nanoTime() < deadline) {
        Thread.sleep(200); got = rows()
      }
      assert(got.take(2) === Seq((0L, 3L), (1L, 1L)), got.toString)
    } finally ProgressLog.detach(spark, l)
  }
}
