package graft

import org.apache.spark.sql.SparkSession

/** Throwaway per-query wall-time profiler (dev use only).
  * Usage: runMain graft.Prof q_name [q_name ...] */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // legacy-compat for old INT64(NANOS) events files; see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("-explain")) {
      for (n <- args.tail; q <- Queries.byName.get(n))
        println(q.run(spark, dir).queryExecution.executedPlan.toString)
      spark.stop(); return
    }
    if (args.headOption.contains("-buildscale")) {
      // build the Nx salted-replica dir only (for per-query 10x rehearsals
      // via SPARK_GRAFT_SF_DIR without re-measuring the whole family set)
      val n = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(10)
      ScaleRehearsal.build(spark, dir, s"/tmp/graft_scale_${n}x", n)
      spark.stop(); return
    }
    if (args.headOption.contains("-scale")) {
      // 10x scale rehearsal for the pair-join dedup families; see
      // ScaleRehearsal. Usage: Prof -scale [N] [baseDir] — both optional,
      // so a lone dir argument works (non-numeric arg 1 is the dir)
      val rest = args.drop(1)
      val n = rest.headOption.flatMap(_.toIntOption).getOrElse(10)
      val base = (if (rest.headOption.exists(_.toIntOption.isDefined))
        rest.drop(1) else rest).headOption.getOrElse(dir)
      val scaled = s"/tmp/graft_scale_${n}x"
      ScaleRehearsal.build(spark, base, scaled, n)
      ScaleRehearsal.run(spark, base, scaled, n)
      spark.stop(); return
    }
    val names = if (args.nonEmpty) args.toSeq else Queries.all.map(_.name)
    // Same sink as Bench: noop consumes every output column; count() lets
    // Catalyst prune projections and under-measures map-heavy queries.
    for (n <- names; q <- Queries.byName.get(n); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"PROF $n%-24s run$rep ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      if (rep == 2) spark.catalog.clearCache()
    }
    spark.stop()
  }
}
