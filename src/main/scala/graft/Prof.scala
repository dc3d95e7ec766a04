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
      // mirror Bench's session shape so profiles match bench plans
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST_THRESHOLD", "64m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev A/B hook: SPARK_GRAFT_PROF_CONF="k=v;k=v" applies runtime SQL
    // confs before profiling (e.g. autoBroadcastJoinThreshold sweeps)
    sys.env.get("SPARK_GRAFT_PROF_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    if (args.headOption.contains("-explain")) {
      for (n <- args.tail; q <- Queries.byName.get(n))
        println(q.run(spark, dir).queryExecution.executedPlan.toString)
      spark.stop(); return
    }
    if (args.headOption.contains("-fmt")) {
      // write each query's POST-EXECUTION formatted plan (AQE final plan,
      // PushedFilters/ReadSchema per scan) to <outDir>/<name>_<suffix>.txt
      // — the plan evidence files the optimization rounds commit under
      // plans/. Usage: Prof -fmt <outDir> <suffix> q_name [q_name ...]
      val outDir = args(1); val suffix = args(2)
      new java.io.File(outDir).mkdirs()
      for (n <- args.drop(3); q <- Queries.byName.get(n)) {
        val df = q.run(spark, dir)
        df.write.format("noop").mode("overwrite").save() // finalize AQE plan
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (args.headOption.contains("-stages")) {
      // per-stage wall/shuffle attribution: run each query once warm, then
      // once with a stage listener, printing each stage's duration, task
      // count, shuffle read/write and input bytes. Dev-only forensics.
      val names = args.tail
      for (n <- names; q <- Queries.byName.get(n)) {
        q.run(spark, dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        val stages =
          new scala.collection.mutable.ArrayBuffer[(Int, Long, Int, Long, Long, Long, String, Long, Long, Long, Long)]
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val t = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
            // callsite: the submitting action is a future thunk for AQE
            // subqueries, so si.name is useless ($anonfun...); the stage's
            // RDD scope names (physical operators, innermost first) name
            // the work, falling back to the first graft.* stack frame
            val ops = si.rddInfos.sortBy(-_.id).flatMap(_.scope)
              .map(_.name).distinct.take(5).mkString("<")
            val site = (if (ops.nonEmpty) ops else si.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("graft.Prof"))
              .getOrElse(si.name.takeWhile(_ != '\n'))).trim.take(90)
            stages += ((si.stageId, t.getOrElse(-1L), si.numTasks,
              si.taskMetrics.shuffleReadMetrics.totalBytesRead,
              si.taskMetrics.shuffleWriteMetrics.bytesWritten,
              si.taskMetrics.inputMetrics.bytesRead,
              site,
              si.taskMetrics.executorRunTime,
              si.taskMetrics.executorCpuTime / 1000000,
              si.taskMetrics.executorDeserializeTime,
              si.taskMetrics.jvmGCTime))
          }
        }
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        q.run(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // drain the async listener bus
        spark.sparkContext.removeSparkListener(listener)
        println(f"STAGES $n wall=$wall%.2f s, ${stages.size} stages, " +
          f"sum(run)=${stages.map(_._8).sum / 1000.0}%.2f " +
          f"sum(cpu)=${stages.map(_._9).sum / 1000.0}%.2f " +
          f"sum(deser)=${stages.map(_._10).sum / 1000.0}%.2f " +
          f"sum(gc)=${stages.map(_._11).sum / 1000.0}%.2f")
        for ((id, ms, nt, sr, sw, in, nm, rt, cpu, de, gc) <- stages.sortBy(-_._2).take(12))
          println(f"  stage $id%4d ${ms / 1000.0}%7.2f s tasks=$nt%3d " +
            f"shufR=${sr / 1e6}%6.1fMB shufW=${sw / 1e6}%6.1fMB " +
            f"in=${in / 1e6}%6.1fMB run=${rt / 1000.0}%6.2f cpu=${cpu / 1000.0}%6.2f " +
            f"deser=${de / 1000.0}%5.2f gc=${gc / 1000.0}%5.2f $nm")
        spark.catalog.clearCache()
      }
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
