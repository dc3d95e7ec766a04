package graft

import org.apache.spark.sql.functions._

/** Canary for driver testdata regeneration (the round-7 incident): the driver
  * has shipped `events.parquet` with different physical types for `ts` across
  * rounds — INT64 nanos (reads as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`), then plain timestamp[us] with
  * isAdjustedToUTC=false (reads as TimestampNTZType). A loader that assumes
  * one shape silently breaks every events-family query when the data is
  * regenerated with the other. This spec writes the SAME logical rows in all
  * three shapes Tables.events supports and asserts every shape yields
  * identical (event_id, ts_us, ts) — so the next silent regeneration fails
  * one named test instead of 39 queries. Removing either branch of the
  * adaptive loader makes at least one of these shapes throw or mismatch.
  */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  // epoch-microsecond fixtures incl. a value whose nanos form exceeds the
  // 53-bit double mantissa (the reason the nanos branch must use integer div)
  private val rows: Seq[(Long, Long)] = Seq(
    (0L, 0L),
    (1L, 1234567890123456L),
    (2L, 1700000000000001L),
    (3L, -5L))

  private def writeShape(shape: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-drift-$shape").toString
    val base = rows.toDF("event_id", "ts_us")
    val df = shape match {
      case "nanos_int64" =>
        // Spark cannot author parquet INT64 TIMESTAMP(NANOS); under
        // nanosAsLong that logical type arrives as plain LongType, exactly
        // like this raw int64 column — same branch of the loader either way.
        base.withColumn("ts", $"ts_us" * 1000L).drop("ts_us")
      case "micros_ntz" =>
        // the driver's current shape: timestamp[us], isAdjustedToUTC=false
        base.withColumn("ts", timestamp_micros($"ts_us").cast("timestamp_ntz"))
          .drop("ts_us")
      case "micros_utc" =>
        // timestamp[us], isAdjustedToUTC=true → reads back as TimestampType
        base.withColumn("ts", timestamp_micros($"ts_us")).drop("ts_us")
    }
    val out = s"$dir/events.parquet"
    shape match {
      case "micros_utc" =>
        val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        try df.write.parquet(out)
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
          case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
        }
      case _ => df.write.parquet(out)
    }
    dir
  }

  private def load(dir: String): Map[Long, (Long, java.sql.Timestamp)] =
    Tables.events(spark, dir)
      .select($"event_id", $"ts_us", $"ts")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getTimestamp(2))))
      .toMap

  test("all supported events.ts physical shapes load to identical ts_us/ts") {
    val shapes = Seq("nanos_int64", "micros_ntz", "micros_utc")
    val loaded = shapes.map(s => s -> load(writeShape(s))).toMap

    // every shape exposes the exact epoch micros we authored
    for (s <- shapes) {
      val got = loaded(s)
      assert(got.keySet == rows.map(_._1).toSet, s"shape $s lost rows")
      for ((id, us) <- rows)
        assert(got(id)._1 == us, s"shape $s: event $id ts_us ${got(id)._1} != $us")
    }
    // and the derived TimestampType column is bit-identical across shapes
    val ref = loaded(shapes.head)
    for (s <- shapes.tail; (id, (us, ts)) <- loaded(s))
      assert(ts == ref(id)._2, s"shape $s: event $id ts $ts != ${ref(id)._2} (ts_us=$us)")
  }

  test("driver table contracts: every column the queries depend on is present") {
    // the generalized round-7 lesson: a driver regeneration that renames or
    // drops a column should fail ONE named test, not scatter failures over
    // a whole query family. Column NAMES only — types may drift and the
    // loaders adapt (events.ts being the precedent).
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory)
    val expected = Map(
      "region" -> Set("r_regionkey", "r_name"),
      "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"),
      "supplier" -> Set("s_suppkey", "s_nationkey"),
      "part" -> Set("p_partkey", "p_brand", "p_type"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderdate",
        "o_orderpriority", "o_totalprice"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus"),
      "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"),
      "events" -> Set("event_id", "ts", "user_id", "event_type", "value",
        "props"))
    for ((t, cols) <- expected) {
      val have = Tables.table(spark, sfDir, t).schema.fieldNames.toSet
      val missing = cols -- have
      assert(missing.isEmpty,
        s"table $t lost columns $missing (driver regeneration?) — have $have")
    }
  }

  test("driver testdata (if present) loads through the adaptive branch") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts_us").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // micros derived from ts must equal ts_us — catches a branch that pairs
    // the wrong unit conversion with the loaded physical type
    val bad = df.filter(unix_micros($"ts") =!= $"ts_us").count()
    assert(bad == 0L, s"$bad rows where ts and ts_us disagree")
  }
}
