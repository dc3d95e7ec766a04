package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.Random

/** Native dot_f32 / lsh_bucket expressions: exact agreement with the
  * declarative decimal zip_with/aggregate formulation they replace, null
  * semantics, and codegen participation. */
class ArrayOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(7)
  private def randVec(n: Int): Array[Float] =
    Array.fill(n)((rnd.nextFloat() - 0.5f) * 4f)

  // NOTE the reference formulation is posexplode + sum(CAST(... AS
  // DECIMAL(38,12))) — the aggregate keeps scale 12 exactly, like the DuckDB
  // oracle. (An aggregate() HOF with a (38,12) accumulator does NOT: Spark's
  // decimal addition yields (38,11), shaving a digit per step.)

  test("dot_f32 equals the exploded decimal-sum formulation on 300 random pairs") {
    val rows = Seq.fill(300)((randVec(64), randVec(64)))
    val df = rows.toDF("a", "b").withColumn("id", monotonically_increasing_id())
    val ref = df
      .select($"id", explode(zip_with($"a", $"b",
        (x, y) => x.cast(DoubleType) * y.cast(DoubleType))).as("p"))
      .groupBy($"id")
      .agg(sum($"p".cast(DecimalType(38, 12))).cast(DoubleType).as("declarative"))
    val native = df.select($"id", call_function("dot_f32", $"a", $"b").as("native"))
    val diffs = native.join(ref, Seq("id"))
      .filter($"native" =!= $"declarative").count()
    assert(diffs === 0)
  }

  test("lsh_bucket equals the exploded per-plane decimal sums on random vectors") {
    val rows = Seq.fill(200)(randVec(64))
    val df = rows.map(Tuple1(_)).toDF("e").withColumn("id", monotonically_increasing_id())
    val ref = df
      .select($"id", posexplode($"e").as(Seq("d", "v")))
      .crossJoin(spark.range(8).toDF("j"))
      .select($"id", $"j",
        (expr("((1103515245 * (j * 64 + d) + 12345) div 65536) % 19") - lit(9L))
          .cast(DoubleType).multiply($"v".cast(DoubleType)).as("p"))
      .groupBy($"id", $"j")
      .agg(sum($"p".cast(DecimalType(38, 12))).as("proj"))
      .groupBy($"id")
      .agg(sum(when($"proj" >= 0, expr("shiftleft(cast(1 as bigint), cast(j as int))"))
        .otherwise(0L)).as("declarative"))
    val native = df.select($"id", call_function("lsh_bucket", $"e", lit(8)).as("native"))
    val diffs = native.join(ref, Seq("id"))
      .filter($"native" =!= $"declarative").count()
    assert(diffs === 0)
  }

  test("null semantics: null array or length mismatch yields null") {
    val r = spark.sql("""
      SELECT dot_f32(cast(null as array<float>), array(1.0f)) AS a,
             dot_f32(array(1.0f, 2.0f), array(1.0f)) AS b,
             dot_f32(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS c""")
      .as[(Option[Double], Option[Double], Option[Double])].head()
    assert(r === ((None, None, Some(11.0))))
  }

  test("dot_f32 stays inside whole-stage codegen") {
    val plan = Tables.embeddings(spark, fixtureDir)
      .select(call_function("dot_f32", $"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dot_f32"))
  }

  test("native expressions are null-safe: null in, null out") {
    val r = spark.sql("""
      SELECT word_shingles(cast(null as string), 2) AS ws,
             simhash32(cast(null as string)) AS sh,
             minhash_bands(cast(null as array<string>), 12, 3) AS mb,
             vader_score(cast(null as string)) AS vs,
             sentiment_score(cast(null as string)) AS ss""")
    assert(r.selectExpr("ws IS NULL", "sh IS NULL", "mb IS NULL",
      "vs IS NULL", "ss IS NULL")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].head()
      === ((true, true, true, true, true)))
    // and degenerate non-null inputs are total
    val d = spark.sql("""
      SELECT word_shingles('', 3) AS ws, simhash32('') AS sh,
             minhash_bands(cast(array() as array<string>), 12, 3) AS mb,
             vader_score('') AS vs""")
      .as[(Seq[String], Long, Seq[String], Double)].head()
    assert(d._1 === Seq.empty)
    assert(d._3 === null)  // empty shingle set: NULL bands, never "" keys
    assert(d._4 === 0.0)
  }

  test("word_chunks: lossless in-order chunking incl. trailing partial and empty text") {
    val r = spark.sql("""
      SELECT word_chunks('A b c d e', 2) AS c5,
             word_chunks('a b c d', 2) AS c4,
             word_chunks('', 3) AS ce,
             word_chunks('one', 3) AS c1,
             word_chunks(cast(null as string), 2) AS cn""")
      .as[(Seq[String], Seq[String], Seq[String], Seq[String], Seq[String])].head()
    assert(r._1 === Seq("a b", "c d", "e"))     // trailing partial kept
    assert(r._2 === Seq("a b", "c d"))          // exact multiple: no empty tail
    assert(r._3 === Seq(""))                    // empty text -> one empty chunk
    assert(r._4 === Seq("one"))
    assert(r._5 === null)
    // reassembly reproduces the lowercased document verbatim
    val doc = "The quick brown fox jumps over the lazy dog again and again"
    val joined = spark.sql(
      s"SELECT array_join(word_chunks('$doc', 5), ' ') AS j")
      .as[String].head()
    assert(joined === doc.toLowerCase)
    // in-order and NOT distinct: repeated spans must all survive
    val rep = spark.sql("SELECT word_chunks('x y x y x y', 2) AS c")
      .as[Seq[String]].head()
    assert(rep === Seq("x y", "x y", "x y"))
  }

  test("zorder2: bit interleave, 21-bit masking, null propagation") {
    val r = spark.sql("""
      SELECT zorder2(3L, 1L) AS a,          -- x bits at even, y at odd: 0b0111
             zorder2(0L, 0L) AS b,
             zorder2(2097151L, 0L) AS c,    -- x = 2^21-1: all even bits set
             zorder2(2097152L, 0L) AS d,    -- bit 21 ignored by design
             zorder2(cast(null as bigint), 1L) AS e""")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert(r._1 === 7L)
    assert(r._2 === 0L)
    assert(r._3 === (0 until 21).map(i => 1L << (2 * i)).sum)
    assert(r._4 === 0L)
    assert(r._5 === None)
    // locality: neighbors in both dims stay within a small z distance
    assert(functions.ArrayOps.zorder2(5, 9) ===
      (functions.ArrayOps.zorder2(4, 8) | 3L))
  }

  test("q8_stats: exact round-trip errors, zero-vector and empty-vector guards") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f)),      // all-zero: scale degenerates, errs 0
      (3L, Array.empty[Float]))
    val out = vecs.toDF("id", "v")
      .selectExpr("id", "q8_stats(v) AS st")
      .selectExpr("id", "st.max_abs", "st.errs")
      .as[(Long, Double, Seq[Double])]
      .collect().sortBy(_._1)
    assert(out(0)._2 === 1.0)
    // scale = 1/127; per-element err = |floor(x*127 + .5)/127 - x|
    val expected = Seq(1.0, -0.5, 0.25, 0.0).map { x =>
      val q = math.floor(x * 127.0 / 1.0 + 0.5)
      math.abs(q * (1.0 / 127.0) - x)
    }
    assert(out(0)._3 === expected)
    assert(out(0)._3.head === 0.0)  // exact max round-trips exactly
    assert(out(1) === ((2L, 0.0, Seq(0.0, 0.0))))
    assert(out(2) === ((3L, 0.0, Seq.empty[Double])))
  }

  test("all round-2 native expressions stay inside whole-stage codegen") {
    // the whole point of these expressions is replacing CodegenFallback HOFs;
    // a silent fallback would show as a Project OUTSIDE a *(n) codegen span
    val docs = Tables.documents(spark, fixtureDir)
    for ((name, colExpr) <- Seq(
      "word_shingles" -> call_function("word_shingles", $"text", lit(2)),
      "word_chunks" -> call_function("word_chunks", $"text", lit(3)),
      "simhash32" -> call_function("simhash32", $"text"),
      "vader_score" -> call_function("vader_score", $"text"),
      "sentiment_score" -> call_function("sentiment_score", $"text"))) {
      val plan = docs.select(colExpr).queryExecution.executedPlan.toString
      assert(plan.contains(s"*(1) Project [$name"), s"$name fell out of codegen:\n$plan")
    }
    val bandsPlan = docs
      .select(call_function("minhash_bands",
        call_function("word_shingles", $"text", lit(2)), lit(12), lit(3)))
      .queryExecution.executedPlan.toString
    assert(bandsPlan.contains("*(1) Project [minhash_bands"), bandsPlan)
  }
}
