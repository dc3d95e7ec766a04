package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the lexicon sentiment scorer — the one
  * place a custom expression is justified over built-ins (SURVEY.md §7.3):
  * the reference's hot path runs a Python UDF per row per action
  * (reddit_consumer.py:87-99); here the scorer is a single generated-code
  * call with no serialization boundary, usable from SQL as
  * `sentiment_score(text)` once [[GraftExtensions]] is installed.
  *
  * Semantics are identical to the relational formulation used by the
  * verified surface (tokenize → Σ valence / n_tokens, exact decimal sum,
  * rounded to 6 dp) — asserted by SentimentScoreSpec, so either path can
  * serve the same queries.
  */
case class SentimentScore(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sentiment_score requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sentiment_score"

  override protected def nullSafeEval(input: Any): Any =
    SentimentScore.score(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SentimentScore.score($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SentimentScore =
    copy(child = newChild)
}

object SentimentScore {
  private val valences: java.util.HashMap[String, java.math.BigDecimal] = {
    val m = new java.util.HashMap[String, java.math.BigDecimal]()
    SentimentLexicon.all.foreach { case (t, v) =>
      m.put(t, java.math.BigDecimal.valueOf(v))
    }
    m
  }

  /** Tokenize (MLlib Tokenizer semantics), sum valences exactly (decimal),
    * divide by token count, round to 6 dp. Called from generated code.
    * Locale.ROOT lowering + limit -1 split: the relational twin
    * (split(lower(text), "\\s+") — locale-independent, trailing empties
    * KEPT) and the DuckDB oracle both count trailing empty tokens in the
    * denominator, and a Turkish default locale would break the lexicon
    * lookup ("BIG" → "bıg"). */
  def score(text: String): Double = {
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    if (toks.isEmpty) return 0.0
    var sum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < toks.length) {
      val v = valences.get(toks(i))
      if (v != null) sum = sum.add(v)
      i += 1
    }
    // cross-engine-exact rounding (Det.qround twin): floor(x*1e6+0.5)/1e6 —
    // identical IEEE ops to the relational path and the DuckDB oracle, which
    // disagree with BigDecimal HALF_UP exactly when the quotient terminates
    // on x.xxxxxx5 (e.g. 41/640 = 0.0640625; n_tokens = 2^a*5^b is common)
    math.floor(sum.doubleValue() / toks.length * 1000000.0 + 0.5) / 1000000.0
  }
}

/** Session extensions installing the engine's native functions; use with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  /** Evaluate an integer parameter argument, failing with a readable error
    * at registration time when it is not a literal — a bare
    * `args(i).eval()` on a column reference throws an opaque
    * UnsupportedOperationException from deep inside plan building. */
  private def intArg(fn: String, name: String, args: Seq[Expression],
      i: Int, default: => Int = throw new IllegalArgumentException("missing")): Int =
    args.lift(i) match {
      case None => default
      case Some(e) if e.foldable => e.eval().asInstanceOf[Number].intValue()
      case Some(e) => throw new IllegalArgumentException(
        s"$fn: $name must be a literal integer, got ${e.sql}")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("sentiment_score"),
      new ExpressionInfo(classOf[SentimentScore].getName, "sentiment_score"),
      (args: Seq[Expression]) => SentimentScore(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
      (args: Seq[Expression]) => DotF32(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_f32_fast"),
      new ExpressionInfo(classOf[DotF32Fast].getName, "dot_f32_fast"),
      (args: Seq[Expression]) => DotF32Fast(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      (args: Seq[Expression]) => LshBucket(args.head,
        intArg("lsh_bucket", "n_planes", args, 1, default = 8))))
    ext.injectFunction((
      new FunctionIdentifier("dot_f32_f64"),
      new ExpressionInfo(classOf[DotF32F64].getName, "dot_f32_f64"),
      (args: Seq[Expression]) => DotF32F64(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("dist2_f32_f64"),
      new ExpressionInfo(classOf[Dist2F32F64].getName, "dist2_f32_f64"),
      (args: Seq[Expression]) => Dist2F32F64(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("dist2_f32_f64_fast"),
      new ExpressionInfo(classOf[Dist2F32F64Fast].getName, "dist2_f32_f64_fast"),
      (args: Seq[Expression]) => Dist2F32F64Fast(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("mean_codepoint"),
      new ExpressionInfo(classOf[MeanCodepoint].getName, "mean_codepoint"),
      (args: Seq[Expression]) => MeanCodepoint(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("rep_stats"),
      new ExpressionInfo(classOf[RepStats].getName, "rep_stats"),
      (args: Seq[Expression]) => RepStats(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("token_diversity"),
      new ExpressionInfo(classOf[TokenDiversity].getName, "token_diversity"),
      (args: Seq[Expression]) => TokenDiversity(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("vader_score"),
      new ExpressionInfo(classOf[VaderScore].getName, "vader_score"),
      (args: Seq[Expression]) => VaderScore(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinhashBands].getName, "minhash_bands"),
      (args: Seq[Expression]) => MinhashBands(args.head,
        intArg("minhash_bands", "k", args, 1),
        intArg("minhash_bands", "band_rows", args, 2))))
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[Simhash32].getName, "simhash32"),
      (args: Seq[Expression]) => Simhash32(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("ahash16"),
      new ExpressionInfo(classOf[Ahash16].getName, "ahash16"),
      (args: Seq[Expression]) => Ahash16(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("upper_products"),
      new ExpressionInfo(classOf[UpperProducts].getName, "upper_products"),
      (args: Seq[Expression]) => UpperProducts(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => WordShingles(args.head,
        intArg("word_shingles", "n", args, 1))))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles_all"),
      new ExpressionInfo(classOf[WordShinglesAll].getName, "word_shingles_all"),
      (args: Seq[Expression]) => WordShinglesAll(args.head,
        intArg("word_shingles_all", "n", args, 1))))
    ext.injectFunction((
      new FunctionIdentifier("word_chunks"),
      new ExpressionInfo(classOf[WordChunks].getName, "word_chunks"),
      (args: Seq[Expression]) => WordChunks(args.head,
        intArg("word_chunks", "n", args, 1))))
    ext.injectFunction((
      new FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[Zorder2].getName, "zorder2"),
      (args: Seq[Expression]) => Zorder2(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_hashes"),
      new ExpressionInfo(classOf[WinnowHashes].getName, "winnow_hashes"),
      (args: Seq[Expression]) => WinnowHashes(args.head,
        intArg("winnow_hashes", "n", args, 1),
        intArg("winnow_hashes", "w", args, 2))))
    ext.injectFunction((
      new FunctionIdentifier("cdc_chunk_hashes"),
      new ExpressionInfo(classOf[CdcChunkHashes].getName, "cdc_chunk_hashes"),
      (args: Seq[Expression]) => CdcChunkHashes(args.head,
        intArg("cdc_chunk_hashes", "divisor", args, 1))))
    ext.injectFunction((
      new FunctionIdentifier("q8_stats"),
      new ExpressionInfo(classOf[Q8Stats].getName, "q8_stats"),
      (args: Seq[Expression]) => Q8Stats(args.head)))
    // Spark's own semi-join runtime-filter machinery, exposed as callable
    // functions: bloom_agg(xxhash64(k), est_items, n_bits) builds the binary
    // sketch, bloom_contains(bf, xxhash64(k)) probes it. Both are Tungsten
    // expressions (the probe participates in codegen); the pair lets a query
    // state the build-small-probe-big shape explicitly where the optimizer's
    // injection heuristics would not fire.
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_contains"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))))
  }
}
