package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native array expressions for the similarity operators.
  *
  * The declarative formulation of these (zip_with/aggregate with
  * DECIMAL(38,12) accumulators) is CodegenFallback — every element step is
  * an interpreted lambda call allocating boxed decimals, which is the single
  * biggest CPU wart at scale. These expressions keep the EXACT same
  * semantics (each double product rounded to a scale-12 decimal via the
  * shortest-decimal representation, exact decimal accumulation — i.e.
  * order-independent and bit-identical to the DuckDB oracle's
  * `sum(CAST(x*y AS DECIMAL(38,12)))::DOUBLE`) in one tight loop inside
  * whole-stage codegen.
  */
object ArrayOps {

  /** Exact decimal dot product of two float arrays (null on null input /
    * element, or length mismatch — mirroring the zip_with formulation). */
  def dotF32(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      sum = sum.add(java.math.BigDecimal.valueOf(p)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    sum.doubleValue()
  }

  /** Sign-LSH bucket of a float array under the deterministic LCG plane
    * weights w(j,d) = ((1103515245*(j*64+d) + 12345) div 65536) % 19 - 9,
    * projections accumulated in scale-12 decimals (sign decisions identical
    * to the oracle's decimal sums). */
  def lshBucket(arr: ArrayData, nPlanes: Int): java.lang.Long = {
    val n = arr.numElements()
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var sum = java.math.BigDecimal.ZERO
      var d = 0
      while (d < n) {
        if (arr.isNullAt(d)) return null
        val w = ((1103515245L * (j * 64 + d) + 12345L) / 65536L) % 19L - 9L
        val p = w * arr.getFloat(d).toDouble
        sum = sum.add(java.math.BigDecimal.valueOf(p)
          .setScale(12, java.math.RoundingMode.HALF_UP))
        d += 1
      }
      if (sum.signum() >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }
}

/** `dot_f32(a, b)`: exact-decimal dot product of two array&lt;float&gt;. */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f32"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("dot_f32 requires two array<float> arguments")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.dotF32(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.ArrayOps.dotF32($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

/** `lsh_bucket(embedding)`: 8-plane sign-LSH bucket id of an array&lt;float&gt;. */
case class LshBucket(child: Expression, nPlanes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("lsh_bucket requires array<float>")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.lshBucket(input.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.ArrayOps.lshBucket($c, $nPlanes);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}
