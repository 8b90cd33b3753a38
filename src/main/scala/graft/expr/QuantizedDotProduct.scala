package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Integer-quantized dot product of two float vectors:
  * `quantized_dot(a, b)` → `long`, Σ_i floor(aᵢ·bᵢ·10¹²).
  *
  * Bit-identical to [[graft.llm.Similarity.quantizedDot]] (the higher-order
  * function formulation): float×float is exact in double, floor(p·10¹²) is
  * one deterministic IEEE rounding, and long addition is order-free. This
  * native form exists because the HOF version allocates an intermediate
  * array per row (`zip_with` output) in the innermost loop of brute-force
  * re-ranking — here it's a single fused loop over the two float arrays,
  * one static call inside whole-stage codegen.
  *
  * Mismatched lengths yield NULL (the HOF's zip_with-padding would also
  * null the fold).
  */
case class QuantizedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quantized_dot requires (array<float>, array<float>), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    QuantizedDotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.expr.QuantizedDotProduct.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDotProduct =
    copy(left = newLeft, right = newRight)
}

object QuantizedDotProduct {
  private final val Scale = 1e12

  /** Returns null for length mismatch or null elements (matches the HOF
    * three-valued-logic result). Boxed Long so codegen can branch. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale
      acc += math.floor(p).toLong
      i += 1
    }
    acc
  }
}
