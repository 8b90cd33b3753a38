package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native w-shingling: `word_shingles(tokens, w)` → `array<string>` of
  * space-joined runs of w consecutive tokens — output identical to
  * [[graft.text.TextOps.ngrams]] (the higher-order-function form).
  *
  * Exists for the same reason as [[MinHashSignature]]: Spark evaluates HOF
  * lambdas interpreted, outside whole-stage codegen — the `transform`-based
  * n-gram benched ~2ms/doc at sf0.1, making shingling the dominant cost of
  * the whole dedup pipeline. This fused loop over the token array (one
  * `UTF8String.concatWs` per shingle) is pure codegen-resident projection.
  * Null token elements are treated as empty strings (concatWs semantics).
  */
case class WordShingles(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1, s"shingle width must be >= 1, got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.WordShingles.compute($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")
  private val Empty = UTF8String.fromString("")

  def compute(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    val window = new Array[UTF8String](w)
    var i = 0
    while (i <= n - w) {
      var j = 0
      while (j < w) {
        window(j) = if (toks.isNullAt(i + j)) Empty else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
