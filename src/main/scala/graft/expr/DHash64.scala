package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** dHash perceptual image fingerprint: `dhash64(rgb)` over a 9×8 RGB24
  * buffer (216 bytes — the caller resizes with [[RgbResize]] first) →
  * a 64-bit signature where bit `y·8+x` is set iff
  * `gray(x,y) < gray(x+1,y)` (BT.601 integer-weighted gray,
  * `299r+587g+114b`, never divided — pure integer compare).
  *
  * The gradient encoding is what makes it PERCEPTUAL: uniform brightness
  * or contrast shifts move both sides of each comparison together, so
  * re-encoded / slightly-retouched copies land within a few bits while
  * unrelated images differ in ~32 — the image-modality analogue of
  * [[SimHash64]] over text, and it feeds the same banded-hamming
  * near-dup join. NULL on any buffer that is not exactly 9·8·3 bytes
  * (corrupt input stays visible). Codegen-resident, no UDF. */
case class DHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dhash64 requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash64"

  override def nullSafeEval(input: Any): Any =
    DHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = graft.expr.DHash64.compute($c);
      ${ev.isNull} = r == null;
      ${ev.value} = ${ev.isNull} ? -1L : ((Long) r).longValue();
    """)

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

object DHash64 {
  val W = 9
  val H = 8

  /** Null (boxed) on shape mismatch; otherwise the 64-bit gradient hash. */
  def compute(rgb: Array[Byte]): java.lang.Long = {
    if (rgb == null || rgb.length != W * H * 3) return null
    // integer gray per cell, scaled ×1000 — exact, divisionless
    val gray = new Array[Long](W * H)
    var i = 0
    while (i < W * H) {
      gray(i) = 299L * (rgb(i * 3) & 0xff) +
        587L * (rgb(i * 3 + 1) & 0xff) +
        114L * (rgb(i * 3 + 2) & 0xff)
      i += 1
    }
    var bits = 0L
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W - 1) {
        if (gray(y * W + x) < gray(y * W + x + 1))
          bits |= 1L << (y * (W - 1) + x)
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(bits)
  }
}
