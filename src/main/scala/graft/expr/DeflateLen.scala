package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Compression-ratio quality signal: `deflate_len(bytes)` → the DEFLATE
  * (zlib, fixed level 6, default strategy) compressed size of a binary
  * payload. `deflate_len(x) / octet_length(x)` is the classic
  * long-range-redundancy screen of web-corpus curation — boilerplate,
  * template spam, and generated filler compress far below prose, and the
  * signal catches redundancy at distances the fixed-width duplicate-gram
  * ratio (`TextOps.duplicateGramStats`) cannot see.
  *
  * Determinism: fixed level + strategy on the JVM's bundled zlib — the
  * same payload always yields the same length in-process (the signal is
  * engine-local by nature, so its queries are rows-only, pinned by
  * specs). One pass, one Deflater per call (allocated/closed — no shared
  * state), pure projection: embarrassingly parallel at any scale.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.DeflateLen.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  def compute(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) {
        total += d.deflate(buf)
      }
      total
    } finally d.end()
  }
}
