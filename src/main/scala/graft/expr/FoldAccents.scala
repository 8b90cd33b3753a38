package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding: `fold_accents(s)` → s with diacritics removed —
  * canonical-decompose (Unicode NFD, UAX #15) then drop every combining
  * mark (category Mn). 'café' → 'cafe', 'naïve' → 'naive'. The standard
  * LLM-corpus text-normalization step (matches utf8proc-based
  * `strip_accents` in other engines for Latin-script input).
  *
  * Pure projection, embarrassingly parallel; the fast path skips the
  * normalizer entirely for ASCII-only strings (the overwhelmingly common
  * case in web corpora), costing one byte scan. */
case class FoldAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fold_accents requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "fold_accents"

  override def nullSafeEval(input: Any): Any =
    FoldAccents.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.FoldAccents.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): FoldAccents =
    copy(child = newChild)
}

object FoldAccents {
  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) return s // no combining marks possible — zero-copy
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(str.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
