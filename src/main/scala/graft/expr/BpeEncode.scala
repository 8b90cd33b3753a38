package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encode: `bpe_encode(pretokens)` → the byte-pair-merged
  * subword units of every pre-token, flattened in order — the merge-table
  * half that [[graft.text.TextOps.bpeTokens]] (the GPT-2-style
  * pre-tokenizer) deliberately leaves out. Together they form the standard
  * LLM token-counting pipeline: pre-tokenize → merge against a pinned
  * vocabulary (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — the public BPE algorithm; GPT-2's encoder
  * applies the same rank-priority merge loop).
  *
  * Encoding algorithm (per pre-token): split to characters, then
  * repeatedly find the LOWEST-RANK adjacent pair present in the merge
  * table and fuse all its (left-to-right, non-overlapping) occurrences,
  * until no listed pair remains. The merge table is a plan-embedded model
  * artifact (it rides the serialized expression to every executor — the
  * broadcast-small-model pattern); the rank map is built once per executor
  * via a transient lazy val and injected into generated code as a
  * reference object, so the hot loop is codegen-resident with zero regex
  * and zero per-row setup.
  *
  * Scale: pure projection — embarrassingly parallel, no shuffle; cost is
  * O(len · merges-applied) per token on tiny strings.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  /** pair key `<a.length>:<a><b>` → rank; built once per deserialized
    * expression. The length prefix makes the key unambiguous for ANY unit
    * content — a separator character could itself appear inside a unit
    * (the pre-tokenizer's fallback class matches control chars too) and
    * would then collide distinct pairs onto one key. */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(BpeEncode.pairKey(a, b), Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.BpeEncode.compute($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** Unambiguous pair key for any unit content: length-prefixed left unit. */
  def pairKey(a: String, b: String): String =
    new java.lang.StringBuilder(a.length + b.length + 8)
      .append(a.length).append(':').append(a).append(b).toString

  def compute(toks: ArrayData, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val n = toks.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) encodeInto(toks.getUTF8String(i).toString, ranks, out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeInto(
      w: String,
      ranks: java.util.HashMap[String, Integer],
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    if (w.length <= 1) {
      if (w.nonEmpty) out += UTF8String.fromString(w)
      return
    }
    // split by CODE POINT, not UTF-16 code unit: a supplementary-plane char
    // (emoji, CJK ext-B) must stay one unit — splitting its surrogate pair
    // would corrupt the UTF-8 round-trip and diverge from the per-codepoint
    // oracle regex '(.)'
    val nCp = w.codePointCount(0, w.length)
    var units = new Array[String](nCp)
    var i = 0
    var ci = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      val cc = Character.charCount(cp)
      units(i) = w.substring(ci, ci + cc)
      ci += cc
      i += 1
    }

    var done = false
    while (!done && units.length > 1) {
      // lowest-rank adjacent pair present in the table
      var bestRank = Int.MaxValue
      i = 0
      while (i < units.length - 1) {
        val r = ranks.get(pairKey(units(i), units(i + 1)))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // fuse all left-to-right non-overlapping occurrences of that pair
        val next = new scala.collection.mutable.ArrayBuffer[String](units.length)
        i = 0
        while (i < units.length) {
          if (i < units.length - 1 && {
            val r = ranks.get(pairKey(units(i), units(i + 1)))
            r != null && r.intValue() == bestRank
          }) {
            next += units(i) + units(i + 1)
            i += 2
          } else {
            next += units(i)
            i += 1
          }
        }
        units = next.toArray
      }
    }
    i = 0
    while (i < units.length) { out += UTF8String.fromString(units(i)); i += 1 }
  }
}
