package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over a token array: `simhash64(tokens)` → `long`.
  *
  * Charikar's random-hyperplane sketch specialized to token features
  * (public algorithm): each token hashes to 64 bits; bit b of the sketch is
  * set iff Σ_tokens (±1 for bit b of the token hash) > 0. Near-duplicate
  * documents differ in few sketch bits, so hamming distance on two longs
  * replaces set comparison — the cheap second opinion next to MinHash
  * (north-star dedup family). Per-row projection, no shuffle; codegen is a
  * single static call inside whole-stage codegen.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private final val Seed = 0xc3a5c85c97cb3127L

  def compute(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two sketches — similarity = 64 - distance. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
