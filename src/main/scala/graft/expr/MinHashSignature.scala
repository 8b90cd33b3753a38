package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature: `minhash_sig(shingles, k)` → `array<long>`.
  *
  * The throughput path for near-dedup at scale (SURVEY.md §7.3 — the one
  * custom Catalyst piece the design calls for). The portable md5
  * formulation ([[graft.llm.Dedup.minhashSignatureMd5]]) computes k full
  * md5 digests per shingle (k×n hashes per doc, each allocating a 32-char
  * hex string); this expression computes TWO xxhash64 passes per shingle
  * and derives the k hash families as g_j = h1 + j·h2 (Kirsch–Mitzenmacher
  * double hashing — public result, standard Bloom/MinHash practice), i.e.
  * k multiply-adds per shingle, no allocation.
  *
  * Codegen emits a single static call, so the expression stays inside
  * whole-stage codegen (one virtual call per row, same shape as Spark's own
  * `XxHash64` expression).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.MinHashSignature.compute($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  // Two fixed, public seeds — determinism across runs/executors is part of
  // the contract (same doc ⇒ same signature on every node).
  private final val Seed1 = 0x9747b28c9747b28cL
  private final val Seed2 = 0x85ebca6bc2b2ae35L

  /** One pass over the shingle array; mins(j) = min over shingles of
    * h1 + j·h2 (unsigned-wrapping long arithmetic). Null elements are
    * skipped. Empty input yields Long.MaxValue sentinels (callers filter
    * empty shingle sets — see Dedup.bandBuckets). */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUTF8String(s, Seed1)
        val h2 = XXH64.hashUTF8String(s, Seed2)
        var g = h1
        var j = 0
        while (j < k) {
          if (g < mins(j)) mins(j) = g
          g += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
