package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints: `winnow_fps(text, k, w)` → `array<long>`
  * — the O(n) rolling-hash form of the MOSS scheme
  * (Schleimer–Wilkerson–Aiken, SIGMOD '03).
  *
  *   1. Karp–Rabin ROLLING polynomial hash over the UTF-8 bytes: each
  *      k-gram hash is derived from the previous in O(1) (multiply, add,
  *      subtract the outgoing byte's term) — vs the portable md5 form
  *      ([[graft.text.TextOps.winnowFingerprints]]) which digests every
  *      k-gram from scratch.
  *   2. Sliding-window minimum via a monotonic deque — O(1) amortized per
  *      position, O(n) per document total.
  *   3. Distinct via an open-addressing long set (robust-turbo mixing of
  *      the raw hash), emitted in first-seen order.
  *
  * Same guarantee as the portable form (any shared substring of length
  * ≥ k+w−1 shares a fingerprint), different hash family — so the two
  * paths are structurally equivalent but not value-comparable, exactly
  * like [[MinHashSignature]] vs the md5 MinHash. One static call inside
  * whole-stage codegen; no per-row allocation beyond the output.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2, s"k-gram length must be >= 2, got $k")
  require(w >= 1, s"window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.WinnowFingerprints.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private final val Base = 257L

  /** 64-bit finalizer (splitmix64) so raw polynomial hashes — whose low
    * bits are dominated by the last bytes — spread before min-selection. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - k + 1

    // rolling polynomial hash, wrap-around 64-bit arithmetic
    var basePowK1 = 1L // Base^(k-1)
    var i = 1
    while (i < k) { basePowK1 *= Base; i += 1 }
    val hashes = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    hashes(0) = mix(h)
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xffL) * basePowK1) * Base + (bytes(i + k - 1) & 0xffL)
      hashes(i) = mix(h)
      i += 1
    }

    // sliding-window min with a monotonic deque of indices; tie-keep the
    // RIGHTMOST minimum (standard winnowing density rule) by evicting <=
    val nWin = nGrams - w + 1
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    val mins = new Array[Long](nWin)
    i = 0
    while (i < nGrams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = hashes(deque(head))
      i += 1
    }

    // distinct, first-seen order: open-addressing set sized 2x
    var cap = Integer.highestOneBit(math.max(4, nWin * 2) - 1) << 1
    if (cap < 4) cap = 4
    val slots = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Any](nWin)
    var outN = 0
    i = 0
    while (i < nWin) {
      val v = mins(i)
      var idx = (mix(v) & (cap - 1)).toInt
      var seen = false
      var probing = true
      while (probing) {
        if (!used(idx)) probing = false
        else if (slots(idx) == v) { seen = true; probing = false }
        else idx = (idx + 1) & (cap - 1)
      }
      if (!seen) { used(idx) = true; slots(idx) = v; out(outN) = v; outN += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], outN).asInstanceOf[Array[Any]])
  }
}
