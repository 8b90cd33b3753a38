package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** vHash perceptual VIDEO fingerprint — the video leg of the 64-bit
  * sketch trio (text [[SimHash64]], image [[DHash64]], audio
  * [[AudioHash64]]), round-12 VERDICT next #2:
  * `vhash64(y, w, h, n_frames)` over a [[Y4mDecode]] output (all luma
  * planes concatenated) → one 64-bit signature.
  *
  * Per sampled frame (every `stride`-th frame, first frame always
  * included): nearest-neighbor resample the luma plane to the canonical
  * 9×8 gray grid (same integer center sampling as [[RgbResize]]), then
  * the dHash gradient bits — bit `y·8+x` set iff
  * `gray(x,y) < gray(x+1,y)` (luma is already gray; no channel fold
  * needed). The per-frame 64-bit hashes then fold by PER-BIT MAJORITY
  * vote (ties set the bit — deterministic), the SimHash-style fold:
  * a retouch confined to a few frames moves only bits where the
  * majority was marginal, while re-encoded copies preserve nearly every
  * gradient relation — so near-dup videos land within a few bits and
  * unrelated ones differ in ~32 of 64, exactly the contract the shared
  * banded-hamming LSH join ([[graft.llm.Dedup.hamming64Dups]]) needs.
  *
  * The gradient encoding inherits dHash's perceptual property per
  * frame (uniform brightness/contrast shifts move both sides of every
  * comparison together), and the majority fold adds temporal
  * robustness (dropping or duplicating a minority of frames cannot
  * flip a decided bit). NULL when the buffer is not exactly
  * `n_frames·w·h` bytes or any dimension is non-positive (corrupt
  * input stays visible). Codegen-resident, no UDF; per-row work is
  * O(sampled frames · 72) after the O(plane) reads. */
case class VHash64(
    first: Expression,  // y: all luma planes, concatenated
    second: Expression, // frame width
    third: Expression,  // frame height
    fourth: Expression, // frame count
    stride: Int = 1)
  extends QuaternaryExpression {
  require(stride > 0, s"frame stride must be > 0, got $stride")

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vhash64 requires (binary, int, int, int), got $other")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vhash64"

  override def nullSafeEval(y: Any, w: Any, h: Any, n: Any): Any =
    VHash64.compute(y.asInstanceOf[Array[Byte]], w.asInstanceOf[Int],
      h.asInstanceOf[Int], n.asInstanceOf[Int], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (y, w, h, n) => s"""
      Object r = graft.expr.VHash64.compute($y, $w, $h, $n, $stride);
      ${ev.isNull} = r == null;
      ${ev.value} = ${ev.isNull} ? -1L : ((Long) r).longValue();
    """)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): VHash64 =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object VHash64 {
  val W = 9 // sampled gray grid — shared with DHash64's canonical shape
  val H = 8

  /** Null (boxed) on shape mismatch; otherwise the majority-folded
    * 64-bit video gradient hash. */
  def compute(
      y: Array[Byte], w: Int, h: Int, nFrames: Int,
      stride: Int): java.lang.Long = {
    if (y == null || w <= 0 || h <= 0 || nFrames <= 0 || stride <= 0)
      return null
    val plane = w.toLong * h
    if (plane * nFrames != y.length || plane > Int.MaxValue) return null
    val votes = new Array[Int](64)
    var sampled = 0
    var f = 0
    while (f < nFrames) {
      val base = f * plane.toInt
      // nearest-neighbor 9×8 gray grid (integer center sampling — the
      // RgbResize rule on a single channel)
      val gray = new Array[Int](W * H)
      var gy = 0
      while (gy < H) {
        val sy = (((2L * gy + 1) * h) / (2L * H)).toInt
        var gx = 0
        while (gx < W) {
          val sx = (((2L * gx + 1) * w) / (2L * W)).toInt
          gray(gy * W + gx) = y(base + sy * w + sx) & 0xff
          gx += 1
        }
        gy += 1
      }
      var row = 0
      while (row < H) {
        var x = 0
        while (x < W - 1) {
          if (gray(row * W + x) < gray(row * W + x + 1))
            votes(row * (W - 1) + x) += 1
          x += 1
        }
        row += 1
      }
      sampled += 1
      f += stride
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      // majority with ties SET: deterministic, and symmetric enough
      // that a one-frame flip moves only marginal bits
      if (votes(b) * 2 >= sampled) bits |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(bits)
  }
}
