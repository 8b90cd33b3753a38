package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Real image decode for the multimodal pipeline: `bmp_decode(content)` →
  * `struct<w int, h int, rgb binary>` for uncompressed 24-bit BMP payloads
  * (Windows BITMAPINFOHEADER, BI_RGB — the public file format), NULL for
  * anything else.
  *
  * This replaces the image branch of `Multimodal.decodeStub` with an
  * actual pixel decoder: pure JVM, no codecs, handles bottom-up (positive
  * height) and top-down (negative height) layouts and 4-byte row padding,
  * and emits row-major top-down RGB24 — the canonical batch shape a
  * downstream feature extractor consumes. Pure projection: embarrassingly
  * parallel, one pass over the payload bytes, codegen-resident via a
  * static call.
  */
case class BmpDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bmp_decode requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("rgb", BinaryType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_decode"

  override def nullSafeEval(input: Any): Any =
    BmpDecode.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.BmpDecode.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpDecode =
    copy(child = newChild)
}

object BmpDecode {
  import LittleEndian.{i32, u16}

  /** Returns (w, h, rgb) or null if the payload is not a decodable
    * 24-bit BI_RGB BMP. rgb is top-down row-major, 3 bytes/pixel. */
  def compute(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 54) return null
    if (bytes(0) != 'B' || bytes(1) != 'M') return null
    val pixOff = i32(bytes, 10)
    val dibSize = i32(bytes, 14)
    if (dibSize < 40) return null
    val w = i32(bytes, 18)
    val hRaw = i32(bytes, 22)
    val planes = u16(bytes, 26)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    if (w <= 0 || w > (1 << 20) || hRaw == 0 || planes != 1 ||
      bpp != 24 || compression != 0) return null
    // abs in Long: math.abs(Int.MinValue) stays negative and would slip
    // past every guard into a negative array allocation
    val hL = math.abs(hRaw.toLong)
    if (hL > (1 << 20)) return null
    val h = hL.toInt
    val topDown = hRaw < 0
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (pixOff < 54 || pixOff.toLong + rowSize.toLong * h > bytes.length)
      return null

    val out = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      var src = pixOff + srcRow * rowSize
      var dst = row * w * 3
      var x = 0
      while (x < w) {
        // BMP stores BGR — emit RGB
        out(dst) = bytes(src + 2)
        out(dst + 1) = bytes(src + 1)
        out(dst + 2) = bytes(src)
        src += 3
        dst += 3
        x += 1
      }
      row += 1
    }
    new GenericInternalRow(Array[Any](w, h, out))
  }

  /** Build an uncompressed bottom-up 24-bit BMP from top-down RGB24 bytes —
    * the encode mirror of [[compute]], used to synthesize real fixtures. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3, "need w*h*3 RGB bytes")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowSize * h
    val b = new Array[Byte](size)
    def putU16(o: Int, v: Int): Unit = LittleEndian.putU16(b, o, v)
    def putI32(o: Int, v: Int): Unit = LittleEndian.putI32(b, o, v)
    b(0) = 'B'; b(1) = 'M'
    putI32(2, size); putI32(10, 54)
    putI32(14, 40); putI32(18, w); putI32(22, h)
    putU16(26, 1); putU16(28, 24); putI32(30, 0); putI32(34, rowSize * h)
    var row = 0
    while (row < h) {
      val dst = 54 + (h - 1 - row) * rowSize // bottom-up
      var x = 0
      while (x < w) {
        val src = (row * w + x) * 3
        b(dst + x * 3) = rgb(src + 2)     // B
        b(dst + x * 3 + 1) = rgb(src + 1) // G
        b(dst + x * 3 + 2) = rgb(src)     // R
        x += 1
      }
      row += 1
    }
    b
  }
}

/** Per-channel means of an RGB24 byte buffer: `rgb_means(rgb)` →
  * `array<double>` of [mean_r, mean_g, mean_b, mean_luma] (ITU-R BT.601
  * integer-weighted luma) — the feature head over decoded pixels. */
case class RgbMeans(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rgb_means requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rgb_means"

  override def nullSafeEval(input: Any): Any =
    RgbMeans.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.RgbMeans.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RgbMeans =
    copy(child = newChild)
}

object RgbMeans {
  def compute(rgb: Array[Byte]): ArrayData = {
    val n = rgb.length / 3
    if (n == 0) return new GenericArrayData(Array[Any](0.0, 0.0, 0.0, 0.0))
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i + 2 < rgb.length) {
      r += rgb(i) & 0xff
      g += rgb(i + 1) & 0xff
      b += rgb(i + 2) & 0xff
      i += 3
    }
    // BT.601 integer weights (×1000): deterministic double division at end
    val luma = (299L * r + 587L * g + 114L * b).toDouble / (1000.0 * n)
    new GenericArrayData(Array[Any](
      r.toDouble / n, g.toDouble / n, b.toDouble / n, luma))
  }
}

/** Real nearest-neighbor resize of an RGB24 buffer:
  * `rgb_resize(rgb, w, h, dstW, dstH)` → binary of exactly dstW·dstH·3
  * bytes, NULL if the buffer doesn't hold w·h·3 bytes. Source dimensions
  * are COLUMNS (they come per-row from [[BmpDecode]]); the target shape is
  * a plan literal, so every output row has the same tensor shape — the
  * batch contract a training pipeline needs. Center-point sampling in pure
  * integer arithmetic (`sx = (2x+1)·w / 2·dstW`): deterministic on any
  * JVM, no floating point. Pure projection, codegen-resident. */
case class RgbResize(
    first: Expression,  // rgb binary
    second: Expression, // src w
    third: Expression,  // src h
    dstW: Int,
    dstH: Int)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(dstW > 0 && dstH > 0 && dstW.toLong * dstH <= (1L << 24),
    s"target dims out of range: ${dstW}x$dstH")

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rgb_resize requires (binary, int, int), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "rgb_resize"

  override def nullSafeEval(rgb: Any, w: Any, h: Any): Any =
    RgbResize.compute(rgb.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int], dstW, dstH)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (rgb, w, h) => s"""
      ${ev.value} = graft.expr.RgbResize.compute($rgb, $w, $h, $dstW, $dstH);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RgbResize =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RgbResize {
  /** Nearest-neighbor with integer center sampling; null on shape
    * mismatch (corrupt input stays visible, never silently reshaped). */
  def compute(rgb: Array[Byte], w: Int, h: Int, dw: Int, dh: Int): Array[Byte] = {
    if (rgb == null || w <= 0 || h <= 0) return null
    if (rgb.length != w.toLong * h * 3) return null
    val out = new Array[Byte](dw * dh * 3)
    var y = 0
    while (y < dh) {
      // center of target pixel mapped to source grid, floored
      val sy = (((2L * y + 1) * h) / (2L * dh)).toInt
      var x = 0
      while (x < dw) {
        val sx = (((2L * x + 1) * w) / (2L * dw)).toInt
        val src = (sy * w + sx) * 3
        val dst = (y * dw + x) * 3
        out(dst) = rgb(src)
        out(dst + 1) = rgb(src + 1)
        out(dst + 2) = rgb(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}
