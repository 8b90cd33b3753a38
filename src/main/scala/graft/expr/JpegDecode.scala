package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Compressed-image decode for the multimodal pipeline:
  * `jpeg_decode(content)` → `struct<w int, h int, rgb binary>` for BASELINE
  * sequential JPEG payloads (ITU-T T.81 / ISO 10918-1, SOF0: 8-bit,
  * Huffman-coded, 1- or 3-component, any sampling factors ≤ 4, restart
  * markers honored), NULL for anything else — same output contract as
  * [[BmpDecode]], so the image pipeline composes `coalesce(bmp, jpeg)` and
  * every downstream stage (feature head, resize, frame batch) is
  * format-agnostic.
  *
  * Pure-JVM implementation of the PUBLIC spec — markers, DQT/DHT/SOF0/
  * SOS/DRI parsing, canonical Huffman decode (mincode/maxcode/valptr,
  * T.81 §F.2.2.3), byte-stuffing removal, per-MCU block decode with DC
  * prediction, dequantize, separable double-precision IDCT (T.81 §A.3.3),
  * pixel-replication chroma upsample, and BT.601 YCbCr→RGB. Progressive
  * (SOF2), arithmetic coding, 12-bit precision, and hierarchical modes
  * return NULL (out of baseline scope, as declared). Pure projection:
  * embarrassingly parallel, codegen-resident via a static call. Malformed
  * payloads surface as NULL, never as a stub value.
  */
case class JpegDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_decode requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("rgb", BinaryType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_decode"

  override def nullSafeEval(input: Any): Any =
    JpegDecode.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.JpegDecode.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): JpegDecode =
    copy(child = newChild)
}

object JpegDecode {

  /** Zig-zag index order (T.81 Figure 5): zigzag(k) = natural position of
    * the k-th coefficient in scan order. */
  private[expr] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---------------------------------------------------------------------
  // Decode
  // ---------------------------------------------------------------------

  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // canonical code tables, T.81 §F.2.2.3 DECODE procedure
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def symbol(i: Int): Int = symbols(i)
  }

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  /** Entropy-coded-segment bit reader: MSB-first, 0xFF00 stuffing removed,
    * stops (and byte-aligns) at any real marker. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) fail()
        var byte = b(pos) & 0xff
        pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) fail()
          val next = b(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed FF
          else fail() // real marker inside entropy data: malformed here
          byte = 0xff
        }
        acc = byte
        nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Drop partial byte and consume an expected RSTn marker. */
    def restart(): Unit = {
      nbits = 0
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) fail()
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) fail()
      pos += 2
    }
    def decodeHuff(t: Huff): Int = {
      var code = readBit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.symbol(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | readBit()
        l += 1
      }
      fail()
    }
  }

  /** T.81 §F.2.2.1 EXTEND: map magnitude bits to a signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  /** 2-D separable IDCT with the T.81 §A.3.3 normalization; operates on a
    * dequantized natural-order block, emits clamped level-shifted bytes
    * into `out` at `(ox, oy)` within a `stride`-wide plane. */
  private def idctBlock(
      coef: Array[Double], out: Array[Byte], stride: Int, planeH: Int,
      ox: Int, oy: Int): Unit = {
    val tmp = new Array[Double](64)
    // rows
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) 0.70710678118654752 else 1.0
          s += cu * coef(y * 8 + u) * CosTab(x)(u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    // columns + level shift + clamp
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752 else 1.0
          s += cv * tmp(v * 8 + x) * CosTab(yy)(v)
          v += 1
        }
        val px = ox + x
        val py = oy + yy
        if (px < stride && py < planeH) {
          val value = math.round(s / 2.0 + 128.0).toInt
          out(py * stride + px) =
            (if (value < 0) 0 else if (value > 255) 255 else value).toByte
        }
        yy += 1
      }
      x += 1
    }
  }

  /** cos((2x+1)·u·π/16) lookup. */
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private def u16be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** Returns (w, h, rgb) or null if the payload is not a decodable
    * baseline JPEG. rgb is top-down row-major, 3 bytes/pixel. */
  def compute(bytes: Array[Byte]): InternalRow =
    try decodeImpl(bytes)
    catch { case _: Malformed | _: ArrayIndexOutOfBoundsException |
                 _: NegativeArraySizeException | _: OutOfMemoryError => null }

  private def decodeImpl(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null // SOI

    val quant = new Array[Array[Int]](4) // natural-order tables
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var restartInterval = 0
    var w = 0
    var h = 0
    var nComp = 0
    val compId = new Array[Int](3)
    val compH = new Array[Int](3)
    val compV = new Array[Int](3)
    val compQ = new Array[Int](3)
    var sofSeen = false

    var pos = 2
    var scanStart = -1
    val scanDc = new Array[Int](3)
    val scanAc = new Array[Int](3)
    while (scanStart < 0) {
      if (pos + 3 >= b.length) fail()
      if ((b(pos) & 0xff) != 0xff) fail()
      val marker = b(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd8 => // stray SOI
        case m if m >= 0xd0 && m <= 0xd7 => // RST outside scan: ignore
        case 0x01 => // TEM
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended-sequential-Huffman
          val len = u16be(b, pos)
          if (b(pos + 2) != 8) fail() // 8-bit precision only
          h = u16be(b, pos + 3)
          w = u16be(b, pos + 5)
          nComp = b(pos + 7) & 0xff
          if (w <= 0 || h <= 0 || w > (1 << 16) || h > (1 << 16)) fail()
          if (nComp != 1 && nComp != 3) fail()
          var c = 0
          while (c < nComp) {
            val o = pos + 8 + c * 3
            compId(c) = b(o) & 0xff
            compH(c) = (b(o + 1) & 0xf0) >> 4
            compV(c) = b(o + 1) & 0x0f
            compQ(c) = b(o + 2) & 0xff
            if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4 ||
              compQ(c) > 3) fail()
            c += 1
          }
          sofSeen = true
          pos += len
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return null // progressive / arithmetic / lossless / hierarchical
        case 0xc4 => // DHT
          val len = u16be(b, pos)
          var o = pos + 2
          while (o < pos + len) {
            val tc = (b(o) & 0xf0) >> 4
            val th = b(o) & 0x0f
            if (tc > 1 || th > 3) fail()
            val counts = new Array[Int](16)
            var total = 0
            var i = 0
            while (i < 16) {
              counts(i) = b(o + 1 + i) & 0xff; total += counts(i); i += 1
            }
            if (total > 256 || o + 17 + total > pos + len) fail()
            val syms = new Array[Int](total)
            i = 0
            while (i < total) { syms(i) = b(o + 17 + i) & 0xff; i += 1 }
            val t = new Huff(counts, syms)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            o += 17 + total
          }
          pos += len
        case 0xdb => // DQT
          val len = u16be(b, pos)
          var o = pos + 2
          while (o < pos + len) {
            val pq = (b(o) & 0xf0) >> 4
            val tq = b(o) & 0x0f
            if (tq > 3 || pq > 1) fail()
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              val v =
                if (pq == 0) b(o + 1 + i) & 0xff
                else u16be(b, o + 1 + 2 * i)
              t(Zigzag(i)) = v
              i += 1
            }
            quant(tq) = t
            o += 1 + (if (pq == 0) 64 else 128)
          }
          pos += len
        case 0xdd => // DRI
          restartInterval = u16be(b, pos + 2)
          pos += u16be(b, pos)
        case 0xda => // SOS
          if (!sofSeen) fail()
          val len = u16be(b, pos)
          val ns = b(pos + 2) & 0xff
          if (ns != nComp) fail() // single interleaved scan only (baseline)
          var i = 0
          while (i < ns) {
            val cid = b(pos + 3 + 2 * i) & 0xff
            val tt = b(pos + 4 + 2 * i) & 0xff
            var c = 0
            var found = -1
            while (c < nComp) { if (compId(c) == cid) found = c; c += 1 }
            if (found < 0) fail()
            scanDc(found) = (tt & 0xf0) >> 4
            scanAc(found) = tt & 0x0f
            i += 1
          }
          scanStart = pos + len
        case 0xd9 => return null // EOI before any scan
        case _ => // APPn, COM, anything else with a length field
          pos += u16be(b, pos)
      }
    }

    // geometry
    var hMax = 1
    var vMax = 1
    var c = 0
    while (c < nComp) {
      if (compH(c) > hMax) hMax = compH(c)
      if (compV(c) > vMax) vMax = compV(c)
      c += 1
    }
    if (w.toLong * h > (1L << 24)) fail() // bound allocation per payload
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeW = new Array[Int](nComp)
    val planeH = new Array[Int](nComp)
    val planes = new Array[Array[Byte]](nComp)
    c = 0
    while (c < nComp) {
      planeW(c) = mcusX * compH(c) * 8
      planeH(c) = mcusY * compV(c) * 8
      if (planeW(c).toLong * planeH(c) > (1L << 27)) fail()
      planes(c) = new Array[Byte](planeW(c) * planeH(c))
      if (quant(compQ(c)) == null) fail()
      c += 1
    }

    val reader = new BitReader(b, scanStart)
    val dcPred = new Array[Int](nComp)
    val coef = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        reader.restart()
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      c = 0
      while (c < nComp) {
        val qt = quant(compQ(c))
        val dcT = dcTabs(scanDc(c))
        val acT = acTabs(scanAc(c))
        if (dcT == null || acT == null) fail()
        var by = 0
        while (by < compV(c)) {
          var bx = 0
          while (bx < compH(c)) {
            java.util.Arrays.fill(coef, 0.0)
            // DC
            val t = reader.decodeHuff(dcT)
            if (t > 11) fail()
            dcPred(c) += extend(reader.receive(t), t)
            coef(0) = dcPred(c).toDouble * qt(0)
            // AC
            var k = 1
            while (k < 64) {
              val rs = reader.decodeHuff(acT)
              val r = rs >> 4
              val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                if (k > 63) fail()
                // qt is natural-order; k is a zigzag scan position
                coef(Zigzag(k)) = extend(reader.receive(s), s).toDouble * qt(Zigzag(k))
                k += 1
              }
            }
            idctBlock(coef, planes(c), planeW(c), planeH(c),
              (mx * compH(c) + bx) * 8, (my * compV(c) + by) * 8)
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }

    // upsample (pixel replication) + color convert
    val out = new Array[Byte](w * h * 3)
    if (nComp == 1) {
      val p = planes(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = p(y * planeW(0) + x)
          val d = (y * w + x) * 3
          out(d) = v; out(d + 1) = v; out(d + 2) = v
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = planes(0)(
            (y * compV(0) / vMax) * planeW(0) + (x * compH(0) / hMax)) & 0xff
          val cb = (planes(1)(
            (y * compV(1) / vMax) * planeW(1) + (x * compH(1) / hMax)) & 0xff) - 128
          val cr = (planes(2)(
            (y * compV(2) / vMax) * planeW(2) + (x * compH(2) / hMax)) & 0xff) - 128
          val d = (y * w + x) * 3
          out(d) = clamp8(yv + ((91881 * cr) >> 16))
          out(d + 1) = clamp8(yv - ((22554 * cb + 46802 * cr) >> 16))
          out(d + 2) = clamp8(yv + ((116130 * cb) >> 16))
          x += 1
        }
        y += 1
      }
    }
    new GenericInternalRow(Array[Any](w, h, out))
  }

  private def clamp8(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  // ---------------------------------------------------------------------
  // Encode (fixture mirror — baseline sequential, 4:4:4 or grayscale)
  // ---------------------------------------------------------------------

  // Standard Huffman tables (T.81 Annex K.3) — counts[16] then symbols.
  private val DcLumCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumSyms = (0 to 11).toArray
  private val DcChrCounts = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrSyms = (0 to 11).toArray
  private val AcLumCounts =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumSyms = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChrCounts =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrSyms = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** (code, length) per symbol from canonical counts+symbols. */
  private def encTable(counts: Array[Int], syms: Array[Int]): Array[Int] = {
    // packed as length<<16 | code, indexed by symbol
    val out = new Array[Int](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < counts(l - 1)) {
        out(syms(k)) = (l << 16) | code
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out
  }

  private final class BitWriter(sb: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          sb.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) sb.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = {
      while (nbits != 0) put(1, 1) // pad with 1s (T.81 §F.1.2.3)
    }
  }

  private def fdctBlock(px: Array[Double], out: Array[Int], qt: Array[Int]): Unit = {
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += px(y * 8 + x) * CosTab(x)(v) * CosTab(y)(u)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) 0.70710678118654752 else 1.0
        val cv = if (v == 0) 0.70710678118654752 else 1.0
        val coefIdx = u * 8 + v
        out(coefIdx) =
          math.round(s * cu * cv / 4.0 / qt(coefIdx)).toInt
        v += 1
      }
      u += 1
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Build a BASELINE 4:4:4 JPEG (or grayscale when `gray`) from top-down
    * RGB24 bytes — the encode mirror of [[compute]], used to synthesize
    * real compressed fixtures. `quantVal` fills both quant tables flat
    * (1 = near-lossless; larger = real quantization loss). */
  def encode(w: Int, h: Int, rgb: Array[Byte], quantVal: Int = 1,
      gray: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3, "need w*h*3 RGB bytes")
    require(quantVal >= 1 && quantVal <= 255, s"quantVal out of range: $quantVal")
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    val qt = Array.fill(64)(quantVal)
    val nComp = if (gray) 1 else 3

    m(0xd8) // SOI
    // DQT (one flat table, id 0)
    m(0xdb); u16(2 + 1 + 64); out.write(0x00)
    var i = 0
    while (i < 64) { out.write(qt(Zigzag(i))); i += 1 }
    // SOF0
    m(0xc0); u16(8 + 3 * nComp); out.write(8); u16(h); u16(w); out.write(nComp)
    var c = 0
    while (c < nComp) {
      out.write(c + 1); out.write(0x11); out.write(0x00) // 1x1 sampling, qt 0
      c += 1
    }
    // DHT — luma DC/AC as tables 0, chroma DC/AC as tables 1
    def dht(tcTh: Int, counts: Array[Int], syms: Array[Int]): Unit = {
      m(0xc4); u16(2 + 1 + 16 + syms.length); out.write(tcTh)
      counts.foreach(out.write)
      syms.foreach(out.write)
    }
    dht(0x00, DcLumCounts, DcLumSyms)
    dht(0x10, AcLumCounts, AcLumSyms)
    if (!gray) {
      dht(0x01, DcChrCounts, DcChrSyms)
      dht(0x11, AcChrCounts, AcChrSyms)
    }
    // SOS
    m(0xda); u16(6 + 2 * nComp); out.write(nComp)
    c = 0
    while (c < nComp) {
      out.write(c + 1); out.write(if (c == 0) 0x00 else 0x11)
      c += 1
    }
    out.write(0); out.write(63); out.write(0)

    // planes: level-shifted YCbCr (BT.601, same fixed-point factors the
    // decoder inverts)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val dcEnc = Array(encTable(DcLumCounts, DcLumSyms),
      encTable(DcChrCounts, DcChrSyms))
    val acEnc = Array(encTable(AcLumCounts, AcLumSyms),
      encTable(AcChrCounts, AcChrSyms))
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](3)
    val px = new Array[Double](64)
    val coefs = new Array[Int](64)
    def sample(comp: Int, x0: Int, y0: Int): Unit = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val sx = math.min(x0 + x, w - 1)
          val sy = math.min(y0 + y, h - 1)
          val o = (sy * w + sx) * 3
          val r = rgb(o) & 0xff
          val g = rgb(o + 1) & 0xff
          val b = rgb(o + 2) & 0xff
          val value = comp match {
            case 0 => (19595 * r + 38470 * g + 7471 * b) >> 16
            case 1 => 128 + ((-11059 * r - 21709 * g + 32768 * b) >> 16)
            case _ => 128 + ((32768 * r - 27439 * g - 5329 * b) >> 16)
          }
          px(y * 8 + x) = value - 128.0
          x += 1
        }
        y += 1
      }
    }
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        c = 0
        while (c < nComp) {
          val tsel = if (c == 0) 0 else 1
          sample(c, mx * 8, my * 8)
          fdctBlock(px, coefs, qt)
          // DC
          val diff = coefs(0) - dcPred(c)
          dcPred(c) = coefs(0)
          val s = category(diff)
          val dc = dcEnc(tsel)(s)
          bw.put(dc & 0xffff, dc >>> 16)
          if (s > 0)
            bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
          // AC
          var run = 0
          var k = 1
          while (k < 64) {
            val v = coefs(Zigzag(k))
            if (v == 0) run += 1
            else {
              while (run > 15) {
                val zrl = acEnc(tsel)(0xf0)
                bw.put(zrl & 0xffff, zrl >>> 16)
                run -= 16
              }
              val sz = category(v)
              val code = acEnc(tsel)((run << 4) | sz)
              bw.put(code & 0xffff, code >>> 16)
              bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
              run = 0
            }
            k += 1
          }
          if (run > 0) {
            val eob = acEnc(tsel)(0x00)
            bw.put(eob & 0xffff, eob >>> 16)
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    m(0xd9) // EOI
    out.toByteArray
  }
}
