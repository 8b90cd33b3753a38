package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Real video decode for the multimodal pipeline: `y4m_decode(content)` →
  * `struct<w int, h int, n_frames int, y binary>` for YUV4MPEG2 payloads
  * (the public uncompressed interchange format: a plain-text header,
  * then `FRAME\n` + raw planes per frame), NULL for anything else.
  *
  * The video sibling of [[BmpDecode]]/[[WavDecode]]: pure JVM, no codecs.
  * Supports `Cmono` (luma only) and the default/`C420*` 4:2:0 layouts; `y`
  * is every frame's LUMA plane concatenated (n_frames · w · h bytes,
  * chroma skipped) — the canonical batch a frame-level feature extractor
  * ([[ByteStats]], per-frame slicing via substring) consumes. Pure
  * projection: one header parse + one copy, codegen-resident via a
  * static call.
  */
case class Y4mDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"y4m_decode requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("y", BinaryType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "y4m_decode"

  override def nullSafeEval(input: Any): Any =
    Y4mDecode.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.Y4mDecode.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Y4mDecode =
    copy(child = newChild)
}

object Y4mDecode {

  private val Magic = "YUV4MPEG2".getBytes("US-ASCII")

  /** Returns (w, h, nFrames, concatenated luma planes) or null if the
    * payload is not a decodable mono/4:2:0 YUV4MPEG2 stream. */
  def compute(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < Magic.length + 1) return null
    var i = 0
    while (i < Magic.length) {
      if (bytes(i) != Magic(i)) return null
      i += 1
    }
    // header line runs to the first \n
    var eol = i
    while (eol < bytes.length && bytes(eol) != '\n') eol += 1
    if (eol >= bytes.length) return null
    val header = new String(bytes, i, eol - i, "US-ASCII")
    var w = 0; var h = 0; var mono = false
    val toks = header.split(' ')
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) tok.charAt(0) match {
        case 'W' | 'H' =>
          val v = try { tok.substring(1).toInt }
            catch { case _: NumberFormatException => -1 }
          if (v < 0) return null
          if (tok.charAt(0) == 'W') w = v else h = v
        case 'C' =>
          if (tok == "Cmono") mono = true
          else if (!tok.startsWith("C420")) return null // 4:2:2 etc. unsupported
        case _ => () // F (rate), I (interlace), A (aspect), X (comment) — ignored
      }
      t += 1
    }
    if (w <= 0 || h <= 0 || w > (1 << 16) || h > (1 << 16)) return null
    if (!mono && (w % 2 != 0 || h % 2 != 0)) return null
    // plane arithmetic in Long: header-claimed 65536×65536 overflows Int
    // (w*h wraps negative) — a malformed header must reject (NULL), never
    // index negatively or allocate a negative array (cf. BmpDecode)
    val lumaSizeL = w.toLong * h
    val frameSizeL = if (mono) lumaSizeL else lumaSizeL + (w / 2).toLong * (h / 2) * 2
    if (frameSizeL > bytes.length) return null
    val lumaSize = lumaSizeL.toInt
    val frameSize = frameSizeL.toInt

    // count frames first (each is "FRAME[ params]\n" + planes)
    var off = eol + 1
    var nFrames = 0
    while (off < bytes.length) {
      val fe = frameDataStart(bytes, off)
      if (fe < 0 || fe.toLong + frameSize > bytes.length) return null
      nFrames += 1
      off = fe + frameSize
    }
    if (nFrames == 0) return null

    // nFrames * lumaSize <= bytes.length by the per-frame bound above
    val out = new Array[Byte](nFrames * lumaSize)
    off = eol + 1
    var f = 0
    while (f < nFrames) {
      val fe = frameDataStart(bytes, off)
      System.arraycopy(bytes, fe, out, f * lumaSize, lumaSize)
      off = fe + frameSize
      f += 1
    }
    new GenericInternalRow(Array[Any](w, h, nFrames, out))
  }

  /** Offset of the first plane byte of the frame starting at `off`, or -1
    * if there is no well-formed `FRAME...\n` marker there. */
  private def frameDataStart(bytes: Array[Byte], off: Int): Int = {
    if (off + 6 > bytes.length) return -1
    if (bytes(off) != 'F' || bytes(off + 1) != 'R' || bytes(off + 2) != 'A' ||
      bytes(off + 3) != 'M' || bytes(off + 4) != 'E') return -1
    var i = off + 5
    while (i < bytes.length && bytes(i) != '\n') i += 1
    if (i >= bytes.length) -1 else i + 1
  }

  /** Build a Cmono YUV4MPEG2 stream from concatenated luma planes — the
    * encode mirror of [[compute]], used to synthesize real fixtures. */
  def encode(w: Int, h: Int, nFrames: Int, y: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0 && y.length == nFrames * w * h,
      "need nFrames*w*h luma bytes")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n".getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val lumaSize = w * h
    val out = new Array[Byte](header.length + nFrames * (frameMark.length + lumaSize))
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    var f = 0
    while (f < nFrames) {
      System.arraycopy(frameMark, 0, out, off, frameMark.length)
      off += frameMark.length
      System.arraycopy(y, f * lumaSize, out, off, lumaSize)
      off += lumaSize
      f += 1
    }
    out
  }
}

/** Unsigned-byte statistics: `byte_stats(binary)` → `array<double>` of
  * [mean, std, min, max] each normalized to [0, 1] — the feature head over
  * decoded luma planes (and any raw byte payload), sibling of [[RgbMeans]]
  * and [[PcmStats]]. Integer accumulation; doubles only in the final
  * division, so results are deterministic across engines. */
case class ByteStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_stats requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "byte_stats"

  override def nullSafeEval(input: Any): Any =
    ByteStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.ByteStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
}

object ByteStats {
  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array[Any](0.0, 0.0, 0.0, 0.0))
    var sum = 0L; var sumSq = 0L; var mn = 255L; var mx = 0L
    var i = 0
    while (i < n) {
      val v = (bytes(i) & 0xff).toLong
      sum += v
      sumSq += v * v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    val mean = sum.toDouble / n
    val variance = math.max(0.0, sumSq.toDouble / n - mean * mean)
    new GenericArrayData(Array[Any](
      mean / 255.0, math.sqrt(variance) / 255.0, mn.toDouble / 255.0,
      mx.toDouble / 255.0))
  }
}
