package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Real audio decode for the multimodal pipeline: `wav_decode(content)` →
  * `struct<channels int, sample_rate int, n_samples int, pcm binary>` for
  * RIFF/WAVE PCM 16-bit payloads (the public container format), NULL for
  * anything else.
  *
  * The audio sibling of [[BmpDecode]]: pure JVM, no codecs, walks the RIFF
  * chunk list (tolerating extra chunks like `LIST` before `data`) and
  * returns the raw little-endian PCM16 frames — the canonical batch shape a
  * sample-level feature extractor ([[PcmStats]]) consumes. `n_samples`
  * counts frames (all channels at one instant = one frame). Pure
  * projection: embarrassingly parallel, one header walk + one bounds check,
  * codegen-resident via a static call.
  */
case class WavDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_decode requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("pcm", BinaryType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "wav_decode"

  override def nullSafeEval(input: Any): Any =
    WavDecode.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.WavDecode.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): WavDecode =
    copy(child = newChild)
}

object WavDecode {
  import LittleEndian.{i32, u16}

  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    b(o) == t(0) && b(o + 1) == t(1) && b(o + 2) == t(2) && b(o + 3) == t(3)

  /** Returns (channels, sampleRate, nFrames, pcm) or null if the payload is
    * not a decodable PCM16 RIFF/WAVE file. */
  def compute(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 44) return null
    if (!tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE")) return null

    var channels = 0
    var sampleRate = 0
    var haveFmt = false
    var off = 12
    // walk chunks: each is tag(4) + size(4) + payload (word-aligned).
    // ALL bounds arithmetic in Long — a crafted size near Int.MaxValue must
    // reject (NULL), not wrap negative and crash the task (cf. BmpDecode)
    while (off + 8 <= bytes.length) {
      val size = i32(bytes, off + 4)
      if (size < 0 || off.toLong + 8L + size > bytes.length) return null
      if (tag(bytes, off, "fmt ")) {
        if (size < 16) return null
        val audioFormat = u16(bytes, off + 8)
        channels = u16(bytes, off + 10)
        sampleRate = i32(bytes, off + 12)
        val bitsPerSample = u16(bytes, off + 22)
        if (audioFormat != 1 || bitsPerSample != 16 ||
          channels < 1 || channels > 16 ||
          sampleRate <= 0 || sampleRate > 1000000) return null
        haveFmt = true
      } else if (tag(bytes, off, "data")) {
        if (!haveFmt) return null // fmt must precede data per spec
        val blockAlign = channels * 2
        if (size % blockAlign != 0) return null
        val pcm = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
        return new GenericInternalRow(
          Array[Any](channels, sampleRate, size / blockAlign, pcm))
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    null
  }

  /** Build a PCM16 RIFF/WAVE file from raw little-endian samples — the
    * encode mirror of [[compute]], used to synthesize real fixtures. */
  def encode(channels: Int, sampleRate: Int, pcm: Array[Byte]): Array[Byte] = {
    require(channels >= 1 && pcm.length % (channels * 2) == 0,
      "pcm must be whole 16-bit frames")
    val b = new Array[Byte](44 + pcm.length)
    def putTag(o: Int, t: String): Unit = (0 until 4).foreach(i => b(o + i) = t(i).toByte)
    def putU16(o: Int, v: Int): Unit = LittleEndian.putU16(b, o, v)
    def putI32(o: Int, v: Int): Unit = LittleEndian.putI32(b, o, v)
    putTag(0, "RIFF"); putI32(4, 36 + pcm.length); putTag(8, "WAVE")
    putTag(12, "fmt "); putI32(16, 16)
    putU16(20, 1); putU16(22, channels); putI32(24, sampleRate)
    putI32(28, sampleRate * channels * 2); putU16(32, channels * 2); putU16(34, 16)
    putTag(36, "data"); putI32(40, pcm.length)
    System.arraycopy(pcm, 0, b, 44, pcm.length)
    b
  }
}

/** Sample statistics over a PCM16LE buffer: `pcm_stats(pcm)` →
  * `array<double>` of [mean, rms, peak, zero_crossing_ratio], each
  * normalized to [-1, 1] full scale — the feature head over decoded audio,
  * sibling of [[RgbMeans]]. Integer accumulation throughout; doubles only
  * in the final division, so results are deterministic across engines. */
case class PcmStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pcm_stats requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pcm_stats"

  override def nullSafeEval(input: Any): Any =
    PcmStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.PcmStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PcmStats =
    copy(child = newChild)
}

object PcmStats {
  private final val FullScale = 32768.0

  def compute(pcm: Array[Byte]): ArrayData = {
    val n = pcm.length / 2
    if (n == 0) return new GenericArrayData(Array[Any](0.0, 0.0, 0.0, 0.0))
    var sum = 0L; var sumSq = 0L; var peak = 0L; var crossings = 0L
    var prevSign = 0
    var i = 0
    while (i + 1 < pcm.length) {
      val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toLong
      sum += s
      sumSq += s * s
      val a = math.abs(s)
      if (a > peak) peak = a
      val sign = java.lang.Long.signum(s).toInt
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) crossings += 1
        prevSign = sign
      }
      i += 2
    }
    new GenericArrayData(Array[Any](
      sum.toDouble / (n * FullScale),
      math.sqrt(sumSq.toDouble / n) / FullScale,
      peak.toDouble / FullScale,
      if (n > 1) crossings.toDouble / (n - 1) else 0.0))
  }
}
