package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Audio energy-delta fingerprint: `audio_hash64(pcm)` over a PCM16-LE
  * mono sample buffer → a 64-bit signature where bit `i` is set iff the
  * energy of window `i` is less than that of window `i+1`, over 65
  * equal-width windows (integer boundaries `i·n/65` — divisionless
  * deterministic splits, exact Σsample² energies in long).
  *
  * The delta encoding is the audio analogue of [[DHash64]]'s gradients:
  * uniform gain moves every window's energy together (scaling preserves
  * the < relation), so re-encoded or re-gained copies land within a few
  * bits while unrelated streams differ in ~32 — and the signature feeds
  * the same banded-hamming near-dup join as the text SimHash and image
  * dHash paths. NULL when the buffer holds fewer than 2·65 samples
  * (degenerate windows stay visible, never silently hashed).
  * Codegen-resident, no UDF. */
case class AudioHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_hash64 requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_hash64"

  override def nullSafeEval(input: Any): Any =
    AudioHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Object r = graft.expr.AudioHash64.compute($c);
      ${ev.isNull} = r == null;
      ${ev.value} = ${ev.isNull} ? -1L : ((Long) r).longValue();
    """)

  override protected def withNewChildInternal(newChild: Expression): AudioHash64 =
    copy(child = newChild)
}

object AudioHash64 {
  val Windows = 65 // 64 adjacent-energy comparisons → 64 bits

  def compute(pcm: Array[Byte]): java.lang.Long = {
    if (pcm == null) return null
    val n = pcm.length / 2
    if (n < 2 * Windows) return null
    // exact per-window energies: sample² ≤ 2³⁰, window ≤ n samples —
    // Σ fits long far beyond any real clip length
    val energy = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      val from = (w.toLong * n / Windows).toInt
      val to = ((w + 1).toLong * n / Windows).toInt
      var i = from
      var e = 0L
      while (i < to) {
        val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toLong
        e += s * s
        i += 1
      }
      energy(w) = e
      w += 1
    }
    var bits = 0L
    var i = 0
    while (i < Windows - 1) {
      if (energy(i) < energy(i + 1)) bits |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(bits)
  }
}
