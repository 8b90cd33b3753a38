package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the public
  * algorithm behind FAISS's PQ/IVFPQ indexes).
  *
  * A d-dim vector splits into `m` contiguous subvectors of `subDim = d/m`;
  * each subvector is quantized to its nearest of `kc` per-subspace
  * centroids, so a vector compresses to `m` small codes (≤1 byte each for
  * kc ≤ 256) — a 16–32× storage/bandwidth cut, which is the entire point
  * at 100 TB: the ADC scan reads codes, never raw floats.
  *
  * All three kernels carry the trained codebook as a plan-embedded
  * reference object (`m·kc·subDim` floats — a few KiB, the
  * broadcast-small-model pattern of [[BpeEncode]]'s merge table), so the
  * hot loops run inside whole-stage codegen with zero per-row setup:
  *
  *   - [[PqEncode]]    vector → `array<int>` of m codes (index build)
  *   - [[PqAdcTable]]  query vector → `array<float>` of m·kc partial dot
  *                     products (once per QUERY — the table amortizes the
  *                     float work across every candidate)
  *   - [[PqAdcDot]]    (table, codes) → double approximate dot product:
  *                     m array lookups + adds per CANDIDATE (asymmetric
  *                     distance computation, the paper's ADC)
  */
case class PqEncode(
    child: Expression,
    codebook: Array[Float],
    m: Int,
    kc: Int,
    subDim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // NULL on dim mismatch even for non-null input — without this, a
  // non-nullable child makes ev.isNull the literal `false` and the
  // generated `isNull = true` branch fails to compile (interpreter fallback)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqOps.encode(input.asInstanceOf[ArrayData], codebook, m, kc, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.expr.PqOps.encode($c, $cbRef, $m, $kc, $subDim);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

case class PqAdcTable(
    child: Expression,
    codebook: Array[Float],
    m: Int,
    kc: Int,
    subDim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_table requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true // NULL on dim mismatch (see PqEncode)
  override def prettyName: String = "pq_adc_table"

  override def nullSafeEval(input: Any): Any =
    PqOps.adcTable(input.asInstanceOf[ArrayData], codebook, m, kc, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.expr.PqOps.adcTable($c, $cbRef, $m, $kc, $subDim);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
}

case class PqAdcDot(left: Expression, right: Expression, kc: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dot requires (array<float> table, array<int> codes), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqOps.adcDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], kc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.expr.PqOps.adcDot($a, $b, $kc);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

object PqOps {

  /** Nearest per-subspace centroid ids. Null on dimension mismatch or
    * null elements (same three-valued discipline as [[QuantizedDotProduct]]). */
  def encode(x: ArrayData, cb: Array[Float], m: Int, kc: Int, subDim: Int): ArrayData = {
    if (x.numElements() != m * subDim) return null
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < kc) {
        var d2 = 0.0
        var d = 0
        val base = (j * kc + c) * subDim
        while (d < subDim) {
          val i = j * subDim + d
          if (x.isNullAt(i)) return null
          val diff = x.getFloat(i).toDouble - cb(base + d)
          d2 += diff * diff
          d += 1
        }
        // strict < keeps the LOWEST id on ties — deterministic codes
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Per-(subspace, centroid) partial dot products of a query vector:
    * table[j·kc + c] = Σ_d q[j·subDim+d] · cb[(j·kc+c)·subDim+d]. */
  def adcTable(q: ArrayData, cb: Array[Float], m: Int, kc: Int, subDim: Int): ArrayData = {
    if (q.numElements() != m * subDim) return null
    val out = new Array[Any](m * kc)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < kc) {
        var acc = 0.0
        var d = 0
        val base = (j * kc + c) * subDim
        while (d < subDim) {
          val i = j * subDim + d
          if (q.isNullAt(i)) return null
          acc += q.getFloat(i).toDouble * cb(base + d)
          d += 1
        }
        out(j * kc + c) = acc.toFloat
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate dot by table lookups: Σ_j table[j·kc + codes[j]].
    * Null when the table is not exactly |codes|·kc wide or any code is out
    * of range — a mismatched (table, codes) pairing is a caller bug that
    * must surface as NULL, not as a garbage score. */
  def adcDot(table: ArrayData, codes: ArrayData, kc: Int): java.lang.Double = {
    val m = codes.numElements()
    if (table.numElements() != m * kc) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= kc) return null
      acc += table.getFloat(j * kc + c).toDouble
      j += 1
    }
    acc
  }
}
