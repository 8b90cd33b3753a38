package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a native aggregate:
  * `misra_gries(value, k)` → `array<struct<item string, lb bigint>>`
  * (candidates with their lower-bound counts, ordered by lb desc, item asc).
  *
  * One pass, ≤ k counters per aggregation buffer, mergeable (Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012):
  * Spark runs it as a map-side partial per partition + one reduce-side
  * merge, so the full scan never shuffles more than numPartitions·k tiny
  * rows. Guarantee (the reason it composes into EXACT heavy-hitter
  * queries): every item with true frequency f > N/(k+1) survives with
  * lb ≥ f − N/(k+1) > 0 — under ANY partitioning and merge order, because
  * both the decrement step and the merge step subtract from ALL counters
  * equally, charging each subtraction against k+1 distinct stream items.
  * The candidate set is therefore a SUPERSET of the true > N/(k+1) heavy
  * hitters; an exact recount of just the ≤ k candidates
  * ([[graft.ops.Relational.heavyHitters]]) turns it into an exact answer
  * with no full-vocabulary shuffle.
  *
  * The buffer is a plain hash map (string → long); the decrement-all
  * overflow step is O(k) amortized against the k inserts that filled the
  * buffer. Aggregation is imperative (no codegen) — inherent to
  * TypedImperativeAggregate and irrelevant here: the cost is the scan,
  * not the sketch.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string column, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf // nulls carry no frequency mass
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // decrement-all: charges one count to each of k counters plus the
        // arriving item — k+1 distinct items per unit of discarded mass
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (item, c) =>
      a.update(item, a.getOrElse(item, 0L) + c)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from every counter and drop
      // the non-positive — the merge rule that preserves the N/(k+1) bound
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (item, lb) => (-lb, item) }
      .map { case (item, lb) =>
        InternalRow(UTF8String.fromString(item), lb)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  /** Decode an eval() result (Seq of Rows at the public API) to pairs. */
  def decode(rows: Seq[org.apache.spark.sql.Row]): Seq[(String, Long)] =
    rows.map(r => (r.getString(0), r.getLong(1)))
}
