package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Partial-aggregation buffer for [[VecSum]]: per-dimension exact long sums
  * plus the contributing row count.
  */
final class VecSumBuf(val dims: Int) {
  val sums = new Array[Long](dims)
  var n: Long = 0L
}

/** One-pass element-wise SUM over an `array<bigint>` vector column —
  * the centroid-accumulation kernel of the k-means family. Returns
  * `array<bigint>` of length `dims`, or NULL when no non-null row
  * contributed (the emptied-cluster signal the callers' `least()` argmin
  * skips, matching `sum(CASE WHEN ...)` over zero rows).
  *
  * Replaces the posexplode + groupBy(d) centroid kernel (N·D generated
  * rows shuffled per k-means round) with a [[TypedImperativeAggregate]]:
  * each task folds its partition into one fixed D-cell buffer, partial
  * buffers (D longs) merge on a single reducer — the per-round exchange
  * carries one buffer per task instead of N·D rows. The same
  * exact-integer discipline as [[GramMoments]]: quantized inputs are
  * exact BIGINTs and addition is order-free, so the result is
  * bit-identical to any other summation order. Overflow is LOUD
  * (Math.addExact throws) — at the 1e-6 quantization (|x| ≤ ~1e6) the
  * long lane holds ~9·10¹² contributing rows per dimension, far past any
  * realistic cluster population; a corpus beyond it fails fast rather
  * than silently wrapping.
  *
  * Null ROWS are skipped (SQL aggregate semantics — the conditional
  * `when(cid = j, xs)` pattern relies on it); a null ELEMENT inside a
  * non-null array throws (the vectors are machine-generated, a null
  * element is data corruption, not a value).
  */
case class VecSum(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Pin the element type at ANALYSIS time (the GramMoments discipline):
    * the hot loop reads 8-byte words via `ArrayData.getLong`; a narrower
    * element type would read wrong words, so it is rejected up front.
    */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"VecSum requires array<bigint> input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf(dims)

  override def update(buf: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dims,
      s"VecSum expects arrays of length $dims, got ${arr.numElements()}")
    val sums = buf.sums
    var i = 0
    while (i < dims) {
      require(!arr.isNullAt(i), s"VecSum: null element at $i")
      sums(i) = Math.addExact(sums(i), arr.getLong(i))
      i += 1
    }
    buf.n += 1L
    buf
  }

  override def merge(buf: VecSumBuf, other: VecSumBuf): VecSumBuf = {
    var i = 0
    while (i < dims) {
      buf.sums(i) = Math.addExact(buf.sums(i), other.sums(i))
      i += 1
    }
    buf.n += other.n
    buf
  }

  override def eval(buf: VecSumBuf): Any =
    if (buf.n == 0L) null else new GenericArrayData(buf.sums.clone())

  override def serialize(buf: VecSumBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(dims)
    out.writeLong(buf.n)
    var i = 0
    while (i < dims) { out.writeLong(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): VecSumBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val d = in.readInt()
    require(d == dims, s"VecSum buffer arity $d != $dims")
    val buf = new VecSumBuf(dims)
    buf.n = in.readLong()
    var i = 0
    while (i < dims) { buf.sums(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSum =
    copy(child = newChildren.head)
}

object VecSumAgg {
  /** Column wrapper over [[VecSum]] as a complete aggregate. */
  def vecSum(xs: Column, dims: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      VecSum(org.apache.spark.sql.graft.bridge.expression(xs), dims)
        .toAggregateExpression())
}
