package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, Decimal, LongType}

/** Partial-aggregation buffer for [[GramMoments]]: the upper-triangle Gram
  * sums, the per-dimension first moments, and the row count, all exact.
  *
  * The hot path accumulates into a primitive `Array[Long]` (one add per
  * cell per row, no allocation); an exact `BigInteger` shadow absorbs the
  * long lane whenever the remaining headroom (`slack`) could no longer
  * provably hold the next row's worst-case products. The flush cadence is
  * driven by the data itself (each row debits its max |x_i|² from the
  * budget), so the aggregate is overflow-safe at ANY corpus size without
  * paying BigInteger arithmetic per row — at the 1e-6 quantization used by
  * the PCA family (|x_i| ≤ ~1e6, products ≤ ~1e12) a flush happens about
  * once per 4.6M rows per partition.
  */
final class GramBuf(val nCells: Int) {
  val longs = new Array[Long](nCells)
  val big: Array[BigInteger] = Array.fill(nCells)(BigInteger.ZERO)
  var slack: Long = GramBuf.SlackMax

  def flush(): Unit = {
    var k = 0
    while (k < nCells) {
      if (longs(k) != 0L) {
        big(k) = big(k).add(BigInteger.valueOf(longs(k)))
        longs(k) = 0L
      }
      k += 1
    }
    slack = GramBuf.SlackMax
  }
}

object GramBuf {
  /** Budget such that |longs(k)| never exceeds Long.MaxValue/2: each row
    * debits its max per-cell magnitude, and a flush resets the budget.
    */
  val SlackMax: Long = Long.MaxValue / 2
}

/** One-pass exact second/first-moment aggregate over a quantized
  * `array<bigint>` vector column: returns a flat
  * `array<decimal(38,0)>` of length dims·(dims+1)/2 + dims + 1 holding
  * [upper-triangle Σ xᵢxⱼ in (i,j) row-major order | Σ xᵢ per dim | N].
  *
  * Replaces the posexplode Gram kernel of q_pca_power (2080 generated rows
  * PER INPUT ROW shuffled into a 2080-group hash aggregate) with a
  * [[TypedImperativeAggregate]]: each task folds its partition into one
  * fixed 2145-cell buffer, partial buffers (a few kB each) merge on a
  * single reducer, and the scan → result path is one job with zero
  * Generate volume. At 100 TB this is the difference between shuffling
  * 2080·N rows and shuffling one buffer per task.
  *
  * Input contract: every non-null array must have exactly `dims` non-null
  * elements with |x| < 3e9 (quantized 1e-6 fixed-point coordinates are
  * ~1e6) — violations throw rather than silently wrap. Null rows are
  * skipped, matching the SQL aggregates the oracle uses.
  */
case class GramMoments(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramBuf] {

  private val nTri = dims * (dims + 1) / 2
  private val nCells = nTri + dims + 1
  // |x| bound keeping x² inside Long: floor(sqrt(Long.MaxValue))
  private val MaxAbs = 3037000499L

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DecimalType(38, 0), containsNull = false)

  /** Pin the element type at ANALYSIS time: the hot loop reads raw words
    * via `UnsafeArrayData.getLong`, so an array<int> (or any narrower
    * element) child would read misaligned 8-byte words and produce
    * silently WRONG sums — the runtime `require`s only guard lengths,
    * nulls, and magnitude, not element width.
    */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"GramMoments requires array<bigint> input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): GramBuf = new GramBuf(nCells)

  override def update(buf: GramBuf, input: InternalRow): GramBuf = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dims,
      s"GramMoments expects arrays of length $dims, got ${arr.numElements()}")
    val x = new Array[Long](dims)
    var i = 0
    var rowMax = 1L
    while (i < dims) {
      require(!arr.isNullAt(i), s"GramMoments: null element at $i")
      val xi = arr.getLong(i)
      x(i) = xi
      val a = math.abs(xi)
      if (a > rowMax) rowMax = a
      i += 1
    }
    require(rowMax < MaxAbs, s"GramMoments: |x|=$rowMax exceeds fixed-point bound")
    val prodMax = rowMax * rowMax // < Long.MaxValue by the bound above
    if (buf.slack < prodMax) buf.flush()
    buf.slack -= prodMax
    val longs = buf.longs
    var k = 0
    i = 0
    while (i < dims) {
      val xi = x(i)
      var j = i
      while (j < dims) {
        longs(k) += xi * x(j)
        k += 1
        j += 1
      }
      longs(nTri + i) += xi // first moment; |xi| ≤ rowMax ≤ prodMax budget
      i += 1
    }
    longs(nTri + dims) += 1L // row count
    buf
  }

  override def merge(buf: GramBuf, other: GramBuf): GramBuf = {
    buf.flush(); other.flush()
    var k = 0
    while (k < nCells) {
      buf.big(k) = buf.big(k).add(other.big(k))
      k += 1
    }
    buf
  }

  override def eval(buf: GramBuf): Any = {
    buf.flush()
    new GenericArrayData(buf.big.map(b =>
      Decimal(scala.math.BigDecimal(new java.math.BigDecimal(b)), 38, 0)))
  }

  override def serialize(buf: GramBuf): Array[Byte] = {
    buf.flush()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(nCells)
    var k = 0
    while (k < nCells) {
      val bytes = buf.big(k).toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
      k += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): GramBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    require(n == nCells, s"GramMoments buffer arity $n != $nCells")
    val buf = new GramBuf(nCells)
    var k = 0
    while (k < nCells) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      buf.big(k) = new BigInteger(bytes)
      k += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMoments =
    copy(child = newChildren.head)
}

object GramAgg {
  /** Column wrapper over [[GramMoments]] as a complete aggregate. */
  def gramMoments(q: Column, dims: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      GramMoments(org.apache.spark.sql.graft.bridge.expression(q), dims)
        .toAggregateExpression())
}
