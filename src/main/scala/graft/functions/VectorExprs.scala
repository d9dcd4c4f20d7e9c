package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The HOF composition (`aggregate(zip_with(...))`) is semantically right
  * but interpreted row-at-a-time with per-element closure dispatch — on the
  * all-pairs similarity joins (millions of 64-dim dot products) it dominates
  * the benchmark. This expression emits a tight codegen loop instead, inside
  * whole-stage codegen, with the IDENTICAL IEEE operation order
  * (left-to-right multiply-accumulate from a 0.0 seed), so results stay
  * bit-equal to the DuckDB oracles' `list_reduce` fold.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(DoubleType, false) ||
      left.dataType == ArrayType(DoubleType, true)) {
      right.dataType match {
        case ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"right must be array<double>, got ${right.dataType}")
      }
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"left must be array<double>, got ${left.dataType}")
    }
  }

  // The result can be NULL even for non-null inputs (ragged lengths, null
  // slots), matching the HOF reference: zip_with pads the shorter array
  // with nulls and aggregate's `acc + null` poisons the fold to NULL.
  override def nullable: Boolean = true

  private def elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      var sawNull = false
      while (i < n && !sawNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) sawNull = true
        else {
          acc += x.getDouble(i) * y.getDouble(i)
          i += 1
        }
      }
      if (sawNull) null else acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // per-element null checks only when the array type can hold nulls —
      // the non-null fast path stays a tight two-load multiply-accumulate
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) null
    else {
      val b = right.eval(input)
      if (b == null) null else nullSafeEval(a, b)
    }
  }
}

/** Top-k nearest-centroid assignment as ONE codegen-participating pass —
  * the IVF-family build kernel (`assignTopK` in queries/Similarity.scala).
  *
  * The HOF formulation (`slice(array_sort(transform(cents, …), cmp), 1, k)`)
  * is semantically right but pays three interpreted layers per row: the
  * `transform` lambda re-enters expression eval per centroid (burying the
  * codegen [[DotProduct]] under interpreted dispatch), `array_sort`
  * evaluates its COMPARATOR as a Catalyst expression per comparison
  * (O(nlist·log nlist) expression evals per row), and the struct array is
  * materialized just to be sliced to k entries. With nlist = √N centroids
  * the assignment stage is the dominant cost of every IVF query, so those
  * constants are the difference between the measured wall and the design's
  * map-side-matmul story. This expression runs the whole loop — dot,
  * cosine, top-k insertion — in compiled code and returns just the k cell
  * ids in rank order.
  *
  * Bit-parity contract (the reason results are IDENTICAL to the HOF plan
  * and the DuckDB oracle): the dot product accumulates left-to-right from
  * a 0.0 seed exactly like [[DotProduct]]; the similarity is
  * `dot / sqrt(nrm·cn)` guarded to NULL when the norm product is not > 0
  * (the cosSim guard); and the ordering is the same total order as the HOF
  * comparator — sim DESC, NULL sims last, centroid id ASC on ties (ids are
  * unique, so sort-then-slice ≡ top-k insertion). All doubles are IEEE
  * operations in the same order, so every comparison sees the same values.
  *
  * `cents` is a single-row broadcast array of struct(ccid: long,
  * ce: array<double>, cn: double) — field ORDINALS are part of the
  * contract (0/1/2), as with any Catalyst struct access.
  */
case class CellAssign(vec: Expression, nrm: Expression, cents: Expression,
    k: Int) extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = nrm
  override def third: Expression = cents

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean =
    vec.nullable || nrm.nullable || cents.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = vec.dataType.isInstanceOf[ArrayType] &&
      vec.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
      nrm.dataType == DoubleType &&
      cents.dataType.isInstanceOf[ArrayType] &&
      cents.dataType.asInstanceOf[ArrayType].elementType
        .isInstanceOf[org.apache.spark.sql.types.StructType]
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expected (array<double>, double, array<struct>), got " +
        s"(${vec.dataType}, ${nrm.dataType}, ${cents.dataType})")
  }

  override protected def nullSafeEval(e: Any, n: Any, c: Any): Any =
    CellAssignKernel.topK(e.asInstanceOf[ArrayData], n.asInstanceOf[Double],
      c.asInstanceOf[ArrayData], k)

  // a standalone object (no companion class) guarantees a static forwarder
  // the generated Java can call directly
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, n, c) =>
      s"${ev.value} = graft.functions.CellAssignKernel.topK($e, $n, $c, $k);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CellAssign =
    copy(vec = newFirst, nrm = newSecond, cents = newThird)
}

object CellAssignKernel {
  /** The compiled kernel; public static (via the Java-friendly forwarder)
    * so generated code can call it directly inside whole-stage codegen.
    */
  def topK(e: ArrayData, nrm: Double, cents: ArrayData, k: Int): ArrayData = {
    val n = cents.numElements()
    val kk = math.min(k, n)
    // rank-ordered best-so-far; parallel arrays avoid per-candidate allocs
    val ids = new Array[Long](kk)
    val sims = new Array[Double](kk)
    val simNulls = new Array[Boolean](kk)
    var filled = 0
    val m = e.numElements()
    var ci = 0
    while (ci < n) {
      val c = cents.getStruct(ci, 3)
      val ccid = c.getLong(0)
      val ce = c.getArray(1)
      val cn = c.getDouble(2)
      // DotProduct semantics: ragged lengths or a null slot -> NULL
      var dot = 0.0
      var dNull = m != ce.numElements()
      var i = 0
      while (i < m && !dNull) {
        if (e.isNullAt(i) || ce.isNullAt(i)) dNull = true
        else { dot += e.getDouble(i) * ce.getDouble(i); i += 1 }
      }
      // cosSim guard: NULL unless the norm product is strictly positive
      val n2 = nrm * cn
      val sNull = dNull || !(n2 > 0.0)
      val s = if (sNull) 0.0 else dot / math.sqrt(n2)
      // HOF comparator: sim DESC, NULL sims last, ccid ASC on ties
      def before(aN: Boolean, aS: Double, aI: Long,
          bN: Boolean, bS: Double, bI: Long): Boolean =
        if (aN != bN) bN
        else if (!aN && aS != bS) aS > bS
        else aI < bI
      if (filled < kk ||
          before(sNull, s, ccid, simNulls(kk - 1), sims(kk - 1), ids(kk - 1))) {
        var p = if (filled < kk) filled else kk - 1
        while (p > 0 && before(sNull, s, ccid,
            simNulls(p - 1), sims(p - 1), ids(p - 1))) {
          ids(p) = ids(p - 1); sims(p) = sims(p - 1)
          simNulls(p) = simNulls(p - 1)
          p -= 1
        }
        ids(p) = ccid; sims(p) = s; simNulls(p) = sNull
        if (filled < kk) filled = filled + 1
      }
      ci += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(if (filled == kk) ids else ids.take(filled))
  }
}

object VectorExprs {
  /** Column wrapper over [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      DotProduct(org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))

  /** Column wrapper over [[CellAssign]]: array of the k nearest centroid
    * ids (rank order) for a vector against the broadcast centroid array.
    */
  def cellAssign(vec: Column, nrm: Column, cents: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      CellAssign(org.apache.spark.sql.graft.bridge.expression(vec),
        org.apache.spark.sql.graft.bridge.expression(nrm),
        org.apache.spark.sql.graft.bridge.expression(cents), k))
}
