package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

object VectorExprs {
  /** Column wrapper over [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      DotProduct(org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))
}
