package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd vector arithmetic for the ANN/similarity family.
  *
  * The SQL forms — `aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
  * (acc, v) -> acc + v)` and the (x−y)² analogue — walk the arrays
  * through interpreted lambdas and allocate the zipped intermediate
  * per row; on the candidate×query frames of the ANN operators that
  * is the dominant per-row cost. These loops run the IDENTICAL IEEE
  * operation sequence (left-to-right fold, one multiply/subtract and
  * one add per element, 0.0 seed) as compiled Java — bit-identical
  * results, which the DuckDB oracles' `list_reduce` replays rely on.
  *
  * Mismatched lengths throw (loud) rather than the SQL form's
  * null-padding — every caller zips equal-length vectors by
  * construction, and a silent null would disappear into a filter.
  */
object VecOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"graft dot: length mismatch $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"graft sqdist: length mismatch $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** double left-fold dot product of two array<double> columns. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.llm.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** double left-fold squared-L2 distance of two array<double> columns. */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.llm.VecOps.sqDist($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}

object VectorColumns {
  import org.apache.spark.sql.graftglue.ColumnBridge.{column, expression}
  def dot(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))
  def sqDist(a: Column, b: Column): Column =
    column(SqDistExpr(expression(a), expression(b)))
}
