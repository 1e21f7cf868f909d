package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the similarity hot loop: an in-order
  * double-precision dot product over two numeric vectors (float or
  * double element type on either side).
  *
  * Why a custom Expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order array functions evaluate their lambdas interpreted
  * (never codegen'd), allocate an intermediate array per row, and box
  * per element. This expression participates in whole-stage codegen — a
  * tight primitive loop over the two `ArrayData` buffers, no
  * allocation — while producing BIT-IDENTICAL results to the
  * left-fold-with-0.0 formulation (same multiplies and additions in the
  * same order), so the DuckDB oracle is unaffected.
  */
case class VectorDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xd = elemType(left) == DoubleType
    val yd = elemType(right) == DoubleType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def getter(v: String, e: Expression): String =
        if (elemType(e) == DoubleType) s"$v.getDouble($i)"
        else s"((double) $v.getFloat($i))"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(a, left)} * ${getter(b, right)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-level API for the codegen'd dot product (the classic
    * Column↔Expression bridge; Spark 4's public Column is node-based).
    */
  def float_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VectorDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
