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

/** Native projection of a vector onto a bank of DETERMINISTIC
  * pseudo-random planes (the LCG family of
  * [[graft.ops.Similarity.planeValue]]): out(p) = Σ_j plane(p+offset)(j)
  * · v(j), j ascending — bit-identical to a column of
  * [[VectorDotProduct]]s against literal plane arrays, which is what it
  * replaces. The literal formulation materializes nOut × dim Literal
  * nodes (2048 for the JL reranker) that every analyzer/optimizer pass
  * re-walks and janino compiles as 2048 inline constants; this node
  * carries the planes as ONE reference object and generates two tight
  * loops — same arithmetic, same order, a plan tree 3 orders of
  * magnitude smaller.
  */
case class PlaneProject(child: Expression, offset: Int, nOut: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "plane_project"

  /** The plane bank, regenerated from the LCG — data-independent
    * constants, identical on every worker without coordination
    * (Similarity.planeValue's formula).
    */
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nOut, dim) { (i, j) =>
      val x = (((i + offset).toLong * dim + j + 1) * 2654435761L) % 4294967296L
      x.toDouble / 2147483648.0 - 1.0
    }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val isD = elemIsDouble
    val n = math.min(dim, v.numElements())
    val out = new Array[Double](nOut)
    var p = 0
    while (p < nOut) {
      val pl = planes(p)
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += pl(j) * (if (isD) v.getDouble(j) else v.getFloat(j).toDouble)
        j += 1
      }
      out(p) = acc
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pls = ctx.addReferenceObj("planes", planes, "double[][]")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val pl = ctx.freshName("pl")
      val getter =
        if (elemIsDouble) s"$a.getDouble($j)" else s"((double) $a.getFloat($j))"
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |double[] $out = new double[$nOut];
         |for (int $p = 0; $p < $nOut; $p++) {
         |  double[] $pl = $pls[$p];
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += $pl[$j] * $getter;
         |  }
         |  $out[$p] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-level API for the codegen'd dot product (the classic
    * Column↔Expression bridge; Spark 4's public Column is node-based).
    */
  def float_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VectorDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[PlaneProject]]: project onto `nOut` LCG planes
    * starting at plane index `offset`, over the first `dim` elements.
    */
  def plane_project(v: Column, offset: Int, nOut: Int, dim: Int): Column =
    ColumnBridge.column(
      PlaneProject(ColumnBridge.expression(v), offset, nOut, dim))
}
