package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd squared L2 distance — the k-means assignment
  * kernel. Accumulates `(x−y)·(x−y)` component-by-component in the SAME
  * left-to-right IEEE order as the declarative `zip_with`+`aggregate`
  * form (and the oracle's list_sum replay), so argmin assignments are
  * bit-identical; the higher-order form runs interpreted
  * (CodegenFallback), which makes k× per-row distance evaluation the
  * Lloyd-iteration hot spot.
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_sqdist"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (lt, rt) = (elementType(left), elementType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lt == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rt == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val getX = CodeGenerator.getValue(a, elementType(left), i)
      val getY = CodeGenerator.getValue(b, elementType(right), i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    double $d = (double) $getX - (double) $getY;
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}
