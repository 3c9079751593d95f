package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two embedding arrays — the
  * [[CosineSimilarity]] kernel without the norms. Semantically identical
  * to [[VectorFunctions.dot]] (sequential left-to-right double
  * accumulation ⇒ bit-identical to the declarative `zip_with`+`aggregate`
  * form and the DuckDB oracle), but one fused codegen'd loop with no
  * intermediate product array. The IVF cell-assignment path evaluates
  * nCells of these per row over the full corpus — the higher-order form
  * runs INTERPRETED (`ArrayAggregate` is CodegenFallback), which
  * dominated the 100k+-corpus profile.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_dot"
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
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (lt == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rt == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getX = CodeGenerator.getValue(a, elementType(left), i)
      val getY = CodeGenerator.getValue(b, elementType(right), i)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    double $x = (double) $getX;
         |    double $y = (double) $getY;
         |    $dot += $x * $y;
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
