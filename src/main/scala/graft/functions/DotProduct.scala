package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `array<float>` /
  * `array<double>` columns — Σ (double)aᵢ · (double)bᵢ, sequential
  * left-to-right accumulation. Each side's element type may
  * independently be float or double (the fold it replaced widened any
  * numeric element to double, so callers holding double vectors keep
  * working).
  *
  * Semantically identical to the
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)` fold it
  * replaces (same widening, same summation order — so the same IEEE
  * double reaches the DuckDB oracle comparison), but the fold runs
  * the higher-order-function interpreter with per-element closure
  * calls while this expression compiles to a tight primitive loop
  * inside whole-stage codegen — the hot inner kernel of every cosine
  * scoring join. NULL if either side is NULL, lengths differ, or a
  * null element is hit (the fold yields NULL in those cases too).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<float|double>, array<float|double>), " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  private lazy val leftIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val rightIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val get1 =
        if (leftIsFloat) s"((double) $arr1.getFloat($i))" else s"$arr1.getDouble($i)"
      val get2 =
        if (rightIsFloat) s"((double) $arr2.getFloat($i))" else s"$arr2.getDouble($i)"
      s"""
         |final int $n = $arr1.numElements();
         |if ($n != $arr2.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arr1.isNullAt($i) || $arr2.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $get1 * $get2;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
